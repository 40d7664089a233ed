package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[Option[String]] = {
    import spark.implicits._
    urls.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c"))
      .as[Option[String]].collect().toSeq
  }

  test("canonicalize: case, www, default ports, slashes, tracking params, fragments") {
    assert(canon(
      "HTTP://WWW.Example.COM:80//a//b/?utm_source=x&b=2&a=1#frag",
      "https://example.com:443/a/b",
      "https://example.com:8443/a/b",       // non-default port kept
      "http://example.com",                 // empty path -> "/"
      "http://example.com/?fbclid=zz",      // tracking-only query drops the ?
      "http://example.com/a?b=2&a=1",       // params sorted
      "http://sub.www-like.example.com/x"   // only a LEADING www. strips
    ) === Seq(
      Some("http://example.com/a/b?a=1&b=2"),
      Some("https://example.com/a/b"),
      Some("https://example.com:8443/a/b"),
      Some("http://example.com/"),
      Some("http://example.com/"),
      Some("http://example.com/a?a=1&b=2"),
      Some("http://sub.www-like.example.com/x")))
  }

  test("canonicalize: idempotent on its own output") {
    import spark.implicits._
    val messy = Seq(
      "HTTP://WWW.Example.COM:80//a//b/?utm_source=x&b=2&a=1#frag",
      "https://Example.com/a//b//c?gclid=1&z=9&y=8")
    val once = canon(messy: _*).map(_.get)
    assert(canon(once: _*).map(_.get) === once)
  }

  test("canonicalize: malformed input surfaces as NULL, not passthrough") {
    assert(canon("not a url", "example.com/no-scheme", "http//missing-colon")
      === Seq(None, None, None))
  }

  test("the column stack stays inside whole-stage codegen (no UDF)") {
    import spark.implicits._
    val df = Seq("http://a.example.com/x").toDF("url")
      .select(UrlOps.canonicalize(col("url")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"plan must be UDF-free:\n$plan")
  }
}
