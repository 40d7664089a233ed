package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BindOnceAuditSpec extends SparkSpec {

  private def violations(df: org.apache.spark.sql.DataFrame): Seq[String] =
    BindOnceAudit.audit(df.queryExecution.analyzed)

  test("a deliberately pessimised kernel is flagged (O(n) aggregate inside the lambda)") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(transform(col("v"), x => x - array_max(col("v"))).as("bad"))
    val found = violations(df)
    assert(found.nonEmpty, "array_max(v) inside transform(v, ...) must be flagged")
    assert(found.exists(_.contains("array_max")), found.mkString("; "))
  }

  test("a non-leaf iterated array re-referenced inside its own lambda is flagged") {
    import spark.implicits._
    // `sequence(...)` is a non-leaf array expression; element_at(arr, 1)
    // inside the lambda re-evaluates the whole sequence per element.
    val df = Seq(5).toDF("n")
      .select(
        transform(
          sequence(lit(1), col("n")),
          x => x + element_at(sequence(lit(1), col("n")), 1)).as("bad"))
    val found = violations(df)
    assert(found.exists(_.contains("re-referenced")), found.mkString("; "))
  }

  test("the let-bound fix pattern passes: lambda variables are bound values") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(
        element_at(
          transform(
            array(struct(col("v").as("v"), array_max(col("v")).as("mx"))),
            p =>
              transform(p.getField("v"), x => x - p.getField("mx"))),
          1).as("good"))
    assert(violations(df).isEmpty, violations(df).mkString("; "))
  }

  test("the full query surface is bindOnce-clean at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val dirty = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs =
          try violations(fn(spark, sfDir))
          catch { case e: Throwable => Seq(s"(audit could not build $name: ${e.getMessage})") }
        vs.map(v => s"$name: $v")
    }
    assert(dirty.isEmpty, s"${dirty.size} violations:\n${dirty.mkString("\n")}")
  }
}
