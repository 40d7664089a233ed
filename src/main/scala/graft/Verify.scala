package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump one query result to `outDir/<name>`. A throwing query emits an
    * explicit failure artifact — a one-row parquet whose `_error` schema can
    * never match the oracle — so the driver reports a RED row instead of
    * silently shrinking its denominator (round-9 lesson: q_sessionize broke
    * and vanished from the dump with no red signal anywhere).
    */
  def dumpOne(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      name: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
    try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    catch { case e: Throwable =>
      System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
      import spark.implicits._
      Seq(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(2000)}")
        .toDF("_error").coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Optional extra args: restrict to a subset of query names (local iteration).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Fixture-scale scan split (see GSession.local).
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as nanos-since-epoch long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // Robustness-sweep hook: semicolon-separated k=v pairs override any
    // default above (codegen off, AQE off, shuffle.partitions=1/200 — the
    // oracle answers must not depend on the plan configuration).
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").iterator.map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder = builder.config(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_EXTRA_CONF entry '$kv' is not key=value")
        }
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        dumpOne(spark, sfDir, outDir, name, fn)
        // queries that persist internal frames (coloc chain, pagerank
        // edges, IVF codebooks) would otherwise accumulate cache across a
        // ~200-query dump and starve executor memory at larger SFs —
        // measured: q_clump 3 s in isolation vs >20 min after 100 cached
        // queries at ~sf1. Mirror Bench's per-query isolation.
        spark.catalog.clearCache()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
