package graft.plans

import scala.util.Random

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property pins for the round-12 window-flag conversions: every predicate
  * that used to reduce a whole-partition `collect_set` array must agree
  * with its min/max replacement on every null/duplicate/singleton shape —
  * including the all-null group, where the set forms read size(∅) = 0 and
  * the min/max forms rely on coalesce(…, false).
  */
class DistinctFlagEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(12)
  // Groups engineered to cover: all-null, singleton, duplicates-only,
  // two distinct, many distinct, distinct+null mixes — plus random fill.
  private val rows: Seq[(Int, Option[String], Option[Boolean])] = Seq(
    (0, None, None), (0, None, None),
    (1, Some("x"), Some(false)),
    (2, Some("x"), Some(false)), (2, Some("x"), Some(false)),
    (3, Some("x"), Some(false)), (3, Some("y"), Some(true)),
    (4, Some("x"), None), (4, None, Some(false)), (4, Some("x"), Some(false)),
    (5, None, Some(true)), (5, Some("z"), None)
  ) ++ (0 until 500).map { i =>
    val g = 6 + rng.nextInt(40)
    (
      g,
      if (rng.nextInt(5) == 0) None else Some(s"v${rng.nextInt(4)}"),
      if (rng.nextInt(5) == 0) None else Some(rng.nextBoolean()))
  }

  private val df = rows.toDF("g", "s", "b")
  private val w = Window.partitionBy("g")

  private def assertAgree(setForm: Column, minMaxForm: Column): Unit = {
    val got = df
      .withColumn("setForm", setForm)
      .withColumn("mmForm", minMaxForm)
      .filter(col("setForm") =!= col("mmForm") ||
        col("setForm").isNull =!= col("mmForm").isNull)
    val bad = got.select("g", "s", "b", "setForm", "mmForm").collect()
    assert(bad.isEmpty, s"forms disagree on ${bad.length} rows: ${bad.take(5).mkString(", ")}")
  }

  test(">1-distinct flag: size(collect_set) > 1 ⇔ coalesce(min =!= max, false), all group shapes") {
    assertAgree(
      size(collect_set(col("s")).over(w)) > 1,
      coalesce(min(col("s")).over(w) =!= max(col("s")).over(w), lit(false)))
  }

  test("any-true flag: array_contains(collect_set(b), true) ⇔ coalesce(max(b), false), all group shapes") {
    assertAgree(
      when(array_contains(collect_set(col("b")).over(w), true), lit(true)).otherwise(lit(false)),
      coalesce(max(col("b")).over(w), lit(false)))
  }

  test(">1-distinct flag on doubles: min/max agree with the distinct array under duplicate floats") {
    val dd = rows.map { case (g, s, _) => (g, s.map(_.length.toDouble * 0.1)) }
      .toDF("g", "d")
    val got = dd
      .withColumn("setForm", size(array_distinct(collect_list(col("d")).over(w))) > 1)
      .withColumn("mmForm", coalesce(min(col("d")).over(w) =!= max(col("d")).over(w), lit(false)))
      .filter(col("setForm") =!= col("mmForm"))
    assert(got.count() === 0)
  }
}
