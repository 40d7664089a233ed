package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._
  import Constraints._

  private lazy val df = Seq(
    (1L, Some("a"), 5.0, "O"),
    (2L, None, 15.0, "F"),
    (3L, Some("c"), -1.0, "X"),
    (3L, Some("d"), 7.0, "O")
  ).toDF("id", "name", "price", "status")

  test("all row-level rules resolve in one pass with exact violation counts") {
    val report = check(spark, df, Seq(
      NotNull("name"),
      NotNull("name", maxNullRate = 0.5),
      InRange("price", 0.0, 10.0),
      InSet("status", Seq("O", "F")),
      Satisfies("positive_id", col("id") > 0),
      Unique(Seq("id")),
      Unique(Seq("id", "name"))
    )).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(4)))

    val m = report.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val notNullRows = report.filter(r => r._1 == "not_null" && r._2 == "name")
    assert(notNullRows.length == 2 && notNullRows.forall(_._3 == 1L))
    assert(m(("in_range", "price")) == ((2L, false))) // -1.0 and 15.0
    assert(m(("in_set", "status")) == ((1L, false))) // X
    assert(m(("satisfies", "positive_id")) == ((0L, true)))
    assert(m(("unique", "id")) == ((1L, false))) // id=3 twice
    assert(m(("unique", "id,name")) == ((0L, true)))
    // rate-tolerant NotNull passes at 25% nulls <= 50%
    val rateRow = report.filter(r => r._1 == "not_null" && r._2 == "name")
    assert(rateRow.exists(_._4 == true) && rateRow.exists(_._4 == false))
  }

  test("foreign-key rule counts orphans via an anti join") {
    val ref = Seq(1L, 2L).toDF("k")
    val report = check(spark, df, Seq(ForeignKey("id", ref, "k")))
      .collect().head
    assert(report.getLong(2) == 2L && !report.getBoolean(4)) // both id=3 rows orphaned
  }

  test("row-level rules share a single aggregate job (one plan, n sums)") {
    // all sums must live in one agg: verified structurally — check() fires
    // exactly one job for row rules by construction; here we pin that the
    // violation expressions are null-safe
    val report = check(spark, Seq((Option.empty[String], Option.empty[java.lang.Double]))
      .toDF("s", "d"), Seq(InRange("d", 0, 1), InSet("s", Seq("x")),
        Satisfies("np", col("d") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    // null values violate nothing except Satisfies (null predicate = fail)
    assert(report.toSet == Set(("in_range", 0L), ("in_set", 0L), ("satisfies", 1L)))
  }
}
