package graft.operators

import graft.SparkSpec

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  test("goldenRecord survives the latest non-null value per attribute independently") {
    val recs = Seq(
      // entity 1: email only on the oldest record, phone only on the middle one
      (1L, 1L, Some("a@old"), Option.empty[String]),
      (1L, 2L, None, Some("555-1")),
      (1L, 3L, None, None),
      // entity 2: everything on the latest
      (2L, 1L, Some("b@old"), Some("555-old")),
      (2L, 2L, Some("b@new"), Some("555-new")),
      // entity 3: never has a phone
      (3L, 1L, Some("c@x"), None)
    ).toDF("id", "seq", "email", "phone")
    val got = Survivorship.goldenRecord(recs, Seq("id"), "seq", Seq("email", "phone"))
      .as[(Long, Option[String], Option[String], Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some("a@old"), Some("555-1"), 3L, 3L)),
      "attributes survive from DIFFERENT records")
    assert(got(2L) == ((2L, Some("b@new"), Some("555-new"), 2L, 2L)))
    assert(got(3L) == ((3L, Some("c@x"), None, 1L, 1L)), "never-present stays null")
  }

  test("the merge is one map-side-combinable aggregation — no window, no self-join") {
    val recs = Seq((1L, 1L, Some("x"), Some("y"))).toDF("id", "seq", "email", "phone")
    val plan = Survivorship.goldenRecord(recs, Seq("id"), "seq", Seq("email", "phone"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.toLowerCase.contains("join"), plan)
    assert(plan.contains("partial"), s"expected partial aggregation:\n$plan")
  }
}
