package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  test("withSessionIndex splits on gaps and counts sessions per user") {
    import spark.implicits._
    val df = Seq(
      // user 1: two sessions (gap 5000 > 1800)
      (1L, 1000L), (1L, 1500L), (1L, 6500L),
      // user 2: one session — gap exactly 1800 does NOT split (> comparison)
      (2L, 100L), (2L, 1900L)
    ).toDF("user_id", "ts_sec")

    val got = Sessionize
      .withSessionIndex(df, col("user_id"), col("ts_sec"), 1800)
      .select("user_id", "ts_sec", "session_idx")
      .as[(Long, Long, Long)]
      .collect()
      .toSet

    assert(
      got === Set(
        (1L, 1000L, 1L), (1L, 1500L, 1L), (1L, 6500L, 2L),
        (2L, 100L, 1L), (2L, 1900L, 1L)
      )
    )
  }
}
