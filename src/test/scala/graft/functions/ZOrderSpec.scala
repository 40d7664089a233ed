package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bucket bits (x at even, y at odd positions)") {
    val df = Seq((3.0, 1.0)).toDF("x", "y")
    val z = df.select(
      ZOrder.zValue(Seq(col("x") -> (0.0, 4.0), col("y") -> (0.0, 4.0)), bits = 2).as("z"))
      .head().getLong(0)
    // bucket(x)=3 (bits 11 at even pos 0,2), bucket(y)=1 (bit 1 at odd pos 1)
    assert(z == 7L)
  }

  test("z-ordered layout prunes range queries on EVERY interleaved dimension") {
    val grid = (for (x <- 0 until 128; y <- 0 until 128) yield (x, y)).toDF("x", "y")
      .repartition(8) // scramble first

    // how many partitions' min/max stats overlap a thin band on `dim` —
    // the file-skipping proxy: a pruned scan touches only those
    def partsTouching(df: org.apache.spark.sql.DataFrame, dim: String, lo: Int, hi: Int): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min(dim).as("mn"), max(dim).as("mx"))
        .filter(col("mx") >= lo && col("mn") <= hi)
        .count()

    val zord = ZOrder.zOrdered(grid, Seq("x", "y"), numFiles = 16).cache()
    val xOnly = grid.repartitionByRange(16, col("x")).sortWithinPartitions("x").cache()
    // x-sorted layout: perfect pruning on x, NONE on y (every strip spans y)
    assert(partsTouching(xOnly, "y", 0, 7) == 16L)
    // z-order: both dimensions prune — a 8/128 band touches a fraction
    val zy = partsTouching(zord, "y", 0, 7)
    val zx = partsTouching(zord, "x", 0, 7)
    assert(zy <= 8L, s"y-band touched $zy of 16 z-ordered partitions")
    assert(zx <= 8L, s"x-band touched $zx of 16 z-ordered partitions")
    assert(zord.count() == grid.count())
    zord.unpersist(); xOnly.unpersist()
  }

  test("bounds computes per-column min/max in one pass and zOrdered round-trips") {
    val df = Seq((1, 10L, 0.5), (5, 20L, 0.1), (3, 15L, 0.9)).toDF("a", "b", "c")
    val bs = ZOrder.bounds(df, Seq("a", "b", "c")).map(_._2)
    assert(bs == Seq((1.0, 5.0), (10.0, 20.0), (0.1, 0.9)))
    val out = ZOrder.zOrdered(df, Seq("a", "b"), numFiles = 2)
    assert(out.columns.toSeq == Seq("a", "b", "c"))
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 5))
  }

  test("63-bit budget and empty-column guards fail loudly") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq.fill(6)(col("x") -> (0.0, 1.0)), bits = 12)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq.empty, bits = 12)
    }
  }
}
