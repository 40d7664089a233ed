package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) clustering for data-skipping layouts.
  *
  * Writing a 100 TB table sorted by ONE key gives perfect min/max pruning on
  * that key and none on the others; interleaving the bits of several keys'
  * bucket indices gives every interleaved key partial locality, so
  * file-level min/max statistics prune scans on ANY of them. This is the
  * layout tool for fact tables queried along multiple dimensions
  * (chromosome × position × study; user × time).
  *
  * [[zValue]] builds a static shift/mask expression tree (no lambdas, no
  * UDFs — it stays inside whole-stage codegen). Buckets are equal-width
  * over each column's observed min/max by default (one tiny driver-side
  * agg); pass explicit per-column (min, max) bounds to skip that job or to
  * bucket by domain knowledge. For heavily skewed columns, pre-map through
  * a rank/quantile transform before z-ordering.
  */
object ZOrder {

  /** Morton-interleave the given numeric columns into one sortable long.
    *
    * @param cols   columns with their (min, max) bounds
    * @param bits   bits per column; cols.size * bits must be ≤ 63
    */
  def zValue(cols: Seq[(Column, (Double, Double))], bits: Int = 12): Column = {
    val k = cols.size
    require(k >= 1, "need at least one column")
    require(k * bits <= 63, s"$k cols × $bits bits exceeds a long")
    val buckets = cols.map { case (c, (mn, mx)) =>
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      // clamp into [0, 2^bits - 1]
      least(
        greatest(
          floor((c.cast("double") - lit(mn)) / lit(span) * lit((1L << bits).toDouble)),
          lit(0.0)),
        lit(((1L << bits) - 1).toDouble)).cast("long")
    }
    // bit i of column j lands at position i*k + j — a static fold, fully
    // codegen'd shift/mask arithmetic
    (0 until bits)
      .flatMap(i => buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
      })
      .reduce(_ bitwiseOR _)
  }

  /** Compute each column's observed (min, max) in one aggregation pass. */
  def bounds(df: DataFrame, colNames: Seq[String]): Seq[(Column, (Double, Double))] = {
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"_mn_$c"), max(col(c).cast("double")).as(s"_mx_$c")))
    val row = df.select(aggs: _*).head()
    colNames.map(c =>
      col(c) -> (row.getAs[Double](s"_mn_$c"), row.getAs[Double](s"_mx_$c")))
  }

  /** Cluster `df` by the z-value of `colNames` into `numFiles` range
    * partitions, sorted within each, and return the frame ready to write
    * (call `.write.parquet(...)` on it): every output file covers a compact
    * hyper-rectangle of the key space, so parquet footer min/max stats
    * prune on any of the z-ordered columns.
    */
  def zOrdered(df: DataFrame, colNames: Seq[String], numFiles: Int, bits: Int = 12): DataFrame = {
    val z = zValue(bounds(df, colNames), bits)
    df.withColumn("_zorder", z)
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
  }
}
