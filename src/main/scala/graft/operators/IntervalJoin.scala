package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Scalable interval joins for the case the broadcast range join
  * (Annotations.annotateLocusStatistics pattern, reference
  * common/processing.py locus annotation) cannot handle: BOTH sides too
  * large to broadcast.
  *
  * Fixed-width genomic bins turn the range predicate into an equi-join:
  * an interval is exploded to every bin it overlaps (cost = span/binWidth
  * rows, small for bounded genomic features), a point maps to exactly one
  * bin, and the shuffle is a plain `(chromosome, bin)` hash exchange —
  * no broadcast, no cartesian, skew bounded by per-bin density rather
  * than per-chromosome size.
  *
  * Interval×interval overlap uses the same explosion on both sides plus
  * the standard dedup rule: a candidate pair is kept only in the bin that
  * contains `max(aStart, bStart)`, so each overlapping pair survives
  * exactly once without a distinct.
  */
object IntervalJoin {

  /** Points annotated with every interval containing them.
    *
    * @param points    frame with `chromCol`, `posCol` (+ payload)
    * @param intervals frame with `chromCol`, `startCol`, `endCol`
    *                  (+ payload); intervals are CLOSED on both ends
    * @param binWidth  bin width in position units; pick ≥ the typical
    *                  interval span so explosion stays ≤2× (100 kb for
    *                  regulatory features)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      chromCol: String = "chromosome",
      posCol: String = "position",
      startCol: String = "start",
      endCol: String = "end",
      binWidth: Long = 100000L
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("_bin", floor(col(posCol) / binWidth).cast("long"))
    val iv = intervals.withColumn(
      "_bin",
      explode(
        sequence(
          floor(col(startCol) / binWidth).cast("long"),
          floor(col(endCol) / binWidth).cast("long"))))
    p.join(iv, Seq(chromCol, "_bin"))
      .filter(col(posCol) >= col(startCol) && col(posCol) <= col(endCol))
      .drop("_bin")
  }

  /** All overlapping (a, b) interval pairs across two frames. Column names
    * on `b` get the given suffix in the output. Overlap is closed-interval
    * (`aStart ≤ bEnd && bStart ≤ aEnd`).
    */
  def intervalOverlap(
      a: DataFrame,
      b: DataFrame,
      chromCol: String = "chromosome",
      startCol: String = "start",
      endCol: String = "end",
      suffix: String = "_b",
      binWidth: Long = 100000L
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame): DataFrame =
      df.withColumn(
        "_bin",
        explode(
          sequence(
            floor(col(startCol) / binWidth).cast("long"),
            floor(col(endCol) / binWidth).cast("long"))))
    val bRenamed = b.columns.foldLeft(b) { (df, c) =>
      if (c == chromCol) df else df.withColumnRenamed(c, s"$c$suffix")
    }
    val sB = s"$startCol$suffix"
    val eB = s"$endCol$suffix"
    binned(a)
      .join(
        bRenamed.withColumn(
          "_bin",
          explode(
            sequence(
              floor(col(sB) / binWidth).cast("long"),
              floor(col(eB) / binWidth).cast("long")))),
        Seq(chromCol, "_bin"))
      .filter(
        col(startCol) <= col(eB) && col(sB) <= col(endCol) &&
          // keep each pair only in the bin holding max(aStart, bStart)
          col("_bin") === floor(greatest(col(startCol), col(sB)) / binWidth).cast("long"))
      .drop("_bin")
  }
}
