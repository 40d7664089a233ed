package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.sql.{Column, DataFrame}

import graft.core.GDataset

/** Distance-based clumping of GWAS significant variants
  * (reference: method/window_based_clumping.py:24-258).
  *
  * Design for scale: the expensive greedy lead-selection runs ONCE per
  * cluster on a collected position array (complexity reduction from O(n²)
  * over a chromosome to O(cluster²) per cluster), exactly as the reference
  * does; clusters are formed first with a single window pass. All windows
  * share the (studyId, chromosome) partitioning, so the whole pipeline is
  * one shuffle on those keys.
  */
object WindowBasedClumping {

  /** The QC flag appended to variants explained by a more significant lead
    * (dataset/study_locus.py:100).
    */
  val WindowClumpedFlag = "Explained by a more significant variant in the same window"

  /** Assign a cluster identifier: clusters are runs of variants where the gap
    * between subsequent positions stays within `windowLength`
    * (method/window_based_clumping.py:28-112).
    */
  def clusterPeaks(
      study: Column,
      chromosome: Column,
      position: Column,
      windowLength: Long
  ): Column = {
    val byPosition = Window.partitionBy(study, chromosome).orderBy(position)
    val previousPosition = lag(position, 1).over(byPosition)
    val clusterId = when(
      previousPosition.isNull || (position - previousPosition > windowLength),
      concat_ws("_", study, chromosome, position)
    )
    when(
      clusterId.isNull,
      last(clusterId, ignoreNulls = true)
        .over(byPosition.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).otherwise(clusterId)
  }

  /** Greedy lead selection: positions are listed by ascending p-value; a
    * position becomes a lead unless a previously-chosen lead lies within
    * `windowSize` (method/window_based_clumping.py:114-153). Plain arrays —
    * no ML vector types.
    *
    * The "is any chosen lead within `windowSize`" membership test runs on
    * a TreeSet (nearest lead via floor/ceiling) — O(n log n) per cluster
    * instead of the reference's O(n × leads) linear re-scan. Identical
    * output (only the LOOKUP changed, the greedy order did not); the
    * difference is what makes dense clusters survivable: at 10× the sf0.1
    * density a chromosome collapses into ONE cluster of ~150k positions
    * with ~2000 leads, and the quadratic scan measured >20 minutes where
    * this runs in milliseconds.
    */
  def prunePeak(positions: Seq[Long], windowSize: Int): Seq[Int] = {
    val isLead = Array.fill(positions.length)(0)
    val leads = new java.util.TreeSet[java.lang.Long]()
    var index = 0
    while (index < positions.length) {
      val p = positions(index)
      val below = leads.floor(p)
      val above = leads.ceiling(p)
      val nearLead =
        (below != null && p - below < windowSize) ||
          (above != null && above - p < windowSize)
      if (!nearLead) {
        leads.add(p)
        isLead(index) = 1
      }
      index += 1
    }
    isLead.toSeq
  }

  private val prunePeakUdf =
    udf((positions: Seq[Long], windowSize: Int) => prunePeak(positions, windowSize))

  /** Clump associations: all variants are kept, non-lead variants gain the
    * [[WindowClumpedFlag]] QC flag (method/window_based_clumping.py:155-258).
    *
    * Expects columns: studyId, chromosome, position, pValueMantissa,
    * pValueExponent, variantId. Significance ordering is
    * (pValueExponent asc, pValueMantissa asc) like the reference, extended
    * with `position asc` so rank ties resolve deterministically (the
    * reference is only set-stable on ties).
    */
  def clump(unclumped: DataFrame, distance: Long = 500000): DataFrame = {
    val clusterWindow = Window
      .partitionBy("studyId", "chromosome", "cluster_id")
      .orderBy(col("pValueExponent").asc, col("pValueMantissa").asc, col("position").asc)

    val qcCheck = col("semiIndices")(col("pvRank") - 1) <= 0
    val qcExpression =
      if (unclumped.columns.contains("qualityControls"))
        when(qcCheck, array_union(col("qualityControls"), array(lit(WindowClumpedFlag))))
          .otherwise(col("qualityControls"))
      else
        when(qcCheck, array(lit(WindowClumpedFlag)))
          .otherwise(array().cast(ArrayType(StringType)))

    unclumped
      .withColumn(
        "cluster_id",
        clusterPeaks(col("studyId"), col("chromosome"), col("position"), distance)
      )
      .withColumn("pvRank", row_number().over(clusterWindow))
      .withColumn(
        "collectedPositions",
        // whole-partition frame, NOT currentRow→unboundedFollowing: only the
        // rank-1 row's value is consumed, and for that row the two frames are
        // identical — but the moving frame re-materialises a shrinking list
        // per ROW (O(n²) per cluster; a 150k-position cluster at ~sf1 took
        // >20 min), while the unbounded frame is computed ONCE per partition.
        when(
          col("pvRank") === 1,
          collect_list(col("position"))
            .over(clusterWindow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        ).otherwise(array())
      )
      .withColumn(
        "semiIndices",
        when(
          size(col("collectedPositions")) > 0,
          prunePeakUdf(col("collectedPositions"), lit(distance.toInt))
        )
      )
      .withColumn(
        "semiIndices",
        when(
          col("semiIndices").isNull,
          first(col("semiIndices"), ignoreNulls = true).over(clusterWindow)
        ).otherwise(col("semiIndices"))
      )
      .withColumn(
        "studyLocusId",
        GDataset.generateIdentifier(Seq("studyId", "variantId")).alias("studyLocusId")
      )
      .withColumn("qualityControls", qcExpression)
      .drop("pvRank", "collectedPositions", "semiIndices", "cluster_id")
  }
}
