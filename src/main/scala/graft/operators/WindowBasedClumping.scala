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
    // Copy to an array before the loop: the Seq Spark deserialises for a
    // UDF argument can have O(i) apply (List-like in Scala 2.13), which
    // silently turns this greedy loop into O(n²) — measured 345 of
    // q_clump's 366 s at sf1 (42 clusters × ~142k positions ≈ 1e10 derefs)
    // with every OTHER stage of the pipeline ≤6 s. With the array the whole
    // UDF is O(n log n) in the TreeSet as designed.
    val ps = positions.toArray
    val isLead = Array.fill(ps.length)(0)
    val leads = new java.util.TreeSet[java.lang.Long]()
    var index = 0
    while (index < ps.length) {
      val p = ps(index)
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

  /** [[prunePeak]] compressed to the 0-based ranks that ARE leads. This is
    * what the clump pipeline distributes: the flag array is cluster-sized,
    * so carrying it to every row (via window or join) costs O(cluster²)
    * element copies (measured: the ~150k-position sf1 clusters made q_clump
    * a 700 s query); the index array is only #leads ≤ span/window + 1 long
    * and explodes to one row per lead for the rank join in [[clump]].
    * Pinned equal to prunePeak in ClumpingSpec.
    */
  def prunePeakLeadIndices(positions: Seq[Long], windowSize: Int): Seq[Int] = {
    val flags = prunePeak(positions, windowSize)
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i < flags.length) {
      if (flags(i) == 1) out += i
      i += 1
    }
    out.result()
  }

  private[graft] val prunePeakLeadIndicesUdf =
    udf((positions: Seq[Long], windowSize: Int) => prunePeakLeadIndices(positions, windowSize))

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

    // a row is clumped away when no lead-rank row matched its own rank in
    // the left join below
    val qcCheck = col("_leadRank").isNull
    val qcExpression =
      if (unclumped.columns.contains("qualityControls"))
        when(qcCheck, array_union(col("qualityControls"), array(lit(WindowClumpedFlag))))
          .otherwise(col("qualityControls"))
      else
        when(qcCheck, array(lit(WindowClumpedFlag)))
          .otherwise(array().cast(ArrayType(StringType)))

    val clustered = unclumped
      .withColumn(
        "cluster_id",
        clusterPeaks(col("studyId"), col("chromosome"), col("position"), distance)
      )

    // Per-cluster greedy lead selection through an AGGREGATE and a per-rank
    // join — no array ever rides a per-row column. Earlier formulations paid
    // quadratic element copies twice over (measured round 12 at 10× rows,
    // where a (study, chromosome) group collapses into ONE ~150k-position
    // cluster with ~10k leads): (1) window frames — WindowExec materialises
    // an array-valued window column into EVERY row of the frame before any
    // `when` guard applies, so collecting the positions via a window was
    // O(cluster²) copies (q_clump 700 s solo); (2) joining the cluster's
    // lead-index ARRAY onto its rows was O(rows × leads) ≈ 5.9e10 copied
    // elements (362 s). Here the aggregate holds exactly ONE ordered
    // positions array per cluster, the UDF runs once per cluster, the lead
    // indices EXPLODE to one row per lead (#leads ≈ span/window, bounded),
    // and a left equi join on (cluster, rank) hands each row a scalar
    // matched/unmatched flag — every path linear in rows + leads.
    // sort_array on (exponent, mantissa, position) structs is lexicographic
    // — precisely the significance order the rank window uses, so lead
    // indices and window ranks agree.
    val leadRanks = clustered
      .groupBy("studyId", "chromosome", "cluster_id")
      .agg(
        sort_array(
          collect_list(
            struct(
              col("pValueExponent").as("e"),
              col("pValueMantissa").as("m"),
              col("position").as("p")))).as("_ordered"))
      .select(
        col("studyId").as("_l_studyId"),
        col("chromosome").as("_l_chromosome"),
        col("cluster_id").as("_l_clusterId"),
        explode(
          prunePeakLeadIndicesUdf(
            expr("transform(_ordered, x -> CAST(x.p AS LONG))"),
            lit(distance.toInt))).as("_leadIdx"))
      .select(
        col("_l_studyId"),
        col("_l_chromosome"),
        col("_l_clusterId"),
        (col("_leadIdx") + 1).as("_leadRank"))

    clustered
      .withColumn("pvRank", row_number().over(clusterWindow))
      .join(
        leadRanks,
        col("studyId") === col("_l_studyId") &&
          col("chromosome") === col("_l_chromosome") &&
          col("cluster_id") === col("_l_clusterId") &&
          col("pvRank") === col("_leadRank"),
        "left")
      .withColumn(
        "studyLocusId",
        GDataset.generateIdentifier(Seq("studyId", "variantId")).alias("studyLocusId")
      )
      .withColumn("qualityControls", qcExpression)
      .drop("pvRank", "cluster_id", "_l_studyId", "_l_chromosome", "_l_clusterId", "_leadRank")
  }
}
