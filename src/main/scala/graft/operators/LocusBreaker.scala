package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.sql.DataFrame

import graft.core.GDataset
import graft.functions.Stats

/** Locus-breaker clumping: split a chromosome into loci at baseline-significance
  * gaps, keep the top variant per locus
  * (reference: method/locus_breaker_clumping.py:40-163).
  *
  * Three windows, all sharing the (studyId, chromosome) shuffle key: lag for
  * gap detection, a running `last` for locus-start propagation, full-frame
  * `max` for locus end, and `rank` for lead selection.
  */
object LocusBreaker {

  def locusBreaker(
      sumstats: DataFrame,
      baselinePvalueCutoff: Double,
      distanceCutoff: Long,
      pvalueCutoff: Double,
      flankingDistance: Long
  ): DataFrame = {
    val sumstatsColumns = sumstats.columns.toSeq
    val neglogPvCutoff = -math.log10(pvalueCutoff)

    val w1 = Window.partitionBy("studyId", "chromosome").orderBy("position")
    val w1Running = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w2 = Window
      .partitionBy("studyId", "chromosome", "locusStart")
      .orderBy("position")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w3 = Window
      .partitionBy("studyId", "chromosome", "locusStart", "locusEnd")
      .orderBy(col("negLogPValue").desc)

    val runningStart = last(col("locusStart") - flankingDistance, ignoreNulls = true).over(w1Running)

    sumstats
      .filter(
        Stats.pvalueFilterCondition(
          col("pValueMantissa"), col("pValueExponent"), baselinePvalueCutoff)
      )
      .withColumn(
        "negLogPValue",
        Stats.neglogpvalFromPvalue(col("pValueMantissa"), col("pValueExponent"))
      )
      .withColumn("next_position", lag(col("position"), 1).over(w1))
      .withColumn("distance", col("position") - col("next_position"))
      .withColumn(
        "locusStart",
        when(col("distance") > distanceCutoff || col("distance").isNull, col("position"))
      )
      .withColumn(
        "locusStart",
        when(runningStart > 0, runningStart).otherwise(lit(0))
      )
      .withColumn("locusEnd", max(col("position") + flankingDistance).over(w2))
      .withColumn("rank", rank().over(w3))
      .filter(col("rank") === 1 && col("negLogPValue") > neglogPvCutoff)
      .select(
        sumstatsColumns.map(col) ++ Seq(
          col("locusStart").cast(IntegerType).as("locusStart"),
          col("locusEnd").cast(IntegerType).as("locusEnd"),
          lit(null).cast(ArrayType(StringType)).as("qualityControls"),
          GDataset.generateIdentifier(Seq("studyId", "variantId")).as("studyLocusId")
        ): _*
      )
  }

  /** Keep window-clumped loci that fall inside large locus-breaker loci; keep
    * small loci as-is (left-semi join, method/locus_breaker_clumping.py:140-163).
    */
  def processLocusBreakerOutput(
      lbc: DataFrame,
      wbc: DataFrame,
      largeLociSize: Int
  ): DataFrame = {
    val smallLoci = lbc.filter(col("locusEnd") - col("locusStart") <= largeLociSize)
    val largeLoci = lbc.filter(col("locusEnd") - col("locusStart") > largeLociSize)
    // Bin-keyed range semi-join (same shape as IntervalJoin/the round-12
    // locus_annotate fix): the bare (studyId, chromosome) equi prefix has
    // only tens of distinct keys — study-count × chromosome-count — so at
    // scale every key group pairs millions of positions against thousands
    // of loci and per-key work grows quadratically with density (sf10
    // probe: 138 s, exponent 1.16). Adding the position bin to the key
    // makes key count track the position range instead; a locus explodes
    // to the ≲ span/binWidth + 1 bins it touches, and semi semantics
    // dedup for free.
    val binWidth = largeLociSize.toLong.max(1L)
    val ll = largeLoci
      .select(col("studyId"), col("chromosome"), col("locusStart"), col("locusEnd"))
      .withColumn(
        "_bin",
        explode(
          sequence(
            floor(col("locusStart") / binWidth).cast("long"),
            floor(col("locusEnd") / binWidth).cast("long"))))
      .alias("ll")
    val largeLociWbc = wbc
      .withColumn("_bin", floor(col("position") / binWidth).cast("long"))
      .alias("wbc")
      .join(
        ll,
        col("wbc.studyId") === col("ll.studyId") &&
          col("wbc.chromosome") === col("ll.chromosome") &&
          col("wbc._bin") === col("ll._bin") &&
          col("wbc.position").between(col("ll.locusStart"), col("ll.locusEnd")),
        "semi"
      )
      .drop("_bin")
      .withColumn("locusStart", col("position") - largeLociSize / 2)
      .withColumn("locusEnd", col("position") + largeLociSize / 2)
    largeLociWbc.unionByName(smallLoci, allowMissingColumns = true)
  }
}
