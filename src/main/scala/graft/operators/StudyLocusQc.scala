package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.core.GDataset
import graft.functions.Stats

/** StudyLocus validation / QC flag family
  * (reference: dataset/study_locus.py:252-500, 1180-1242, 1423-1494).
  * Every method is a column transform or an equi join + flag update —
  * shuffle-free except where a per-study or per-locus aggregate is
  * inherent.
  */
object StudyLocusQc {

  // StudyLocusQualityCheck texts (study_locus.py:78-122)
  val SubsignificantFlag = "Subsignificant p-value"
  val DuplicatedStudyLocusFlag = "Non-unique study locus identifier"
  val InvalidVariantIdentifierFlag =
    "Some variant identifiers of this locus were not found in variant index"
  val InMhcFlag = "MHC region"
  val RedundantPicsTopHitFlag =
    "PICS results from summary statistics available for this same study"
  val TopHitFlag = "Study locus from curated top hit"
  val OutOfSampleLdFlag = "Study locus finemapped without in-sample LD reference"
  val AbnormalPipsFlag =
    "Study locus with a sum of PIPs that not in the expected range [0.95,1]"
  val InvalidChromosomeFlag = "Chromosome not in 1:22, X, Y, XY or MT"
  val NoPopulationFlag = "Study does not have population annotation to resolve LD"

  // CredibleSetConfidenceClasses (study_locus.py:40-60)
  val ConfidenceInSampleLd = "SuSiE fine-mapped credible set with in-sample LD"
  val ConfidenceOutOfSampleLd = "SuSiE fine-mapped credible set with out-of-sample LD"
  val ConfidencePicsSumstats = "PICS fine-mapped credible set extracted from summary statistics"
  val ConfidencePicsTopHit = "PICS fine-mapped credible set based on reported top hit"
  val ConfidenceUnknown = "Unknown confidence"

  val ValidChromosomes: Seq[String] = (1 to 22).map(_.toString) ++ Seq("X", "Y", "XY", "MT")

  private def qcCol(df: DataFrame): Column =
    if (df.columns.contains("qualityControls")) col("qualityControls")
    else lit(null).cast("array<string>")

  /** Flag chromosomes outside 1:22, X, Y, XY, MT (study_locus.py:252-278). */
  def validateChromosomeLabel(df: DataFrame): DataFrame =
    df.withColumn(
      "qualityControls",
      GDataset.updateQualityFlag(
        qcCol(df),
        !col("chromosome").isin(ValidChromosomes: _*),
        InvalidChromosomeFlag))

  /** Flag loci whose locus array contains variants missing from the variant
    * index (study_locus.py:281-339): explode → left join → any-missing per
    * locus.
    */
  def validateVariantIdentifiers(df: DataFrame, variantIndex: DataFrame): DataFrame = {
    val flag = df
      .select(col("studyLocusId"), explode(col("locus")).as("l"))
      .select(col("studyLocusId"), col("l.variantId").as("variantId"))
      .join(
        variantIndex.select(col("variantId"), lit(true).as("inVariantIndex")),
        Seq("variantId"),
        "left")
      .withColumn("inVariantIndex", col("inVariantIndex").isNotNull)
      .groupBy(col("studyLocusId"))
      .agg(collect_set(col("inVariantIndex")).as("inVariantIndex"))
      .select(
        col("studyLocusId"),
        array_contains(col("inVariantIndex"), false).as("toFlag"))
    df.join(flag, Seq("studyLocusId"), "left")
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(qcCol(df), col("toFlag"), InvalidVariantIdentifierFlag))
      .drop("toFlag")
  }

  /** Flag sub-significant lead p-values (study_locus.py:341-377, 398-438). */
  def validateLeadPvalue(df: DataFrame, pvalueCutoff: Double): DataFrame =
    df.withColumn(
      "qualityControls",
      array_distinct(
        GDataset.updateQualityFlag(
          qcCol(df),
          Stats.neglogpvalFromPvalue(col("pValueMantissa"), col("pValueExponent")) <
            lit(-math.log10(pvalueCutoff)),
          SubsignificantFlag)))

  /** Flag duplicated studyLocusIds (study_locus.py:379-396). The reference
    * keeps one random copy unflagged (`orderBy(rand())`); this port takes a
    * deterministic tiebreak.
    */
  def validateUniqueStudyLocusId(df: DataFrame, tiebreak: Column): DataFrame =
    df.withColumn(
      "qualityControls",
      GDataset.updateQualityFlag(
        qcCol(df),
        row_number().over(Window.partitionBy(col("studyLocusId")).orderBy(tiebreak)) > 1,
        DuplicatedStudyLocusFlag))

  /** Flag loci whose PIPs do not sum into [lower, upper]
    * (study_locus.py:439-492). Pure array aggregate — no shuffle.
    */
  def qcAbnormalPips(
      df: DataFrame,
      lower: Double = 0.99,
      upper: Double = 1.0001
  ): DataFrame = {
    val sumPips = aggregate(
      col("locus"),
      lit(0.0),
      (acc, x) => acc + x.getField("posteriorProbability"))
    df.withColumn(
      "qualityControls",
      GDataset.updateQualityFlag(
        qcCol(df),
        sumPips < lower || sumPips > upper,
        AbnormalPipsFlag))
  }

  /** Flag leads inside the MHC region chr6:25726063-33400556
    * (study_locus.py:1180-1202, common/genomic_region.py:20-24).
    */
  def qcMhcRegion(df: DataFrame): DataFrame =
    df.withColumn(
      "qualityControls",
      GDataset.updateQualityFlag(
        qcCol(df),
        col("chromosome") === "6" &&
          col("position") >= 25726063L && col("position") <= 33400556L,
        InMhcFlag))

  /** Flag curated top hits in studies that also carry PICS results from
    * summary statistics (study_locus.py:1204-1242).
    */
  def qcRedundantTopHitsFromPics(df: DataFrame): DataFrame = {
    val studiesWithPicsSumstats = df
      .filter(col("finemappingMethod") === "PICS")
      .withColumn("hasPicsSumstats", !array_contains(col("qualityControls"), TopHitFlag))
      .groupBy(col("studyId"))
      .agg(max(col("hasPicsSumstats")).as("studiesWithPicsSumstats"))
    df.join(studiesWithPicsSumstats, Seq("studyId"), "left")
      .withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          qcCol(df),
          array_contains(col("qualityControls"), TopHitFlag) &&
            col("studiesWithPicsSumstats"),
          RedundantPicsTopHitFlag))
      .drop("studiesWithPicsSumstats")
  }

  /** Flag associations whose study has no LD population annotation
    * (study_locus.py:1322-1340); a no-op when the frame does not carry
    * `ldPopulationStructure`, exactly like the reference.
    */
  def qcNoPopulation(df: DataFrame): DataFrame =
    if (!df.columns.contains("ldPopulationStructure")) df
    else
      df.withColumn(
        "qualityControls",
        GDataset.updateQualityFlag(
          qcCol(df),
          col("ldPopulationStructure").isNull,
          NoPopulationFlag))

  /** Assign the credible-set confidence class from fine-mapping method and
    * QC flags (study_locus.py:1423-1494).
    */
  def assignConfidence(df: DataFrame): DataFrame = {
    val isSusie = col("finemappingMethod").isin("SuSie", "SuSiE-inf")
    val outOfSample = array_contains(col("qualityControls"), OutOfSampleLdFlag)
    val topHit = array_contains(col("qualityControls"), TopHitFlag)
    df.withColumn(
      "confidence",
      when(isSusie && !outOfSample, ConfidenceInSampleLd)
        .when(isSusie && outOfSample, ConfidenceOutOfSampleLd)
        .when(col("finemappingMethod") === "PICS" && !topHit, ConfidencePicsSumstats)
        .when(col("finemappingMethod") === "PICS" && topHit, ConfidencePicsTopHit)
        .otherwise(ConfidenceUnknown))
  }

  /** Distinct (studyLocusId-independent) variants across all loci
    * (study_locus.py:892-913).
    */
  def uniqueVariantsInLocus(df: DataFrame): DataFrame =
    df.withColumn("variantId", explode(col("locus.variantId")))
      .select(
        col("variantId"),
        split(col("variantId"), "_").getItem(0).as("chromosome"))
      .distinct()

  /** Credible-set log10 Bayes factor
    * (study_locus.py:653-681): log10-scaled logsumexp of the variant logBFs
    * with the 1/numVariantsRegion prior folded in —
    * `logsumexp(logBF + log(1/N)) · log10(e)`. The reference computes this
    * in a Python UDF; here it is a stable max-shifted array aggregate, fully
    * codegen.
    */
  def calculateCredibleSetLog10Bf(logBfs: Column, numVariantsRegion: Int = 500): Column =
    // the codegen LogSumExp kernel (bit-identical max-shifted formula):
    // the earlier HOF formulation referenced array_max(logBfs) inside the
    // aggregate lambda, re-evaluating it per element (O(n²) for a
    // 500-variant region)
    (graft.functions.expressions.logsumexp(logBfs) -
      log(lit(numVariantsRegion.toDouble))) / log(lit(10.0))
}
