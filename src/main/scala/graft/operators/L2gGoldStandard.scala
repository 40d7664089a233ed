package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.DfOps

/** L2G gold-standard (training-label) refinement
  * (reference: dataset/l2g_gold_standard.py:26-232).
  *
  * A gold-standard row is (studyLocusId, variantId, studyId, geneId,
  * goldStandardSet ∈ {positive, negative}). Refinement removes loci whose
  * labels are unreliable: redundant associations whose credible sets
  * overlap another locus pointing at the same gene, and negative labels
  * confounded by a strong physical interaction with a positive gene.
  *
  * Scale notes: every step is an equi join or a window keyed on geneId /
  * variantId; the interactions table (bounded: gene-pair interactome) is
  * broadcast-sized, the gold standard itself is curated (thousands of
  * rows) — at 100 TB only the overlap matrix is big, and it enters through
  * one equi join on (studyLocusId, tagVariantId).
  */
object L2gGoldStandard {

  val InteractionThreshold = 0.7
  val Positive = "positive"
  val Negative = "negative"

  /** Top-scoring interaction per (targetA, targetB) pair
    * (l2g_gold_standard.py:76-106).
    */
  def processGeneInteractions(interactions: DataFrame): DataFrame =
    DfOps
      .getTopRankedInWindow(
        interactions,
        Window.partitionBy(col("targetA"), col("targetB")).orderBy(col("scoring").desc))
      .select(
        col("targetA").as("geneIdA"),
        col("targetB").as("geneIdB"),
        col("scoring").as("score"))

  /** Symmetrise the overlap matrix (study_locus_overlap.py:85-103). */
  def squareOverlaps(overlaps: DataFrame): DataFrame =
    overlaps
      .unionByName(
        overlaps.select(
          col("rightStudyLocusId").as("leftStudyLocusId"),
          col("leftStudyLocusId").as("rightStudyLocusId"),
          col("tagVariantId")))
      .distinct()

  /** Drop loci that are not independent (l2g_gold_standard.py:141-183):
    * when a locus overlaps another credible set AND its gene is claimed by
    * more than one study locus, the row is redundant and removed.
    *
    * @param goldStandard (studyLocusId, variantId, studyId, geneId,
    *                     goldStandardSet)
    * @param overlaps     triangular (leftStudyLocusId, rightStudyLocusId,
    *                     tagVariantId) — symmetrised internally
    */
  def filterUniqueAssociations(goldStandard: DataFrame, overlaps: DataFrame): DataFrame = {
    val squared = squareOverlaps(
      overlaps.select("leftStudyLocusId", "rightStudyLocusId", "tagVariantId"))
    // ">1 study locus claims this gene" ⇔ min ≠ max over the gene window:
    // constant per-row state instead of a per-gene set array carried
    // through the overlap join.
    val geneW = Window.partitionBy(col("geneId"))
    val slSameGene = coalesce(
      min(col("studyLocusId")).over(geneW) =!= max(col("studyLocusId")).over(geneW),
      lit(false))
    goldStandard
      .withColumn("gene_is_shared", slSameGene)
      .join(
        squared,
        goldStandard("studyLocusId") === squared("leftStudyLocusId") &&
          goldStandard("variantId") === squared("tagVariantId"),
        "left")
      .withColumn("overlaps", squared("tagVariantId").isNotNull)
      .filter(!(col("gene_is_shared") && col("overlaps")))
      .select(goldStandard.columns.map(goldStandard(_)): _*)
      .distinct()
  }

  /** Remove negative labels confounded by gene-gene interactions
    * (l2g_gold_standard.py:185-232): a row survives when it has no strong
    * interactor, or when it is non-negative and at least one strong
    * interactor is a gold-standard positive. (The final distinct makes the
    * filter an EXISTS over the join-expanded rows — faithful to the
    * reference, pinned by its test_remove_false_negatives.)
    */
  def removeFalseNegatives(goldStandard: DataFrame, topInteractions: DataFrame): DataFrame = {
    val squared = topInteractions
      .unionByName(
        topInteractions.select(
          col("geneIdB").as("geneIdA"),
          col("geneIdA").as("geneIdB"),
          col("score")))
      .filter(col("score") > InteractionThreshold)
    val interactorStatus = goldStandard
      .select(
        col("geneId").as("interactorGeneId"),
        col("goldStandardSet").as("interactorGoldStandardSet"))
      .distinct()
    goldStandard
      .join(squared, goldStandard("geneId") === squared("geneIdA"), "left")
      .withColumnRenamed("geneIdB", "interactorGeneId")
      .join(interactorStatus, Seq("interactorGeneId"), "left")
      .filter(
        goldStandard("geneId") =!= col("interactorGeneId") ||
          col("interactorGeneId").isNull)
      .filter(
        (!(col("goldStandardSet") === Negative) &&
          col("interactorGoldStandardSet") === Positive) ||
          col("interactorGeneId").isNull)
      .select(goldStandard.columns.map(goldStandard(_)): _*)
      .distinct()
  }

  /** 500 kb window used for negative-label expansion
    * (open_targets/l2g_gold_standard.py:21).
    */
  val LocusToGeneWindow = 500000L

  /** Parse the Open Targets gold-standard curation export into positive
    * rows (datasource/open_targets/l2g_gold_standard.py:24-58): keep
    * High/Medium-confidence curations, build the GRCh38 variantId, hash the
    * (studyId, variantId) studyLocusId, collect curation sources.
    */
  def parsePositiveCuration(curation: DataFrame): DataFrame =
    curation
      .filter(col("gold_standard_info.highest_confidence").isin("High", "Medium"))
      .select(
        col("association_info.otg_id").as("studyId"),
        col("gold_standard_info.gene_id").as("geneId"),
        concat_ws(
          "_",
          col("sentinel_variant.locus_GRCh38.chromosome"),
          col("sentinel_variant.locus_GRCh38.position"),
          col("sentinel_variant.alleles.reference"),
          col("sentinel_variant.alleles.alternative")).as("variantId"),
        col("metadata.set_label").as("source"))
      .withColumn(
        "studyLocusId",
        graft.datasets.StudyLocus.assignStudyLocusId(Seq("studyId", "variantId")))
      .groupBy(col("studyLocusId"), col("studyId"), col("variantId"), col("geneId"))
      .agg(collect_set(col("source")).as("sources"))

  /** Expand the positive curation with negatives: every gene within 500 kb
    * of the sentinel that is NOT the curated gene becomes a negative label;
    * curated genes missing from the variant index stay positive
    * (open_targets/l2g_gold_standard.py:60-107).
    *
    * @param distanceToGene (variantId, targetId, distanceFromTss)
    */
  def expandGoldStandardWithNegatives(
      positiveSet: DataFrame,
      distanceToGene: DataFrame
  ): DataFrame =
    positiveSet
      .withColumnRenamed("geneId", "curated_geneId")
      .join(
        distanceToGene
          .select(
            col("variantId"),
            col("targetId").as("non_curated_geneId"),
            col("distanceFromTss"))
          .filter(col("distanceFromTss") <= LocusToGeneWindow),
        Seq("variantId"),
        "left")
      .withColumn(
        "goldStandardSet",
        when(
          col("curated_geneId") === col("non_curated_geneId") ||
            col("non_curated_geneId").isNull,
          Positive).otherwise(Negative))
      .withColumn(
        "geneId",
        when(col("goldStandardSet") === Positive, col("curated_geneId"))
          .otherwise(col("non_curated_geneId")))
      .drop("distanceFromTss", "curated_geneId", "non_curated_geneId")

  /** The full curation-to-training-labels chain
    * (l2g_gold_standard.py:33-65 from_otg_curation +
    * datasource/open_targets/l2g_gold_standard.py:109-133
    * as_l2g_gold_standard): parse the positive curation, expand with
    * within-window negatives, drop non-independent loci, remove
    * interaction-confounded false negatives.
    *
    * @param distanceToGene relational replacement of the variant index's
    *                       get_distance_to_gene view:
    *                       (variantId, targetId, distanceFromTss)
    */
  def fromOtgCuration(
      curation: DataFrame,
      distanceToGene: DataFrame,
      overlaps: DataFrame,
      interactions: DataFrame
  ): DataFrame =
    removeFalseNegatives(
      filterUniqueAssociations(
        expandGoldStandardWithNegatives(parsePositiveCuration(curation), distanceToGene),
        overlaps),
      processGeneInteractions(interactions))

  /** Restrict a full feature matrix to gold-standard rows
    * (l2g_gold_standard.py:108-139): annotate the matrix with
    * (studyId, variantId) through the credible set, inner-join the
    * broadcast gold standard on (studyId, variantId, geneId), and keep
    * protein-coding genes only.
    */
  def buildFeatureMatrix(
      goldStandard: DataFrame,
      featureMatrix: DataFrame,
      credibleSets: DataFrame
  ): DataFrame =
    featureMatrix
      .join(
        credibleSets.select("studyLocusId", "variantId", "studyId"),
        Seq("studyLocusId"),
        "left")
      .join(
        broadcast(
          goldStandard.select("studyId", "variantId", "geneId", "goldStandardSet")),
        Seq("studyId", "variantId", "geneId"),
        "inner")
      .filter(col("isProteinCoding") === 1.0)
      .drop("studyId", "variantId")
      .distinct()
}
