package graft.operators

import breeze.numerics.lgamma

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.functions.ArrayOps

/** ChEMBL drug-target enrichment from L2G evidence
  * (reference: method/drug_enrichment_from_evid.py:16-360, after
  * doi.org/10.1038/s41586-024-07316-0).
  *
  * Scale notes: association building is equi joins + groupBy on
  * (targetId, diseaseId); the ontology-ancestor propagation is an explode +
  * equi join (the disease index is bounded — broadcast). The enrichment
  * contingency cells for ALL phases are computed in ONE aggregation pass
  * over the joined frame (the reference fires 4 `.count()` jobs × 3 phases
  * = 12 scans); the Fisher test itself is a driver-side scalar on a 2×2
  * table.
  */
object DrugEnrichment {

  /** Score table → disease-target evidence rows
    * (drug_enrichment_from_evid.py:23-68): join credible sets for studyId,
    * study index for diseaseIds, explode the diseases.
    */
  def toDiseaseTargetEvidence(
      tableWithScore: DataFrame,
      scoreColumn: String,
      datasourceId: String,
      studyLoci: DataFrame,
      studyIndex: DataFrame,
      minScore: Double = 0.0,
      datatypeId: String = "GWAS"
  ): DataFrame =
    tableWithScore
      .filter(col(scoreColumn) >= minScore)
      .join(studyLoci.select("studyLocusId", "studyId"), Seq("studyLocusId"), "inner")
      .join(studyIndex.select("studyId", "diseaseIds"), Seq("studyId"), "inner")
      .select(
        lit(datatypeId).as("datatypeId"),
        lit(datasourceId).as("datasourceId"),
        col("geneId").as("targetId"),
        explode(col("diseaseIds")).as("diseaseId"),
        col(scoreColumn).as("resourceScore"),
        col("studyLocusId"))

  /** (diseaseId, ancestorDiseaseId) pairs from the ontology, each disease
    * also its own ancestor (drug_enrichment_from_evid.py:166-177).
    */
  def explodeAncestors(diseaseIndex: DataFrame): DataFrame =
    diseaseIndex
      .select(col("id").as("diseaseId"), explode(col("ancestors")).as("ancestorDiseaseId"))
      .union(diseaseIndex.select(col("id").as("diseaseId"), col("id").as("ancestorDiseaseId")))

  /** Direct associations: per (target, disease) either max score or the
    * harmonic sum of the distinct scores
    * (drug_enrichment_from_evid.py:107-144).
    */
  def evidenceToDirectAssociations(
      evidence: DataFrame,
      useMax: Boolean = false,
      efoToRemove: Seq[String] = Nil
  ): DataFrame = {
    val filtered =
      if (efoToRemove.nonEmpty) evidence.filter(!col("diseaseId").isin(efoToRemove: _*))
      else evidence
    if (useMax)
      filtered
        .groupBy(col("targetId"), col("diseaseId"))
        .agg(max(col("resourceScore")).as("direct_assoc_score"))
    else
      filtered
        .groupBy(col("targetId"), col("diseaseId"))
        .agg(collect_set(col("resourceScore")).as("scores"))
        .select(
          col("targetId"), col("diseaseId"),
          ArrayOps.calculateHarmonicSum(col("scores")).as("direct_assoc_score"))
  }

  /** Indirect associations: propagate evidence up the ontology before
    * aggregating (drug_enrichment_from_evid.py:145-199). The harmonic-sum
    * variants of this and [[evidenceToDirectAssociations]] are also the
    * exact kernels of the reference's LocusToGeneAssociationsStep
    * (l2g.py:459-517): collect_set of resource scores per
    * (target, disease[, ancestor]) → harmonic sum.
    */
  def evidenceToIndirectAssociations(
      evidence: DataFrame,
      diseaseIndex: DataFrame,
      useMax: Boolean = false,
      efoToRemove: Seq[String] = Nil
  ): DataFrame = {
    val filtered =
      if (efoToRemove.nonEmpty) evidence.filter(!col("diseaseId").isin(efoToRemove: _*))
      else evidence
    val propagated = filtered
      .join(broadcast(explodeAncestors(diseaseIndex)), Seq("diseaseId"), "inner")
    val grouped = propagated.groupBy(col("targetId"), col("ancestorDiseaseId"))
    val agged =
      if (useMax) grouped.agg(max(col("resourceScore")).as("indirect_assoc_score"))
      else
        grouped
          .agg(collect_set(col("resourceScore")).as("scores"))
          .select(
            col("targetId"), col("ancestorDiseaseId"),
            ArrayOps.calculateHarmonicSum(col("scores")).as("indirect_assoc_score"))
    agged.withColumnRenamed("ancestorDiseaseId", "diseaseId")
  }

  /** ChEMBL evidence → max clinical phase per (target, disease), phase > 0.5
    * (drug_enrichment_from_evid.py:202-225).
    */
  def processChemblEvidence(chembl: DataFrame, efoToRemove: Seq[String] = Nil): DataFrame = {
    val filtered =
      if (efoToRemove.nonEmpty) chembl.filter(!col("diseaseId").isin(efoToRemove: _*))
      else chembl
    filtered
      .groupBy(col("targetId"), col("diseaseId"))
      .agg(max(col("clinicalPhase")).as("maxClinicalPhase"))
      .filter(col("maxClinicalPhase") > 0.5)
  }

  /** Two-sided Fisher's exact test on [[a, b], [c, d]]: sum of all
    * hypergeometric point probabilities ≤ the observed one (the scipy
    * `fisher_exact` convention the reference relies on). Driver-side
    * scalar — log-space via lgamma, tolerance-relaxed like scipy.
    */
  def fisherExactTwoSided(a: Long, b: Long, c: Long, d: Long): Double = {
    val (r1, r2, c1, n) = (a + b, c + d, a + c, a + b + c + d)
    def logChoose(nn: Long, kk: Long): Double =
      lgamma(nn + 1.0) - lgamma(kk + 1.0) - lgamma(nn - kk + 1.0)
    def logP(k: Long): Double =
      logChoose(r1, k) + logChoose(r2, c1 - k) - logChoose(n, c1)
    val lo = math.max(0L, c1 - r2)
    val hi = math.min(r1, c1)
    val obs = logP(a)
    val eps = 1e-7
    (lo to hi).iterator
      .map(logP)
      .filter(_ <= obs + math.log1p(eps))
      .map(math.exp)
      .sum
      .min(1.0)
  }

  final case class PhaseEnrichment(
      clinicalPhase: String,
      oddsRatio: Double,
      pValue: Double,
      ciLow: Double,
      ciHigh: Double,
      relativeSuccess: Double,
      noEvidLowPhase: Long,
      noEvidHighPhase: Long,
      yesEvidLowPhase: Long,
      yesEvidHighPhase: Long)

  /** Genetic-support enrichment of clinical success, one row per phase
    * (drug_enrichment_from_evid.py:227-360). The joined (associations ⨝
    * ChEMBL) frame is reduced to the 12 contingency cells in a single
    * aggregation, then the odds ratio, Fisher p and Wald CI are driver-side
    * arithmetic.
    *
    * @param joined right-join of indirect associations onto ChEMBL pairs:
    *               (indirect_assoc_score nullable, maxClinicalPhase)
    */
  def enrichmentTable(
      joined: DataFrame,
      scoreThreshold: Double = 0.5,
      phases: Seq[Int] = Seq(2, 3, 4)
  ): Seq[PhaseEnrichment] = {
    val gs = coalesce(col("indirect_assoc_score") >= scoreThreshold, lit(false))
    val cells = joined
      .select(
        (sum(when(gs, 1L).otherwise(0L)).as("n_g") +:
          sum(when(!gs, 1L).otherwise(0L)).as("n_neg") +:
          phases.flatMap(p =>
            Seq(
              sum(when(gs && col("maxClinicalPhase") >= p, 1L).otherwise(0L))
                .as(s"x_g_$p"),
              sum(when(!gs && col("maxClinicalPhase") >= p, 1L).otherwise(0L))
                .as(s"x_neg_$p")))): _*)
      .collect()
      .head
    val nG = cells.getAs[Long]("n_g")
    val nNeg = cells.getAs[Long]("n_neg")
    val z = 1.96
    phases.map { p =>
      val xG = cells.getAs[Long](s"x_g_$p")
      val xNeg = cells.getAs[Long](s"x_neg_$p")
      val (a, b, c, d) = (nNeg - xNeg, xNeg, nG - xG, xG)
      val pValue = fisherExactTwoSided(a, b, c, d)
      if (Seq(a, b, c, d).contains(0L))
        PhaseEnrichment(s"$p+", 1.0, pValue, 1.0, 1.0, 1.0, a, b, c, d)
      else {
        val or = (a.toDouble * d) / (b.toDouble * c)
        val seLnOr = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
        val rs = (xG.toDouble / nG) / (xNeg.toDouble / nNeg)
        PhaseEnrichment(
          s"$p+", or, pValue,
          math.exp(math.log(or) - z * seLnOr),
          math.exp(math.log(or) + z * seLnOr),
          rs, a, b, c, d)
      }
    }
  }
}
