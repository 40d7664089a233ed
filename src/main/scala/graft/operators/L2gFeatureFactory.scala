package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Named L2G feature catalog — the full 30-feature registry of the
  * reference's FeatureFactory (method/l2g/feature_factory.py:102-139),
  * composed from the primitives in [[L2gFeatures]].
  *
  * Every feature is (studyLocusId, geneId, featureName, featureValue) long
  * format; [[computeAll]] unions the requested names and pivots into the
  * training matrix with a bounded column list. All computations are
  * equi-joins, windows and aggregations keyed on (studyLocusId, geneId) —
  * nothing collects to the driver, and the wide matrix shuffle is one
  * hash partitioning on the same key for every feature family.
  */
object L2gFeatureFactory {

  /** Input bundle: the frames every feature family draws from.
    *
    * @param studyLoci           one row per credible set: studyLocusId,
    *                            variantId (sentinel), chromosome, position,
    *                            confidence
    * @param credsetVariants     exploded locus: studyLocusId, variantId,
    *                            chromosome, position, posteriorProbability
    * @param coloc               aligned colocalisation rows
    *                            (leftStudyLocusId, rightStudyLocusId,
    *                            rightGeneId, colocalisationMethod,
    *                            rightStudyType, clpp, h4)
    * @param tssDistances        variantId, geneId, distance (to TSS)
    * @param footprintDistances  variantId, geneId, distance (to footprint)
    * @param consequences        variantId, geneId, severityScore
    * @param genesInWindow       variantId, geneId, biotype,
    *                            distanceFromFootprint (VariantIndex
    *                            transcript consequences)
    * @param genes               geneId, chromosome, tss, biotype
    *                            (TargetIndex)
    * @param intervals           chromosome, start, end, geneId, score (E2G)
    */
  final case class Inputs(
      studyLoci: DataFrame,
      credsetVariants: DataFrame,
      coloc: DataFrame,
      tssDistances: DataFrame,
      footprintDistances: DataFrame,
      consequences: DataFrame,
      genesInWindow: DataFrame,
      genes: DataFrame,
      intervals: DataFrame)

  /** The reference's feature_mapper keys (feature_factory.py:102-139). */
  val AllFeatureNames: Seq[String] = Seq(
    "distanceSentinelTss", "distanceSentinelTssNeighbourhood",
    "distanceSentinelFootprint", "distanceSentinelFootprintNeighbourhood",
    "distanceTssMean", "distanceTssMeanNeighbourhood",
    "distanceFootprintMean", "distanceFootprintMeanNeighbourhood",
    "eQtlColocClppMaximum", "eQtlColocClppMaximumNeighbourhood",
    "pQtlColocClppMaximum", "pQtlColocClppMaximumNeighbourhood",
    "sQtlColocClppMaximum", "sQtlColocClppMaximumNeighbourhood",
    "eQtlColocH4Maximum", "eQtlColocH4MaximumNeighbourhood",
    "pQtlColocH4Maximum", "pQtlColocH4MaximumNeighbourhood",
    "sQtlColocH4Maximum", "sQtlColocH4MaximumNeighbourhood",
    "vepMean", "vepMeanNeighbourhood",
    "vepMaximum", "vepMaximumNeighbourhood",
    "e2gMean", "e2gMeanNeighbourhood",
    "geneCount500kb", "proteinGeneCount500kb",
    "isProteinCoding", "credibleSetConfidence")

  private val ColocDefByName: Map[String, (String, String, String)] =
    L2gFeatures.ColocFeatureDefs.map { case (n, m, metric, q) => n -> (m, metric, q) }.toMap

  /** Restrict a long feature frame to protein-coding genes — every
    * neighbourhood family does this before normalising
    * (distance.py:113-121, vep.py:103-110, colocalisation.py:181-188).
    */
  private def proteinCodingOnly(long: DataFrame, genes: DataFrame): DataFrame =
    long.join(
      genes.filter(col("biotype") === "protein_coding").select("geneId").distinct(),
      Seq("geneId"),
      "left_semi")

  /** Compute one named feature in long format. */
  def compute(name: String, in: Inputs): DataFrame = name match {
    case n if n.endsWith("Neighbourhood") =>
      val base = n.stripSuffix("Neighbourhood")
      val clamp = base.startsWith("distance")
      L2gFeatures.neighbourhoodFeature(
        proteinCodingOnly(compute(base, in), in.genes), n, clamp = clamp)
    case n if ColocDefByName.contains(n) =>
      val (method, metric, qtl) = ColocDefByName(n)
      L2gFeatures.colocFeature(
        in.coloc, in.studyLoci.select("studyLocusId"), method, metric, qtl, n)
    case n @ ("distanceSentinelTss" | "distanceTssMean") =>
      val side = if (n.contains("Mean")) explodedWithPp(in) else sentinels(in)
      L2gFeatures.distanceFeature(side, in.tssDistances, n)
    case n @ ("distanceSentinelFootprint" | "distanceFootprintMean") =>
      val side = if (n.contains("Mean")) explodedWithPp(in) else sentinels(in)
      L2gFeatures.distanceFeature(side, in.footprintDistances, n)
    case n @ ("vepMean" | "vepMaximum") =>
      L2gFeatures.vepFeature(explodedWithPp(in), in.consequences, n)
    case "e2gMean" =>
      L2gFeatures.e2gFeature(in.credsetVariants, in.intervals)
        .select(
          col("studyLocusId"), col("geneId"),
          lit("e2gMean").as("featureName"), col("e2gMean").as("featureValue"))
    case "geneCount500kb" =>
      L2gFeatures.geneCountFeature(in.studyLoci, in.genes, name)
    case "proteinGeneCount500kb" =>
      L2gFeatures.geneCountFeature(in.studyLoci, in.genes, name, proteinCodingOnly = true)
    case "isProteinCoding" =>
      L2gFeatures.proteinCodingFeature(in.credsetVariants, in.genesInWindow, name)
    case "credibleSetConfidence" =>
      // other.py:268-324: the sentinel confidence score attached to every
      // gene reachable from any credible-set variant
      in.credsetVariants
        .select("studyLocusId", "variantId")
        .join(in.genesInWindow.select("variantId", "geneId"), Seq("variantId"))
        .join(
          in.studyLoci.select(
            col("studyLocusId"),
            L2gFeatures.credibleSetConfidenceScore(col("confidence")).as("featureValue")),
          Seq("studyLocusId"))
        .select(
          col("studyLocusId"), col("geneId"),
          lit(name).as("featureName"), col("featureValue"))
        .distinct()
    case other =>
      throw new IllegalArgumentException(s"unknown L2G feature: $other")
  }

  /** e2gMeanNeighbourhood comes out of the E2G wide computation directly
    * (intervals.py:194-208 computes both columns in one pass), so special-case
    * it instead of recomputing through the generic neighbourhood path.
    */
  private def e2gNeighbourhood(in: Inputs): DataFrame =
    L2gFeatures.e2gFeature(in.credsetVariants, in.intervals)
      .select(
        col("studyLocusId"), col("geneId"),
        lit("e2gMeanNeighbourhood").as("featureName"),
        col("e2gMeanNeighbourhood").as("featureValue"))

  /** Union the requested features and pivot to the wide training matrix. */
  def computeAll(in: Inputs, names: Seq[String] = AllFeatureNames): DataFrame = {
    val longs = names.map {
      case "e2gMeanNeighbourhood" => e2gNeighbourhood(in)
      case n => compute(n, in)
    }
    L2gFeatures.featureMatrix(longs.reduce(_ unionByName _), names)
  }

  /** Missing-value handling for the wide matrix
    * (l2g_feature_matrix.py:138-168): gene-count features impute with the
    * per-locus mean (they are locus attributes), everything else fills with
    * `naValue`.
    */
  def fillNa(
      matrix: DataFrame,
      naValue: Double = 0.0,
      featureCols: Seq[String] = AllFeatureNames
  ): DataFrame = {
    val countCols = Seq("proteinGeneCount500kb", "geneCount500kb")
      .filter(matrix.columns.contains)
    val imputed = countCols.foldLeft(matrix) { (df, c) =>
      df.withColumn(
        c,
        when(
          col(c).isNull,
          mean(col(c)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("studyLocusId"))))
          .otherwise(col(c)))
    }
    imputed.na.fill(naValue, featureCols.filter(matrix.columns.contains))
  }

  /** Per-feature missingness (null-or-zero) rate in ONE aggregation pass —
    * the reference fires one count job per feature
    * (l2g_feature_matrix.py:113-136).
    */
  def featureMissingnessRate(
      matrix: DataFrame,
      featureCols: Seq[String]
  ): Map[String, Double] = {
    val present = featureCols.filter(matrix.columns.contains)
    require(present.nonEmpty, "No features found")
    val aggs = count(lit(1)).as("_total") +:
      present.map(c =>
        sum(when(col(c).isNull || col(c) === 0, 1L).otherwise(0L)).as(s"_miss_$c"))
    val row = matrix.select(aggs: _*).collect().head
    val total = row.getAs[Long]("_total").toDouble
    present.map(c => c -> row.getAs[Long](s"_miss_$c") / total).toMap
  }

  /** Keep id columns + the requested features, float-cast
    * (l2g_feature_matrix.py:170-199).
    */
  def selectFeatures(matrix: DataFrame, features: Seq[String]): DataFrame = {
    require(features.nonEmpty, "features must be selected")
    matrix.select(
      (Seq(col("studyLocusId"), col("geneId")) ++
        features.map(c => col(c).cast("float").as(c))): _*)
  }

  /** Sentinel rows: the lead variant of each locus with unit pp. */
  private def sentinels(in: Inputs): DataFrame =
    in.studyLoci.select(
      col("studyLocusId"), col("variantId"), lit(1.0).as("posteriorProbability"))

  private def explodedWithPp(in: Inputs): DataFrame =
    in.credsetVariants.select("studyLocusId", "variantId", "posteriorProbability")
}
