package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.datasets.{TargetIndex, VariantIndex}
import graft.operators.{L2gFeatureFactory, Overlaps}
import graft.sources.VepParser

/** Oracle-checked queries for index-level filters and the L2G feature-matrix
  * missing-value family that previously had only ScalaTest evidence:
  * biotype filtering (dataset/target_index.py:36-46), variant semi-join
  * filtering (dataset/variant_index.py:228-252), the overlap tag-variant
  * source label (dataset/study_locus_overlap.py), LOFTEE extraction
  * (datasource/open_targets/variants.py get_loftee), and the matrix
  * fillNa / missingness passes (method/l2g/feature_matrix logic,
  * l2g_feature_matrix.py:113-168).
  */
object IndexQueries {
  import Tables._

  /** Targets from `part` with a 5-way biotype rotation. */
  private def synthTargets(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey") % 500
    part(s, d)
      .select(
        concat(lit("ENSG"), k.cast(StringType)).as("id"),
        element_at(
          array(lit("protein_coding"), lit("lncRNA"), lit("miRNA"),
            lit("pseudogene"), lit("snoRNA")),
          (k % 5 + 1).cast("int")).as("biotype"))
      .distinct()
  }

  /** Biotype allow-list filter — stays a plan-level predicate, never a
    * collected id list.
    */
  def biotypeFilterQ(s: SparkSession, d: String): DataFrame =
    TargetIndex(synthTargets(s, d))
      .filterByBiotypes(Seq("protein_coding", "lncRNA"))
      .df
      .select(col("id").as("geneId"), col("biotype"))

  /** Keep only variants present in another frame — left-semi join. */
  def filterByVariantQ(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey") % 1000
    val vindex = part(s, d)
      .select(
        concat(lit("v"), k.cast(StringType)).as("variantId"),
        (k % 22 + 1).cast(StringType).as("chromosome"))
      .distinct()
    val present = orders(s, d)
      .filter(col("o_orderkey") % 3 === 0)
      .select(concat(lit("v"), (col("o_orderkey") % 700).cast(StringType)).as("variantId"))
    VariantIndex(vindex).filterByVariant(present).df
  }

  /** Overlap statistics → tag-variant source label (left/right/both). */
  def tagVariantSourceQ(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val stats = orders(s, d).select(
      k.as("row_id"),
      struct(
        when(k % 3 =!= 0, (k % 97) / lit(100.0)).as("left_posteriorProbability"),
        when(k % 4 =!= 0, (k % 89) / lit(100.0)).as("right_posteriorProbability")
      ).as("statistics"))
    stats.select(
      col("row_id"),
      Overlaps.tagVariantSource(col("statistics")).as("source"))
  }

  /** LOFTEE predictions exploded out of transcript consequences; HC → true,
    * LC → false high-quality pLoF flag.
    */
  def lofteeQ(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val vindex = orders(s, d).select(
      concat(lit("var"), k.cast(StringType)).as("variantId"),
      array(
        struct(
          concat(lit("G"), (k % 50).cast(StringType)).as("targetId"),
          when(k % 3 === 0, "HC").when(k % 3 === 1, "LC").as("lofteePrediction")),
        struct(
          concat(lit("H"), (k % 70).cast(StringType)).as("targetId"),
          when(k % 5 === 0, "HC").as("lofteePrediction"))
      ).as("transcriptConsequences"))
    VepParser.getLoftee(vindex)
  }

  /** Wide feature matrix with planted nulls: (studyLocusId, geneId) keys from
    * independent residues so each locus carries several genes.
    */
  private def synthMatrix(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    orders(s, d)
      .select(
        concat(lit("L"), (k % 200).cast(StringType)).as("studyLocusId"),
        concat(lit("G"), (floor(k / 200).cast("long") % 50).cast(StringType)).as("geneId"),
        when(k % 7 =!= 0, (k % 23).cast("double")).as("geneCount500kb"),
        when(k % 11 =!= 0, (k % 100) / lit(100.0)).as("distanceTssMean"))
      .groupBy("studyLocusId", "geneId")
      .agg(
        max("geneCount500kb").as("geneCount500kb"),
        max("distanceTssMean").as("distanceTssMean"))
  }

  /** fillNa: gene-count features impute with the per-locus mean, everything
    * else with 0.0 (l2g_feature_matrix.py:138-168).
    */
  def l2gFillnaQ(s: SparkSession, d: String): DataFrame =
    L2gFeatureFactory
      .fillNa(synthMatrix(s, d), 0.0, Seq("geneCount500kb", "distanceTssMean"))
      .select(
        col("studyLocusId"), col("geneId"),
        round(col("geneCount500kb"), 6).as("geneCount500kb"),
        round(col("distanceTssMean"), 6).as("distanceTssMean"))

  /** Per-feature null-or-zero missingness rate in one aggregation pass
    * (the reference fires one count job per feature).
    */
  def l2gMissingnessQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = L2gFeatureFactory.featureMissingnessRate(
      synthMatrix(s, d), Seq("geneCount500kb", "distanceTssMean"))
    rates.toSeq
      .map { case (f, r) =>
        (f, BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("feature", "rate")
  }

  /** Leakage-aware hierarchical train/test split (operators/L2gModel
    * .hierarchicalSplit): genes hash deterministically into the test side
    * (md5 first-8-hex / 2^32 < testSize), loci follow their positive genes,
    * and loci seen from both sides stay in train. Fully deterministic, so
    * the whole split is oracle-checkable.
    */
  def l2gSplitQ(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val gs = orders(s, d)
      .select(
        concat(lit("L"), (k % 300).cast(StringType)).as("studyLocusId"),
        concat(lit("G"), (floor(k / 300).cast("long") % 80).cast(StringType)).as("geneId"),
        when(k % 3 === 0, 1).otherwise(0).as("goldStandardSet"))
      .distinct()
    val (train, test) = graft.operators.L2gModel.hierarchicalSplit(gs, testSize = 0.15)
    train.withColumn("split", lit("train"))
      .unionByName(test.withColumn("split", lit("test")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_l2g_split" -> (l2gSplitQ _),
    "q_biotype_filter" -> (biotypeFilterQ _),
    "q_filter_by_variant" -> (filterByVariantQ _),
    "q_tag_variant_source" -> (tagVariantSourceQ _),
    "q_loftee" -> (lofteeQ _),
    "q_l2g_fillna" -> (l2gFillnaQ _),
    "q_l2g_missingness" -> (l2gMissingnessQ _)
  )

  private val MatrixSql =
    """SELECT 'L' || CAST(o_orderkey % 200 AS VARCHAR) AS studyLocusId,
      |    'G' || CAST((o_orderkey // 200) % 50 AS VARCHAR) AS geneId,
      |    max(CASE WHEN o_orderkey % 7 <> 0 THEN CAST(o_orderkey % 23 AS DOUBLE) END) AS gc,
      |    max(CASE WHEN o_orderkey % 11 <> 0 THEN (o_orderkey % 100) / 100.0 END) AS dt
      |  FROM orders GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_l2g_split" ->
      """WITH gs AS (SELECT DISTINCT 'L' || CAST(o_orderkey % 300 AS VARCHAR) AS studyLocusId,
        |    'G' || CAST((o_orderkey // 300) % 80 AS VARCHAR) AS geneId,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END AS goldStandardSet
        |  FROM orders),
        |pos AS (SELECT * FROM gs WHERE goldStandardSet = 1),
        |genes AS (SELECT DISTINCT geneId,
        |    (('0x' || substr(md5(geneId), 1, 8))::UBIGINT / 4294967296.0) < 0.15 AS inTest
        |  FROM pos),
        |trainLoci AS (SELECT DISTINCT studyLocusId FROM pos JOIN genes USING (geneId)
        |  WHERE NOT inTest),
        |testLoci AS (SELECT DISTINCT studyLocusId FROM pos JOIN genes USING (geneId)
        |  WHERE inTest AND studyLocusId NOT IN (SELECT studyLocusId FROM trainLoci))
        |SELECT gs.*, 'train' AS split FROM gs JOIN trainLoci USING (studyLocusId)
        |UNION ALL
        |SELECT gs.*, 'test' AS split FROM gs JOIN testLoci USING (studyLocusId)""".stripMargin,
    "q_biotype_filter" ->
      """WITH t AS (SELECT DISTINCT 'ENSG' || CAST(p_partkey % 500 AS VARCHAR) AS geneId,
        |    ['protein_coding', 'lncRNA', 'miRNA', 'pseudogene', 'snoRNA'][(p_partkey % 500) % 5 + 1] AS biotype
        |  FROM part)
        |SELECT geneId, biotype FROM t WHERE biotype IN ('protein_coding', 'lncRNA')""".stripMargin,
    "q_filter_by_variant" ->
      """WITH v AS (SELECT DISTINCT 'v' || CAST(p_partkey % 1000 AS VARCHAR) AS variantId,
        |    CAST((p_partkey % 1000) % 22 + 1 AS VARCHAR) AS chromosome
        |  FROM part)
        |SELECT variantId, chromosome FROM v
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey % 3 = 0 AND 'v' || CAST(o_orderkey % 700 AS VARCHAR) = v.variantId)""".stripMargin,
    "q_tag_variant_source" ->
      """SELECT o_orderkey AS row_id,
        |  CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0 THEN 'both'
        |       WHEN o_orderkey % 3 <> 0 THEN 'left'
        |       WHEN o_orderkey % 4 <> 0 THEN 'right'
        |  END AS source
        |FROM orders""".stripMargin,
    "q_loftee" ->
      """SELECT 'var' || CAST(o_orderkey AS VARCHAR) AS variantId,
        |  'G' || CAST(o_orderkey % 50 AS VARCHAR) AS targetId,
        |  CASE WHEN o_orderkey % 3 = 0 THEN 'HC' ELSE 'LC' END AS lofteePrediction,
        |  o_orderkey % 3 = 0 AS isHighQualityPlof
        |FROM orders WHERE o_orderkey % 3 < 2
        |UNION ALL
        |SELECT 'var' || CAST(o_orderkey AS VARCHAR) AS variantId,
        |  'H' || CAST(o_orderkey % 70 AS VARCHAR) AS targetId,
        |  'HC' AS lofteePrediction, TRUE AS isHighQualityPlof
        |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin,
    "q_l2g_fillna" ->
      s"""WITH m AS ($MatrixSql)
         |SELECT studyLocusId, geneId,
         |  round(coalesce(gc, avg(gc) OVER (PARTITION BY studyLocusId), 0.0), 6) AS geneCount500kb,
         |  round(coalesce(dt, 0.0), 6) AS distanceTssMean
         |FROM m""".stripMargin,
    "q_l2g_missingness" ->
      s"""WITH m AS ($MatrixSql)
         |SELECT 'geneCount500kb' AS feature,
         |  round(sum(CASE WHEN gc IS NULL OR gc = 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS rate
         |FROM m
         |UNION ALL
         |SELECT 'distanceTssMean' AS feature,
         |  round(sum(CASE WHEN dt IS NULL OR dt = 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS rate
         |FROM m""".stripMargin
  )
}
