package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.QcJoins

/** Oracle-checked queries for the QC/annotation join suite. */
object QcQueries {
  import Tables._

  /** Trans-QTL flagging: credset tags × QTL studies × gene locations. */
  def transQtl(s: SparkSession, d: String): DataFrame = {
    val credset = orders(s, d).select(
      concat(lit("L"), col("o_orderkey").cast(StringType)).as("studyLocusId"),
      concat(lit("q"), (col("o_orderkey") % 20).cast(StringType)).as("studyId"),
      array(
        struct(concat_ws("_",
          (col("o_orderkey") % 5).cast(StringType),
          ((col("o_orderkey") * 13) % 1000000).cast(StringType),
          lit("A"), lit("T")).as("variantId")),
        struct(concat_ws("_",
          ((col("o_orderkey") + 1) % 5).cast(StringType),
          ((col("o_orderkey") * 31) % 9000000).cast(StringType),
          lit("A"), lit("T")).as("variantId"))
      ).as("locus")
    )
    val studyIndex = nation(s, d).select(
      concat(lit("q"), col("n_nationkey").cast(StringType)).as("studyId"),
      when(col("n_nationkey") % 3 === 0, "gwas").otherwise("eqtl").as("studyType"),
      concat(lit("g"), (col("n_nationkey") % 7).cast(StringType)).as("geneId")
    )
    val targetIndex = nation(s, d)
      .filter(col("n_nationkey") < 7)
      .select(
        concat(lit("g"), col("n_nationkey").cast(StringType)).as("id"),
        (col("n_nationkey") * 1000000).cast("long").as("tss"),
        (col("n_nationkey") % 5).cast(StringType).as("geneChromosome")
      )
    QcJoins
      .flagTransQtls(credset, studyIndex, targetIndex)
      .select("studyLocusId", "isTransQtl")
  }

  /** SuSiE-redundancy interval join + QC flag. */
  def susieExplained(s: SparkSession, d: String): DataFrame = {
    val studyLocus = orders(s, d).select(
      concat(lit("L"), col("o_orderkey").cast(StringType)).as("studyLocusId"),
      concat(lit("s"), (col("o_orderkey") % 6).cast(StringType)).as("studyId"),
      (col("o_orderkey") % 4).cast(StringType).as("chromosome"),
      when(col("o_orderkey") % 2 === 0, "SuSiE-inf").otherwise("pics").as("finemappingMethod"),
      ((col("o_orderkey") * 17) % 100000).cast(IntegerType).as("locusStart"),
      ((col("o_orderkey") * 17) % 100000 + 5000).cast(IntegerType).as("locusEnd"),
      array(
        struct(concat_ws("_",
          (col("o_orderkey") % 4).cast(StringType),
          ((col("o_orderkey") * 13) % 100000).cast(StringType),
          lit("A"), lit("T")).as("variantId"))
      ).as("locus"),
      array().cast("array<string>").as("qualityControls")
    )
    QcJoins
      .qcExplainedBySusie(studyLocus)
      .select(col("studyLocusId"), concat_ws(";", col("qualityControls")).as("qc_str"))
  }

  /** Credible-set significance/purity filter + max-BF dedup. */
  def credsetQc(s: SparkSession, d: String): DataFrame =
    QcJoins
      .credibleSetQcFilter(
        orders(s, d).select(
          concat(lit("L"), col("o_orderkey").cast(StringType)).as("studyLocusId"),
          concat(lit("s"), (col("o_orderkey") % 8).cast(StringType)).as("studyId"),
          concat(lit("v"), (col("o_orderkey") % 50).cast(StringType)).as("variantId"),
          (lit(1.0) + (col("o_orderkey") % 90) / 10.0).cast(FloatType).as("pValueMantissa"),
          (-(col("o_orderkey") % 12)).cast(IntegerType).as("pValueExponent"),
          ((col("o_orderkey") % 10) / 10.0).as("purityMinR2"),
          ((col("o_orderkey") % 37) * 1.0).as("credibleSetlog10BF")
        )
      )
      .select("studyLocusId", "studyId", "variantId")

  /** Full-outer index merge with coalesce + null-safe array union. */
  def mergeIndices(s: SparkSession, d: String): DataFrame = {
    val left = customer(s, d).select(
      col("c_custkey").as("id"),
      col("c_name").as("label"),
      array(col("c_mktsegment")).as("tags")
    )
    val right = supplier(s, d).select(
      (col("s_suppkey") * 10).as("id"),
      col("s_name").as("label"),
      array(col("s_nationkey").cast(StringType)).as("tags")
    )
    QcJoins
      .mergeIndices(left, right, keyCols = Seq("id"), arrayCols = Seq("tags"))
      .select(col("id"), col("label"), concat_ws(",", col("tags")).as("tags_str"))
  }

  /** L2G distance feature: pp-weighted TSS proximity + neighbourhood ratio. */
  def l2gDistance(s: SparkSession, d: String): DataFrame = {
    val tags = lineitem(s, d).select(
      concat(lit("L"), col("l_orderkey").cast(StringType)).as("studyLocusId"),
      (col("l_partkey") % 4).cast(StringType).as("chromosome"),
      ((col("l_orderkey") * 31 + col("l_partkey") * 7) % 1000000).cast("long").as("tagPosition"),
      // dyadic weights (k/16) + power-of-two distance window make every
      // partial sum exactly representable → aggregation order cannot change
      // the result, so the oracle matches bit-for-bit.
      ((lit(1) + (col("l_orderkey") + col("l_partkey")) % 9) / 16.0).as("pp")
    ).distinct()
    val genes = part(s, d)
      .filter(col("p_partkey") < 40)
      .select(
        concat(lit("g"), col("p_partkey").cast(StringType)).as("geneId"),
        (col("p_partkey") % 4).cast(StringType).as("chromosome"),
        (col("p_partkey") * 25000 % 1000000).cast("long").as("tss")
      )
    QcJoins
      .distanceFeatures(tags, genes, maxDistance = 524288)
      .select(
        col("studyLocusId"), col("geneId"),
        round(col("distanceTssMean"), 6).as("d_mean"),
        round(col("distanceTssMeanNeighbourhood"), 6).as("d_nbh")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_trans_qtl" -> (transQtl _),
    "q_susie_explained" -> (susieExplained _),
    "q_credset_qc" -> (credsetQc _),
    "q_merge_indices" -> (mergeIndices _),
    "q_l2g_distance" -> (l2gDistance _)
  )

  val oracles: Map[String, String] = Map(
    "q_trans_qtl" ->
      """WITH cred AS (SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS studyLocusId,
        |    'q' || CAST(o_orderkey % 20 AS VARCHAR) AS studyId,
        |    o_orderkey AS o FROM orders),
        |tags AS (
        |  SELECT studyLocusId, studyId, CAST(o % 5 AS VARCHAR) AS chrom, (o * 13) % 1000000 AS pos FROM cred
        |  UNION ALL
        |  SELECT studyLocusId, studyId, CAST((o + 1) % 5 AS VARCHAR), (o * 31) % 9000000 FROM cred),
        |sidx AS (SELECT 'q' || CAST(n_nationkey AS VARCHAR) AS studyId,
        |    CASE WHEN n_nationkey % 3 = 0 THEN 'gwas' ELSE 'eqtl' END AS studyType,
        |    'g' || CAST(n_nationkey % 7 AS VARCHAR) AS geneId FROM nation),
        |tidx AS (SELECT 'g' || CAST(n_nationkey AS VARCHAR) AS geneId,
        |    n_nationkey * 1000000 AS tss, CAST(n_nationkey % 5 AS VARCHAR) AS geneChromosome
        |  FROM nation WHERE n_nationkey < 7),
        |fl AS (SELECT t.studyLocusId,
        |    bool_or(t.chrom <> x.geneChromosome OR abs(x.tss - t.pos) > 5000000) AS isTransQtl
        |  FROM tags t JOIN sidx s ON t.studyId = s.studyId AND s.studyType <> 'gwas'
        |    JOIN tidx x ON s.geneId = x.geneId
        |  GROUP BY t.studyLocusId)
        |SELECT c.studyLocusId, fl.isTransQtl FROM cred c LEFT JOIN fl USING (studyLocusId)""".stripMargin,
    "q_susie_explained" ->
      """WITH sl AS (SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS studyLocusId,
        |    's' || CAST(o_orderkey % 6 AS VARCHAR) AS studyId,
        |    CAST(o_orderkey % 4 AS VARCHAR) AS chromosome,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'SuSiE-inf' ELSE 'pics' END AS fm,
        |    (o_orderkey * 17) % 100000 AS locusStart,
        |    (o_orderkey * 17) % 100000 + 5000 AS locusEnd,
        |    (o_orderkey * 13) % 100000 AS tagPos
        |  FROM orders),
        |reg AS (SELECT DISTINCT studyId, chromosome, locusStart, locusEnd FROM sl WHERE fm = 'SuSiE-inf'),
        |red AS (SELECT DISTINCT s.studyLocusId FROM sl s JOIN reg r
        |  ON s.studyId = r.studyId AND s.chromosome = r.chromosome
        |    AND s.tagPos >= r.locusStart AND s.tagPos <= r.locusEnd
        |  WHERE s.fm <> 'SuSiE-inf')
        |SELECT s.studyLocusId,
        |  CASE WHEN red.studyLocusId IS NOT NULL THEN 'Explained by a SuSiE credible set' ELSE '' END AS qc_str
        |FROM sl s LEFT JOIN red ON s.studyLocusId = red.studyLocusId""".stripMargin,
    "q_credset_qc" ->
      """WITH b AS (SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS studyLocusId,
        |    's' || CAST(o_orderkey % 8 AS VARCHAR) AS studyId,
        |    'v' || CAST(o_orderkey % 50 AS VARCHAR) AS variantId,
        |    CAST(1.0 + (o_orderkey % 90) / 10.0 AS REAL) AS m,
        |    CAST(-(o_orderkey % 12) AS INTEGER) AS e,
        |    (o_orderkey % 10) / 10.0 AS purity,
        |    (o_orderkey % 37) * 1.0 AS bf
        |  FROM orders),
        |f AS (SELECT * FROM b WHERE (e < -5 OR (e = -5 AND m <= 1.0)) AND purity >= 0.25),
        |r AS (SELECT *, row_number() OVER (PARTITION BY studyId, variantId
        |    ORDER BY bf DESC, studyLocusId ASC) AS rn FROM f)
        |SELECT studyLocusId, studyId, variantId FROM r WHERE rn = 1""".stripMargin,
    "q_merge_indices" ->
      """WITH l AS (SELECT c_custkey AS id, c_name AS label, [c_mktsegment] AS tags FROM customer),
        |r AS (SELECT s_suppkey * 10 AS id, s_name AS label, [CAST(s_nationkey AS VARCHAR)] AS tags FROM supplier)
        |SELECT coalesce(l.id, r.id) AS id,
        |  coalesce(l.label, r.label) AS label,
        |  array_to_string(CASE
        |    WHEN l.tags IS NOT NULL AND r.tags IS NOT NULL THEN l.tags || r.tags
        |    ELSE coalesce(l.tags, r.tags) END, ',') AS tags_str
        |FROM l FULL JOIN r ON l.id = r.id""".stripMargin,
    "q_l2g_distance" ->
      """WITH tags AS (SELECT DISTINCT 'L' || CAST(l_orderkey AS VARCHAR) AS studyLocusId,
        |    CAST(l_partkey % 4 AS VARCHAR) AS chromosome,
        |    (l_orderkey * 31 + l_partkey * 7) % 1000000 AS tagPosition,
        |    (1 + (l_orderkey + l_partkey) % 9) / 16.0 AS pp
        |  FROM lineitem),
        |genes AS (SELECT 'g' || CAST(p_partkey AS VARCHAR) AS geneId,
        |    CAST(p_partkey % 4 AS VARCHAR) AS chromosome,
        |    p_partkey * 25000 % 1000000 AS tss
        |  FROM part WHERE p_partkey < 40),
        |sc AS (SELECT t.studyLocusId, g.geneId,
        |    sum(((524288 - abs(g.tss - t.tagPosition)) / 524288.0) * t.pp) / sum(t.pp) AS d_mean_raw
        |  FROM tags t JOIN genes g ON t.chromosome = g.chromosome
        |  WHERE abs(g.tss - t.tagPosition) <= 524288
        |  GROUP BY 1, 2)
        |SELECT studyLocusId, geneId, round(d_mean_raw, 6) AS d_mean,
        |  round(d_mean_raw / max(d_mean_raw) OVER (PARTITION BY studyLocusId), 6) AS d_nbh
        |FROM sc""".stripMargin
  )
}
