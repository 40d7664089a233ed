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

  /** StudyLocus validation chain (operators/StudyLocusQc.scala; reference
    * study_locus.py:252-500, 1180-1242, 1423-1494): chromosome labels,
    * sub-significant leads, duplicated ids (deterministic tiebreak),
    * abnormal PIP sums, MHC region, redundant PICS top hits and the final
    * confidence assignment.
    */
  def studyLocusQc(s: SparkSession, d: String): DataFrame = {
    import graft.operators.StudyLocusQc
    val o = col("o_orderkey")
    val c = o % 26 + 1
    val chrom = when(c <= 22, c.cast(StringType))
      .when(c === 23, lit("X")).when(c === 24, lit("Y"))
      .when(c === 25, lit("chr9")).otherwise(lit("26"))
    val method = when(o % 4 === 0, "PICS").when(o % 4 === 1, "SuSie")
      .when(o % 4 === 2, "SuSiE-inf").otherwise("other")
    val df = orders(s, d).select(
      concat(lit("SL"), (o % 900).cast(StringType)).as("studyLocusId"),
      o.as("key"),
      concat(lit("ST"), (o % 40).cast(StringType)).as("studyId"),
      chrom.as("chromosome"),
      (o % 40000000).cast("long").as("position"),
      (lit(1.0) + (o % 39) / lit(10.0)).cast(FloatType).as("pValueMantissa"),
      (-(o % 12 + 3)).cast(IntegerType).as("pValueExponent"),
      array(
        struct((lit(0.5) + (o % 16) / lit(32.0)).as("posteriorProbability")),
        struct(((o % 17) / lit(32.0)).as("posteriorProbability")))
        .as("locus"),
      method.as("finemappingMethod"),
      when(o % 7 === 0, array(lit(StudyLocusQc.TopHitFlag)))
        .otherwise(array().cast("array<string>")).as("qualityControls")
    )
    val out = StudyLocusQc.assignConfidence(
      StudyLocusQc.qcRedundantTopHitsFromPics(
        StudyLocusQc.qcMhcRegion(
          StudyLocusQc.qcAbnormalPips(
            StudyLocusQc.validateUniqueStudyLocusId(
              StudyLocusQc.validateLeadPvalue(
                StudyLocusQc.validateChromosomeLabel(df), 5e-8),
              col("key"))))))
    // Flattened to a '|'-joined string at the output boundary (driver's
    // oracle harness cannot sort rows with array cells); DuckDB mirrors.
    out.select(
      col("studyLocusId"), col("key"), col("chromosome"), col("confidence"),
      array_join(array_sort(col("qualityControls")), "|").as("qualityControls"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_studylocus_qc" -> (studyLocusQc _),
    "q_trans_qtl" -> (transQtl _),
    "q_susie_explained" -> (susieExplained _),
    "q_credset_qc" -> (credsetQc _),
    "q_merge_indices" -> (mergeIndices _),
    "q_l2g_distance" -> (l2gDistance _)
  )

  val oracles: Map[String, String] = Map(
    "q_studylocus_qc" ->
      """WITH b AS (SELECT o_orderkey AS o,
        |    'SL' || CAST(o_orderkey % 900 AS VARCHAR) AS sl,
        |    'ST' || CAST(o_orderkey % 40 AS VARCHAR) AS st,
        |    CASE WHEN o_orderkey % 26 + 1 <= 22 THEN CAST(o_orderkey % 26 + 1 AS VARCHAR)
        |         WHEN o_orderkey % 26 + 1 = 23 THEN 'X'
        |         WHEN o_orderkey % 26 + 1 = 24 THEN 'Y'
        |         WHEN o_orderkey % 26 + 1 = 25 THEN 'chr9' ELSE '26' END AS chrom,
        |    o_orderkey % 40000000 AS pos,
        |    CAST(1.0 + (o_orderkey % 39) / 10.0 AS REAL) AS m,
        |    -(o_orderkey % 12 + 3) AS e,
        |    (0.0 + (0.5 + (o_orderkey % 16) / 32.0)) + (o_orderkey % 17) / 32.0 AS pipsum,
        |    CASE WHEN o_orderkey % 4 = 0 THEN 'PICS'
        |         WHEN o_orderkey % 4 = 1 THEN 'SuSie'
        |         WHEN o_orderkey % 4 = 2 THEN 'SuSiE-inf' ELSE 'other' END AS method,
        |    o_orderkey % 7 = 0 AS tophit
        |  FROM orders),
        |pics AS (SELECT st, bool_or(method = 'PICS' AND NOT tophit) AS haspics
        |  FROM b GROUP BY st),
        |fl AS (SELECT b.*,
        |    row_number() OVER (PARTITION BY b.sl ORDER BY b.o) > 1 AS dupf,
        |    b.chrom NOT IN ('1','2','3','4','5','6','7','8','9','10','11','12',
        |      '13','14','15','16','17','18','19','20','21','22','X','Y','XY','MT') AS chromf,
        |    -(log10(CAST(b.m AS DOUBLE)) + b.e) < 7.301029995663981 AS pvalf,
        |    b.pipsum < 0.99 OR b.pipsum > 1.0001 AS pipf,
        |    b.chrom = '6' AND b.pos BETWEEN 25726063 AND 33400556 AS mhcf,
        |    b.tophit AND coalesce(p.haspics, false) AS redf
        |  FROM b LEFT JOIN pics p ON b.st = p.st)
        |SELECT sl AS "studyLocusId", o AS key, chrom AS chromosome,
        |  CASE WHEN method IN ('SuSie', 'SuSiE-inf')
        |       THEN 'SuSiE fine-mapped credible set with in-sample LD'
        |       WHEN method = 'PICS' AND tophit
        |       THEN 'PICS fine-mapped credible set based on reported top hit'
        |       WHEN method = 'PICS'
        |       THEN 'PICS fine-mapped credible set extracted from summary statistics'
        |       ELSE 'Unknown confidence' END AS confidence,
        |  coalesce(array_to_string(list_sort(list_distinct(list_filter([
        |    CASE WHEN tophit THEN 'Study locus from curated top hit' END,
        |    CASE WHEN chromf THEN 'Chromosome not in 1:22, X, Y, XY or MT' END,
        |    CASE WHEN pvalf THEN 'Subsignificant p-value' END,
        |    CASE WHEN dupf THEN 'Non-unique study locus identifier' END,
        |    CASE WHEN pipf THEN
        |      'Study locus with a sum of PIPs that not in the expected range [0.95,1]' END,
        |    CASE WHEN mhcf THEN 'MHC region' END,
        |    CASE WHEN redf THEN
        |      'PICS results from summary statistics available for this same study' END],
        |    x -> x IS NOT NULL))), '|'), '') AS "qualityControls"
        |FROM fl""".stripMargin,
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
