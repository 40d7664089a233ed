package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, StringType}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Annotations, LocusBreaker, SumstatQC}

/** Oracle-checked queries for the join suite: broadcast range joins, locus
  * breaker, left-semi restriction, FK validation flags, allele-orientation
  * harmonisation, LD-clumping linkage, n_eff QC.
  */
object JoinQueries {
  import Tables._

  /** Locus-breaker clumping over the synthetic sumstats. */
  def locusBreakerQ(s: SparkSession, d: String): DataFrame =
    LocusBreaker
      .locusBreaker(
        GenomicQueries.synthSumstats(s, d).df,
        baselinePvalueCutoff = 1e-3,
        distanceCutoff = 50000,
        pvalueCutoff = 1e-6,
        flankingDistance = 10000
      )
      .select("studyId", "chromosome", "position", "variantId", "locusStart", "locusEnd", "studyLocusId")

  /** Broadcast range join: collect sumstats into ±50kb loci around leads. */
  def locusAnnotate(s: SparkSession, d: String): DataFrame = {
    val ss = GenomicQueries.synthSumstats(s, d).df
    val leads = ss.filter(col("position") % 97 === 0)
      .withColumn("studyLocusId", graft.core.GDataset.generateIdentifier(Seq("studyId", "variantId")))
    Annotations
      .annotateLocusStatistics(leads, ss, collectLocusDistance = 50000)
      .select(
        col("studyLocusId"),
        size(col("locus")).as("n_tags"),
        round(
          aggregate(transform(col("locus"), x => x.getField("beta")), lit(0.0), (a, x) => a + x),
          6
        ).as("sum_beta")
      )
  }

  /** Left-semi restriction of large loci + window-clumped union
    * (process_locus_breaker_output shape).
    */
  def lbcSemi(s: SparkSession, d: String): DataFrame = {
    val ss = GenomicQueries.synthSumstats(s, d).df
    val wbc = ss.select("studyId", "chromosome", "position")
    val lbc = ss.filter(col("position") % 193 === 0)
      .withColumn("locusStart", (col("position") - col("position") % 40000).cast(IntegerType))
      .withColumn(
        "locusEnd",
        (col("locusStart") + 20000 + col("position") % 30000).cast(IntegerType)
      )
      .select("studyId", "chromosome", "position", "locusStart", "locusEnd")
    LocusBreaker
      .processLocusBreakerOutput(lbc, wbc, largeLociSize = 30000)
      .select("studyId", "chromosome", "position", "locusStart", "locusEnd")
  }

  /** Left-semi study restriction (never collect→isin). */
  def limitStudies(s: SparkSession, d: String): DataFrame = {
    val studies = supplier(s, d)
      .filter(col("s_suppkey") % 10 < 3)
      .select(concat(lit("s"), (col("s_suppkey") % 10).cast(StringType)).as("studyId"))
    Annotations
      .limitToStudies(GenomicQueries.synthSumstats(s, d).df, studies)
      .groupBy("studyId")
      .agg(count(lit(1)).as("n"))
  }

  /** FK-validation flag join: loci whose study is absent from the index. */
  def fkFlags(s: SparkSession, d: String): DataFrame = {
    val loci = orders(s, d).select(
      concat(lit("L"), col("o_orderkey").cast(StringType)).as("studyLocusId"),
      concat(lit("st"), (col("o_orderkey") % 30).cast(StringType)).as("studyId")
    )
    val index = nation(s, d).select(
      concat(lit("st"), col("n_nationkey").cast(StringType)).as("studyId"))
    Annotations
      .flagMissingForeignKeys(loci, "studyId", index, "studyId", "Study not found in the study index")
      .select(
        col("studyLocusId"), col("studyId"),
        concat_ws(";", col("qualityControls")).as("qc_str")
      )
  }

  /** Allele-orientation harmonisation against a direct+flipped LUT. */
  def harmonise(s: SparkSession, d: String): DataFrame = {
    val bases = "ACGT"
    def base(i: org.apache.spark.sql.Column) = lit(bases).substr((i + 1).cast("int"), lit(1))
    val ss = part(s, d).select(
      (col("p_partkey") % 22).cast(StringType).as("chromosome"),
      col("p_partkey").cast(IntegerType).as("position"),
      base(col("p_partkey") % 4).as("referenceAllele"),
      base((col("p_partkey") / 7).cast("long") % 4).as("alternateAllele")
    )
    val index = ss.select(
      col("chromosome"), col("position"),
      when(col("position") % 2 === 0, col("referenceAllele"))
        .otherwise(graft.functions.GenomicOps.reverseComplement(col("alternateAllele")))
        .as("referenceAllele"),
      when(col("position") % 2 === 0, col("alternateAllele"))
        .otherwise(graft.functions.GenomicOps.reverseComplement(col("referenceAllele")))
        .as("alternateAllele")
    )
    Annotations
      .harmoniseOrientation(ss, index)
      .select("chromosome", "position", "referenceAllele", "alternateAllele", "direction")
  }

  /** LD-clumping linkage: leads explained by a more significant lead sharing
    * LD tags.
    */
  def ldLinked(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(
      concat(lit("L"), col("o_orderkey").cast(StringType)).as("studyLocusId"),
      concat(lit("g"), (col("o_orderkey") % 5).cast(StringType)).as("studyId"),
      (col("o_orderkey") % 6).cast(StringType).as("chromosome"),
      concat(lit("v"), (col("o_orderkey") % 300).cast(StringType)).as("variantId"),
      (lit(1.0) + (col("o_orderkey") % 50) / 10.0).cast(FloatType).as("pValueMantissa"),
      (-(col("o_orderkey") % 17)).cast(IntegerType).as("pValueExponent"),
      array(
        struct(concat(lit("v"), ((col("o_orderkey") + 37) % 300).cast(StringType)).as("tagVariantId")),
        struct(concat(lit("v"), ((col("o_orderkey") + 74) % 300).cast(StringType)).as("tagVariantId"))
      ).as("ldSet")
    )
    o.select(
      col("studyLocusId"),
      Annotations
        .isLeadLinked(
          col("studyId"), col("chromosome"), col("variantId"),
          col("pValueExponent"), col("pValueMantissa"), col("ldSet"))
        .as("linked")
    )
  }

  /** n_eff QC: stddev of the effective-sample-size ratio per study. */
  def neff(s: SparkSession, d: String): DataFrame = {
    val gwas = GenomicQueries.synthSumstats(s, d).df
      .withColumn(
        "effectAlleleFrequencyFromSource",
        ((lit(1) + col("position") % 997) / 1000.0).cast(FloatType)
      )
    SumstatQC.nEffCheck(gwas).withColumn("se_N", round(col("se_N"), 4))
  }

  // -- oracles ---------------------------------------------------------------

  private def synthWith(extra: String): String =
    s"""ss AS (SELECT DISTINCT 's' || CAST(l_suppkey % 10 AS VARCHAR) AS studyId,
       |    CAST(1 + l_partkey % 4 AS VARCHAR) AS chromosome,
       |    CAST(((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007 AS INTEGER) AS position,
       |    CAST(1.0 + (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 700 / 100.0 AS REAL) AS pValueMantissa,
       |    CAST(-(4 + (((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 13) AS INTEGER) AS pValueExponent,
       |    ((((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 1000) / 1000.0 - 0.5 AS beta,
       |    0.01 + ((((l_orderkey * 8 + l_linenumber) * 2654435761) % 1000000007) % 100) / 1000.0 AS se
       |    $extra
       |  FROM lineitem)""".stripMargin

  /** Binned point-in-interval join (operators/IntervalJoin): the
    * non-broadcast scale path for variant×feature annotation — both sides
    * shuffle on (chromosome, bin), the range predicate rides an equi join.
    */
  def intervalBin(s: SparkSession, d: String): DataFrame = {
    val x = col("l_orderkey") * 8 + col("l_linenumber")
    val pts = lineitem(s, d).select(
      (lit(1) + col("l_partkey") % 4).cast(StringType).as("chromosome"),
      ((x * 2654435761L) % 10000019L).cast("long").as("position"),
      concat(lit("p"), x.cast(StringType)).as("pid"))
    val k = col("p_partkey")
    val ivs = part(s, d).select(
      (lit(1) + k % 4).cast(StringType).as("chromosome"),
      ((k * 4999) % 10000019L).cast("long").as("start"),
      ((k * 4999) % 10000019L + 500 + (k % 7) * 700).cast("long").as("end"),
      concat(lit("iv"), k.cast(StringType)).as("ivid"))
    graft.operators.IntervalJoin
      .pointInInterval(pts, ivs, binWidth = 10000L)
      .select("chromosome", "pid", "position", "ivid", "start", "end")
  }

  /** Binned interval×interval overlap with exactly-once pair emission. */
  def intervalPairs(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey")
    val a = part(s, d).select(
      (lit(1) + k % 4).cast(StringType).as("chromosome"),
      ((k * 4999) % 10000019L).cast("long").as("start"),
      ((k * 4999) % 10000019L + 500 + (k % 7) * 700).cast("long").as("end"),
      concat(lit("iv"), k.cast(StringType)).as("ivid"))
    val j = col("s_suppkey")
    val b = supplier(s, d).select(
      (lit(1) + j % 4).cast(StringType).as("chromosome"),
      ((j * 99991) % 10000019L).cast("long").as("start"),
      ((j * 99991) % 10000019L + 1000 + (j % 11) * 5000).cast("long").as("end"),
      concat(lit("b"), j.cast(StringType)).as("ivid"))
    graft.operators.IntervalJoin
      .intervalOverlap(a, b, binWidth = 10000L)
      .select("chromosome", "ivid", "start", "end", "ivid_b", "start_b", "end_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_interval_bin" -> (intervalBin _),
    "q_interval_pairs" -> (intervalPairs _),
    "q_locus_breaker" -> (locusBreakerQ _),
    "q_locus_annotate" -> (locusAnnotate _),
    "q_lbc_semi" -> (lbcSemi _),
    "q_limit_studies" -> (limitStudies _),
    "q_fk_flags" -> (fkFlags _),
    "q_harmonise" -> (harmonise _),
    "q_ld_linked" -> (ldLinked _),
    "q_neff" -> (neff _)
  )

  val oracles: Map[String, String] = Map(
    "q_interval_bin" ->
      """WITH pts AS (SELECT CAST(1 + l_partkey % 4 AS VARCHAR) AS chromosome,
        |    ((l_orderkey * 8 + l_linenumber) * 2654435761) % 10000019 AS position,
        |    'p' || CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) AS pid
        |  FROM lineitem),
        |ivs AS (SELECT CAST(1 + p_partkey % 4 AS VARCHAR) AS chromosome,
        |    (p_partkey * 4999) % 10000019 AS start,
        |    (p_partkey * 4999) % 10000019 + 500 + (p_partkey % 7) * 700 AS "end",
        |    'iv' || CAST(p_partkey AS VARCHAR) AS ivid
        |  FROM part)
        |SELECT pts.chromosome, pid, position, ivid, start, "end"
        |FROM pts JOIN ivs ON pts.chromosome = ivs.chromosome
        |  AND position >= start AND position <= "end"""".stripMargin,
    "q_interval_pairs" ->
      """WITH a AS (SELECT CAST(1 + p_partkey % 4 AS VARCHAR) AS chromosome,
        |    (p_partkey * 4999) % 10000019 AS start,
        |    (p_partkey * 4999) % 10000019 + 500 + (p_partkey % 7) * 700 AS "end",
        |    'iv' || CAST(p_partkey AS VARCHAR) AS ivid
        |  FROM part),
        |b AS (SELECT CAST(1 + s_suppkey % 4 AS VARCHAR) AS chromosome,
        |    (s_suppkey * 99991) % 10000019 AS start_b,
        |    (s_suppkey * 99991) % 10000019 + 1000 + (s_suppkey % 11) * 5000 AS end_b,
        |    'b' || CAST(s_suppkey AS VARCHAR) AS ivid_b
        |  FROM supplier)
        |SELECT a.chromosome, ivid, start, "end", ivid_b, start_b, end_b
        |FROM a JOIN b ON a.chromosome = b.chromosome
        |  AND start <= end_b AND start_b <= "end"""".stripMargin,
    "q_locus_breaker" ->
      s"""WITH ${synthWith("")},
         |f1 AS (SELECT * FROM ss WHERE pValueExponent < -3 OR (pValueExponent = -3 AND pValueMantissa <= 1.0)),
         |n AS (SELECT studyId, chromosome, position, pValueMantissa, pValueExponent,
         |    -1 * (log10(pValueMantissa) + pValueExponent) AS negLogPValue,
         |    position - lag(position) OVER w AS distance
         |  FROM f1 WINDOW w AS (PARTITION BY studyId, chromosome ORDER BY position)),
         |st AS (SELECT *, CASE WHEN distance > 50000 OR distance IS NULL THEN position END AS ls0 FROM n),
         |st2 AS (SELECT *, CASE
         |    WHEN last_value(ls0 - 10000 IGNORE NULLS) OVER (PARTITION BY studyId, chromosome ORDER BY position
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
         |    THEN last_value(ls0 - 10000 IGNORE NULLS) OVER (PARTITION BY studyId, chromosome ORDER BY position
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    ELSE 0 END AS locusStart FROM st),
         |en AS (SELECT *, max(position + 10000) OVER (PARTITION BY studyId, chromosome, locusStart) AS locusEnd FROM st2),
         |rk AS (SELECT *, rank() OVER (PARTITION BY studyId, chromosome, locusStart, locusEnd ORDER BY negLogPValue DESC) AS rnk FROM en)
         |SELECT studyId, chromosome, position,
         |  chromosome || '_' || CAST(position AS VARCHAR) || '_A_T' AS variantId,
         |  CAST(locusStart AS INTEGER) AS locusStart, CAST(locusEnd AS INTEGER) AS locusEnd,
         |  md5(studyId || chromosome || '_' || CAST(position AS VARCHAR) || '_A_T') AS studyLocusId
         |FROM rk WHERE rnk = 1 AND negLogPValue > 6.0""".stripMargin,
    "q_locus_annotate" ->
      s"""WITH ${synthWith("")},
         |leads AS (SELECT studyId, chromosome, position,
         |    md5(studyId || chromosome || '_' || CAST(position AS VARCHAR) || '_A_T') AS studyLocusId
         |  FROM ss WHERE position % 97 = 0)
         |SELECT l.studyLocusId, CAST(count(*) AS INTEGER) AS n_tags, round(sum(t.beta), 6) AS sum_beta
         |FROM leads l JOIN ss t ON t.studyId = l.studyId AND t.chromosome = l.chromosome
         |  AND t.position >= l.position - 50000 AND t.position <= l.position + 50000
         |GROUP BY l.studyLocusId""".stripMargin,
    "q_lbc_semi" ->
      s"""WITH ${synthWith("")},
         |lbc AS (SELECT studyId, chromosome, position,
         |    CAST(position - position % 40000 AS INTEGER) AS locusStart,
         |    CAST(position - position % 40000 + 20000 + position % 30000 AS INTEGER) AS locusEnd
         |  FROM ss WHERE position % 193 = 0),
         |small AS (SELECT * FROM lbc WHERE locusEnd - locusStart <= 30000),
         |large AS (SELECT * FROM lbc WHERE locusEnd - locusStart > 30000),
         |wsel AS (SELECT DISTINCT w.studyId, w.chromosome, w.position FROM ss w
         |  WHERE EXISTS (SELECT 1 FROM large ll WHERE ll.studyId = w.studyId
         |    AND ll.chromosome = w.chromosome AND w.position BETWEEN ll.locusStart AND ll.locusEnd))
         |SELECT studyId, chromosome, position,
         |  CAST(position - 15000 AS INTEGER) AS locusStart, CAST(position + 15000 AS INTEGER) AS locusEnd
         |FROM wsel
         |UNION ALL SELECT studyId, chromosome, position, locusStart, locusEnd FROM small""".stripMargin,
    "q_limit_studies" ->
      s"""WITH ${synthWith("")}
         |SELECT studyId, count(*) AS n FROM ss
         |WHERE studyId IN (SELECT DISTINCT 's' || CAST(s_suppkey % 10 AS VARCHAR) FROM supplier WHERE s_suppkey % 10 < 3)
         |GROUP BY studyId""".stripMargin,
    "q_fk_flags" ->
      """SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS studyLocusId,
        |  'st' || CAST(o_orderkey % 30 AS VARCHAR) AS studyId,
        |  CASE WHEN o_orderkey % 30 > 24 THEN 'Study not found in the study index' ELSE '' END AS qc_str
        |FROM orders""".stripMargin,
    "q_harmonise" ->
      """WITH b AS (SELECT CAST(p_partkey % 22 AS VARCHAR) AS chromosome,
        |    CAST(p_partkey AS INTEGER) AS position,
        |    substr('ACGT', CAST(p_partkey % 4 AS INTEGER) + 1, 1) AS ref,
        |    substr('ACGT', CAST((p_partkey // 7) % 4 AS INTEGER) + 1, 1) AS alt
        |  FROM part),
        |rc AS (SELECT *, CASE ref WHEN 'A' THEN 'T' WHEN 'T' THEN 'A' WHEN 'C' THEN 'G' WHEN 'G' THEN 'C' END AS ref_rc,
        |    CASE alt WHEN 'A' THEN 'T' WHEN 'T' THEN 'A' WHEN 'C' THEN 'G' WHEN 'G' THEN 'C' END AS alt_rc FROM b),
        |idx AS (SELECT chromosome, position,
        |    CASE WHEN position % 2 = 0 THEN ref ELSE alt_rc END AS iref,
        |    CASE WHEN position % 2 = 0 THEN alt ELSE ref_rc END AS ialt
        |  FROM rc),
        |lut AS (
        |  SELECT chromosome, position, iref AS referenceAllele, ialt AS alternateAllele, 'direct' AS direction FROM idx
        |  UNION ALL
        |  SELECT chromosome, position,
        |    CASE ialt WHEN 'A' THEN 'T' WHEN 'T' THEN 'A' WHEN 'C' THEN 'G' WHEN 'G' THEN 'C' END,
        |    CASE iref WHEN 'A' THEN 'T' WHEN 'T' THEN 'A' WHEN 'C' THEN 'G' WHEN 'G' THEN 'C' END,
        |    'flipped' FROM idx)
        |SELECT s.chromosome, s.position, s.ref AS referenceAllele, s.alt AS alternateAllele, l.direction
        |FROM b s JOIN lut l ON s.chromosome = l.chromosome AND s.position = l.position
        |  AND s.ref = l.referenceAllele AND s.alt = l.alternateAllele""".stripMargin,
    "q_ld_linked" ->
      """WITH leads AS (SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS studyLocusId,
        |    'g' || CAST(o_orderkey % 5 AS VARCHAR) AS studyId,
        |    CAST(o_orderkey % 6 AS VARCHAR) AS chromosome,
        |    'v' || CAST(o_orderkey % 300 AS VARCHAR) AS vid,
        |    CAST(1.0 + (o_orderkey % 50) / 10.0 AS REAL) AS m,
        |    CAST(-(o_orderkey % 17) AS INTEGER) AS e,
        |    ['v' || CAST(o_orderkey % 300 AS VARCHAR),
        |     'v' || CAST((o_orderkey + 37) % 300 AS VARCHAR),
        |     'v' || CAST((o_orderkey + 74) % 300 AS VARCHAR)] AS tags
        |  FROM orders)
        |SELECT l.studyLocusId,
        |  EXISTS (SELECT 1 FROM leads x WHERE x.studyId = l.studyId AND x.chromosome = l.chromosome
        |    AND (x.e < l.e OR (x.e = l.e AND (x.m < l.m OR (x.m = l.m AND x.vid < l.vid))))
        |    AND x.vid <> l.vid AND list_contains(l.tags, x.vid)) AS linked
        |FROM leads l""".stripMargin,
    "q_neff" ->
      s"""WITH ${synthWith("")},
         |g AS (SELECT studyId, beta, se,
         |    CAST((1 + position % 997) / 1000.0 AS REAL) AS af
         |  FROM ss),
         |v AS (SELECT *, 2.0 * af * (1.0 - af) AS varG,
         |    se * se * 100000 * (2.0 * af * (1.0 - af)) + beta * beta * (2.0 * af * (1.0 - af)) AS pheno_var
         |  FROM g),
         |md AS (SELECT studyId, quantile_disc(pheno_var, 0.5) AS pheno_median, count(*) AS cnt FROM v GROUP BY studyId),
         |r AS (SELECT v.studyId,
         |    (md.pheno_median - (v.beta * v.beta * v.varG)) / (v.se * v.se * v.varG * 100000) AS ratio
         |  FROM v JOIN md ON v.studyId = md.studyId WHERE md.cnt >= 100)
         |SELECT studyId, round(stddev(ratio), 4) AS se_N FROM r GROUP BY studyId""".stripMargin
  )
}
