package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.harness.Tables._
import graft.sources.{Intervals, OpenTargetsVariants, UkBiobank}

/** Round-7 oracle coverage for the remaining DuckDB-expressible ingestion
  * rows that previously had only ScalaTest evidence: the UKBiobank study
  * index, the OTAR2075 LoF curation, FoldX ΔΔG ingestion, and the
  * EPIraction interval parse.
  *
  * Struct-array outputs are serialized (or exploded to scalar columns) at
  * the query boundary, mirroring the StudyQueries convention — the driver's
  * oracle harness cannot hash rows with array cells.
  */
object IngestQueries {

  // array<struct<ancestry,sampleSize>> → sorted "ancestry:size|…"
  private def serializeSamples(c: Column): Column =
    array_join(
      array_sort(
        transform(
          c,
          x =>
            concat_ws(
              ":",
              x.getField("ancestry"),
              x.getField("sampleSize").cast(StringType)))),
      "|")

  // array<struct<ldPopulation,relativeSampleSize>> → sorted "pop:share6"
  private def serializeLdPopulations(c: Column): Column =
    array_join(
      array_sort(
        transform(
          c,
          x =>
            concat_ws(
              ":",
              x.getField("ldPopulation"),
              format_string("%.6f", x.getField("relativeSampleSize"))))),
      "|")

  /** UKBiobank (SAIGE / Neale round 2) study-index constants projection
    * (sources/UkBiobank.scala fromSource; reference
    * datasource/ukbiobank/study_index.py:33-110): per-family publication
    * constants, PheCode trait recomposition, single-population discovery
    * structure and the nfe LD mapping.
    */
  def ukbStudies(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey") % 350
    val manifest = customer(s, d)
      .select(
        when(k % 2 === 0, concat(lit("SAIGE_"), k.cast(StringType)))
          .otherwise(concat(lit("NEALE2_"), k.cast(StringType))).as("code"),
        when(
          k % 3 === 0,
          concat(
            lit("Cat"), (k % 7).cast(StringType),
            lit(": Word"), (k % 11).cast(StringType)))
          .otherwise(concat(lit("Trait "), (k % 11).cast(StringType))).as("trait"),
        (lit(1000L) + (k * 17) % 90000).cast(LongType).as("n_total"),
        (lit(100L) + (k * 7) % 9000).cast(LongType).as("n_cases"),
        concat(lit("https://example.org/ukb/"), k.cast(StringType), lit(".tsv"))
          .as("in_path"))
      .distinct()
    UkBiobank
      .fromSource(manifest)
      .select(
        col("studyId"), col("projectId"), col("studyType"),
        col("traitFromSource"), col("pubmedId"), col("publicationTitle"),
        col("publicationFirstAuthor"), col("publicationDate"),
        col("publicationJournal"), col("initialSampleSize"), col("nCases"),
        serializeSamples(col("discoverySamples")).as("discoverySamples"),
        col("summarystatsLocation"), col("hasSumstats"),
        serializeLdPopulations(col("ldPopulationStructure"))
          .as("ldPopulationStructure"))
  }

  /** OTAR2075 LoF curation → variant-index rows
    * (sources/OpenTargetsVariants.scala lofAsVariantIndex; reference
    * open_targets/lof_curation.py:41-119): GRCh38 chrom/pos + GRCh37
    * ref/alt recomposition, verdict description text and the ordinal
    * normalised score. The single-element variantEffect struct is exploded
    * to scalar columns for the oracle.
    */
  def lofCuration(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey") % 300
    val refA = array(lit("A"), lit("C"), lit("G"), lit("T"))
    val altA = array(lit("G"), lit("T"), lit("A"), lit("C"))
    val verdicts = array(
      lit("lof"), lit("likely_lof"), lit("uncertain"),
      lit("likely_not_lof"), lit("not_lof"))
    val lof = part(s, d)
      .select(
        concat_ws(
          "-",
          (lit(1) + k % 22).cast(StringType), (lit(500) + k).cast(StringType),
          element_at(refA, (k % 4 + 1).cast("int")),
          element_at(altA, (k % 4 + 1).cast("int"))).as("Variant ID GRCh37"),
        concat_ws(
          "-",
          (lit(1) + k % 22).cast(StringType), (lit(9000) + k).cast(StringType),
          element_at(refA, (k % 4 + 1).cast("int")),
          element_at(altA, (k % 4 + 1).cast("int"))).as("Variant ID GRCh38"),
        element_at(verdicts, (k % 5 + 1).cast("int")).as("Verdict"))
      .distinct()
    OpenTargetsVariants
      .lofAsVariantIndex(lof)
      .select(
        col("variantId"), col("chromosome"), col("position"),
        col("referenceAllele"), col("alternateAllele"),
        col("variantDescription"),
        element_at(col("variantEffect"), 1).getField("method").as("method"),
        element_at(col("variantEffect"), 1).getField("assessment")
          .as("assessment"),
        round(
          element_at(col("variantEffect"), 1).getField("normalisedScore"), 6)
          .as("normalisedScore"))
  }

  /** FoldX ΔΔG ingestion (sources/OpenTargetsVariants.scala ingestFoldx;
    * reference open_targets/foldex_integration.py:38-99): pLDDT gate,
    * exclusion of un-disambiguatable UniProt positions (several distinct
    * pLDDTs at one (protein, position, wild type)), amino-acid-change
    * recomposition and |ΔΔG|/2-saturating normalisation. The collect_set
    * prediction array is exploded back to scalar rows for the oracle.
    */
  def foldx(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey") % 600
    val wild = array(lit("A"), lit("R"), lit("N"), lit("D"))
    val mutated = array(lit("G"), lit("V"))
    val raw = part(s, d)
      .select(
        concat(lit("P"), (k % 37).cast(StringType)).as("protein_acc"),
        (lit(1) + k % 13).cast("int").as("position"),
        element_at(wild, (k % 4 + 1).cast("int")).as("wild_type"),
        element_at(mutated, (k % 2 + 1).cast("int")).as("mutated_type"),
        // pLDDT is a function of the (protein, position, wild-type) group
        // key except for protein P5 (planted ambiguity → excluded) and
        // protein P11 (planted low confidence → gated out)
        when(k % 37 === 5, (lit(80.0) + (k % 2).cast("double")))
          .when(k % 37 === 11, lit(65.0))
          .otherwise(lit(80.0) + ((k % 37 + k % 13) % 15).cast("double"))
          .as("plddt"),
        (((k % 41) - 20).cast("double") / 10.0).as("foldx_ddg"))
      .distinct()
    OpenTargetsVariants
      .ingestFoldx(raw, plddtThreshold = 70.0)
      .select(
        col("uniprotAccession"), col("aminoAcidChange"),
        explode(col("variantEffect")).as("p"))
      .select(
        col("uniprotAccession"), col("aminoAcidChange"),
        col("p.method").as("method"),
        col("p.score").as("score"),
        round(col("p.normalisedScore"), 6).as("normalisedScore"))
      .distinct()
  }

  /** EPIraction interval parse (sources/Intervals.scala parseEpiraction;
    * reference datasource/intervals/epiraction.py:41-140): chromosome
    * normalisation (incl. 23→X), lower-cased interval typing, TSS distance
    * against a (geneId, tss) LUT with null propagation, and the six
    * per-assay resourceScore structs (exploded to scalar columns). The
    * frame is synthesized (not file-backed), so the file-name-derived
    * studyId is empty on both sides.
    */
  def epiraction(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey") % 400
    val classes = array(lit("Enhancer"), lit("Promoter"), lit("intragenic"), lit("CTCF"))
    val raw = orders(s, d)
      .select(
        concat(lit("chr"), (lit(1) + k % 23).cast(StringType)).as("chr"),
        (lit(1000L) + k * 50).as("start"),
        (lit(1500L) + k * 50 + k % 300).as("end"),
        concat(lit("ENSG"), (k % 50).cast(StringType)).as("TargetGeneEnsemblID"),
        concat(lit("CT"), (k % 6).cast(StringType)).as("CellType"),
        ((k % 100).cast("double") / 100.0).as("Score"),
        element_at(classes, (k % 4 + 1).cast("int")).as("class"),
        ((k % 10).cast("double") / 10.0).as("H3K27ac"),
        ((k % 9).cast("double") / 10.0).as("Open"),
        ((k % 8).cast("double") / 10.0).as("Cofactor"),
        ((k % 7).cast("double") / 10.0).as("CTCF"),
        ((k % 6).cast("double") / 10.0).as("HiC_contacts"),
        ((k % 5).cast("double") / 10.0).as("abc_tissue"))
      .distinct()
    val g = col("s_suppkey") % 50
    val geneTss = supplier(s, d)
      .select(
        concat(lit("ENSG"), g.cast(StringType)).as("geneId"),
        (lit(500L) + g * 997).as("tss"))
      .filter(g % 5 =!= 4) // some genes carry no TSS → null distance path
      .distinct()
    Intervals
      .parseEpiraction(raw, geneTss)
      .select(
        col("chromosome"), col("start"), col("end"), col("geneId"),
        col("score"), col("distanceToTss").cast(LongType).as("distanceToTss"),
        col("intervalType"), col("biosampleName"), col("pmid"),
        col("datasourceId"), col("studyId"),
        element_at(col("resourceScore"), 1).getField("value").as("h3k27ac"),
        element_at(col("resourceScore"), 2).getField("value").as("open_assay"),
        element_at(col("resourceScore"), 3).getField("value").as("cofactor"),
        element_at(col("resourceScore"), 4).getField("value").as("ctcf"),
        element_at(col("resourceScore"), 5).getField("value").as("hic_contacts"),
        element_at(col("resourceScore"), 6).getField("value").as("abc_tissue"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ukb_studies" -> (ukbStudies _),
    "q_lof_curation" -> (lofCuration _),
    "q_foldx" -> (foldx _),
    "q_epiraction" -> (epiraction _)
  )

  val oracles: Map[String, String] = Map(
    "q_ukb_studies" ->
      """WITH k AS (SELECT DISTINCT c_custkey % 350 AS k FROM customer),
        |m AS (SELECT k,
        |    CASE WHEN k % 2 = 0 THEN 'SAIGE_' || CAST(k AS VARCHAR)
        |         ELSE 'NEALE2_' || CAST(k AS VARCHAR) END AS code,
        |    k % 3 = 0 AS colon_trait,
        |    1000 + (k * 17) % 90000 AS n_total,
        |    100 + (k * 7) % 9000 AS n_cases
        |  FROM k)
        |SELECT code AS "studyId",
        |  'UKBiobank' AS "projectId",
        |  'gwas' AS "studyType",
        |  CASE WHEN colon_trait
        |    THEN 'Word' || CAST(k % 11 AS VARCHAR) || ' | cat' || CAST(k % 7 AS VARCHAR)
        |    ELSE 'Trait ' || CAST(k % 11 AS VARCHAR) END AS "traitFromSource",
        |  CASE WHEN k % 2 = 0 THEN '30104761' END AS "pubmedId",
        |  CASE WHEN k % 2 = 0 THEN 'Efficiently controlling for case-control imbalance and sample relatedness in large-scale genetic association studies' END AS "publicationTitle",
        |  CASE WHEN k % 2 = 0 THEN 'Wei Zhou' END AS "publicationFirstAuthor",
        |  CASE WHEN k % 2 = 0 THEN '2018-10-24' ELSE '2018-08-01' END AS "publicationDate",
        |  CASE WHEN k % 2 = 0 THEN 'Nature Genetics' END AS "publicationJournal",
        |  CAST(n_total AS VARCHAR) AS "initialSampleSize",
        |  CAST(n_cases AS INTEGER) AS "nCases",
        |  'European=' || CAST(n_total AS VARCHAR) || ':' || CAST(n_total AS VARCHAR)
        |    AS "discoverySamples",
        |  'https://example.org/ukb/' || CAST(k AS VARCHAR) || '.tsv'
        |    AS "summarystatsLocation",
        |  true AS "hasSumstats",
        |  'nfe:1.000000' AS "ldPopulationStructure"
        |FROM m""".stripMargin,
    "q_lof_curation" ->
      """WITH k AS (SELECT DISTINCT p_partkey % 300 AS k FROM part),
        |m AS (SELECT k,
        |    CAST(1 + k % 22 AS VARCHAR) AS chrom,
        |    9000 + k AS pos,
        |    ['A','C','G','T'][CAST(k % 4 + 1 AS INTEGER)] AS ref,
        |    ['G','T','A','C'][CAST(k % 4 + 1 AS INTEGER)] AS alt,
        |    ['lof','likely_lof','uncertain','likely_not_lof','not_lof'][CAST(k % 5 + 1 AS INTEGER)] AS verdict
        |  FROM k)
        |SELECT chrom || '_' || CAST(pos AS VARCHAR) || '_' || ref || '_' || alt AS "variantId",
        |  chrom AS chromosome,
        |  CAST(pos AS INTEGER) AS position,
        |  ref AS "referenceAllele",
        |  alt AS "alternateAllele",
        |  CASE verdict
        |    WHEN 'lof' THEN 'Assessed to cause LoF'
        |    WHEN 'likely_lof' THEN 'Suspected to cause LoF'
        |    WHEN 'uncertain' THEN 'Uncertain LoF assessment'
        |    WHEN 'likely_not_lof' THEN 'Suspected not to cause LoF'
        |    WHEN 'not_lof' THEN 'Assessed not to cause LoF'
        |  END || ' by OTAR2075 variant curation effort.' AS "variantDescription",
        |  'LossOfFunctionCuration' AS method,
        |  verdict AS assessment,
        |  round(CASE verdict
        |    WHEN 'lof' THEN 1.0 WHEN 'likely_lof' THEN 0.5
        |    WHEN 'uncertain' THEN 0.0 WHEN 'likely_not_lof' THEN -0.5
        |    WHEN 'not_lof' THEN -1.0 END, 6) AS "normalisedScore"
        |FROM m""".stripMargin,
    "q_foldx" ->
      """WITH k AS (SELECT DISTINCT p_partkey % 600 AS k FROM part),
        |raw AS (SELECT
        |    'P' || CAST(k % 37 AS VARCHAR) AS protein_acc,
        |    CAST(1 + k % 13 AS INTEGER) AS position,
        |    ['A','R','N','D'][CAST(k % 4 + 1 AS INTEGER)] AS wild_type,
        |    ['G','V'][CAST(k % 2 + 1 AS INTEGER)] AS mutated_type,
        |    CASE WHEN k % 37 = 5 THEN 80.0 + (k % 2)
        |         WHEN k % 37 = 11 THEN 65.0
        |         ELSE 80.0 + (k % 37 + k % 13) % 15 END AS plddt,
        |    ((k % 41) - 20) / 10.0 AS foldx_ddg
        |  FROM k),
        |excl AS (SELECT DISTINCT protein_acc FROM raw
        |  GROUP BY protein_acc, position, wild_type
        |  HAVING count(DISTINCT plddt) > 1),
        |kept AS (SELECT * FROM raw
        |  WHERE plddt > 70.0
        |    AND protein_acc NOT IN (SELECT protein_acc FROM excl))
        |SELECT DISTINCT protein_acc AS "uniprotAccession",
        |  wild_type || CAST(position AS VARCHAR) || mutated_type AS "aminoAcidChange",
        |  'FoldX' AS method,
        |  CAST(foldx_ddg AS REAL) AS score,
  -- the REAL→DOUBLE promotion must happen BEFORE the /2, as in Spark:
  -- round over a REAL quotient would stay REAL (float 0.05 ≠ double 0.05)
        |  round(CASE WHEN abs(CAST(foldx_ddg AS REAL)) >= 2 THEN CAST(1.0 AS DOUBLE)
        |        ELSE CAST(abs(CAST(foldx_ddg AS REAL)) AS DOUBLE) / 2.0 END, 6) AS "normalisedScore"
        |FROM kept""".stripMargin,
    "q_epiraction" ->
      """WITH k AS (SELECT DISTINCT o_orderkey % 400 AS k FROM orders),
        |raw AS (SELECT k,
        |    CAST(1 + k % 23 AS VARCHAR) AS chrom_raw,
        |    1000 + k * 50 AS istart,
        |    1500 + k * 50 + k % 300 AS iend,
        |    'ENSG' || CAST(k % 50 AS VARCHAR) AS geneId,
        |    'CT' || CAST(k % 6 AS VARCHAR) AS biosampleName,
        |    (k % 100) / 100.0 AS score,
        |    lower(['Enhancer','Promoter','intragenic','CTCF'][CAST(k % 4 + 1 AS INTEGER)]) AS intervalType,
        |    (k % 10) / 10.0 AS a1, (k % 9) / 10.0 AS a2, (k % 8) / 10.0 AS a3,
        |    (k % 7) / 10.0 AS a4, (k % 6) / 10.0 AS a5, (k % 5) / 10.0 AS a6
        |  FROM k),
        |tssl AS (SELECT 'ENSG' || CAST(g AS VARCHAR) AS geneId, 500 + g * 997 AS tss
        |  FROM (SELECT DISTINCT s_suppkey % 50 AS g FROM supplier) WHERE g % 5 <> 4)
        |SELECT CASE WHEN chrom_raw = '23' THEN 'X' ELSE chrom_raw END AS chromosome,
        |  istart AS start, iend AS "end", r.geneId AS "geneId", score,
        |  CASE WHEN intervalType = 'promoter'
        |         OR (t.tss IS NOT NULL AND t.tss BETWEEN istart AND iend) THEN 0
        |       WHEN t.tss IS NULL THEN NULL
        |       ELSE least(abs(t.tss - istart), abs(t.tss - iend)) END AS "distanceToTss",
        |  intervalType AS "intervalType", biosampleName AS "biosampleName",
        |  '40027634' AS pmid, 'epiraction' AS "datasourceId", '' AS "studyId",
        |  CAST(a1 AS REAL) AS h3k27ac, CAST(a2 AS REAL) AS open_assay,
        |  CAST(a3 AS REAL) AS cofactor, CAST(a4 AS REAL) AS ctcf,
        |  CAST(a5 AS REAL) AS hic_contacts, CAST(a6 AS REAL) AS abc_tissue
        |FROM raw r LEFT JOIN tssl t ON r.geneId = t.geneId""".stripMargin
  )
}
