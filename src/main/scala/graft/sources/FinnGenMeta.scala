package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.functions.GenomicOps

/** FinnGen + UKBB + MVP meta-analysis summary-statistics harmonisation
  * (reference: datasource/finngen_meta/summary_statistics.py:25-470).
  */
object FinnGenMeta {

  /** `.../​<phenotype>_meta_out.tsv.gz` → phenotype
    * (summary_statistics.py:32-63).
    */
  def extractStudyPhenotypeFromPath(filePath: Column): Column =
    regexp_replace(element_at(split(filePath, "/"), -1), "_meta_out.tsv.gz", "")

  /** Cohorts contributing to the meta-analysis for a row: a cohort is in
    * when its allele-frequency column is populated; MVP_HIS maps to the
    * admixed-American cohort label (summary_statistics.py:1108-1184).
    */
  def cohorts(): Column = {
    def entry(afCol: String, cohort: String, biobank: String) = struct(
      col(afCol).isNotNull.as("inCohort"),
      lit(cohort).as("cohort"),
      lit(biobank).as("biobank")
    )
    transform(
      filter(
        array(
          entry("MVP_EUR_af_alt", "MVP_EUR", "MVP"),
          entry("MVP_AFR_af_alt", "MVP_AFR", "MVP"),
          entry("MVP_HIS_af_alt", "MVP_AMR", "MVP"),
          entry("fg_af_alt", "FinnGen", "FinnGen"),
          entry("ukbb_af_alt", "UKBB", "UKBB")
        ),
        x => x.getField("inCohort")
      ),
      x => struct(x.getField("biobank").as("biobank"), x.getField("cohort").as("cohort"))
    )
  }

  /** Meta-analyzed = seen in at least two distinct biobanks
    * (summary_statistics.py:1186-1227).
    */
  def isMetaAnalyzedVariant(cohorts: Column): Column =
    size(array_distinct(transform(cohorts, x => x.getField("biobank")))) >= 2

  /** Codegen scalar twin of the cohorts() array rendered as
    * "biobank:cohort" labels joined by `sep`: concat_ws skips nulls, so the
    * per-cohort when-chain compacts exactly like cohorts()'s inCohort
    * filter. Exhaustively pinned equal (all 32 presence patterns) in
    * UkbFinnGenMetaSpec. Use when only the label string is needed — no
    * array build, no interpreted HOFs.
    */
  def cohortLabels(sep: String = ","): Column = {
    def label(afCol: String, biobank: String, cohort: String) =
      when(col(afCol).isNotNull, lit(s"$biobank:$cohort"))
    concat_ws(
      sep,
      label("MVP_EUR_af_alt", "MVP", "MVP_EUR"),
      label("MVP_AFR_af_alt", "MVP", "MVP_AFR"),
      label("MVP_HIS_af_alt", "MVP", "MVP_AMR"),
      label("fg_af_alt", "FinnGen", "FinnGen"),
      label("ukbb_af_alt", "UKBB", "UKBB"))
  }

  /** Codegen scalar twin of `isMetaAnalyzedVariant(cohorts())` for the fixed
    * raw-file cohort columns: distinct biobanks = {MVP if any MVP af, FinnGen
    * if fg af, UKBB if ukbb af}; meta-analyzed ⇔ at least two present. A pure
    * when-chain sum — no array build, no array_distinct — so the
    * harmoniseCore filter stays inside whole-stage codegen (the array form
    * costs interpreted-HOF evaluation per row; pinned equal in
    * UkbFinnGenMetaSpec).
    */
  def metaAnalyzedPredicate(): Column = {
    def present(c: Column) = when(c.isNotNull, lit(1)).otherwise(lit(0))
    val mvp = present(
      coalesce(col("MVP_EUR_af_alt"), col("MVP_AFR_af_alt"), col("MVP_HIS_af_alt")))
    (mvp + present(col("fg_af_alt")) + present(col("ukbb_af_alt"))) >= 2
  }

  /** Sample-size-weighted allele frequency across cohorts; cohorts missing
    * either the frequency or the sample size are excluded, empty
    * intersection → null (summary_statistics.py:779-860).
    */
  def combinedAlleleFrequency(alleleFreq: Column, nSamplesPerCohort: Column): Column =
    // Let-binding discipline (round-8 audit rule): the cohort→nSamples map
    // and the non-null AF array are bound ONCE per row; the aggregate's
    // lambdas only do field accesses and O(#cohorts) map probes. The
    // previous form re-inlined the map_from_entries(transform(filter(...)))
    // subtree per element per aggregate (interpreted HOFs substitute, not
    // memoize), costing ~37 µs/row at sf0.1. A single struct(num, den)
    // accumulator replaces the two aggregates, and the finish lambda emits
    // the ratio so the accumulator subtree is not duplicated either.
    graft.functions.ArrayOps.bindOnce(
      "nMap" -> map_from_entries(
        transform(
          filter(nSamplesPerCohort, x => x.getField("nSamples").isNotNull),
          x => struct(x.getField("cohort"), x.getField("nSamples")))),
      "afF" -> filter(alleleFreq, x => x.getField("alleleFrequency").isNotNull)
    ) { get =>
      aggregate(
        get("afF"),
        struct(lit(0.0).as("num"), lit(0.0).as("den")),
        (acc, x) => {
          // null n (cohort absent from nMap) contributes 0 to both terms —
          // identical to the reference's inner-join-then-weight semantics
          val n = element_at(get("nMap"), x.getField("cohort")).cast("double")
          struct(
            (acc.getField("num") +
              coalesce(x.getField("alleleFrequency") * n, lit(0.0))).as("num"),
            (acc.getField("den") + coalesce(n, lit(0.0))).as("den"))
        },
        acc => when(acc.getField("den") > 0, acc.getField("num") / acc.getField("den"))
      )
    }

  /** Sample-size-weighted allele frequency over a FIXED cohort set, given as
    * (alleleFrequency, nSamples) column pairs — the shape the raw meta files
    * actually have (one af/n column pair per cohort,
    * summary_statistics.py:64-147). Pure scalar when-chain arithmetic: stays
    * inside whole-stage codegen, no arrays, no interpreted HOFs. Semantics
    * match [[combinedAlleleFrequency]]: a cohort contributes only when both
    * af and n are non-null; no contributing cohort → null.
    */
  def combinedAlleleFrequencyUnrolled(pairs: Seq[(Column, Column)]): Column = {
    def term(value: Column, af: Column, n: Column): Column =
      when(af.isNotNull && n.isNotNull, value).otherwise(lit(0.0))
    val num = pairs.map { case (af, n) => term(af * n.cast("double"), af, n) }.reduce(_ + _)
    val den = pairs.map { case (af, n) => term(n.cast("double"), af, n) }.reduce(_ + _)
    when(den > 0, num / den)
  }

  /** The raw FinnGen+UKBB+MVP meta file column superset, in file order
    * (summary_statistics.py:64-147): variant core, per-cohort effect blocks,
    * the combined meta block, leave-one-out blocks, rsid. Generated from the
    * same per-cohort pattern the files follow.
    */
  val metaRawSchema: StructType = {
    val core = Seq(
      StructField("#CHR", StringType), StructField("POS", LongType),
      StructField("REF", StringType), StructField("ALT", StringType),
      StructField("SNP", StringType))
    def block(prefix: String, withR2: Boolean) = {
      val base = Seq("beta", "sebeta", "pval", "af_alt")
        .map(s => StructField(s"${prefix}_$s", DoubleType))
      if (withR2) base :+ StructField(s"${prefix}_r2", DoubleType) else base
    }
    val cohortBlocks =
      block("fg", withR2 = false) ++
        Seq(StructField("fg_af_alt_cases", DoubleType),
          StructField("fg_af_alt_controls", DoubleType)) ++
        block("MVP_EUR", withR2 = true) ++
        block("MVP_AFR", withR2 = true) ++
        block("MVP_HIS", withR2 = true) ++
        block("ukbb", withR2 = false)
    def metaBlock(prefix: String, hetName: String) =
      StructField(s"${prefix}_N", IntegerType) +:
        Seq("beta", "sebeta", "p", "mlogp")
          .map(s => StructField(s"${prefix}_inv_var_meta_$s", DoubleType)) :+
        StructField(s"${prefix}_$hetName", DoubleType)
    val meta = metaBlock("all", "inv_var_het_p")
    val leaveOneOut = Seq("fg", "MVP_EUR", "MVP_AFR", "MVP_HIS", "ukbb")
      .flatMap(c => metaBlock(s"leave_$c", "inv_var_meta_het_p"))
    StructType(core ++ cohortBlocks ++ meta ++ leaveOneOut :+
      StructField("rsid", StringType))
  }

  /** Align one per-file frame onto the declared column superset
    * (summary_statistics.py:249-264): columns absent from the file are added
    * as typed nulls; literal "NA" cells become nulls before the cast (left
    * as strings they would force the whole column to StringType and the
    * per-file schemas would stay divergent).
    */
  def alignToSchemaSuperset(df: DataFrame, schema: StructType = metaRawSchema): DataFrame = {
    val withAll = schema.fields.foldLeft(df) { (d, f) =>
      if (d.columns.contains(f.name)) d
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    schema.fields.foldLeft(withAll) { (d, f) =>
      // Only string-inferred columns can carry "NA" (and, like the
      // reference's non-ANSI casts, malformed cells null out via try_cast);
      // comparing a numeric-inferred column to 'NA' would itself be an
      // invalid ANSI literal cast.
      val cleaned = d.schema(f.name).dataType match {
        case StringType =>
          when(col(f.name) === "NA", lit(null))
            .otherwise(col(f.name)).try_cast(f.dataType)
        case _ => col(f.name).cast(f.dataType)
      }
      d.withColumn(f.name, cleaned)
    }
      // declared order: every per-file frame leaves with identical layout
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Per-file conversion loop: each raw meta TSV (gzip, or block-gzip via
    * [[BgzfCodec]] — the reference requires its enhanced bgzip codec here,
    * summary_statistics.py:195-211) is schema-inferred independently,
    * aligned onto the superset, stamped with the path-derived studyId, and
    * appended to one studyId-partitioned parquet dataset
    * (summary_statistics.py:149-299 `bgzip_to_parquet`/`process_one`).
    *
    * Per-file schema INFERENCE (an eager scan, the expensive driver-blocking
    * step) runs as `parallelism` concurrent jobs — the reference's
    * ThreadPoolExecutor, capped at 32 like its N_THREAD_MAX; per-file
    * inference is unavoidable because bulk `inferSchema` samples files and
    * drops columns, and `enforceSchema` aligns positionally
    * (summary_statistics.py:178-193). The COMMITS are serialised: the
    * reference appends to one path from all threads at once, which races
    * the Hadoop committer's shared `_temporary/0` staging dir (one job's
    * commit deletes the dir another is still writing) — each write here is
    * still a fully parallel cluster job, only the job-level commit is
    * sequential. Each file's output is clustered by (#CHR, POS) so
    * downstream readers get chromosome-contiguous row groups.
    */
  def schemaSupersetToParquet(
      spark: SparkSession,
      summaryStatisticsFiles: Seq[String],
      datasource: String,
      outputPath: String,
      parallelism: Int = 10,
      outputPartitions: Int = 60
  ): Unit = {
    if (summaryStatisticsFiles.isEmpty) return
    val threads = math.min(math.max(parallelism, 1), 32)
    import java.util.concurrent.Executors
    import scala.concurrent.duration.Duration
    import scala.concurrent.{Await, ExecutionContext, Future}
    val pool = Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val aligned = summaryStatisticsFiles.map { path =>
        Future {
          val raw = spark.read
            .option("header", "true")
            .option("inferSchema", "true")
            .option("delimiter", "\t")
            .csv(path)
          alignToSchemaSuperset(raw)
            .withColumn(
              "studyId",
              concat_ws(
                "_",
                lit(datasource),
                extractStudyPhenotypeFromPath(input_file_name())))
            .repartitionByRange(outputPartitions, col("#CHR"), col("POS"))
            .sortWithinPartitions("#CHR", "POS")
        }
      }
      Await
        .result(Future.sequence(aligned), Duration.Inf)
        .foreach(
          _.write
            .mode("append")
            .partitionBy("studyId")
            .parquet(outputPath))
    } finally pool.shutdown()
  }

  /** Core column harmonisation of the raw meta-analysis frame
    * (summary_statistics.py:404-470): chromosome normalisation, variant id
    * assembly, inverse-variance meta statistics, presence filters, and the
    * ≥2-biobank meta filter.
    */
  def harmoniseCore(raw: DataFrame, metaAnalysisFilter: Boolean = true): DataFrame = {
    var df = raw
      .withColumn("chromosome", GenomicOps.normalizeChromosome(col("#CHR").cast(StringType)))
      .withColumn("position", col("POS").cast(IntegerType))
      .withColumn("neglogpval", col("all_inv_var_meta_mlogp").cast("double"))
      .withColumn("beta", col("all_inv_var_meta_beta").cast("double"))
      .withColumn("standardError", col("all_inv_var_meta_sebeta").cast("double"))
      .withColumn(
        "variantId",
        concat_ws("_", col("chromosome"), col("position"), col("REF"), col("ALT")))
      .filter(col("neglogpval").isNotNull)
      .filter(col("beta").isNotNull)
      .filter(col("standardError").isNotNull)
    if (metaAnalysisFilter) {
      // scalar codegen twin of isMetaAnalyzedVariant(cohorts()) — the array
      // form is only needed when the cohorts column itself is an output
      df = df.filter(metaAnalyzedPredicate())
    }
    df
  }

  // ---------------------------------------------------------------------
  // Study index (reference: datasource/finngen_meta/__init__.py:21-480 +
  // finngen_meta/study_index.py:20-95)
  // ---------------------------------------------------------------------

  /** Meta-analysis data sources (finngen_meta/__init__.py:21-25). */
  val FinnGenUkbbMeta = "FINNGEN_R12_UKB_META"
  val FinnGenUkbbMvpMeta = "FINNGEN_R12_UKB_MVP_META"

  val finngenAncestryCols: Seq[String] = Seq("fg_n_cases", "fg_n_controls")
  val ukbbAncestryCols: Seq[String] = Seq("ukbb_n_cases", "ukbb_n_controls")
  val mvpAncestryCols: Seq[String] = Seq(
    "MVP_AFR_n_cases", "MVP_AFR_n_controls", "MVP_EUR_n_cases",
    "MVP_EUR_n_controls", "MVP_AMR_n_cases", "MVP_AMR_n_controls")

  /** Columns every manifest flavour must carry (__init__.py:40-47). */
  val requiredManifestColumns: Seq[String] =
    Seq("fg_phenotype", "name") ++ finngenAncestryCols ++ ukbbAncestryCols

  val sumstatLocationColumn = "path_bucket"

  /** Null-tolerant integer sum: each operand coalesces to 0
    * (__init__.py:200-224 `_add` doctest: (1,2,3)→6, (1,2,null)→3).
    */
  private def addInts(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0))).reduce(_ + _).cast(IntegerType)

  /** Ancestry count columns for a data source (__init__.py:226-253). */
  def ancestryColumns(meta: String): Seq[String] = meta match {
    case FinnGenUkbbMeta => finngenAncestryCols ++ ukbbAncestryCols
    case FinnGenUkbbMvpMeta =>
      finngenAncestryCols ++ ukbbAncestryCols ++ mvpAncestryCols
    case other => throw new IllegalArgumentException(
      s"Unsupported meta-analysis data source: $other")
  }

  /** Per-cohort ancestry cocktail, keeping cohorts with >0 samples
    * (__init__.py:273-367). UKBB-only metas label the two cohorts with LD
    * codes (`fin`/`nfe`), the MVP meta with GWAS ancestry labels — exactly
    * the reference's (inconsistent but load-bearing) behaviour.
    */
  def discoverySamples(meta: String): Column = {
    def entry(label: String, cols: Seq[String]) = struct(
      addInts(cols.map(col)).as("sampleSize"), lit(label).as("ancestry"))
    val arr = meta match {
      case FinnGenUkbbMeta =>
        array(entry("fin", finngenAncestryCols), entry("nfe", ukbbAncestryCols))
      case FinnGenUkbbMvpMeta =>
        array(
          entry("Finnish", finngenAncestryCols),
          entry(
            "European",
            ukbbAncestryCols ++ Seq("MVP_EUR_n_cases", "MVP_EUR_n_controls")),
          entry("African", Seq("MVP_AFR_n_cases", "MVP_AFR_n_controls")),
          entry("Admixed American", Seq("MVP_AMR_n_cases", "MVP_AMR_n_controls")))
      case other => throw new IllegalArgumentException(
        s"Unsupported meta-analysis data source: $other")
    }
    filter(arr, x => x.getField("sampleSize") > lit(0.0))
  }

  /** Per-cohort case/sample arrays (__init__.py:425-480). */
  private def perCohort(meta: String, suffix: String, outField: String): Column = {
    def entry(cohort: String, cols: Seq[String]) = struct(
      lit(cohort).as("cohort"), addInts(cols.map(col)).as(outField))
    val base = Seq(
      entry("FinnGen", Seq(s"fg_$suffix") ++
        (if (outField == "nSamples") Seq("fg_n_controls") else Nil)),
      entry("UKBB", Seq(s"ukbb_$suffix") ++
        (if (outField == "nSamples") Seq("ukbb_n_controls") else Nil)))
    val mvp =
      if (meta == FinnGenUkbbMvpMeta)
        Seq("MVP_EUR", "MVP_AFR", "MVP_AMR").map(c =>
          entry(c, Seq(s"${c}_$suffix") ++
            (if (outField == "nSamples") Seq(s"${c}_n_controls") else Nil)))
      else Nil
    array((base ++ mvp): _*)
  }

  /** Enforce the manifest contract on a raw (all-string) manifest frame:
    * required columns asserted, case/control counts cast to int, the rest
    * to string, a null `path_bucket` added when missing; the data source is
    * detected from MVP column presence (__init__.py:112-182
    * `from_path`).
    */
  def manifestContract(raw: DataFrame): (DataFrame, String) = {
    val present = raw.columns.toSet
    val missing = requiredManifestColumns.filterNot(present.contains)
    require(
      missing.isEmpty,
      s"Manifest file must contain the following columns: $requiredManifestColumns " +
        s"(missing: ${missing.mkString(", ")})")
    val meta =
      if (mvpAncestryCols.forall(present.contains)) FinnGenUkbbMvpMeta
      else FinnGenUkbbMeta
    // try_cast: the reference (non-ANSI) nulls malformed counts; a plain
    // ANSI cast would throw CAST_INVALID_INPUT on a stray string
    val cols = ancestryColumns(meta)
      .map(c => expr(s"try_cast(`$c` AS INT)").as(c)) ++
      Seq(col("fg_phenotype").cast(StringType).as("fg_phenotype"),
        col("name").cast(StringType).as("name")) :+
      (if (present.contains(sumstatLocationColumn))
        col(sumstatLocationColumn).cast(StringType).as(sumstatLocationColumn)
      else lit(null).cast(StringType).as(sumstatLocationColumn))
    (raw.select(cols: _*), meta)
  }

  /** Header TSV read + contract (__init__.py:112-145). */
  def readManifest(spark: SparkSession, path: String): (DataFrame, String) =
    manifestContract(
      spark.read.option("header", "true").option("sep", "\t").csv(path))

  /** Contracted manifest → the documented manifest shape
    * (__init__.py:70-110 `df` property).
    */
  def shapeManifest(contracted: DataFrame, meta: String): DataFrame = {
    val caseCols = ancestryColumns(meta).filter(_.contains("n_cases"))
    val controlCols = ancestryColumns(meta).filter(_.contains("n_controls"))
    contracted.select(
      concat_ws("_", lit(meta), col("fg_phenotype")).as("studyId"),
      lit(meta).as("projectId"),
      col("name").as("traitFromSource"),
      discoverySamples(meta).as("discoverySamples"),
      addInts(ancestryColumns(meta).map(col)).as("nSamples"),
      perCohort(meta, "n_cases", "nSamples").as("nSamplesPerCohort"),
      addInts(caseCols.map(col)).as("nCases"),
      perCohort(meta, "n_cases", "nCases").as("nCasesPerCohort"),
      addInts(controlCols.map(col)).as("nControls"),
      col(sumstatLocationColumn).as("summarystatsLocation"),
      lit(true).as("hasSumstats"))
  }

  /** Per-data-source constant columns (study_index.py:20-45
    * `get_constants`): published initial sample size, cohort list,
    * publication date.
    */
  def metaConstants(meta: String): Seq[Column] = meta match {
    case FinnGenUkbbMeta => Seq(
      lit("920,880 (FinnGenR12: nNFE=500,349; pan-UKBB-EUR: nEUR=420,531)")
        .as("initialSampleSize"),
      array(lit("FinnGen"), lit("pan-UKBB-EUR")).as("cohorts"),
      lit("2024-11-01").as("publicationDate"))
    case FinnGenUkbbMvpMeta => Seq(
      lit("1,550,147 (MVP: nEUR=449,042, nAFR=121,177, nAMR=59,048; " +
        "FinnGenR12: nNFE=500,349; pan-UKBB-EUR: nEUR=420,531)")
        .as("initialSampleSize"),
      array(lit("MVP"), lit("FinnGen"), lit("pan-UKBB-EUR")).as("cohorts"),
      lit("2024-11-01").as("publicationDate"))
    case other => throw new IllegalArgumentException(
      s"Unsupported meta-analysis data source: $other")
  }

  /** Shaped manifest → StudyIndex rows with constants, LD population
    * structure and EFO mappings (study_index.py:46-95
    * `from_finngen_manifest`). The EFO mapping table is curated/bounded
    * (broadcast inside annotateStudyIndexWithEfo); the result is a
    * dimension table, coalesced like the reference ships it.
    */
  def studyIndexFromManifest(
      shaped: DataFrame,
      meta: String,
      efoMapping: DataFrame,
      finngenRelease: String = "R12"): DataFrame = {
    val base = shaped.select(
      (Seq(
        col("studyId"),
        col("projectId"),
        lit("gwas").as("studyType"),
        col("traitFromSource"),
        col("hasSumstats"),
        col("summarystatsLocation"),
        col("discoverySamples"),
        col("nSamples"),
        col("nCases"),
        col("nControls")) ++
        metaConstants(meta) :+
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples"))
          .as("ldPopulationStructure")): _*)
    FinnGen.annotateStudyIndexWithEfo(base, efoMapping, finngenRelease).coalesce(1)
  }
}
