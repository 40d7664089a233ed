package graft.harness

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.harness.Tables._
import graft.sources.{FinnGen, GwasCatalog, GwasCatalogStudyIndex, GwasCatalogStudySplitter}

/** Study-side ingestion queries: GWAS-Catalog study index (ancestry parsing,
  * sample-size extraction), multi-trait study splitting, OT curation
  * annotation, the FinnGen study index and the GWAS-Catalog harmonised
  * summary-statistics preprocess.
  *
  * Struct-array outputs are serialized to sorted '|'-joined strings at the
  * query boundary (the driver's oracle harness cannot sort rows with array
  * cells); every oracle mirrors the same serialization.
  */
object StudyQueries {

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

  /** GWAS-Catalog study-index ingestion end-to-end
    * (sources/GwasCatalogStudyIndex.scala fromSource; reference
    * datasource/gwas_catalog/study_index.py:36-136, 232-289, 475-639):
    * study-table harmonisation, ancestry parsing with even sample-size
    * splitting across comma-separated labels (parenthesis-aware), LD
    * population mapping, and discovery sample-size extraction from the
    * free-text initial-sample-size field.
    */
  def gcatStudyIndex(s: SparkSession, d: String): DataFrame = {
    val g = col("c_custkey") % 400
    val nc = (g % 50) * 100 + 1000
    val nctl = (g % 30) * 100 + 500
    val studies = customer(s, d).select(
      concat(lit("GCST"), g.cast(StringType)).as("STUDY ACCESSION"),
      concat(lit("PM"), (g % 97).cast(StringType)).as("PUBMED ID"),
      concat(lit("Author"), (g % 13).cast(StringType)).as("FIRST AUTHOR"),
      lit("2021-01-01").as("DATE"),
      lit("J Hum Genet").as("JOURNAL"),
      concat(lit("Title "), g.cast(StringType)).as("STUDY"),
      when(g % 11 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("trait "), (g % 23).cast(StringType)))
        .as("DISEASE/TRAIT"),
      when(g % 17 === 0, lit(null).cast(StringType))
        .otherwise(
          concat(
            format_number(nc, 0), lit(" European cases, "),
            format_number(nctl, 0), lit(" European controls")))
        .as("INITIAL SAMPLE SIZE"),
      concat(
        lit("http://www.ebi.ac.uk/efo/EFO_"), (g % 120).cast(StringType),
        lit(",http://purl.obolibrary.org/obo/MONDO_"), (g % 80).cast(StringType))
        .as("MAPPED_TRAIT_URI"),
      when(g % 3 === 0, lit(null).cast(StringType))
        .otherwise(
          concat(lit("http://purl.obolibrary.org/obo/HP_"), (g % 60).cast(StringType)))
        .as("MAPPED BACKGROUND TRAIT URI"),
      when(g % 5 === 0, lit(null).cast(StringType))
        .when(g % 5 === 1, lit(""))
        .otherwise(lit("UKB|GERA|GERA|BioME")).as("COHORT")
    ).distinct()
    val o = col("o_orderkey")
    val m = o % 6
    val ancestryLut = orders(s, d).select(
      concat(lit("GCST"), (o % 400).cast(StringType)).as("STUDY ACCESSION"),
      when(o % 3 === 0, lit("replication")).otherwise(lit("initial")).as("STAGE"),
      when(m === 0, "European").when(m === 1, "African")
        .when(m === 2, "European, African")
        .when(m === 3, "East Asian, South Asian")
        .when(m === 4, "Finnish")
        .otherwise(
          "Greater Middle Eastern (Middle Eastern, North African or Persian)")
        .as("BROAD ANCESTRAL CATEGORY"),
      ((o % 90) * 10 + 15).cast(StringType).as("NUMBER OF INDIVIDUALS")
    ).distinct()
    GwasCatalogStudyIndex
      .fromSource(studies, ancestryLut)
      .select(
        col("studyId"), col("pubmedId"), col("publicationFirstAuthor"),
        col("traitFromSource"),
        array_join(array_sort(col("traitFromSourceMappedIds")), "|")
          .as("traitEfos"),
        array_join(array_sort(col("backgroundTraitFromSourceMappedIds")), "|")
          .as("backgroundEfos"),
        array_join(array_sort(col("cohorts")), "|").as("cohorts"),
        col("nCases"), col("nControls"), col("nSamples"),
        serializeSamples(col("discoverySamples")).as("discoverySamples"),
        serializeLdPopulations(col("ldPopulationStructure"))
          .as("ldPopulationStructure"),
        serializeSamples(col("replicationSamples")).as("replicationSamples"))
  }

  /** Multi-trait study splitting + association re-keying
    * (sources/GwasCatalogStudyIndex.scala GwasCatalogStudySplitter.split;
    * reference study_splitter.py:20-138, study_index.py:299-341,
    * associations.py:1194-1253): trait/EFO/study-id resolution from the
    * substudy description, study fan-out, ambiguous-association and top-hit
    * flagging.
    */
  def gcatSplit(s: SparkSession, d: String): DataFrame = {
    val sg = col("p_partkey") % 300
    val studies = part(s, d).select(
      concat(lit("GCST"), sg.cast(StringType)).as("studyId"),
      concat(lit("ST"), (sg % 40).cast(StringType)).as("traitFromSource"),
      array(concat(lit("EFO_"), (sg % 50).cast(StringType)))
        .as("traitFromSourceMappedIds")
    ).distinct()
    val o = col("o_orderkey")
    val subDesc = concat(
      lit("AT"), (o % 3).cast(StringType), lit("|"),
      when(o % 3 === 0, "no_pvalue_text")
        .when(o % 3 === 1, "BMI adjusted").otherwise("males"),
      lit("|"),
      concat(
        lit("EFO_"), (o % 5).cast(StringType),
        when(o % 2 === 0, concat(lit("/EFO_"), (o % 7).cast(StringType)))
          .otherwise(lit(""))))
    // `tag` keeps rows distinct while letting (studyId, variantId,
    // subStudyDescription) collide — that collision is what the
    // ambiguous-association flag detects.
    val associations = orders(s, d).select(
      concat(lit("GCST"), (o % 300).cast(StringType)).as("studyId"),
      concat(lit("v"), (o % 90).cast(StringType)).as("variantId"),
      subDesc.as("subStudyDescription"),
      (o % 11).as("tag"),
      array().cast("array<string>").as("qualityControls")
    ).distinct()
    val (updStudies, updAssociations) =
      GwasCatalogStudySplitter.split(studies, associations)
    updAssociations
      .select(
        col("studyId"), col("variantId"), col("studyLocusId"), col("tag"),
        array_join(array_sort(col("qualityControls")), "|")
          .as("qualityControls"))
      .join(
        updStudies.select(
          col("studyId"),
          col("traitFromSource"),
          array_join(col("traitFromSourceMappedIds"), "|").as("efos")),
        Seq("studyId"),
        "left")
  }

  /** OT curation parsing + study-index curation annotation
    * (sources/GwasCatalogStudyIndex.scala parseCurationTable +
    * annotateFromStudyCuration; reference study_index_ot_curation.py:26-52,
    * study_index.py:343-413): pipe-separated flag strings back to arrays,
    * curated study type override, analysis-flag merge and the
    * not-curated quality flag.
    */
  def gcatCuration(s: SparkSession, d: String): DataFrame = {
    val u = col("s_suppkey") % 120
    val studies = supplier(s, d).select(
      concat(lit("GCST"), u.cast(StringType)).as("studyId"),
      lit("gwas").as("studyType")
    ).distinct()
    val n = col("n_nationkey")
    // No qualityControl column on purpose: exercises the missing-column
    // branch of the curation parser.
    val curationRaw = nation(s, d).select(
      concat(lit("GCST"), (n * 5).cast(StringType)).as("studyId"),
      when(n % 3 === 0, lit("eqtl")).otherwise(lit(null).cast(StringType))
        .as("studyType"),
      when(n % 2 === 0, lit("Multivariate analysis|ExWAS"))
        .otherwise(lit(null).cast(StringType)).as("analysisFlag"),
      lit("true").as("isCurated")
    )
    val curation = GwasCatalogStudyIndex.parseCurationTable(curationRaw)
    GwasCatalogStudyIndex
      .annotateFromStudyCuration(studies, Some(curation))
      .select(
        col("studyId"), col("studyType"),
        array_join(array_sort(col("analysisFlags")), "|").as("analysisFlags"),
        array_join(array_sort(col("qualityControls")), "|")
          .as("qualityControls"))
  }

  /** FinnGen study index from the parsed phenotype table
    * (sources/FinnGen.scala studyIndexFromPhenotypes; reference
    * datasource/finngen/study_index.py:69-127): release-prefixed study ids,
    * case/control counts, constant annotations and the Finnish LD
    * population structure.
    */
  def finngenStudies(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey") % 500
    val phenotypes = orders(s, d).select(
      concat(lit("AB"), k.cast(StringType)).as("phenocode"),
      concat(lit("Pheno "), (k % 37).cast(StringType)).as("phenostring"),
      ((k * 7) % 9999).cast(LongType).as("num_cases"),
      ((k * 13) % 99999).cast(LongType).as("num_controls")
    ).distinct()
    FinnGen
      .studyIndexFromPhenotypes(
        phenotypes,
        releasePrefix = "FINNGEN_R11",
        sumstatsUrlPrefix = "https://storage.example.org/finngen/sumstat/",
        sumstatsUrlSuffix = ".gz",
        sampleSize = 500348)
      .select(
        col("studyId"), col("traitFromSource"),
        col("nCases"), col("nControls"), col("nSamples"),
        col("summarystatsLocation"), col("projectId"), col("studyType"),
        col("hasSumstats"), col("initialSampleSize"), col("pubmedId"),
        array_join(col("cohorts"), "|").as("cohorts"),
        serializeLdPopulations(col("ldPopulationStructure"))
          .as("ldPopulationStructure"))
  }

  /** GWAS-Catalog harmonised summary-statistics preprocess
    * (sources/GwasCatalog.scala fromHarmonizedSumstats; reference
    * datasource/gwas_catalog/summary_statistics.py:60-211): hm_-prefixed
    * column dispatch, scientific-notation p-value split, odds-ratio → beta
    * conversion, accession-from-filename, and the position/zero-beta
    * filters.
    */
  def gcatSumstats(s: SparkSession, d: String): DataFrame = {
    val k = col("l_orderkey") * 8 + col("l_linenumber")
    // NO parallel-read spread here: PlanSpec pins this preprocess as a
    // shuffle-free pushed-down projection (the scale property worth more
    // than fixture-core utilisation); the round-18 JIT-limit fix in
    // fromHarmonizedSumstats already took the serial parse 7.4 -> 3.0 s.
    val raw = lineitem(s, d).select(
      (k % 22 + 1).cast(StringType).as("hm_chrom"),
      when(k % 19 === 0, lit(null).cast(StringType))
        .otherwise((k % 5000000).cast(StringType)).as("hm_pos"),
      lit("A").as("hm_other_allele"),
      lit("G").as("hm_effect_allele"),
      concat((k % 9 + 1).cast(StringType), lit("e-"), (k % 30 + 2).cast(StringType))
        .as("p_value"),
      when(k % 7 === 0, lit(null).cast(StringType))
        .otherwise(((k % 21 - 10) / lit(10.0)).cast(StringType)).as("hm_beta"),
      when(k % 7 === 0, ((k % 5 + 1) / lit(2.0)).cast(StringType))
        .otherwise(lit(null).cast(StringType)).as("hm_odds_ratio"),
      ((k % 13 + 1) / lit(100.0)).cast(StringType).as("standard_error"),
      ((k % 100) / lit(100.0)).cast(StringType).as("effect_allele_frequency"),
      (k % 100000).cast(StringType).as("n")
    )
    GwasCatalog
      .fromHarmonizedSumstats(
        raw,
        "ftp://example.org/GCST90086001-GCST90087000/GCST90086758/harmonised/35078996-GCST90086758-EFO_0007937.h.tsv.gz")
      .select(
        col("studyId"), col("variantId"), col("chromosome"), col("position"),
        col("pValueMantissa"), col("pValueExponent"),
        round(col("beta"), 6).as("beta"),
        round(col("standardError"), 6).as("standardError"),
        col("effectAlleleFrequencyFromSource"), col("sampleSize"))
  }

  /** deCODE pQTL study-index assembly (sources/Decode.scala
    * manifestFromBucketListing + aptamerMetadata + studyIndexFromManifest;
    * reference datasource/decode/manifest.py:83-170,
    * aptamer_metadata.py:65-127, study_index.py:60-437): bucket-listing
    * parse, study-id part extraction, NA/Deprecated filtering, aptamer
    * inner join, molecular-complex left join on the sorted protein-id key,
    * publication constants and Icelandic LD structure.
    */
  def decodeStudies(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Decode
    // The real deCODE manifest is a bounded ~5k-line listing file, so the
    // synthetic one is capped too. Dedup on the 5000-bounded integer key
    // FIRST, derive the strings after (guide §8 — decide on the small
    // key, attach the payload once): every listing column is an injective
    // function of k = (p_partkey·3) mod 5000 (the moduli
    // 2/500/97/13/200/17/150 jointly determine k below 5000 by CRT), so
    // distinct-on-k is row-identical to the old distinct over the five
    // derived columns at every SF. The scan now aggregates one small
    // numeric key instead of fusing the concat/when path build into the
    // hash-aggregate update method, the path strings are built once per
    // STUDY (≤5k) instead of once per scan row, and the downstream
    // gene/protein validity filters push through the distinct as
    // arithmetic on k.
    val kd = part(s, d)
      .select(((col("p_partkey") * 3) % 5000).as("_k"))
      .distinct()
    val k = col("_k")
    val inner = when(k % 2 === 0, "SMP_PC0").otherwise(lit("PC0"))
    val apt = concat(lit("1000"), (k % 500).cast(StringType), lit("_"), (k % 97).cast(StringType))
    val gene = when(k % 13 === 0, "NA")
      .otherwise(concat(lit("G"), (k % 200).cast(StringType)))
    val protein = when(k % 17 === 0, "Deprecated")
      .when(k % 17 === 1, "No_Protein")
      .otherwise(concat(lit("P"), (k % 150).cast(StringType)))
    // time/size derive from the same residues as the path, so one manifest
    // row per study id, exactly as the old all-column distinct.
    val listing = kd.select(
      lit("2024-03-01").as("date"),
      lit("12:00:00").as("time"),
      (k % 97).cast(StringType).as("size"),
      lit("KiB").as("unit"),
      concat(
        lit("data/Proteomics_"), inner, lit("_"), apt, lit("_"), gene,
        lit("_"), protein, lit("_3.txt.gz")).as("relativePath")
    )
    val manifest = Decode.manifestFromBucketListing(listing, "decode-bucket")
    // Same key-first dedup for the aptamer table, whose 5-string-column
    // distinct fused an 11.3 KB hash-aggregate update method (over the
    // 8000-byte JIT limit, round-19 sweep). The strings are injective in
    // the 6-int discriminator below — %7 participates only when %5 == 0
    // (both branched columns test the same residue), so the when() keeps
    // tuple-equivalence exact: equal discriminators ⇔ equal string rows.
    val aptDisc = part(s, d).select(
      (col("p_partkey") % 5).as("_m5"),
      when(col("p_partkey") % 5 === 0, col("p_partkey") % 7)
        .otherwise(lit(-1L)).as("_m7"),
      (col("p_partkey") % 40).as("_m40"),
      (col("p_partkey") % 97).as("_m97"),
      (col("p_partkey") % 300).as("_m300"),
      (col("p_partkey") % 500).as("_m500")
    ).distinct()
    val aptamerRaw = aptDisc.select(
      concat(
        lit("SeqId.1000"), col("_m500").cast(StringType), lit("-"),
        col("_m97").cast(StringType)).as("seqid"),
      concat(lit("T"), col("_m300").cast(StringType)).as("target_name"),
      concat(lit("Target "), col("_m300").cast(StringType)).as("target_full_name"),
      when(col("_m5") === 0,
        concat(lit("GA"), col("_m40").cast(StringType), lit(", GB"),
          col("_m7").cast(StringType)))
        .otherwise(concat(lit("GA"), col("_m40").cast(StringType))).as("gene_name"),
      when(col("_m5") === 0,
        concat(lit("U"), col("_m40").cast(StringType), lit(",U"),
          (col("_m40") + 100).cast(StringType)))
        .otherwise(concat(lit("U"), col("_m40").cast(StringType))).as("uniprot")
    )
    val aptamers = Decode.aptamerMetadata(aptamerRaw)
    val n = col("n_nationkey")
    val complexes = nation(s, d).select(
      concat(lit("CPX"), n.cast(StringType)).as("id"),
      array(
        struct(concat(lit("U"), n.cast(StringType)).as("id")),
        struct(concat(lit("U"), (n + 100).cast(StringType)).as("id")))
        .as("components"))
    Decode
      .studyIndexFromManifest(manifest, aptamers, complexes)
      .select(
        col("studyId"), col("projectId"), col("studyType"),
        col("traitFromSource"), col("nSamples"), col("initialSampleSize"),
        col("summarystatsLocation"), col("hasSumstats"),
        col("molecularComplexId"),
        array_join(col("cohorts"), "|").as("cohorts"),
        serializeLdPopulations(col("ldPopulationStructure"))
          .as("ldPopulationStructure"),
        array_join(
          array_sort(
            transform(
              col("targetsFromSource"),
              x => concat_ws(":", x.getField("geneSymbol"), x.getField("proteinId")))),
          "|").as("targets"))
  }

  /** FinnGen EFO curation annotation (sources/FinnGen.scala loadEfoMapping +
    * annotateStudyIndexWithEfo; reference datasource/finngen/
    * efo_mapping.py:14-127): release filter, EFO short-id extraction from
    * the semantic-tag URI, per-study aggregation preserving unmapped
    * studies.
    */
  def finngenEfo(s: SparkSession, d: String): DataFrame = {
    import graft.sources.FinnGen
    val k = col("o_orderkey") % 400
    val studies = orders(s, d).select(
      concat(lit("FINNGEN_R12_AB"), k.cast(StringType)).as("studyId"),
      concat(lit("T"), (k % 60).cast(StringType)).as("traitFromSource")
    ).distinct()
    val pk = col("p_partkey")
    val efoRaw = part(s, d).select(
      when(pk % 3 === 0, "FINNGEN_R12").when(pk % 3 === 1, "FinnGen_r12")
        .otherwise(lit("UKB")).as("STUDY"),
      concat(lit("T"), (pk % 80).cast(StringType)).as("PROPERTY_VALUE"),
      concat(
        lit("http://purl.obolibrary.org/obo/EFO_"), (pk % 90).cast(StringType))
        .as("SEMANTIC_TAG")
    ).distinct()
    FinnGen
      .annotateStudyIndexWithEfo(studies, FinnGen.loadEfoMapping(efoRaw), "R12")
      .select(
        col("studyId"), col("traitFromSource"),
        array_join(array_sort(col("traitFromSourceMappedIds")), "|").as("efos"))
  }

  /** FinnGen SuSiE fine-mapping ingestion (sources/FinnGenFinemapping.scala;
    * reference datasource/finngen/finemapping.py:208-532): position/cs
    * filters, index-selected posterior/logBF/beta from the alpha/lbf/mean
    * column families, LBF-thresholded credible-set summaries (first set in
    * a region always kept), lead-variant window, locus assembly with 95/99%
    * credible-set flags and md5 studyLocusId. The locus array is flattened
    * to (n_tags, n_in95, n_in99) counts at the query boundary.
    */
  def finngenFinemap(s: SparkSession, d: String): DataFrame = {
    import graft.sources.FinnGenFinemapping
    val k = col("p_partkey")
    val g = k % 60
    val csix = (k % 3 + 1).cast(IntegerType)
    val region = concat(
      lit("chr"), (g % 4 + 1).cast(StringType), lit(":"),
      (g * 1000).cast(StringType), lit("-"), (g * 1000 + 999).cast(StringType))
    val posStr = when(k % 29 === 0, lit("NA")).otherwise((k + 100000).cast(StringType))
    val csStr = when(k % 7 === 0, lit("-1")).otherwise(csix.cast(StringType))
    // p-value strings exercise both split branches: scientific and plain
    // (plain digits 2-9 only, keeping floor(log10) far from the power-of-ten
    // boundary where C and JVM libm could legitimately differ by 1 ulp)
    val pStr = when(
      k % 2 === 0,
      concat((k % 9 + 1).cast(StringType), lit("."), (k % 10).cast(StringType),
        lit("E-"), (k % 30 + 4).cast(StringType)))
      .otherwise(concat(lit("0.00"), (k % 8 + 2).cast(StringType)))
    val alphaCols = (1 to 10).map(i =>
      (((k * 37 + i) % 7919) / lit(7919.0)).as(s"alpha$i"))
    val lbfCols = (1 to 10).map(i =>
      (((k * 11 + i * 3) % 50) / lit(10.0) - 1.0).as(s"lbf_variable$i"))
    val meanCols = (1 to 10).map(i =>
      concat(lit("0."), lpad(((k * 7 + i * 13) % 90 + 10).cast(StringType), 2, "0"))
        .as(s"mean$i"))
    val snps = part(s, d).select(Seq(
      concat(lit("T"), (g % 13).cast(StringType)).as("trait"),
      region.as("region"),
      concat((g % 4 + 1).cast(StringType), lit(":"), posStr, lit(":A:G")).as("v"),
      concat(lit("chr"), (g % 4 + 1).cast(StringType)).as("chromosome"),
      posStr.as("position"),
      lit("A").as("allele1"), lit("G").as("allele2"),
      concat(lit("0."), lpad((k % 50).cast(StringType), 2, "0")).as("maf"),
      concat(lit("0.0"), (k % 9 + 1).cast(StringType)).as("se"),
      pStr.as("p"),
      csStr.as("cs")) ++ alphaCols ++ lbfCols ++ meanCols: _*)
    val gg = col("g")
    val summaries = part(s, d).select((k % 60).as("g")).distinct()
      .select(gg, explode(array(lit(1), lit(2), lit(3))).as("cs_i"))
      .select(
        concat(lit("T"), (gg % 13).cast(StringType)).as("trait"),
        concat(
          lit("chr"), (gg % 4 + 1).cast(StringType), lit(":"),
          (gg * 1000).cast(StringType), lit("-"),
          (gg * 1000 + 999).cast(StringType)).as("region"),
        col("cs_i").cast(StringType).as("cs"),
        (((gg * 3 + col("cs_i") * 7) % 40) / lit(10.0) - 0.5).as("cs_log10bf"),
        (((gg + col("cs_i")) % 100) / lit(100.0)).as("cs_avg_r2"),
        (((gg * col("cs_i")) % 100) / lit(100.0)).as("cs_min_r2"))
    FinnGenFinemapping.credibleSets(snps, summaries, "FINNGEN_R11").df
      .select(
        col("studyId"), col("region"), col("credibleSetIndex"),
        col("variantId"), col("chromosome"), col("position"),
        col("beta"), col("pValueMantissa"), col("pValueExponent"),
        col("effectAlleleFrequencyFromSource"), col("standardError"),
        col("finemappingMethod"), col("credibleSetlog10BF"),
        col("purityMeanR2"), col("purityMinR2"),
        col("locusStart"), col("locusEnd"), col("studyLocusId"),
        size(col("locus")).as("n_tags"),
        size(filter(col("locus"), t => t.getField("is95CredibleSet")))
          .as("n_in95"),
        size(filter(col("locus"), t => t.getField("is99CredibleSet")))
          .as("n_in99"))
  }

  /** Biosample ontology ingestion (sources/BiosampleOntology.scala
    * fromObograph; reference datasource/biosample_ontologies/utils.py:13-174):
    * OBO-graph JSON shape → nodes/edges explode, URI stripping, is_a/part_of
    * hierarchy, relational transitive closure for ancestors/descendants.
    * The obograph document is assembled from TPC-H rows (single-row nested
    * frame — harness-side only; production input is spark.read.json).
    */
  def biosamples(s: SparkSession, d: String): DataFrame = {
    import graft.sources.BiosampleOntology
    val k = col("o_orderkey") % 600 + 2
    val base = orders(s, d).select(k.as("k")).distinct()
    val nodeRows = base.select(
      struct(
        concat(lit("http://purl.obolibrary.org/obo/N"), col("k").cast(StringType)).as("id"),
        concat(lit("node "), (col("k") % 37).cast(StringType)).as("lbl"),
        struct(
          struct(concat(lit("def "), (col("k") % 11).cast(StringType)).as("val"))
            .as("definition"),
          array(struct(concat(lit("X"), (col("k") % 5).cast(StringType)).as("val")))
            .as("xrefs"),
          array(struct(concat(lit("S"), (col("k") % 7).cast(StringType)).as("val")))
            .as("synonyms")).as("meta")).as("node"))
    def edge(childK: Column, parentK: Column, pred: String) = struct(
      concat(lit("http://purl.obolibrary.org/obo/N"), childK.cast(StringType)).as("sub"),
      lit(pred).as("pred"),
      concat(lit("http://purl.obolibrary.org/obo/N"), parentK.cast(StringType)).as("obj"))
    val isA = base.select(edge(col("k"), (col("k") / lit(2)).cast(LongType), "is_a").as("edge"))
    val partOf = base
      .filter(col("k") % 5 === 0)
      .select(
        edge(
          col("k"), (col("k") / lit(3)).cast(LongType),
          "http://purl.obolibrary.org/obo/BFO_0000050").as("edge"))
    // a non-hierarchy predicate that must be ignored
    val noise = base
      .filter(col("k") % 11 === 0)
      .select(edge(col("k"), col("k") + 1, "comment").as("edge"))
    val nodesArr = nodeRows.agg(collect_list(col("node")).as("nodes"))
    val edgesArr = isA.unionByName(partOf).unionByName(noise)
      .agg(collect_list(col("edge")).as("edges"))
    val raw = nodesArr
      .crossJoin(edgesArr)
      .select(
        array(struct(lit("g1").as("id"), col("nodes"), col("edges"))).as("graphs"))
    BiosampleOntology
      .fromObograph(raw)
      .select(
        col("biosampleId"), col("biosampleName"), col("description"),
        array_join(col("xrefs"), "|").as("xrefs"),
        array_join(col("synonyms"), "|").as("synonyms"),
        array_join(array_sort(col("parents")), "|").as("parents"),
        array_join(array_sort(col("ancestors")), "|").as("ancestors"),
        array_join(array_sort(col("children")), "|").as("children"),
        array_join(array_sort(col("descendants")), "|").as("descendants"))
  }

  /** Complex Portal ComplexTAB ingestion (sources/ComplexPortal.scala
    * fromComplexTab; reference datasource/complex_portal/__init__.py:86-217):
    * experimental + predicted union, human-taxonomy filter, PSI-MI source /
    * ECO evidence / cross-reference / participant-list regex parsing. The
    * oracle reconstructs the expected parse from the same generator
    * arithmetic, so the regexes are checked against ground truth.
    */
  def complexPortal(s: SparkSession, d: String): DataFrame = {
    import graft.sources.ComplexPortal
    def tabShaped(k: Column, idPrefix: String, taxonomy: Column, source: Column) = Seq(
      concat(lit(idPrefix), k.cast(StringType)).as("#Complex ac"),
      concat(lit("complex "), (k % 29).cast(StringType)).as("Recommended name"),
      lit("-").as("Aliases for complex"),
      taxonomy.as("Taxonomy identifier"),
      lit("-").as("Identifiers (and stoichiometry) of molecules in complex"),
      concat(
        lit("ECO:000035"), (k % 7).cast(StringType),
        lit("|pubmed:"), k.cast(StringType), lit("(ECO:0005543)"))
        .as("Evidence Code"),
      lit("-").as("Experimental evidence"),
      lit("-").as("Go Annotations"),
      concat(
        lit("reactome:R-HSA-"), k.cast(StringType), lit("(identity)|wwpdb:1U"),
        (k % 9).cast(StringType), lit("V(subset)")).as("Cross references"),
      when(k % 11 === 0, lit(null).cast(StringType))
        .otherwise(concat(lit("desc "), (k % 13).cast(StringType)))
        .as("Description"),
      concat(lit("prop "), (k % 5).cast(StringType)).as("Complex properties"),
      when(k % 3 === 0, "Homodimer").otherwise(lit("Heterodimer"))
        .as("Complex assembly"),
      lit("-").as("Ligand"),
      lit("-").as("Disease"),
      lit("-").as("Agonist"),
      lit("-").as("Antagonist"),
      lit("-").as("Comment"),
      source.as("Source"),
      concat(
        lit("P"), (k % 150).cast(StringType), lit("(2)|Q"),
        (k % 80).cast(StringType), lit("-1(1)"))
        .as("Expanded participant list")
    )
    val ek = col("p_partkey") % 350
    val experimental = part(s, d).select(
      tabShaped(
        ek, "CPX-",
        when(ek % 10 === 0, lit(10090)).otherwise(lit(9606)),
        lit("psi-mi:\"MI:0469\"(IntAct)")): _*).distinct()
    val pk = col("n_nationkey")
    val predicted = nation(s, d).select(
      tabShaped(
        pk, "CPXP-", lit(9606),
        lit("psi-mi:\"MI:1197\"(complex portal predicted)")): _*).distinct()
    ComplexPortal.fromComplexTab(experimental, predicted).df.select(
      col("id"), col("description"), col("properties"), col("assembly"),
      array_join(
        transform(
          col("components"),
          x =>
            concat_ws(
              ":", x.getField("id"), x.getField("stoichiometry"),
              x.getField("source"))),
        "|").as("components"),
      array_join(col("evidenceCodes"), "|").as("evidenceCodes"),
      array_join(
        transform(
          col("crossReferences"),
          x => concat_ws(":", x.getField("source"), x.getField("id"))),
        "|").as("crossReferences"),
      concat_ws("/", col("source.id"), col("source.source")).as("source"))
  }

  /** pQTL study index → StudyIndex conversion (datasets/Indices.scala
    * PqtlStudyIndex.toStudy; reference dataset/study_index.py:885-936):
    * target explode, symbol-LUT resolution preferring curated gene ids,
    * ambiguity detection over the resolved ids, and the protein-id-LUT
    * fallback for ambiguous symbols (including its join fan-out semantics).
    */
  def pqtlToStudy(s: SparkSession, d: String): DataFrame = {
    import graft.datasets.PqtlStudyIndex
    val k = col("o_orderkey") % 150
    def target(gid: Column, sym: Column, prot: Column) =
      struct(gid.as("geneId"), sym.as("geneSymbol"), prot.as("proteinId"))
    val pqtl = orders(s, d).select(
      concat(lit("ST"), k.cast(StringType)).as("studyId"),
      concat(lit("T"), (k % 31).cast(StringType)).as("traitFromSource"),
      lit(null).cast(StringType).as("geneId"),
      array(
        target(
          when(k % 10 === 0, concat(lit("CUR"), (k % 60).cast(StringType)))
            .otherwise(lit(null).cast(StringType)),
          concat(lit("SYM"), (k % 60).cast(StringType)),
          concat(lit("U"), (k % 45).cast(StringType))),
        target(
          lit(null).cast(StringType),
          concat(lit("SYM"), ((k + 7) % 60).cast(StringType)),
          concat(lit("U"), ((k + 13) % 45).cast(StringType)))
      ).as("targetsFromSource")
    ).distinct()
    val u = col("s_suppkey") % 60
    val symbolLut = supplier(s, d).select(
      concat(lit("SYM"), u.cast(StringType)).as("geneSymbol"),
      concat(lit("ENSG"), u.cast(StringType)).as("geneId")
    ).unionByName(supplier(s, d).filter(u < 10).select(
      concat(lit("SYM"), u.cast(StringType)).as("geneSymbol"),
      concat(lit("ENSGA"), u.cast(StringType)).as("geneId")
    )).distinct()
    val p = col("p_partkey") % 45
    val proteinLut = part(s, d)
      .filter(p % 7 =!= 0)
      .select(
        concat(lit("U"), p.cast(StringType)).as("proteinId"),
        concat(lit("ENSGP"), p.cast(StringType)).as("geneId"))
      .distinct()
    PqtlStudyIndex.toStudy(pqtl, symbolLut, proteinLut)
  }

  /** Target-index LUT family (datasets/Indices.scala TargetIndex
    * symbolsLut/proteinIdLut/tssLut; reference dataset/target_index.py:
    * 63-158): obsolete-symbol explode, PAR dedup keeping the X copy, and the
    * three-way TSS fallback — unioned into one long frame per (geneId, kind).
    */
  def targetLuts(s: SparkSession, d: String): DataFrame = {
    import graft.datasets.TargetIndex
    val k = col("p_partkey") % 500
    // '?' rows exercise the genomic-location TSS fallback
    val strandC = when(k % 11 === 0, "?").when(k % 2 === 0, "+").otherwise(lit("-"))
    val strandG = when(k % 3 === 0, 1).otherwise(lit(-1))
    // PAR pair: proteins UPAR<j> live on gene pairs GX<j> (X) and GY<j> (Y)
    val isParY = k % 41 === 0
    val isParX = k % 41 === 1
    val chrom = when(isParY, "Y").when(isParX, "X")
      .otherwise((k % 22 + 1).cast(StringType))
    val parJ = (k / 41).cast("long").cast(StringType)
    val parJx = ((k - 1) / 41).cast("long").cast(StringType)
    val gid = when(isParY, concat(lit("GY"), parJ))
      .when(isParX, concat(lit("GX"), parJx))
      .otherwise(concat(lit("ENSG"), k.cast(StringType)))
    val protein = when(isParY, concat(lit("UPAR"), parJ))
      .when(isParX, concat(lit("UPAR"), parJx))
      .otherwise(concat(lit("U"), k.cast(StringType)))
    val targets = part(s, d).select(
      gid.as("id"),
      concat(lit("SYM"), k.cast(StringType)).as("approvedSymbol"),
      when(k % 7 === 0, array(struct(concat(lit("OLD"), k.cast(StringType)).as("label"))))
        .otherwise(array().cast("array<struct<label:string>>")).as("obsoleteSymbols"),
      struct(
        chrom.as("chromosome"), strandG.as("strand"),
        (k * 100).cast("long").as("start"), (k * 100 + 50).cast("long").as("end"))
        .as("genomicLocation"),
      when(k % 5 === 0, (k * 1000).cast("long")).otherwise(lit(null).cast("long")).as("tss"),
      array(struct(protein.as("id"), lit("uniprot_swissprot").as("source"))).as("proteinIds"),
      struct(
        chrom.as("chromosome"), strandC.as("strand"),
        (k * 10).cast("long").as("start"), (k * 10 + 5).cast("long").as("end"))
        .as("canonicalTranscript")
    ).distinct()
    val ti = TargetIndex(targets)
    ti.symbolsLut
      .select(
        col("geneId"), lit("symbol").as("kind"), col("geneSymbol").as("value"))
      .unionByName(ti.proteinIdLut().select(
        col("geneId"), lit("protein").as("kind"), col("proteinId").as("value")))
      .unionByName(ti.tssLut.select(
        col("geneId"), lit("tss").as("kind"), col("tss").cast(StringType).as("value")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gcat_study_index" -> (gcatStudyIndex _),
    "q_gcat_split" -> (gcatSplit _),
    "q_gcat_curation" -> (gcatCuration _),
    "q_finngen_studies" -> (finngenStudies _),
    "q_gcat_sumstats" -> (gcatSumstats _),
    "q_decode_studies" -> (decodeStudies _),
    "q_finngen_efo" -> (finngenEfo _),
    "q_finngen_finemap" -> (finngenFinemap _),
    "q_biosamples" -> (biosamples _),
    "q_complex_portal" -> (complexPortal _),
    "q_pqtl_to_study" -> (pqtlToStudy _),
    "q_target_luts" -> (targetLuts _)
  )

  val oracles: Map[String, String] = Map(
    "q_finngen_finemap" ->
      """WITH raw AS (
        |  SELECT p_partkey AS k, p_partkey % 60 AS g, p_partkey % 3 + 1 AS csix
        |  FROM part WHERE p_partkey % 29 <> 0 AND p_partkey % 7 <> 0),
        |snp AS (
        |  SELECT k, g, csix,
        |    'FINNGEN_R11_T' || CAST(g % 13 AS VARCHAR) AS sid,
        |    'chr' || CAST(g % 4 + 1 AS VARCHAR) || ':' || CAST(g*1000 AS VARCHAR)
        |      || '-' || CAST(g*1000+999 AS VARCHAR) AS region,
        |    CAST(g % 4 + 1 AS VARCHAR) || '_' || CAST(k + 100000 AS VARCHAR)
        |      || '_A_G' AS vid,
        |    CAST(g % 4 + 1 AS VARCHAR) AS chromosome,
        |    CAST(k + 100000 AS INTEGER) AS position,
        |    ((k*37 + csix) % 7919) / 7919.0 AS pp,
        |    ((k*11 + csix*3) % 50) / 10.0 - 1.0 AS logbf,
        |    ((k*7 + csix*13) % 90 + 10) / 100.0 AS beta,
        |    CASE WHEN k % 2 = 0
        |      THEN CAST(round(CAST(CAST(k%9+1 AS VARCHAR) || '.'
        |        || CAST(k%10 AS VARCHAR) AS DOUBLE), 3) AS REAL)
        |      ELSE CAST(round(CAST('0.00' || CAST(k%8+2 AS VARCHAR) AS DOUBLE)
        |        / power(10.0, floor(log10(CAST('0.00' || CAST(k%8+2 AS VARCHAR)
        |          AS DOUBLE)))), 3) AS REAL) END AS mant,
        |    CASE WHEN k % 2 = 0 THEN CAST(-(k % 30 + 4) AS INTEGER)
        |      ELSE CAST(floor(log10(CAST('0.00' || CAST(k%8+2 AS VARCHAR)
        |        AS DOUBLE))) AS INTEGER) END AS expo,
        |    CAST('0.0' || CAST(k%9+1 AS VARCHAR) AS DOUBLE) AS se,
        |    CAST('0.' || lpad(CAST(k%50 AS VARCHAR), 2, '0') AS REAL) AS eaf
        |  FROM raw),
        |summ AS (
        |  SELECT g, cs_i,
        |    ((g*3 + cs_i*7) % 40) / 10.0 - 0.5 AS lbf10,
        |    ((g + cs_i) % 100) / 100.0 AS avg_r2,
        |    ((g * cs_i) % 100) / 100.0 AS min_r2
        |  FROM (SELECT DISTINCT p_partkey % 60 AS g FROM part) grp,
        |       (VALUES (1), (2), (3)) c(cs_i)
        |  WHERE ((g*3 + cs_i*7) % 40) / 10.0 - 0.5 > 0.8685889638065036
        |     OR cs_i = 1),
        |j AS (SELECT snp.*, summ.lbf10, summ.avg_r2, summ.min_r2
        |  FROM snp JOIN summ ON snp.g = summ.g AND snp.csix = summ.cs_i),
        |ranked AS (SELECT *,
        |    row_number() OVER (PARTITION BY g, csix ORDER BY pp DESC) AS rn,
        |    coalesce(sum(pp) OVER (PARTITION BY g, csix ORDER BY pp DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumprev
        |  FROM j),
        |agg AS (SELECT g, csix, CAST(count(*) AS INTEGER) AS n_tags,
        |    CAST(sum(CASE WHEN cumprev < 0.95 THEN 1 ELSE 0 END) AS INTEGER)
        |      AS n_in95,
        |    CAST(sum(CASE WHEN cumprev < 0.99 THEN 1 ELSE 0 END) AS INTEGER)
        |      AS n_in99
        |  FROM ranked GROUP BY g, csix)
        |SELECT t.sid AS "studyId", t.region, t.csix AS "credibleSetIndex",
        |  t.vid AS "variantId", t.chromosome, t.position,
        |  t.beta, t.mant AS "pValueMantissa", t.expo AS "pValueExponent",
        |  t.eaf AS "effectAlleleFrequencyFromSource",
        |  t.se AS "standardError",
        |  'SuSiE' AS "finemappingMethod", t.lbf10 AS "credibleSetlog10BF",
        |  t.avg_r2 AS "purityMeanR2", t.min_r2 AS "purityMinR2",
        |  CAST(t.g*1000 AS INTEGER) AS "locusStart",
        |  CAST(t.g*1000+999 AS INTEGER) AS "locusEnd",
        |  md5(t.sid || t.vid || 'SuSiE') AS "studyLocusId",
        |  a.n_tags, a.n_in95, a.n_in99
        |FROM ranked t JOIN agg a ON t.g = a.g AND t.csix = a.csix
        |WHERE t.rn = 1""".stripMargin,
    "q_target_luts" ->
      """WITH k0 AS (SELECT DISTINCT p_partkey % 500 AS k FROM part),
        |t AS (SELECT k,
        |    CASE WHEN k % 41 = 0 THEN 'GY' || CAST(k // 41 AS VARCHAR)
        |         WHEN k % 41 = 1 THEN 'GX' || CAST((k - 1) // 41 AS VARCHAR)
        |         ELSE 'ENSG' || CAST(k AS VARCHAR) END AS gid,
        |    CASE WHEN k % 41 = 0 THEN 'UPAR' || CAST(k // 41 AS VARCHAR)
        |         WHEN k % 41 = 1 THEN 'UPAR' || CAST((k - 1) // 41 AS VARCHAR)
        |         ELSE 'U' || CAST(k AS VARCHAR) END AS prot,
        |    CASE WHEN k % 11 = 0 THEN '?' WHEN k % 2 = 0 THEN '+' ELSE '-' END AS cstrand,
        |    CASE WHEN k % 3 = 0 THEN 1 ELSE -1 END AS gstrand,
        |    CASE WHEN k % 5 = 0 THEN k * 1000 END AS tss
        |  FROM k0)
        |SELECT gid AS "geneId", 'symbol' AS kind,
        |  'SYM' || CAST(k AS VARCHAR) AS value FROM t
        |UNION ALL
        |SELECT gid, 'symbol', 'OLD' || CAST(k AS VARCHAR) FROM t WHERE k % 7 = 0
        |UNION ALL
        |SELECT gid, 'protein', prot FROM t WHERE k % 41 <> 0
        |UNION ALL
        |-- a Y-chromosome PAR copy survives only when its X twin is absent
        |SELECT gid, 'protein', prot FROM t y
        |WHERE k % 41 = 0
        |  AND NOT EXISTS (SELECT 1 FROM t x WHERE x.k = y.k + 1)
        |UNION ALL
        |SELECT gid, 'tss', CAST(coalesce(tss,
        |    CASE WHEN cstrand = '+' THEN k * 10
        |         WHEN cstrand = '-' THEN k * 10 + 5 END,
        |    CASE WHEN gstrand = 1 THEN k * 100 ELSE k * 100 + 50 END)
        |  AS VARCHAR) FROM t""".stripMargin,
    "q_pqtl_to_study" ->
      """WITH o AS (SELECT DISTINCT o_orderkey % 150 AS k FROM orders),
        |ex AS (SELECT 'ST' || CAST(k AS VARCHAR) AS sid,
        |    'T' || CAST(k % 31 AS VARCHAR) AS trait,
        |    CASE WHEN k % 10 = 0 THEN 'CUR' || CAST(k % 60 AS VARCHAR) END AS curated,
        |    'SYM' || CAST(k % 60 AS VARCHAR) AS sym,
        |    'U' || CAST(k % 45 AS VARCHAR) AS prot
        |  FROM o
        |  UNION ALL
        |  SELECT 'ST' || CAST(k AS VARCHAR), 'T' || CAST(k % 31 AS VARCHAR), NULL,
        |    'SYM' || CAST((k + 7) % 60 AS VARCHAR),
        |    'U' || CAST((k + 13) % 45 AS VARCHAR)
        |  FROM o),
        |lut AS (SELECT DISTINCT 'SYM' || CAST(s_suppkey % 60 AS VARCHAR) AS sym,
        |    'ENSG' || CAST(s_suppkey % 60 AS VARCHAR) AS lg FROM supplier
        |  UNION
        |  SELECT DISTINCT 'SYM' || CAST(s_suppkey % 60 AS VARCHAR),
        |    'ENSGA' || CAST(s_suppkey % 60 AS VARCHAR) FROM supplier
        |  WHERE s_suppkey % 60 < 10),
        |plut AS (SELECT DISTINCT 'U' || CAST(p_partkey % 45 AS VARCHAR) AS prot,
        |    'ENSGP' || CAST(p_partkey % 45 AS VARCHAR) AS pg FROM part
        |  WHERE (p_partkey % 45) % 7 <> 0),
        |j AS (SELECT ex.sid, ex.trait, ex.sym, ex.prot,
        |    coalesce(ex.curated, lut.lg) AS gid
        |  FROM ex LEFT JOIN lut ON ex.sym = lut.sym),
        |amb AS (SELECT sym, count(DISTINCT gid) AS ng FROM j GROUP BY sym)
        |SELECT j.sid AS "studyId", j.trait AS "traitFromSource",
        |  j.gid AS "geneId"
        |FROM j JOIN amb ON j.sym = amb.sym WHERE amb.ng <= 1
        |UNION ALL
        |SELECT j.sid, j.trait, plut.pg
        |FROM j JOIN amb ON j.sym = amb.sym
        |LEFT JOIN plut ON j.prot = plut.prot
        |WHERE amb.ng > 1""".stripMargin,
    "q_complex_portal" ->
      """WITH e AS (SELECT DISTINCT p_partkey % 350 AS k FROM part
        |  WHERE (p_partkey % 350) % 10 <> 0),
        |p AS (SELECT DISTINCT n_nationkey AS k FROM nation),
        |u AS (SELECT 'CPX-' || CAST(k AS VARCHAR) AS id, k,
        |    'MI:0469/IntAct' AS src FROM e
        |  UNION ALL
        |  SELECT 'CPXP-' || CAST(k AS VARCHAR), k,
        |    'MI:1197/complex portal predicted' FROM p)
        |SELECT id,
        |  CASE WHEN k % 11 = 0 THEN NULL
        |       ELSE 'desc ' || CAST(k % 13 AS VARCHAR) END AS description,
        |  'prop ' || CAST(k % 5 AS VARCHAR) AS properties,
        |  CASE WHEN k % 3 = 0 THEN 'Homodimer' ELSE 'Heterodimer' END AS assembly,
        |  'P' || CAST(k % 150 AS VARCHAR) || ':2:uniprot|Q'
        |    || CAST(k % 80 AS VARCHAR) || '-1:1:uniprot' AS components,
        |  'ECO:000035' || CAST(k % 7 AS VARCHAR) || '|ECO:0005543'
        |    AS "evidenceCodes",
        |  'reactome:R-HSA-' || CAST(k AS VARCHAR) || '|wwpdb:1U'
        |    || CAST(k % 9 AS VARCHAR) || 'V' AS "crossReferences",
        |  src AS source
        |FROM u""".stripMargin,
    "q_biosamples" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT o_orderkey % 600 + 2 AS k FROM orders),
        |e AS (
        |  SELECT 'N' || CAST(k AS VARCHAR) AS child,
        |         'N' || CAST(k // 2 AS VARCHAR) AS parent FROM n
        |  UNION
        |  SELECT 'N' || CAST(k AS VARCHAR),
        |         'N' || CAST(k // 3 AS VARCHAR) FROM n WHERE k % 5 = 0),
        |closure AS (
        |  SELECT child AS node, parent AS ancestor FROM e
        |  UNION
        |  SELECT c.node, e.parent FROM closure c JOIN e ON c.ancestor = e.child),
        |par AS (SELECT child, string_agg(parent, '|' ORDER BY parent) AS v
        |  FROM e GROUP BY child),
        |chd AS (SELECT parent, string_agg(child, '|' ORDER BY child) AS v
        |  FROM e GROUP BY parent),
        |anc AS (SELECT node, string_agg(ancestor, '|' ORDER BY ancestor) AS v
        |  FROM closure GROUP BY node),
        |des AS (SELECT ancestor, string_agg(node, '|' ORDER BY node) AS v
        |  FROM closure GROUP BY ancestor)
        |SELECT 'N' || CAST(n.k AS VARCHAR) AS "biosampleId",
        |  'node ' || CAST(n.k % 37 AS VARCHAR) AS "biosampleName",
        |  'def ' || CAST(n.k % 11 AS VARCHAR) AS description,
        |  'X' || CAST(n.k % 5 AS VARCHAR) AS xrefs,
        |  'S' || CAST(n.k % 7 AS VARCHAR) AS synonyms,
        |  par.v AS parents, anc.v AS ancestors,
        |  chd.v AS children, des.v AS descendants
        |FROM n
        |LEFT JOIN par ON par.child = 'N' || CAST(n.k AS VARCHAR)
        |LEFT JOIN anc ON anc.node = 'N' || CAST(n.k AS VARCHAR)
        |LEFT JOIN chd ON chd.parent = 'N' || CAST(n.k AS VARCHAR)
        |LEFT JOIN des ON des.ancestor = 'N' || CAST(n.k AS VARCHAR)""".stripMargin,
    "q_decode_studies" ->
      """WITH k0 AS (SELECT (p_partkey * 3) % 5000 AS kk FROM part),
        |b AS (SELECT DISTINCT
        |    CASE WHEN kk % 2 = 0 THEN 'SMP_PC0' ELSE 'PC0' END AS inr,
        |    kk % 500 AS a1,
        |    kk % 97 AS a2,
        |    CASE WHEN kk % 13 = 0 THEN 'NA'
        |         ELSE 'G' || CAST(kk % 200 AS VARCHAR) END AS gene,
        |    CASE WHEN kk % 17 = 0 THEN 'Deprecated'
        |         WHEN kk % 17 = 1 THEN 'No_Protein'
        |         ELSE 'P' || CAST(kk % 150 AS VARCHAR) END AS protein
        |  FROM k0),
        |m AS (SELECT
        |    CASE WHEN inr = 'SMP_PC0' THEN 'deCODE-proteomics-smp'
        |         ELSE 'deCODE-proteomics-raw' END AS pid,
        |    'Proteomics_' || inr AS dstype,
        |    '1000' || CAST(a1 AS VARCHAR) || '-' || CAST(a2 AS VARCHAR) AS aid,
        |    '1000' || CAST(a1 AS VARCHAR) || '_' || CAST(a2 AS VARCHAR) AS aidu,
        |    gene, protein
        |  FROM b WHERE gene <> 'NA' AND protein NOT IN ('Deprecated', 'No_Protein')),
        |apt AS (SELECT DISTINCT
        |    '1000' || CAST(p_partkey % 500 AS VARCHAR) || '-'
        |      || CAST(p_partkey % 97 AS VARCHAR) AS aid,
        |    CASE WHEN p_partkey % 5 = 0 THEN
        |      array_to_string(list_sort([
        |        'GA' || CAST(p_partkey % 40 AS VARCHAR) || ':U' || CAST(p_partkey % 40 AS VARCHAR),
        |        'GB' || CAST(p_partkey % 7 AS VARCHAR) || ':U' || CAST(p_partkey % 40 + 100 AS VARCHAR)]), '|')
        |    ELSE 'GA' || CAST(p_partkey % 40 AS VARCHAR) || ':U' || CAST(p_partkey % 40 AS VARCHAR)
        |    END AS tstr,
        |    CASE WHEN p_partkey % 5 = 0 THEN
        |      array_to_string(list_sort(list_distinct([
        |        'U' || CAST(p_partkey % 40 AS VARCHAR),
        |        'U' || CAST(p_partkey % 40 + 100 AS VARCHAR)])), ',')
        |    ELSE 'U' || CAST(p_partkey % 40 AS VARCHAR) END AS pids
        |  FROM part),
        |cpx AS (SELECT 'CPX' || CAST(n_nationkey AS VARCHAR) AS cid,
        |    array_to_string(list_sort(list_distinct([
        |      'U' || CAST(n_nationkey AS VARCHAR),
        |      'U' || CAST(n_nationkey + 100 AS VARCHAR)])), ',') AS pids
        |  FROM nation)
        |SELECT m.pid || '_' || m.dstype || '_' || m.aidu || '_' || m.gene || '_'
        |    || m.protein || '_3' AS "studyId",
        |  m.pid AS "projectId", 'pqtl' AS "studyType",
        |  m.dstype || '_' || m.aid || '_' || m.gene || '_' || m.protein
        |    AS "traitFromSource",
        |  CASE WHEN m.pid = 'deCODE-proteomics-smp' THEN 35892 ELSE 36136 END
        |    AS "nSamples",
        |  CASE WHEN m.pid = 'deCODE-proteomics-smp'
        |       THEN '35,892 Icelandic individuals'
        |       ELSE '36,136 Icelandic individuals' END AS "initialSampleSize",
        |  's3a://decode-bucket/data/' || m.dstype || '_' || m.aidu || '_' || m.gene
        |    || '_' || m.protein || '_3.txt.gz' AS "summarystatsLocation",
        |  true AS "hasSumstats",
        |  cpx.cid AS "molecularComplexId",
        |  'deCODE' AS cohorts,
        |  'nfe:1.000000' AS "ldPopulationStructure",
        |  apt.tstr AS targets
        |FROM m
        |JOIN apt ON m.aid = apt.aid
        |LEFT JOIN cpx ON apt.pids = cpx.pids""".stripMargin,
    "q_finngen_efo" ->
      """WITH st AS (SELECT DISTINCT o_orderkey % 400 AS k FROM orders),
        |ef AS (SELECT DISTINCT
        |    CASE WHEN p_partkey % 3 = 0 THEN 'FINNGEN_R12'
        |         WHEN p_partkey % 3 = 1 THEN 'FinnGen_r12' ELSE 'UKB' END AS study,
        |    'T' || CAST(p_partkey % 80 AS VARCHAR) AS pv,
        |    'EFO_' || CAST(p_partkey % 90 AS VARCHAR) AS efo
        |  FROM part),
        |fm AS (SELECT pv, efo FROM ef
        |  WHERE upper(study) LIKE '%FINNGEN%' AND upper(study) LIKE '%R12%')
        |SELECT 'FINNGEN_R12_AB' || CAST(k AS VARCHAR) AS "studyId",
        |  'T' || CAST(k % 60 AS VARCHAR) AS "traitFromSource",
        |  coalesce(array_to_string(list_sort(
        |    list(fm.efo) FILTER (fm.efo IS NOT NULL)), '|'), '') AS efos
        |FROM st LEFT JOIN fm ON 'T' || CAST(k % 60 AS VARCHAR) = fm.pv
        |GROUP BY k""".stripMargin,
    "q_gcat_study_index" ->
      """WITH g AS (SELECT DISTINCT c_custkey % 400 AS g FROM customer),
        |st AS (SELECT g, 'GCST' || CAST(g AS VARCHAR) AS sid,
        |    (g % 50) * 100 + 1000 AS nc, (g % 30) * 100 + 500 AS nctl,
        |    g % 17 = 0 AS nosample FROM g),
        |anc AS (SELECT DISTINCT o_orderkey % 400 AS ag,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'replication' ELSE 'initial' END AS stage,
        |    o_orderkey % 6 AS m,
        |    (o_orderkey % 90) * 10 + 15 AS n
        |  FROM orders),
        |lab AS (SELECT ag, stage, n,
        |    CASE m WHEN 0 THEN 'European' WHEN 1 THEN 'African'
        |         WHEN 2 THEN 'European, African'
        |         WHEN 3 THEN 'East Asian, South Asian'
        |         WHEN 4 THEN 'Finnish'
        |         ELSE 'Greater Middle Eastern (Middle Eastern, North African or Persian)'
        |    END AS label,
        |    CASE m WHEN 2 THEN ['European', 'African']
        |         WHEN 3 THEN ['East Asian', 'South Asian']
        |         WHEN 0 THEN ['European'] WHEN 1 THEN ['African']
        |         WHEN 4 THEN ['Finnish']
        |         ELSE ['Greater Middle Eastern (Middle Eastern, North African or Persian)']
        |    END AS pops
        |  FROM anc),
        |expl AS (SELECT ag, n, len(pops) AS kk, unnest(pops) AS pop
        |  FROM lab WHERE stage = 'initial'),
        |disc AS (SELECT ag, pop, SUM(CAST(floor(n / kk) AS INTEGER)) AS tot
        |  FROM expl GROUP BY 1, 2),
        |discs AS (SELECT ag, string_agg(pop || ':' || CAST(tot AS VARCHAR), '|'
        |    ORDER BY pop || ':' || CAST(tot AS VARCHAR)) AS ds
        |  FROM disc GROUP BY 1),
        |ldm AS (SELECT ag,
        |    CASE pop WHEN 'European' THEN 'nfe' WHEN 'African' THEN 'afr'
        |         WHEN 'East Asian' THEN 'eas' WHEN 'South Asian' THEN 'eas'
        |         WHEN 'Finnish' THEN 'fin' ELSE 'eas' END AS ld, tot
        |  FROM disc),
        |ldp AS (SELECT ag, ld, SUM(tot) AS sa FROM ldm GROUP BY 1, 2),
        |ldt AS (SELECT ag, SUM(sa) AS t FROM ldp GROUP BY 1),
        |lds AS (SELECT ldp.ag,
        |    string_agg(ld || ':' || printf('%.6f', sa / t), '|'
        |      ORDER BY ld || ':' || printf('%.6f', sa / t)) AS lp
        |  FROM ldp JOIN ldt ON ldp.ag = ldt.ag GROUP BY 1),
        |reps AS (SELECT ag, string_agg(label || ':' || CAST(n AS VARCHAR), '|'
        |    ORDER BY label || ':' || CAST(n AS VARCHAR)) AS rs
        |  FROM (SELECT DISTINCT ag, label, n FROM lab WHERE stage = 'replication')
        |  GROUP BY 1)
        |SELECT st.sid AS "studyId",
        |  'PM' || CAST(g % 97 AS VARCHAR) AS "pubmedId",
        |  'Author' || CAST(g % 13 AS VARCHAR) AS "publicationFirstAuthor",
        |  CASE WHEN g % 11 = 0 THEN 'Unreported'
        |       ELSE 'trait ' || CAST(g % 23 AS VARCHAR) END AS "traitFromSource",
        |  'EFO_' || CAST(g % 120 AS VARCHAR) || '|MONDO_' || CAST(g % 80 AS VARCHAR)
        |    AS "traitEfos",
        |  CASE WHEN g % 3 = 0 THEN NULL
        |       ELSE 'HP_' || CAST(g % 60 AS VARCHAR) END AS "backgroundEfos",
        |  CASE WHEN g % 5 IN (0, 1) THEN NULL
        |       ELSE 'BioME|GERA|UKB' END AS cohorts,
        |  CASE WHEN nosample THEN 0 ELSE nc END AS "nCases",
        |  CASE WHEN nosample THEN 0 ELSE nctl END AS "nControls",
        |  CASE WHEN nosample THEN NULL ELSE nc + nctl END AS "nSamples",
        |  discs.ds AS "discoverySamples",
        |  lds.lp AS "ldPopulationStructure",
        |  reps.rs AS "replicationSamples"
        |FROM st
        |LEFT JOIN discs ON st.g = discs.ag
        |LEFT JOIN lds ON st.g = lds.ag
        |LEFT JOIN reps ON st.g = reps.ag""".stripMargin,
    "q_gcat_split" ->
      """WITH a AS (SELECT DISTINCT
        |    'GCST' || CAST(o_orderkey % 300 AS VARCHAR) AS sid,
        |    'v' || CAST(o_orderkey % 90 AS VARCHAR) AS vid,
        |    'AT' || CAST(o_orderkey % 3 AS VARCHAR) || '|' ||
        |      CASE o_orderkey % 3 WHEN 0 THEN 'no_pvalue_text'
        |           WHEN 1 THEN 'BMI adjusted' ELSE 'males' END || '|' ||
        |      'EFO_' || CAST(o_orderkey % 5 AS VARCHAR) ||
        |      CASE WHEN o_orderkey % 2 = 0
        |           THEN '/EFO_' || CAST(o_orderkey % 7 AS VARCHAR) ELSE '' END
        |      AS sdesc,
        |    o_orderkey % 11 AS tag
        |  FROM orders),
        |-- resolution only exists for studies present in the study table
        |-- (the splitter composites associations with an INNER study join);
        |-- unresolved associations keep their original study id and get no
        |-- study-side trait annotation
        |st AS (SELECT DISTINCT 'GCST' || CAST(p_partkey % 300 AS VARCHAR) AS sid
        |  FROM part),
        |res0 AS (SELECT DISTINCT a.sid, a.sdesc FROM a JOIN st ON a.sid = st.sid),
        |r AS (SELECT sid, sdesc,
        |    dense_rank() OVER (PARTITION BY sid ORDER BY sdesc) AS dr FROM res0),
        |map AS (SELECT sid, sdesc,
        |    CASE WHEN dr = 1 THEN sid
        |         ELSE sid || '_' || CAST(dr AS VARCHAR) END AS usid,
        |    CASE WHEN string_split(sdesc, '|')[2] <> 'no_pvalue_text'
        |         THEN string_split(sdesc, '|')[1] || ' [' ||
        |              string_split(sdesc, '|')[2] || ']'
        |         ELSE string_split(sdesc, '|')[1] END AS rtrait,
        |    replace(string_split(sdesc, '|')[3], '/', '|') AS refo
        |  FROM r),
        |upd0 AS (SELECT a.vid, a.tag, coalesce(map.usid, a.sid) AS usid
        |  FROM a LEFT JOIN map ON a.sid = map.sid AND a.sdesc = map.sdesc),
        |upd AS (SELECT usid, vid, tag,
        |    count(*) OVER (PARTITION BY usid, vid) AS cnt
        |  FROM upd0),
        |us AS (SELECT DISTINCT usid, rtrait, refo FROM map)
        |SELECT upd.usid AS "studyId", upd.vid AS "variantId",
        |  md5(upd.usid || upd.vid) AS "studyLocusId", upd.tag,
        |  CASE WHEN cnt > 1
        |       THEN 'Association with ambiguous study|Study locus from curated top hit'
        |       ELSE 'Study locus from curated top hit' END AS "qualityControls",
        |  us.rtrait AS "traitFromSource",
        |  us.refo AS efos
        |FROM upd LEFT JOIN us ON upd.usid = us.usid""".stripMargin,
    "q_gcat_curation" ->
      """WITH st AS (SELECT DISTINCT
        |    'GCST' || CAST(s_suppkey % 120 AS VARCHAR) AS sid FROM supplier),
        |cur AS (SELECT 'GCST' || CAST(n_nationkey * 5 AS VARCHAR) AS sid,
        |    CASE WHEN n_nationkey % 3 = 0 THEN 'eqtl' END AS ctype,
        |    CASE WHEN n_nationkey % 2 = 0
        |         THEN 'ExWAS|Multivariate analysis' ELSE '' END AS aflags
        |  FROM nation)
        |SELECT st.sid AS "studyId",
        |  coalesce(cur.ctype, 'gwas') AS "studyType",
        |  coalesce(cur.aflags, '') AS "analysisFlags",
        |  CASE WHEN cur.sid IS NULL
        |       THEN 'GWAS Catalog study has not been curated by Open Targets'
        |       ELSE '' END AS "qualityControls"
        |FROM st LEFT JOIN cur ON st.sid = cur.sid""".stripMargin,
    "q_finngen_studies" ->
      """WITH k AS (SELECT DISTINCT o_orderkey % 500 AS k FROM orders)
        |SELECT 'FINNGEN_R11_AB' || CAST(k AS VARCHAR) AS "studyId",
        |  'Pheno ' || CAST(k % 37 AS VARCHAR) AS "traitFromSource",
        |  CAST((k * 7) % 9999 AS INTEGER) AS "nCases",
        |  CAST((k * 13) % 99999 AS INTEGER) AS "nControls",
        |  CAST((k * 7) % 9999 + (k * 13) % 99999 AS INTEGER) AS "nSamples",
        |  'https://storage.example.org/finngen/sumstat/AB' || CAST(k AS VARCHAR)
        |    || '.gz' AS "summarystatsLocation",
        |  'FINNGEN_R11' AS "projectId",
        |  'gwas' AS "studyType",
        |  true AS "hasSumstats",
        |  '500,348 (282,064 females and 218,284 males)' AS "initialSampleSize",
        |  '36653562' AS "pubmedId",
        |  'FinnGen' AS cohorts,
        |  'fin:1.000000' AS "ldPopulationStructure"
        |FROM k""".stripMargin,
    "q_gcat_sumstats" ->
      """WITH b AS (SELECT l_orderkey * 8 + l_linenumber AS k FROM lineitem),
        |c AS (SELECT k,
        |    CAST(k % 22 + 1 AS VARCHAR) AS chrom,
        |    CASE WHEN k % 19 = 0 THEN NULL ELSE k % 5000000 END AS pos,
        |    CAST(k % 9 + 1 AS REAL) AS pm,
        |    -(k % 30 + 2) AS pe,
        |    CASE WHEN k % 7 = 0 THEN ln((k % 5 + 1) / 2.0)
        |         ELSE (k % 21 - 10) / 10.0 END AS beta,
        |    (k % 13 + 1) / 100.0 AS se,
        |    CAST((k % 100) / 100.0 AS REAL) AS eaf,
        |    CAST(k % 100000 AS INTEGER) AS n
        |  FROM b)
        |SELECT 'GCST90086758' AS "studyId",
        |  chrom || '_' || CAST(pos AS VARCHAR) || '_A_G' AS "variantId",
        |  chrom AS chromosome,
        |  CAST(pos AS INTEGER) AS position,
        |  pm AS "pValueMantissa", CAST(pe AS INTEGER) AS "pValueExponent",
        |  round(beta, 6) AS beta,
        |  round(se, 6) AS "standardError",
        |  eaf AS "effectAlleleFrequencyFromSource",
        |  n AS "sampleSize"
        |FROM c
        |WHERE pos IS NOT NULL AND beta <> 0""".stripMargin
  )
}
