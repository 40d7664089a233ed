package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.ArrayOps

/** deCODE proteomics ingestion: summary-statistics helpers, the S3
  * bucket-listing manifest, SomaScan aptamer metadata and the pQTL study
  * index assembly (reference: datasource/decode/summary_statistics.py:146-210,
  * manifest.py:19-170, aptamer_metadata.py:20-127, study_index.py:60-530).
  */
object Decode {

  // Project identifiers (datasource/decode/__init__.py:25-36)
  val ProteomicsRaw = "deCODE-proteomics-raw"
  val ProteomicsSmp = "deCODE-proteomics-smp"

  /** Bibliographic constants for the deCODE proteomics publication
    * (datasource/decode/__init__.py:38-66).
    */
  object PublicationMetadata {
    val PubmedId = "37794188"
    val PubTitle =
      "Large-scale plasma proteomics comparisons through genetics and disease associations"
    val PubFirstAuthor = "Eldjarn GH, Ferkingstad E"
    val PubDate = "2023"
    val PubJournal = "Nature"
    val SmpSampleSize = 35892
    val SampleSize = 36136
    val Ancestry = "Icelandic"
    val Cohorts = "deCODE"
    val BiosampleId = "UBERON_0001969"
  }

  /** Study id from the raw file name: `<project>_Proteomics_...`. */
  def studyIdFromFile(projectId: Column, fileName: Column): Column =
    concat_ws("_", projectId, regexp_extract(fileName, "^.*/(Proteomics_.*)\\.txt\\.gz$", 1))

  /** Infer the effect allele frequency by comparing the imputed minor allele
    * frequency with the gnomAD European frequency: pick whichever of impMAF /
    * 1−impMAF the European AF is closer to; null EUR_AF falls back to impMAF
    * (doctest: (0.01, 0.02)→0.01, (0.01, 0.6)→0.99, (0.01, null)→0.01).
    */
  def inferAlleleFrequency(impMaf: Column, eurAf: Column): Column =
    when(eurAf.isNull, impMaf)
      .when(abs(eurAf - impMaf) <= abs(eurAf - (lit(1.0) - impMaf)), impMaf)
      .otherwise(lit(1.0) - impMaf)

  /** `aws s3 ls` bucket listing (columns date, time, size, unit,
    * relativePath) → manifest rows with project id, study id, location and
    * accession timestamp (manifest.py:83-170 from_bucket_listing). Pure
    * projection — the listing is ~5k rows, nothing shuffles.
    */
  def manifestFromBucketListing(listing: DataFrame, bucketName: String): DataFrame = {
    val projectId = when(
      col("relativePath").contains("Proteomics_SMP_"), lit(ProteomicsSmp))
      .otherwise(lit(ProteomicsRaw))
    listing.select(
      projectId.as("projectId"),
      concat_ws(
        "_",
        projectId,
        regexp_extract(col("relativePath"), "^.*/(Proteomics_.*)\\.txt.gz$", 1))
        .as("studyId"),
      lit(true).as("hasSumstats"),
      concat(lit("s3a://"), lit(bucketName), lit("/"), col("relativePath"))
        .as("summarystatsLocation"),
      concat_ws(" ", col("size"), col("unit")).as("size"),
      to_timestamp(
        concat_ws(" ", col("date"), col("time")), "yyyy-MM-dd HH:mm:ss")
        .as("accessionTimestamp"))
  }

  /** SomaScan aptamer study table → aptamer/protein-target mapping:
    * normalised aptamer ids, comma-separated genes/proteins zipped into a
    * target-metadata struct array, protein complexes flagged
    * (aptamer_metadata.py:65-127 from_source/_transform_source).
    */
  def aptamerMetadata(raw: DataFrame): DataFrame =
    raw
      .select(
        regexp_replace(trim(col("seqid")), "SeqId.", "").as("aptamerId"),
        trim(col("target_name")).as("targetName"),
        trim(col("target_full_name")).as("targetFullName"),
        ArrayOps.safeSplit(trim(col("gene_name")), ",").as("geneSymbol"),
        ArrayOps.safeSplit(trim(col("uniprot")), ",").as("proteinId"))
      .withColumn("targetMetadata", arrays_zip(col("geneSymbol"), col("proteinId")))
      .withColumn("isProteinComplex", size(col("targetMetadata")) > 1)
      .select(
        "aptamerId", "targetName", "targetFullName", "isProteinComplex",
        "targetMetadata")
      .distinct()

  // Study-id structure: {projectId}_Proteomics_{SMP_PC0|PC0}_{d_d}_{gene}_{protein}_{n}
  // (study_index.py:88-102 get_pattern)
  private val StudyIdPattern =
    "^([\\w\\-_]+?)_(Proteomics_(SMP_PC0|PC0))_(\\d+_\\d+)_([A-Za-z0-9]+)_(\\w+)_\\d+$"

  /** Extracted study-id parts (study_index.py:106-158): project id,
    * datasource type, hyphen-normalised aptamer id, gene symbol (NA → null)
    * and protein name (Deprecated/No_Protein → null).
    */
  def studyIdProjectId(studyId: Column): Column =
    regexp_extract(studyId, StudyIdPattern, 1)
  def studyIdDatasourceType(studyId: Column): Column =
    regexp_extract(studyId, StudyIdPattern, 2)
  def studyIdAptamerId(studyId: Column): Column =
    regexp_replace(regexp_extract(studyId, StudyIdPattern, 4), "_", "-")
  def studyIdGeneSymbol(studyId: Column): Column = {
    val g = regexp_extract(studyId, StudyIdPattern, 5)
    when(g === "NA", lit(null).cast(StringType)).otherwise(g)
  }
  def studyIdProteinName(studyId: Column): Column = {
    val p = regexp_extract(studyId, StudyIdPattern, 6)
    when(p === "Deprecated" || p === "No_Protein", lit(null).cast(StringType))
      .otherwise(p)
  }
  def studyIdTrait(studyId: Column): Column =
    concat_ws(
      "_",
      studyIdDatasourceType(studyId),
      studyIdAptamerId(studyId),
      studyIdGeneSymbol(studyId),
      studyIdProteinName(studyId))

  /** pQTL study index from manifest + aptamer metadata + protein complexes
    * (study_index.py:265-437 from_manifest): parse study-id parts, drop
    * assays without curated gene/protein, inner-join the aptamer table
    * (trait metadata authority), left-join molecular complexes on the
    * sorted protein-id key, attach publication constants and the Icelandic
    * LD structure.
    *
    * Both joined tables are bounded (SomaScan has ~5k aptamers, ComplexTab
    * ~4k complexes) and broadcast against the manifest.
    */
  def studyIndexFromManifest(
      manifest: DataFrame,
      aptamerMetadata: DataFrame,
      molecularComplex: DataFrame
  ): DataFrame = {
    val sid = col("studyId")
    val parsed = manifest
      .select(
        col("projectId"), col("studyId"), col("hasSumstats"),
        col("summarystatsLocation"),
        studyIdTrait(sid).as("traitFromSource"),
        studyIdAptamerId(sid).as("aptamerId"),
        studyIdDatasourceType(sid).as("datasourceType"),
        studyIdGeneSymbol(sid).as("geneSymbolFromStudyId"),
        studyIdProteinName(sid).as("proteinNameFromSource"))
      .filter(col("geneSymbolFromStudyId").isNotNull)
      .filter(col("proteinNameFromSource").isNotNull)
      .drop("proteinNameFromSource")
    val aptamers = broadcast(
      aptamerMetadata.select(col("aptamerId"), col("targetMetadata")))
    val withTargets = parsed
      .join(aptamers, Seq("aptamerId"), "inner")
      .withColumn(
        "proteinIds",
        concat_ws(
          ",",
          array_sort(
            array_distinct(
              transform(col("targetMetadata"), x => x.getField("proteinId"))))))
    val complexes = broadcast(
      molecularComplex.select(
        col("id").as("molecularComplexId"),
        concat_ws(
          ",",
          array_sort(
            array_distinct(
              transform(col("components"), x => x.getField("id")))))
          .as("proteinIds")))
    val pub = PublicationMetadata
    val discoverySamples = when(
      col("projectId") === ProteomicsRaw,
      array(struct(
        lit(pub.SampleSize).as("sampleSize"), lit(pub.Ancestry).as("ancestry"))))
      .when(
        col("projectId") === ProteomicsSmp,
        array(struct(
          lit(pub.SmpSampleSize).as("sampleSize"),
          lit(pub.Ancestry).as("ancestry"))))
    withTargets
      .join(complexes, Seq("proteinIds"), "left")
      .drop("proteinIds")
      .withColumn("geneId", lit(null).cast(StringType))
      .withColumn(
        "targetsFromSource",
        transform(
          col("targetMetadata"),
          x =>
            x.withField("geneId", lit(null).cast(StringType))
              .withField("proteinName", lit(null).cast(StringType))))
      .withColumn("studyType", lit("pqtl"))
      .withColumn("biosampleFromSourceId", lit(pub.BiosampleId))
      .withColumn("pubmedId", lit(pub.PubmedId))
      .withColumn("publicationFirstAuthor", lit(pub.PubFirstAuthor))
      .withColumn("publicationDate", lit(pub.PubDate))
      .withColumn("publicationJournal", lit(pub.PubJournal))
      .withColumn("publicationTitle", lit(pub.PubTitle))
      .withColumn(
        "initialSampleSize",
        when(
          col("projectId") === ProteomicsRaw,
          lit(f"${pub.SampleSize}%,d Icelandic individuals"))
          .when(
            col("projectId") === ProteomicsSmp,
            lit(f"${pub.SmpSampleSize}%,d Icelandic individuals")))
      .withColumn(
        "nSamples",
        when(col("projectId") === ProteomicsRaw, lit(pub.SampleSize))
          .when(col("projectId") === ProteomicsSmp, lit(pub.SmpSampleSize)))
      .withColumn("discoverySamples", discoverySamples)
      .withColumn(
        "ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))
      .withColumn("cohorts", array(lit(pub.Cohorts)))
      .withColumn("qualityControls", lit(null).cast("array<string>"))
      .select(
        "studyId", "geneId", "projectId", "studyType", "traitFromSource",
        "biosampleFromSourceId", "pubmedId", "publicationTitle",
        "publicationFirstAuthor", "publicationDate", "publicationJournal",
        "initialSampleSize", "nSamples", "cohorts", "ldPopulationStructure",
        "discoverySamples", "qualityControls", "summarystatsLocation",
        "hasSumstats", "targetsFromSource", "molecularComplexId")
  }

  /** Rebuild a study id from curated target metadata
    * (study_index.py:437-530 update_study_id): gene symbols and protein ids
    * comma-joined, missing values placeheld with `_NA`.
    */
  def updateStudyId(studyId: Column, targets: Column): Column =
    concat_ws(
      "_",
      studyIdProjectId(studyId),
      studyIdDatasourceType(studyId),
      studyIdAptamerId(studyId),
      concat_ws(
        ",",
        transform(targets, x => coalesce(x.getField("geneSymbol"), lit("_NA")))),
      concat_ws(
        ",",
        transform(targets, x => coalesce(x.getField("proteinId"), lit("_NA")))))
}
