package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.datasets.MolecularComplex

/** Complex Portal protein-complex ingestion: parses the ComplexTAB flat-file
  * export (experimental + predicted complexes) into the `MolecularComplex`
  * dataset used by the deCODE proteomics pipeline to annotate multi-protein
  * SomaScan aptamers (reference: datasource/complex_portal/__init__.py:31-217,
  * dataset/molecular_complex.py:25-58).
  *
  * Pure shuffle-free column work: union → taxonomy filter → regex projections,
  * all inside one whole-stage-codegen span. The ComplexTAB export is a bounded
  * file (~5k complexes), so downstream consumers broadcast it.
  */
object ComplexPortal {

  /** NCBI taxonomy ID for Homo sapiens; non-human complexes are discarded
    * (`__init__.py:44`).
    */
  val HumanTaxonomyId = 9606

  /** Raw Spark schema matching the ComplexTAB TSV column layout
    * (`__init__.py:46-84` get_schema).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("#Complex ac", StringType),
    StructField("Recommended name", StringType),
    StructField("Aliases for complex", StringType),
    StructField("Taxonomy identifier", IntegerType),
    StructField("Identifiers (and stoichiometry) of molecules in complex", StringType),
    StructField("Evidence Code", StringType),
    StructField("Experimental evidence", StringType),
    StructField("Go Annotations", StringType),
    StructField("Cross references", StringType),
    StructField("Description", StringType),
    StructField("Complex properties", StringType),
    StructField("Complex assembly", StringType),
    StructField("Ligand", StringType),
    StructField("Disease", StringType),
    StructField("Agonist", StringType),
    StructField("Antagonist", StringType),
    StructField("Comment", StringType),
    StructField("Source", StringType),
    StructField("Expanded participant list", StringType)
  ))

  /** `psi-mi:"MI:XXXX"(source name)` → struct(id, source)
    * (`__init__.py:139-155`; doctest: `psi-mi:"MI:0469"(IntAct)` →
    * ("MI:0469", "IntAct")). No match → empty strings.
    */
  def parseSource(c: Column): Column = struct(
    regexp_extract(c, "psi-mi:\"(.*)\"\\((.*)\\)", 1).as("id"),
    regexp_extract(c, "psi-mi:\"(.*)\"\\((.*)\\)", 2).as("source"))

  /** Pipe-delimited evidence field → array of ECO accessions
    * (`__init__.py:157-172`; surrounding text like `pubmed:123(ECO:0000353)`
    * is stripped, only the `ECO:\d+` accession is kept).
    */
  def parseEvidenceCodes(c: Column): Column =
    transform(split(c, "\\|"), x => regexp_extract(x, "(ECO:\\d+)", 1))

  /** Pipe-delimited `source:id(description)` list → array of
    * struct(source, id) (`__init__.py:174-192`).
    */
  def parseCrossReferences(c: Column): Column =
    transform(split(c, "\\|"), x => struct(
      regexp_extract(x, "^(.*)\\:(.*)\\(.*\\)$", 1).as("source"),
      regexp_extract(x, "^(.*)\\:(.*)\\(.*\\)$", 2).as("id")))

  /** Pipe-delimited expanded participant list `UniProtID(stoichiometry)` →
    * array of struct(id, stoichiometry, source="uniprot")
    * (`__init__.py:194-217`; hyphenated isoform ids like `P12345-1` parse).
    */
  def parseComponents(c: Column): Column =
    transform(split(c, "\\|"), x => struct(
      regexp_extract(x, "([\\w-]+)\\((\\d+)\\)", 1).as("id"),
      regexp_extract(x, "([\\w-]+)\\((\\d+)\\)", 2).as("stoichiometry"),
      lit("uniprot").as("source")))

  /** Experimental + predicted ComplexTAB frames → schema-validated
    * `MolecularComplex` (`__init__.py:86-136` from_complex_tab): union,
    * human-taxonomy filter, rename/parse into the molecular_complex schema.
    */
  def fromComplexTab(experimental: DataFrame, predicted: DataFrame): MolecularComplex =
    MolecularComplex(
      experimental.unionByName(predicted)
        .filter(col("Taxonomy identifier") === HumanTaxonomyId)
        .select(
          col("#Complex ac").as("id"),
          col("Description").as("description"),
          col("Complex properties").as("properties"),
          col("Complex assembly").as("assembly"),
          parseComponents(col("Expanded participant list")).as("components"),
          parseEvidenceCodes(col("Evidence Code")).as("evidenceCodes"),
          parseCrossReferences(col("Cross references")).as("crossReferences"),
          parseSource(col("Source")).as("source"))
    ).validate()
}
