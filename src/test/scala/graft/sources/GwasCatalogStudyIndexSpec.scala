package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden values come from the reference's own doctests
  * (datasource/gwas_catalog/study_index.py, study_splitter.py,
  * datasource/finngen/study_index.py).
  */
class GwasCatalogStudyIndexSpec extends SparkSpec {

  test("parseDiscoverySamples splits shared counts evenly and sums per label") {
    // study_index.py:52-73 doctest: s1 [("European",10),("African",10)] and
    // s2 [("European, African, Asian",100),("European",50)]
    import spark.implicits._
    val df = Seq(
      ("s1", "European", 10), ("s1", "African", 10),
      ("s2", "European, African, Asian", 100), ("s2", "European", 50)
    ).toDF("studyId", "ancestry", "sampleSize")
      .groupBy("studyId")
      .agg(collect_set(struct(col("ancestry"), col("sampleSize"))).as("ds"))
      .withColumn("parsed", GwasCatalogStudyIndex.parseDiscoverySamples(col("ds")))
      .select(col("studyId"), explode(col("parsed")).as("p"))
      .select(col("studyId"), col("p.ancestry"), col("p.sampleSize"))
    val got = df.as[(String, String, Int)].collect().toSet
    assert(got === Set(
      ("s1", "European", 10), ("s1", "African", 10),
      ("s2", "European", 83), ("s2", "African", 33), ("s2", "Asian", 33)))
  }

  test("parseDiscoverySamples keeps parenthesised labels unsplit") {
    import spark.implicits._
    val gme = "Greater Middle Eastern (Middle Eastern, North African or Persian)"
    val got = Seq(("s1", gme, 40))
      .toDF("studyId", "ancestry", "sampleSize")
      .groupBy("studyId")
      .agg(collect_set(struct(col("ancestry"), col("sampleSize"))).as("ds"))
      .select(explode(GwasCatalogStudyIndex.parseDiscoverySamples(col("ds"))).as("p"))
      .select(col("p.ancestry"), col("p.sampleSize"))
      .as[(String, Int)]
      .collect()
    assert(got.toSeq === Seq((gme, 40)))
  }

  test("parseCohorts dedups pipe-separated labels, null/empty to null") {
    // study_index.py:217-224 doctest
    import spark.implicits._
    val got = Seq(Some("BioME|CaPS|Estonia|FHS|UKB|GERA|GERA|GERA"), None, Some(""))
      .toDF("cohorts")
      .select(GwasCatalogStudyIndex.parseCohorts(col("cohorts")).as("c"))
      .collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[scala.collection.Seq[String]].toList))
    assert(got(0) === Some(List("BioME", "CaPS", "Estonia", "FHS", "UKB", "GERA")))
    assert(got(1).isEmpty)
    assert(got(2).isEmpty)
  }

  test("parseGwasCatalogStudyId takes the last GCST accession in the path") {
    // study_index.py:680-686 doctest
    import spark.implicits._
    val got = Seq(
      Some("./GCST90086001-GCST90087000/GCST90086758/harmonised/35078996-GCST90086758-EFO_0007937.h.tsv.gz"),
      Some("gs://sumstats/harmonised/GCST000568.parquet/"),
      None)
      .toDF("p")
      .select(GwasCatalogStudyIndex.parseGwasCatalogStudyId(col("p")).as("a"))
      .collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("GCST90086758"), Some("GCST000568"), None))
  }

  test("toCamelCase matches the reference's Python capitalize semantics") {
    // common/spark.py:227-251 doctests + the ancestry-file headers
    assert(GwasCatalogStudyIndex.toCamelCase("hello_world") === "helloWorld")
    assert(GwasCatalogStudyIndex.toCamelCase("hello world") === "helloWorld")
    assert(
      GwasCatalogStudyIndex.toCamelCase("BROAD ANCESTRAL CATEGORY")
        === "broadAncestralCategory")
    assert(
      GwasCatalogStudyIndex.toCamelCase("NUMBER OF INDIVIDUALS")
        === "numberOfIndividuals")
  }

  test("filenameToStudyIdentifier extracts the accession or throws") {
    // summary_statistics.py:37-43 doctest
    assert(
      GwasCatalog.filenameToStudyIdentifier(
        "http://ftp.ebi.ac.uk/pub/databases/gwas/summary_statistics/GCST006001-GCST007000/GCST006090/harmonised/29895819-GCST006090-HP_0000975.h.tsv.gz")
        === "GCST006090")
    intercept[IllegalArgumentException] {
      GwasCatalog.filenameToStudyIdentifier("wrong/path")
    }
  }

  test("splitter resolves study ids, traits and EFOs per substudy") {
    // study_splitter.py semantics: single-substudy studies keep their id;
    // multi-substudy studies keep the id for the first (ordered) substudy
    // and suffix later ones with the dense rank.
    import spark.implicits._
    val studies = Seq(
      ("GCST1", "T1", Seq("EFO_9")),
      ("GCST2", "T2", Seq("EFO_8"))
    ).toDF("studyId", "traitFromSource", "traitFromSourceMappedIds")
    val associations = Seq(
      ("GCST1", "1_1_A_T", "height|no_pvalue_text|EFO_1"),
      ("GCST1", "1_2_A_T", "weight|females|EFO_2/EFO_3"),
      ("GCST2", "2_5_C_G", "bmi|no_pvalue_text|EFO_4")
    ).toDF("studyId", "variantId", "subStudyDescription")
      .withColumn("qualityControls", array().cast("array<string>"))
    val (updStudies, updAssociations) =
      GwasCatalogStudySplitter.split(studies, associations)
    val st = updStudies
      .select("studyId", "traitFromSource", "traitFromSourceMappedIds")
      .as[(String, String, Seq[String])]
      .collect()
      .sortBy(_._1)
    assert(st.toSeq === Seq(
      ("GCST1", "height", Seq("EFO_1")),
      ("GCST1_2", "weight [females]", Seq("EFO_2", "EFO_3")),
      ("GCST2", "bmi", Seq("EFO_4"))))
    val assoc = updAssociations
      .select("studyId", "variantId", "qualityControls")
      .as[(String, String, Seq[String])]
      .collect()
      .sortBy(_._2)
    assert(assoc.map(_._1).toSeq === Seq("GCST1", "GCST1_2", "GCST2"))
    // every split association is flagged as a curated top hit
    assert(assoc.forall(_._3.contains("Study locus from curated top hit")))
  }

  test("curation parser and annotation: type override, flags, NO_OT_CURATION") {
    import spark.implicits._
    val studies = Seq(("GCST1", "gwas"), ("GCST2", "gwas"))
      .toDF("studyId", "studyType")
    val curationRaw = Seq(("GCST1", null: String, "Multivariate analysis|GxG", "true"))
      .toDF("studyId", "studyType", "analysisFlag", "isCurated")
    val out = GwasCatalogStudyIndex
      .annotateFromStudyCuration(
        studies,
        Some(GwasCatalogStudyIndex.parseCurationTable(curationRaw)))
      .select("studyId", "studyType", "analysisFlags", "qualityControls")
      .as[(String, String, Seq[String], Seq[String])]
      .collect()
      .sortBy(_._1)
    assert(out(0) === (("GCST1", "gwas", Seq("Multivariate analysis", "GxG"), Seq())))
    assert(out(1) === (("GCST2", "gwas", Seq(),
      Seq("GWAS Catalog study has not been curated by Open Targets"))))
  }

  test("FinnGen study index from a phenotype JSON document") {
    // finngen/study_index.py:69-127: constants, derived counts, Finnish LD.
    val json =
      """[{"phenocode": "AB1", "phenostring": "Amoebiasis", "num_cases": 100, "num_controls": 900},
        | {"phenocode": "AB2", "phenostring": "Other", "num_cases": 50, "num_controls": 150}]"""
        .stripMargin
    val out = FinnGen.studyIndexFromJson(
      spark, json, "FINNGEN_R11", "https://example.org/", ".gz", 500348)
    import spark.implicits._
    val rows = out
      .select(
        col("studyId"), col("traitFromSource"), col("nCases"), col("nControls"),
        col("nSamples"), col("summarystatsLocation"), col("projectId"),
        col("studyType"), col("hasSumstats"), col("pubmedId"))
      .as[(String, String, Int, Int, Int, String, String, String, Boolean, String)]
      .collect()
      .sortBy(_._1)
    assert(rows.head === (("FINNGEN_R11_AB1", "Amoebiasis", 100, 900, 1000,
      "https://example.org/AB1.gz", "FINNGEN_R11", "gwas", true, "36653562")))
    val ld = out
      .filter(col("studyId") === "FINNGEN_R11_AB2")
      .select(explode(col("ldPopulationStructure")).as("p"))
      .select(col("p.ldPopulation"), col("p.relativeSampleSize"))
      .as[(String, Double)]
      .collect()
    assert(ld.toSeq === Seq(("fin", 1.0)))
  }

  test("validateReleasePrefix accepts FINNGEN_R* and strips trailing underscore") {
    assert(FinnGen.validateReleasePrefix("FINNGEN_R11") === (("FINNGEN_R11", "R11")))
    assert(FinnGen.validateReleasePrefix("FINNGEN_R9_") === (("FINNGEN_R9", "R9")))
    intercept[IllegalArgumentException] {
      FinnGen.validateReleasePrefix("R11_FINNGEN")
    }
  }

  test("extractStudiesForCuration flattens propagated curation for the TSV export") {
    import spark.implicits._
    val studies = Seq(
      ("GCST1", true, "PM1", "T1", "trait1"),
      ("GCST2", false, "PM2", "T2", "trait2")
    ).toDF("studyId", "hasSumstats", "pubmedId", "publicationTitle", "traitFromSource")
    val curation = Seq(
      ("GCST1", "gwas", Seq("GxG"), Seq.empty[String], true)
    ).toDF("studyId", "studyType", "analysisFlags", "qualityControls", "isCurated")
    val out = GwasCatalogStudyIndex
      .extractStudiesForCuration(studies, Some(curation))
      .select("studyId", "studyType", "analysisFlag", "isCurated")
      .as[(String, String, String, String)]
      .collect()
    // only hasSumstats studies are exported
    assert(out.toSeq === Seq(("GCST1", "gwas", "GxG", "true")))
  }
}
