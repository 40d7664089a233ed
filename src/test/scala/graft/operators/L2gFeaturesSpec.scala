package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class L2gFeaturesSpec extends SparkSpec {

  import spark.implicits._

  private def coloc() = Seq(
    // left, right, gene, method, studyType, clpp, h4
    ("L1", "R1", "G1", "ECaviar", "eqtl", 0.3, 0.1),
    ("L1", "R2", "G1", "ECaviar", "eqtl", 0.7, 0.2), // max clpp for (L1,G1)
    ("L1", "R3", "G2", "coloc_pip_ecaviar", "eqtl", 0.5, 0.9), // combined method admitted
    ("L1", "R4", "G1", "Coloc", "eqtl", 0.9, 0.4), // wrong method for clpp feature
    ("L1", "R5", "G1", "ECaviar", "pqtl", 0.95, 0.5), // wrong qtl type
    ("L2", "R6", "G3", "Coloc", "pqtl", 0.1, 0.8),
    ("L2", "R7", null, "Coloc", "pqtl", 0.2, 0.99) // null gene dropped
  ).toDF(
    "leftStudyLocusId", "rightStudyLocusId", "rightGeneId",
    "colocalisationMethod", "rightStudyType", "clpp", "h4")

  private def loci() = Seq("L1", "L2").toDF("studyLocusId")

  test("coloc CLPP feature takes the max per (studyLocus, gene) with method+QTL filters") {
    val f = L2gFeatures
      .colocFeature(coloc(), loci(), "ECaviar", "clpp", "eqtl", "eQtlColocClppMaximum")
      .select("studyLocusId", "geneId", "featureValue")
      .as[(String, String, Double)].collect().toSet
    assert(f === Set(("L1", "G1", 0.7), ("L1", "G2", 0.5)))
  }

  test("coloc H4 feature via Coloc method") {
    val f = L2gFeatures
      .colocFeature(coloc(), loci(), "Coloc", "h4", "pqtl", "pQtlColocH4Maximum")
      .select("studyLocusId", "geneId", "featureValue")
      .as[(String, String, Double)].collect().toSet
    assert(f === Set(("L2", "G3", 0.8)))
  }

  test("dropTransEffects removes colocalisations whose right locus is a trans QTL") {
    val rightLoci = Seq(("R1", false), ("R2", true), ("R3", false), ("R4", false),
      ("R5", false), ("R6", false), ("R7", false)).toDF("studyLocusId", "isTransQtl")
    val cis = L2gFeatures.dropTransEffects(coloc(), rightLoci)
    assert(cis.count() === 6)
    assert(cis.filter(col("rightStudyLocusId") === "R2").count() === 0)
    // feature recomputed without the trans row: max falls back to 0.3
    val f = L2gFeatures
      .colocFeature(cis, loci(), "ECaviar", "clpp", "eqtl", "x")
      .select("studyLocusId", "geneId", "featureValue")
      .as[(String, String, Double)].collect().toSet
    assert(f === Set(("L1", "G1", 0.3), ("L1", "G2", 0.5)))
  }

  test("neighbourhood feature normalises by the regional max and zeroes dead regions") {
    val local = Seq(
      ("L1", "G1", "f", 0.8), ("L1", "G2", "f", 0.2),
      ("L2", "G3", "f", 0.0)
    ).toDF("studyLocusId", "geneId", "featureName", "featureValue")
    val out = L2gFeatures.neighbourhoodFeature(local, "fNeighbourhood")
      .select("studyLocusId", "geneId", "featureName", "featureValue")
      .as[(String, String, String, Double)].collect().toSet
    assert(out === Set(
      ("L1", "G1", "fNeighbourhood", 1.0),
      ("L1", "G2", "fNeighbourhood", 0.25),
      ("L2", "G3", "fNeighbourhood", 0.0)))
  }

  test("missing coloc genes extend to zero-valued features for neighbourhood normalisation") {
    val local = Seq(("L1", "G1", "f", 0.8)).toDF(
      "studyLocusId", "geneId", "featureName", "featureValue")
    val lut = Seq(("v1", "G1"), ("v1", "G2"), ("v2", "G9")).toDF("variantId", "geneId")
    val slv = Seq(("L1", "v1")).toDF("studyLocusId", "variantId")
    val out = L2gFeatures.extendMissingColocToNeighbourhoodGenes(local, lut, slv)
      .select("studyLocusId", "geneId", "featureValue")
      .as[(String, String, Double)].collect().toSet
    // G2 overlaps v1 but has no coloc → artificial zero; G9 isn't at the locus
    assert(out === Set(("L1", "G2", 0.0)))
  }

  test("feature matrix pivots the long features with a bounded name list") {
    val long = Seq(
      ("L1", "G1", "a", 0.5), ("L1", "G1", "b", 0.9), ("L2", "G2", "a", 0.1)
    ).toDF("studyLocusId", "geneId", "featureName", "featureValue")
    val m = L2gFeatures.featureMatrix(long, Seq("a", "b"))
      .select("studyLocusId", "geneId", "a", "b")
      .as[(String, String, Option[Double], Option[Double])].collect().toSet
    assert(m === Set(
      ("L1", "G1", Some(0.5), Some(0.9)),
      ("L2", "G2", Some(0.1), None)))
  }
}
