package graft.operators

import graft.SparkSpec

class L2gGoldStandardSpec extends SparkSpec {

  import spark.implicits._

  private val gsCols = Seq("studyLocusId", "variantId", "studyId", "geneId", "goldStandardSet")

  test("processGeneInteractions keeps the top-scoring interaction per pair") {
    // l2g_gold_standard.py:76-106 doctest
    val interactions = Seq(
      ("gene1", "gene2", 0.8), ("gene1", "gene2", 0.5), ("gene2", "gene3", 0.7)
    ).toDF("targetA", "targetB", "scoring")
    val got = L2gGoldStandard.processGeneInteractions(interactions)
      .as[(String, String, Double)].collect().toSet
    assert(got === Set(("gene1", "gene2", 0.8), ("gene2", "gene3", 0.7)))
  }

  test("filterUniqueAssociations matches the reference test_filter_unique_associations") {
    val gs = Seq(
      ("1", "variant1", "study1", "gene1", "positive"),
      ("2", "variant2", "study1", "gene1", "negative"), // same locus as 1, same gene → drop
      ("3", "variant3", "study1", "gene1", "positive"), // different locus → keep
      ("4", "variant4", "study1", "gene2", "positive")  // same locus as 1, other gene → keep
    ).toDF(gsCols: _*)
    val overlaps = Seq(
      ("1", "2", "variant2"),
      ("1", "4", "variant4")
    ).toDF("leftStudyLocusId", "rightStudyLocusId", "tagVariantId")
    val got = L2gGoldStandard.filterUniqueAssociations(gs, overlaps)
      .as[(String, String, String, String, String)].collect().toSet
    assert(got === Set(
      ("1", "variant1", "study1", "gene1", "positive"),
      ("3", "variant3", "study1", "gene1", "positive"),
      ("4", "variant4", "study1", "gene2", "positive")))
  }

  test("removeFalseNegatives matches the reference test_remove_false_negatives") {
    val gs = Seq(
      ("1", "variant1", "study1", "gene1", "positive"),
      ("2", "variant2", "study1", "gene2", "negative"), // partner of positive gene1 → drop
      ("3", "variant3", "study1", "gene3", "negative"), // weak partner → keep
      ("4", "variant4", "study1", "gene4", "positive")  // partner but positive → keep
    ).toDF(gsCols: _*)
    val interactions = Seq(
      ("gene1", "gene2", 0.8), ("gene1", "gene3", 0.5), ("gene1", "gene4", 0.8)
    ).toDF("geneIdA", "geneIdB", "score")
    val got = L2gGoldStandard.removeFalseNegatives(gs, interactions)
      .as[(String, String, String, String, String)].collect().toSet
    assert(got === Set(
      ("1", "variant1", "study1", "gene1", "positive"),
      ("3", "variant3", "study1", "gene3", "negative"),
      ("4", "variant4", "study1", "gene4", "positive")))
  }

  test("buildFeatureMatrix restricts to gold-standard protein-coding rows") {
    val gs = Seq(
      ("9", "variant1", "study1", "G1", "positive"),
      ("9", "variant1", "study1", "G2", "negative")
    ).toDF(gsCols: _*)
    val matrix = Seq(
      ("SL1", "G1", 0.9, 1.0),
      ("SL1", "G2", 0.2, 0.0), // not protein-coding → dropped
      ("SL2", "G1", 0.5, 1.0)  // credible set not in gold standard → dropped
    ).toDF("studyLocusId", "geneId", "distanceSentinelTss", "isProteinCoding")
    val credsets = Seq(
      ("SL1", "variant1", "study1"),
      ("SL2", "variant9", "study2")
    ).toDF("studyLocusId", "variantId", "studyId")
    val got = L2gGoldStandard.buildFeatureMatrix(gs, matrix, credsets)
      .select("studyLocusId", "geneId", "goldStandardSet")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(("SL1", "G1", "positive")))
  }
}
