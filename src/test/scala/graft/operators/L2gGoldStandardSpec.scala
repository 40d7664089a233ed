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

  test("positive curation parsing builds ids and collects sources") {
    import org.apache.spark.sql.functions.{size => asize, col}
    val curation = Seq(
      ("High", "GCST1", "gene1", "1", 1000, "A", "C", "ProGeM"),
      ("Medium", "GCST1", "gene1", "1", 1000, "A", "C", "otg"),
      ("Low", "GCST2", "gene2", "2", 5, "G", "T", "x") // dropped
    ).map { case (conf, study, gene, chrom, pos, ref, alt, label) =>
      ((conf, gene), (study), ((chrom, pos), (ref, alt)), (label))
    }.toDF("gold_standard_info_t", "assoc", "sv", "label")
      .selectExpr(
        "named_struct('highest_confidence', gold_standard_info_t._1, 'gene_id', gold_standard_info_t._2) AS gold_standard_info",
        "named_struct('otg_id', assoc) AS association_info",
        "named_struct('locus_GRCh38', named_struct('chromosome', sv._1._1, 'position', sv._1._2), 'alleles', named_struct('reference', sv._2._1, 'alternative', sv._2._2)) AS sentinel_variant",
        "named_struct('set_label', label) AS metadata")
    val got = L2gGoldStandard.parsePositiveCuration(curation)
    assert(got.columns.toSeq === Seq("studyLocusId", "studyId", "variantId", "geneId", "sources"))
    val row = got.collect()
    assert(row.length === 1)
    assert(row.head.getAs[String]("variantId") === "1_1000_A_C")
    assert(got.select(asize(col("sources"))).as[Int].collect().head === 2)
  }

  test("negative expansion matches the reference test fixture") {
    val positives = Seq(
      ("variant1", "gene1", "study1"),
      ("variant2", "gene2", "study1")
    ).toDF("variantId", "geneId", "studyId")
    val distances = Seq(
      ("variant1", "gene1", 5L),
      ("variant1", "gene3", 10L)
    ).toDF("variantId", "targetId", "distanceFromTss")
    val got = L2gGoldStandard.expandGoldStandardWithNegatives(positives, distances)
      .select("variantId", "studyId", "geneId", "goldStandardSet")
      .as[(String, String, String, String)].collect().toSet
    assert(got === Set(
      ("variant1", "study1", "gene1", "positive"),
      ("variant1", "study1", "gene3", "negative"),
      ("variant2", "study1", "gene2", "positive"))) // not in index → stays positive
    assert(got.count(_._4 == "positive") === positives.count().toInt)
  }

  test("fromOtgCuration composes parse -> expand -> unique -> de-confound " +
    "(reference from_otg_curation + as_l2g_gold_standard)") {
    // Two High-confidence curated loci: (study1, 1_1000_A_C, gene1) and
    // (study1, 2_2000_G_T, gene4). The variant index places gene1 at 5 bp
    // (positive confirmed), gene2 at 10 kb (negative candidate), gene9 at
    // 600 kb (outside the 500 kb window -> never labelled), gene4 at 5 bp
    // of its own sentinel. Interactions: gene1-gene2 at 0.8 makes the gene2
    // negative a confounded false negative -> dropped; gene1-gene4 at 0.9
    // is the positive-positive interaction that (per the reference's
    // EXISTS-over-join-rows semantics) lets gene1 itself survive having a
    // strong negative interactor.
    val curation = Seq(
      ("High", "study1", "gene1", "1", 1000, "A", "C", "ProGeM"),
      ("High", "study1", "gene4", "2", 2000, "G", "T", "ProGeM")
    ).map { case (conf, study, gene, chrom, pos, ref, alt, label) =>
      ((conf, gene), study, ((chrom, pos), (ref, alt)), label)
    }.toDF("gold_standard_info_t", "assoc", "sv", "label")
      .selectExpr(
        "named_struct('highest_confidence', gold_standard_info_t._1, 'gene_id', gold_standard_info_t._2) AS gold_standard_info",
        "named_struct('otg_id', assoc) AS association_info",
        "named_struct('locus_GRCh38', named_struct('chromosome', sv._1._1, 'position', sv._1._2), 'alleles', named_struct('reference', sv._2._1, 'alternative', sv._2._2)) AS sentinel_variant",
        "named_struct('set_label', label) AS metadata")
    val distances = Seq(
      ("1_1000_A_C", "gene1", 5L),
      ("1_1000_A_C", "gene2", 10000L),
      ("1_1000_A_C", "gene9", 600000L),
      ("2_2000_G_T", "gene4", 5L)
    ).toDF("variantId", "targetId", "distanceFromTss")
    val overlaps = Seq.empty[(String, String, String)]
      .toDF("leftStudyLocusId", "rightStudyLocusId", "tagVariantId")
    val interactions = Seq(
      ("gene1", "gene2", 0.8), ("gene1", "gene4", 0.9)
    ).toDF("targetA", "targetB", "scoring")
    val got = L2gGoldStandard
      .fromOtgCuration(curation, distances, overlaps, interactions)
      .select("variantId", "geneId", "goldStandardSet")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("1_1000_A_C", "gene1", "positive"),
      ("2_2000_G_T", "gene4", "positive")))
    // with all interactions weak, nothing is confounded and the gene2
    // negative survives the chain
    val noConfound = L2gGoldStandard
      .fromOtgCuration(
        curation, distances, overlaps,
        Seq(("gene1", "gene2", 0.1)).toDF("targetA", "targetB", "scoring"))
      .select("geneId", "goldStandardSet")
      .as[(String, String)].collect().toSet
    assert(noConfound === Set(
      ("gene1", "positive"), ("gene2", "negative"), ("gene4", "positive")))
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
