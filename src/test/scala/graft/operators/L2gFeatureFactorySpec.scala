package graft.operators

import graft.SparkSpec

class L2gFeatureFactorySpec extends SparkSpec {

  import spark.implicits._

  private def inputs() = L2gFeatureFactory.Inputs(
    studyLoci = Seq(
      ("L1", "v1", "1", 120000L, "SuSiE fine-mapped credible set with in-sample LD"),
      ("L2", "v3", "1", 400000L, "PICS fine-mapped credible set based on reported top hit")
    ).toDF("studyLocusId", "variantId", "chromosome", "position", "confidence"),
    credsetVariants = Seq(
      ("L1", "v1", "1", 120000L, 0.8),
      ("L1", "v2", "1", 180000L, 0.2),
      ("L2", "v3", "1", 400000L, 1.0)
    ).toDF("studyLocusId", "variantId", "chromosome", "position", "posteriorProbability"),
    coloc = Seq(
      ("L1", "R1", "G1", "ECaviar", "eqtl", 0.7, 0.2),
      ("L1", "R2", "G2", "Coloc", "pqtl", 0.3, 0.9),
      ("L2", "R3", "G1", "ECaviar", "sqtl", 0.4, 0.6)
    ).toDF(
      "leftStudyLocusId", "rightStudyLocusId", "rightGeneId",
      "colocalisationMethod", "rightStudyType", "clpp", "h4"),
    tssDistances = Seq(
      ("v1", "G1", 1000L), ("v1", "G2", 50000L), ("v2", "G1", 2000L), ("v3", "G1", 300L)
    ).toDF("variantId", "geneId", "distance"),
    footprintDistances = Seq(
      ("v1", "G1", 0L), ("v2", "G1", 500L), ("v3", "G2", 10000L)
    ).toDF("variantId", "geneId", "distance"),
    consequences = Seq(
      ("v1", "G1", 0.66), ("v2", "G1", 0.1), ("v3", "G2", 1.0)
    ).toDF("variantId", "geneId", "severityScore"),
    genesInWindow = Seq(
      ("v1", "G1", "protein_coding", 1000L),
      ("v1", "G2", "lncRNA", 50000L),
      ("v2", "G1", "protein_coding", 2000L),
      ("v3", "G1", "protein_coding", 300L),
      ("v3", "G2", "lncRNA", 10000L)
    ).toDF("variantId", "geneId", "biotype", "distanceFromFootprint"),
    genes = Seq(
      ("G1", "1", 121000L, "protein_coding"),
      ("G2", "1", 170000L, "lncRNA"),
      ("G3", "1", 430000L, "protein_coding")
    ).toDF("geneId", "chromosome", "tss", "biotype"),
    intervals = Seq(
      ("1", 100000L, 130000L, "G1", Some(0.5)),
      ("1", 150000L, 200000L, "G2", Some(0.25))
    ).toDF("chromosome", "start", "end", "geneId", "score")
  )

  test("the catalog carries the reference's full 30-feature registry") {
    // feature_factory.py:102-139: 8 distance + 12 coloc + 4 vep + 2 e2g + 4 other
    assert(L2gFeatureFactory.AllFeatureNames.size === 30)
    assert(L2gFeatureFactory.AllFeatureNames.distinct.size ===
      L2gFeatureFactory.AllFeatureNames.size)
    val families = Map(
      "distance" -> 8, "QtlColoc" -> 12, "vep" -> 4, "e2g" -> 2,
      "Count500kb" -> 2, "isProteinCoding" -> 1, "credibleSetConfidence" -> 1)
    families.foreach { case (frag, n) =>
      assert(L2gFeatureFactory.AllFeatureNames.count(_.contains(frag)) === n, frag)
    }
  }

  test("every named feature computes to the long schema") {
    val in = inputs()
    L2gFeatureFactory.AllFeatureNames.filterNot(_ == "e2gMeanNeighbourhood").foreach { n =>
      val df = L2gFeatureFactory.compute(n, in)
      assert(
        df.columns.toSet === Set("studyLocusId", "geneId", "featureName", "featureValue"),
        s"$n: ${df.columns.mkString(",")}")
    }
  }

  test("fillNa imputes gene counts with locus means, fills the rest with zero") {
    val m = Seq(
      ("L1", "G1", Some(4.0), Some(0.5)),
      ("L1", "G2", None, None),
      ("L2", "G3", None, Some(0.1))
    ).toDF("studyLocusId", "geneId", "geneCount500kb", "distanceSentinelTss")
    val got = L2gFeatureFactory
      .fillNa(m, featureCols = Seq("geneCount500kb", "distanceSentinelTss"))
      .as[(String, String, Double, Double)].collect().toSet
    assert(got === Set(
      ("L1", "G1", 4.0, 0.5),
      ("L1", "G2", 4.0, 0.0), // locus mean for count, 0 for distance
      ("L2", "G3", 0.0, 0.1))) // no non-null count in locus → fillna 0
  }

  test("missingness rate computes all features in one pass") {
    val m = Seq(
      ("L1", "G1", Some(1.0), Some(0.0)),
      ("L1", "G2", None, Some(0.2))
    ).toDF("studyLocusId", "geneId", "a", "b")
    val got = L2gFeatureFactory.featureMissingnessRate(m, Seq("a", "b"))
    assert(got === Map("a" -> 0.5, "b" -> 0.5)) // b: one zero counts as missing
  }

  test("selectFeatures keeps ids and float-casts the requested columns") {
    val m = Seq(("L1", "G1", 0.5, 0.9)).toDF("studyLocusId", "geneId", "a", "b")
    val got = L2gFeatureFactory.selectFeatures(m, Seq("a"))
    assert(got.columns.toSeq === Seq("studyLocusId", "geneId", "a"))
    assert(got.schema("a").dataType.typeName === "float")
  }

  test("computeAll assembles the full wide matrix with one column per feature") {
    val m = L2gFeatureFactory.computeAll(inputs())
    assert(m.columns.toSeq ===
      Seq("studyLocusId", "geneId") ++ L2gFeatureFactory.AllFeatureNames)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // spot-check a few cells
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val l1g1 = byKey(("L1", "G1"))
    assert(l1g1.getAs[Double]("eQtlColocClppMaximum") === 0.7)
    assert(l1g1.getAs[Double]("isProteinCoding") === 1.0)
    assert(l1g1.getAs[Double]("credibleSetConfidence") === 1.0)
    // e2g: G1 max score 0.5 weighted by pp 0.8 = 0.4
    assert(math.abs(l1g1.getAs[Double]("e2gMean") - 0.4) < 1e-12)
    // neighbourhood of the only protein-coding gene with signal = 1.0
    assert(l1g1.getAs[Double]("distanceSentinelTssNeighbourhood") === 1.0)
    val l2g1 = byKey(("L2", "G1"))
    assert(l2g1.getAs[Double]("credibleSetConfidence") === 0.25)
    assert(l2g1.getAs[Double]("sQtlColocClppMaximum") === 0.4)
  }
}
