package graft.operators

import graft.SparkSpec

class DrugEnrichmentSpec extends SparkSpec {

  import spark.implicits._

  test("Fisher exact two-sided matches published scipy values") {
    // lady-tasting-tea table
    assert(math.abs(
      DrugEnrichment.fisherExactTwoSided(3, 1, 1, 3) - 0.4857142857142857) < 1e-12)
    // scipy.stats.fisher_exact docs example
    assert(math.abs(
      DrugEnrichment.fisherExactTwoSided(1, 9, 11, 3) - 0.0027594561852200836) < 1e-12)
    // degenerate row
    assert(DrugEnrichment.fisherExactTwoSided(0, 0, 5, 5) === 1.0)
  }

  test("evidence conversion joins studies and explodes diseases") {
    val scores = Seq(("SL1", "G1", 0.9), ("SL2", "G2", 0.1)).toDF("studyLocusId", "geneId", "s")
    val sl = Seq(("SL1", "ST1"), ("SL2", "ST2")).toDF("studyLocusId", "studyId")
    val si = Seq(("ST1", Seq("D1", "D2")), ("ST2", Seq("D3"))).toDF("studyId", "diseaseIds")
    val got = DrugEnrichment
      .toDiseaseTargetEvidence(scores, "s", "gentropy", sl, si, minScore = 0.5)
      .select("targetId", "diseaseId", "resourceScore")
      .as[(String, String, Double)].collect().toSet
    assert(got === Set(("G1", "D1", 0.9), ("G1", "D2", 0.9)))
  }

  test("indirect associations propagate scores up the ontology (max mode)") {
    val evidence = Seq(
      ("G1", "D1", 0.4), ("G1", "D2", 0.8), ("G2", "D1", 0.3)
    ).toDF("targetId", "diseaseId", "resourceScore")
    val diseases = Seq(
      ("D1", Seq("ROOT")), ("D2", Seq("ROOT", "D1"))
    ).toDF("id", "ancestors")
    val got = DrugEnrichment
      .evidenceToIndirectAssociations(evidence, diseases, useMax = true)
      .as[(String, String, Double)].collect().toSet
    // D2 evidence flows into D1 and ROOT; every disease is its own ancestor
    assert(got === Set(
      ("G1", "D1", 0.8), ("G1", "D2", 0.8), ("G1", "ROOT", 0.8),
      ("G2", "D1", 0.3), ("G2", "ROOT", 0.3)))
  }

  test("direct associations use the harmonic sum of distinct scores by default") {
    val evidence = Seq(
      ("G1", "D1", 1.0), ("G1", "D1", 0.5), ("G1", "D1", 1.0)
    ).toDF("targetId", "diseaseId", "resourceScore")
    val got = DrugEnrichment.evidenceToDirectAssociations(evidence)
      .select("direct_assoc_score").as[Double].collect().head
    // harmonic sum of [1.0, 0.5]: (1/1 + 0.5/4) / K
    val k = (1 to 1000).map(i => 1.0 / (i.toDouble * i)).sum
    assert(math.abs(got - (1.0 + 0.5 / 4) / k) < 1e-12)
  }

  test("chembl processing keeps the max clinical phase above 0.5") {
    val chembl = Seq(
      ("G1", "D1", 4.0), ("G1", "D1", 2.0), ("G2", "D2", 0.5)
    ).toDF("targetId", "diseaseId", "clinicalPhase")
    val got = DrugEnrichment.processChemblEvidence(chembl)
      .as[(String, String, Double)].collect().toSet
    assert(got === Set(("G1", "D1", 4.0)))
  }

  test("enrichment table computes contingency cells, OR and CI in one pass") {
    // 10 supported pairs (6 reach phase 2), 20 unsupported (5 reach phase 2)
    val rows =
      (1 to 10).map(i => (Some(0.9), if (i <= 6) 3.0 else 1.0)) ++
        (1 to 20).map(i => (None: Option[Double], if (i <= 5) 2.0 else 1.0))
    val joined = rows.toDF("indirect_assoc_score", "maxClinicalPhase")
    val res = DrugEnrichment.enrichmentTable(joined, phases = Seq(2))
    assert(res.size === 1)
    val r = res.head
    assert((r.noEvidLowPhase, r.noEvidHighPhase, r.yesEvidLowPhase, r.yesEvidHighPhase)
      === ((15L, 5L, 4L, 6L)))
    assert(math.abs(r.oddsRatio - (15.0 * 6.0) / (5.0 * 4.0)) < 1e-12)
    assert(math.abs(r.relativeSuccess - (0.6 / 0.25)) < 1e-12)
    assert(r.pValue > 0 && r.pValue <= 1)
  }
}
