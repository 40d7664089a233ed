package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FineMapperSpec extends SparkSpec {

  test("flatMapGroups fine-maps independent loci in one pass") {
    import spark.implicits._
    // Two loci. Locus A: variant a2 has a strong signal, a1/a3 weak and
    // loosely linked. Locus B: single strong variant.
    val sumstats = Seq(
      ("A", "a1", 2.0), ("A", "a2", 9.0), ("A", "a3", 1.5),
      ("B", "b1", 8.0)
    ).toDF("studyLocusId", "variantId", "z")
    val ld = Seq(
      ("A", "a1", "a2", 0.3), ("A", "a1", "a3", 0.2), ("A", "a2", "a3", 0.25)
    ).toDF("studyLocusId", "vi", "vj", "r")

    val out = FineMapper.finemapLoci(spark, sumstats, ld, n = 10000)
      .select("studyLocusId", "variantId", "pip")
      .as[(String, String, Double)]
      .collect()

    val byLocus = out.groupBy(_._1)
    assert(byLocus.keySet === Set("A", "B"))
    // the strong variants dominate their credible sets
    assert(byLocus("A").maxBy(_._3)._2 === "a2")
    assert(byLocus("B").head._2 === "b1")
    assert(out.forall(r => r._3 >= 0 && r._3 <= 1.0 + 1e-9))
  }
}
