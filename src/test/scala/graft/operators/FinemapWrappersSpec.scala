package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}

import graft.SparkSpec

/** Distributed-wrapper pins for the two Breeze fine-mapping kernels that
  * fan loci out via `flatMapGroups` (Carma.carmaLoci, Raiss.imputeLoci):
  * the wrapper output over a multi-locus frame must equal the direct
  * kernel call per locus, LD must be accepted in either triangle order,
  * and over-cap loci must be skipped, not half-processed.
  */
class FinemapWrappersSpec extends SparkSpec {

  // AR(1) toy locus: p variants, r = rho^|i-j|, z decaying from `causal`
  private def toy(p: Int, causal: Int, rho: Double, bump: Double) = {
    val z = DenseVector.tabulate(p)(j =>
      bump * math.pow(rho, math.abs(j - causal)) + 0.2 * math.sin(j.toDouble))
    val ld = DenseMatrix.tabulate(p, p)((i, j) => math.pow(rho, math.abs(i - j)))
    (z, ld)
  }

  test("carmaLoci equals the direct seeded kernel per locus; over-cap loci skipped") {
    import spark.implicits._
    val p = 12
    val loci = Seq("LA" -> 3, "LB" -> 8)
    val sumstats = loci.flatMap { case (locus, causal) =>
      val (z, _) = toy(p, causal, 0.85, 6.0)
      (0 until p).map(j => (locus, f"v$j%02d", z(j)))
    }.toDF("studyLocusId", "variantId", "z")
    // upper triangle only — the wrapper mirrors
    val ld = loci.flatMap { case (locus, _) =>
      for (i <- 0 until p; j <- i + 1 until p)
        yield (locus, f"v$i%02d", f"v$j%02d", math.pow(0.85, j - i))
    }.toDF("studyLocusId", "vi", "vj", "r")

    val got = Carma.carmaLoci(spark, sumstats, ld, maxVariants = p)
      .as[(String, String, Double, Boolean)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    loci.foreach { case (locus, causal) =>
      val (z, ldm) = toy(p, causal, 0.85, 6.0)
      val res = Carma.spikeSlabNoEm(z, ldm)
      val rows = got(locus)
      assert(rows.length == p)
      rows.zipWithIndex.foreach { case ((_, _, pip, isOut), j) =>
        // not bit-identity: exp/log intrinsics may differ by ulps between
        // JIT states (executor thread vs test thread) — see verify notes
        assert(math.abs(pip - res.pips(j)) <= 1e-9, s"$locus v$j pip")
        assert(isOut == res.outliers.contains(j))
      }
    }
    // a locus above the cap yields no rows at all
    val capped = Carma.carmaLoci(spark, sumstats, ld, maxVariants = p - 1).count()
    assert(capped == 0)
  }

  test("imputeLoci equals the direct raissModel per locus (mixed triangle orders)") {
    import spark.implicits._
    val p = 10
    val unknowns = Set(2, 7)
    val loci = Seq("RA" -> 0, "RB" -> 5)
    val rho = 0.9
    def zAt(causal: Int)(j: Int) =
      5.0 * math.pow(rho, math.abs(j - causal)) + 0.1 * j
    val knownDf = loci.flatMap { case (locus, causal) =>
      (0 until p).filterNot(unknowns).map(j => (locus, f"v$j%02d", zAt(causal)(j)))
    }.toDF("studyLocusId", "variantId", "z")
    val unknownDf = loci.flatMap { case (locus, _) =>
      unknowns.toSeq.map(j => (locus, f"v$j%02d"))
    }.toDF("studyLocusId", "variantId")
    // alternate triangle orders row-by-row to pin the mirroring
    val ld = loci.flatMap { case (locus, _) =>
      for (i <- 0 until p; j <- i + 1 until p) yield {
        val r = math.pow(rho, j - i)
        if ((i + j) % 2 == 0) (locus, f"v$i%02d", f"v$j%02d", r)
        else (locus, f"v$j%02d", f"v$i%02d", r)
      }
    }.toDF("studyLocusId", "vi", "vj", "r")

    val got = Raiss.imputeLoci(spark, knownDf, unknownDf, ld)
      .as[(String, String, Double, Double, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    loci.foreach { case (locus, causal) =>
      val knownIdx = (0 until p).filterNot(unknowns).toArray
      val unkIdx = unknowns.toArray.sorted
      val zK = DenseVector(knownIdx.map(zAt(causal)))
      val ldK = DenseMatrix.tabulate(knownIdx.length, knownIdx.length)(
        (a, b) => math.pow(rho, math.abs(knownIdx(a) - knownIdx(b))))
      val ldUK = DenseMatrix.tabulate(unkIdx.length, knownIdx.length)(
        (a, b) => math.pow(rho, math.abs(unkIdx(a) - knownIdx(b))))
      val direct = Raiss.raissModel(zK, ldK, ldUK)
      val rows = got(locus)
      assert(rows.map(_._2).toSeq == unkIdx.toSeq.map(j => f"v$j%02d"))
      rows.zipWithIndex.foreach { case ((_, _, mu, va, ls, r2), i) =>
        assert(math.abs(mu - direct.mu(i)) <= 1e-9, s"$locus mu($i)")
        assert(math.abs(va - direct.variance(i)) <= 1e-9)
        assert(math.abs(ls - direct.ldScore(i)) <= 1e-9)
        assert(math.abs(r2 - direct.imputationR2(i)) <= 1e-9)
      }
    }
  }
}
