package graft.operators

import scala.util.Random

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 2 latent factors embedded in 8 dims + small noise: PCA(k=2) must
  // capture nearly all variance and preserve pairwise geometry.
  private lazy val data = {
    val rnd = new Random(11)
    val basis = Array(
      Array(0.6, 0.2, -0.3, 0.5, 0.0, 0.4, -0.2, 0.1),
      Array(-0.1, 0.5, 0.4, 0.0, -0.6, 0.2, 0.3, -0.2))
    (1L to 2000L).map { id =>
      val f = Array(rnd.nextGaussian() * 3, rnd.nextGaussian())
      val x = (0 until 8).map { d =>
        (f(0) * basis(0)(d) + f(1) * basis(1)(d) + rnd.nextGaussian() * 0.01).toFloat
      }
      (id, x)
    }.toDF("vec_id", "embedding")
  }

  test("gramStats matches a driver-side accumulation") {
    val local = data.as[(Long, Seq[Float])].collect()
    val stats = Pca.gramStats(data.repartition(9), "embedding", dims = 8)
    assert(stats.n == 2000)
    val wantSum0 = local.map(_._2.head.toDouble).sum
    assert(math.abs(stats.sums(0) - wantSum0) < 1e-8)
    val want03 = local.map(r => r._2(0).toDouble * r._2(3).toDouble).sum
    assert(math.abs(stats.gram(0 * 8 + 3) - want03) < 1e-8)
  }

  test("fit recovers the 2-factor structure; transform preserves geometry") {
    val model = Pca.fit(data, "embedding", dims = 8, k = 2)
    val total = {
      val all = Pca.fit(data, "embedding", dims = 8, k = 8)
      all.explainedVariance.sum
    }
    assert(model.explainedVariance.sum / total > 0.99,
      s"2 components must explain the 2-factor data: ${model.explainedVariance.mkString(",")} of $total")
    // projection preserves pairwise distances (up to the noise floor)
    val proj = Pca.transform(data, "embedding", model)
      .select($"vec_id", $"embedding", $"embedding_pca")
      .as[(Long, Seq[Float], Seq[Float])].collect().sortBy(_._1).take(50)
    def dist(a: Seq[Float], b: Seq[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    for (w <- proj.sliding(2); p = w(0); q = w(1)) {
      val dFull = dist(p._2, q._2)
      val dProj = dist(p._3, q._3)
      assert(math.abs(dFull - dProj) < 0.15 * dFull + 0.05, s"${p._1}->${q._1}: $dFull vs $dProj")
    }
    // deterministic sign convention: refitting yields identical components
    val again = Pca.fit(data, "embedding", dims = 8, k = 2)
    assert(model.components.flatten.toSeq == again.components.flatten.toSeq)
  }

  test("transform is a shuffle-free codegen projection") {
    val model = Pca.fit(data, "embedding", dims = 8, k = 2)
    val plan = Pca.transform(data, "embedding", model).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("JL random projection preserves pairwise distances within tolerance, deterministically") {
    val proj = Pca.randomProject(data, "embedding", dims = 8, outDims = 32)
      .select($"vec_id", $"embedding", $"embedding_rp")
      .as[(Long, Seq[Float], Seq[Float])].collect().sortBy(_._1).take(40)
    def dist(a: Seq[Float], b: Seq[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for (w <- proj.sliding(2).toSeq; p = w(0); q = w(1); d = dist(p._2, q._2) if d > 0.5)
      yield dist(p._3, q._3) / d
    assert(ratios.nonEmpty)
    // K=32 JL: distortion comfortably within +/-60% per pair, mean near 1
    assert(ratios.forall(r => r > 0.4 && r < 1.6), s"worst ratios: ${ratios.min}, ${ratios.max}")
    assert(math.abs(ratios.sum / ratios.size - 1.0) < 0.2)
    val again = Pca.randomProject(data, "embedding", dims = 8, outDims = 32)
      .select($"embedding_rp").as[Seq[Float]].collect()
    val first = Pca.randomProject(data, "embedding", dims = 8, outDims = 32)
      .select($"embedding_rp").as[Seq[Float]].collect()
    assert(again.toSeq == first.toSeq, "projection must be deterministic")
  }
}
