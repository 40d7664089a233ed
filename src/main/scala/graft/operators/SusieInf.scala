package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector, eigSym, sum}

import graft.functions.SpecialMath

/** SuSiE-inf: sum of single effects fine-mapping with an infinitesimal
  * random-effect component (reference: method/susie_inf.py:33-405, itself a
  * port of the published FinucaneLab implementation).
  *
  * Breeze port of the method-of-moments variance path (the reference's
  * default). The per-locus kernel is driver/executor-local; distribution
  * across loci happens in [[FineMapper]] via `flatMapGroups` — unlike the
  * reference, which runs one locus per job.
  *
  * Both variance paths are ported: method-of-moments (the reference
  * default) and the MLE negative-ELBO minimisation.
  */
object SusieInf {

  final case class Result(
      pip: DenseMatrix[Double],
      mu: DenseMatrix[Double],
      omega: DenseMatrix[Double],
      lbfVariable: DenseMatrix[Double],
      ssq: DenseVector[Double],
      sigmasq: Double,
      tausq: Double,
      alpha: DenseVector[Double],
      lbf: DenseVector[Double]
  )

  /** Bounded scalar minimisation: golden-section search with parabolic
    * interpolation (Brent's `fminbnd`, the same public algorithm behind
    * scipy's `minimize_scalar(method="bounded")`), xatol 1e-5.
    */
  def fminbound(f: Double => Double, lo: Double, hi: Double, xatol: Double = 1e-5, maxfun: Int = 500): Double = {
    val golden = 0.5 * (3.0 - math.sqrt(5.0))
    var a = lo; var b = hi
    var xf = a + golden * (b - a)
    var v = xf; var w = xf
    var fx = f(xf); var fv = fx; var fw = fx
    var d = 0.0; var e = 0.0
    var xm = 0.5 * (a + b)
    var tol1 = 1.48e-8 * math.abs(xf) + xatol / 3.0
    var tol2 = 2.0 * tol1
    var n = 1
    while (math.abs(xf - xm) > (tol2 - 0.5 * (b - a)) && n < maxfun) {
      var useGolden = true
      if (math.abs(e) > tol1) {
        // parabolic fit through (w, fw), (v, fv), (xf, fx)
        val r = (xf - w) * (fx - fv)
        var q = (xf - v) * (fx - fw)
        var p = (xf - v) * q - (xf - w) * r
        q = 2.0 * (q - r)
        if (q > 0.0) p = -p
        q = math.abs(q)
        val etemp = e
        e = d
        if (math.abs(p) < math.abs(0.5 * q * etemp) && p > q * (a - xf) && p < q * (b - xf)) {
          d = p / q
          val u = xf + d
          if ((u - a) < tol2 || (b - u) < tol2) d = if (xm - xf >= 0) tol1 else -tol1
          useGolden = false
        }
      }
      if (useGolden) {
        e = (if (xf >= xm) a else b) - xf
        d = golden * e
      }
      val u = xf + (if (math.abs(d) >= tol1) d else if (d >= 0) tol1 else -tol1)
      val fu = f(u)
      n += 1
      if (fu <= fx) {
        if (u >= xf) a = xf else b = xf
        v = w; fv = fw; w = xf; fw = fx; xf = u; fx = fu
      } else {
        if (u < xf) a = u else b = u
        if (fu <= fw || w == xf) { v = w; fv = fw; w = u; fw = fu }
        else if (fu <= fv || v == xf || v == w) { v = u; fv = fu }
      }
      xm = 0.5 * (a + b)
      tol1 = 1.48e-8 * math.abs(xf) + xatol / 3.0
      tol2 = 2.0 * tol1
    }
    xf
  }

  // scalastyle:off method.length
  def susieInf(
      z: DenseVector[Double],
      ld: DenseMatrix[Double],
      meansq: Double = 1.0,
      n: Int = 100000,
      L: Int = 10,
      estSsq: Boolean = true,
      ssqRange: (Double, Double) = (0.0, 1.0),
      estSigmasq: Boolean = true,
      estTausq: Boolean = false,
      sigmasq0: Double = 1.0,
      tausq0: Double = 0.0,
      maxiter: Int = 100,
      pipTol: Double = 0.001,
      varianceMethod: String = "moments"
  ): Result = {
    require(
      varianceMethod == "moments" || varianceMethod == "MLE",
      s"unknown variance method $varianceMethod")
    val p = z.length
    var sigmasq = sigmasq0
    var tausq = tausq0

    // Eigendecomposition of the LD matrix: X = U D V'
    val es = eigSym(ld)
    val V = es.eigenvectors
    val Dsq = es.eigenvalues.map(ev => math.max(n * ev, 0.0))

    val Xty = z * math.sqrt(n.toDouble)
    val VtXty = V.t * Xty
    val yty = n * meansq

    var varV = Dsq * tausq + sigmasq
    def computeDiagXtOmegaX(): DenseVector[Double] = {
      val out = DenseVector.zeros[Double](p)
      var j = 0
      while (j < p) {
        var acc = 0.0
        var k = 0
        while (k < p) { acc += V(j, k) * V(j, k) * (Dsq(k) / varV(k)); k += 1 }
        out(j) = acc
        j += 1
      }
      out
    }
    var diagXtOmegaX = computeDiagXtOmegaX()
    var XtOmegay = V * (VtXty /:/ varV)

    val ssq = DenseVector.fill(L)(0.2)
    val PIP = DenseMatrix.fill(p, L)(1.0 / p)
    val mu = DenseMatrix.zeros[Double](p, L)
    val lbfVariable = DenseMatrix.zeros[Double](p, L)
    val omega = DenseMatrix.tabulate(p, L)((j, l) => diagXtOmegaX(j) + 1.0 / ssq(l))
    val logpi0 = DenseVector.fill(p)(math.log(1.0 / p))

    var it = 0
    var converged = false
    while (it < maxiter && !converged) {
      val pipPrev = PIP.copy
      var l = 0
      while (l < L) {
        // residual r_l excludes effect l
        val b = DenseVector.tabulate(p) { j =>
          var acc = 0.0
          var k = 0
          while (k < L) { acc += mu(j, k) * PIP(j, k); k += 1 }
          acc - mu(j, l) * PIP(j, l)
        }
        val XtOmegaXb = V * ((V.t * b) *:* Dsq /:/ varV)
        val XtOmegar = XtOmegay - XtOmegaXb
        if (estSsq) {
          def negElbo(x: Double): Double = {
            val terms = Array.tabulate(p) { j =>
              -0.5 * math.log1p(x * diagXtOmegaX(j)) +
                x * XtOmegar(j) * XtOmegar(j) / (2.0 * (1.0 + x * diagXtOmegaX(j))) +
                logpi0(j)
            }
            -SpecialMath.logsum(terms)
          }
          ssq(l) = fminbound(negElbo, ssqRange._1, ssqRange._2)
        }
        var j = 0
        val logPIP = new Array[Double](p)
        while (j < p) {
          omega(j, l) = diagXtOmegaX(j) + 1.0 / ssq(l)
          mu(j, l) = XtOmegar(j) / omega(j, l)
          lbfVariable(j, l) =
            XtOmegar(j) * XtOmegar(j) / (2.0 * omega(j, l)) - 0.5 * math.log(omega(j, l) * ssq(l))
          logPIP(j) = lbfVariable(j, l) + logpi0(j)
          j += 1
        }
        val lse = SpecialMath.logsum(logPIP)
        j = 0
        while (j < p) { PIP(j, l) = math.exp(logPIP(j) - lse); j += 1 }
        l += 1
      }
      if (estSigmasq || estTausq) {
        val (s2, t2) =
          if (varianceMethod == "MLE")
            mleUpdate(PIP, mu, omega, sigmasq, tausq, n, V, Dsq, VtXty, yty, estSigmasq, estTausq)
          else
            methodOfMoments(PIP, mu, omega, sigmasq, tausq, n, V, Dsq, VtXty, Xty, yty, estSigmasq, estTausq)
        sigmasq = s2; tausq = t2
        varV = Dsq * tausq + sigmasq
        diagXtOmegaX = computeDiagXtOmegaX()
        XtOmegay = V * (VtXty /:/ varV)
      }
      val pipDiff = breeze.linalg.max(breeze.numerics.abs(pipPrev - PIP))
      if (pipDiff < pipTol) converged = true
      it += 1
    }

    val b = DenseVector.tabulate(p) { j =>
      var acc = 0.0; var k = 0
      while (k < L) { acc += mu(j, k) * PIP(j, k); k += 1 }
      acc
    }
    val XtOmegaXb = V * ((V.t * b) *:* Dsq /:/ varV)
    val alpha = (XtOmegay - XtOmegaXb) * tausq
    val priors = math.log(1.0 / p)
    val lbfCs = DenseVector.tabulate(L) { l =>
      SpecialMath.logsum(Array.tabulate(p)(j => lbfVariable(j, l) + priors))
    }
    Result(PIP, mu, omega, lbfVariable, ssq, sigmasq, tausq, alpha, lbfCs)
  }
  // scalastyle:on method.length

  /** MLE update for (sigma², tau²) by minimising the negative ELBO
    * (method/susie_inf.py:300-406). The reference minimises with bounded
    * L-BFGS-B (finite-difference gradients); this port uses golden-section
    * coordinate descent over the same bounds.
    *
    * Parity note: on the reference's own fixture the negative ELBO has a
    * long, nearly-flat valley in tau² — this port descends to a point with
    * LOWER negative ELBO (46187 vs 47367 at the fixture's implied
    * variances), so lbf values differ from the stored scipy trajectory even
    * though the objective, bounds and update loop match. The credible-set
    * and causal-variant conclusions agree (pinned in SusieInfSpec); exact
    * lbf parity would require replicating scipy's L-BFGS-B stopping point
    * rather than the optimum.
    */
  private def mleUpdate(
      PIP: DenseMatrix[Double], mu: DenseMatrix[Double], omega: DenseMatrix[Double],
      sigmasq0: Double, tausq0: Double, n: Int,
      V: DenseMatrix[Double], Dsq: DenseVector[Double],
      VtXty: DenseVector[Double], yty: Double,
      estSigmasq: Boolean, estTausq: Boolean
  ): (Double, Double) = {
    val p = mu.rows
    val L = mu.cols
    var sigmasq = sigmasq0
    var tausq = tausq0
    val sRange = (0.2 * yty / n, 1.2 * yty / n)
    val tRange = (1e-12, 1.2 * yty / (n.toDouble * p))
    val b = DenseVector.tabulate(p) { j =>
      var acc = 0.0; var k = 0
      while (k < L) { acc += mu(j, k) * PIP(j, k); k += 1 }
      acc
    }
    val Vtb = V.t * b
    val diagVtMV = Vtb.map(x => x * x)
    val tmpD = DenseVector.zeros[Double](p)
    var l = 0
    while (l < L) {
      val bl = DenseVector.tabulate(p)(j => mu(j, l) * PIP(j, l))
      val Vtbl = V.t * bl
      diagVtMV -= Vtbl.map(x => x * x)
      var j = 0
      while (j < p) { tmpD(j) += PIP(j, l) * (mu(j, l) * mu(j, l) + 1.0 / omega(j, l)); j += 1 }
      l += 1
    }
    var k = 0
    while (k < p) {
      var acc = 0.0; var j = 0
      while (j < p) { acc += V(j, k) * V(j, k) * tmpD(j); j += 1 }
      diagVtMV(k) += acc
      k += 1
    }
    // negative ELBO in (sigma_e², sigma_g²)
    def f(se2: Double, sg2: Double): Double = {
      var acc = 0.5 * (n - p) * math.log(se2) + 0.5 / se2 * yty
      var i = 0
      while (i < p) {
        val denom = sg2 * Dsq(i) + se2
        acc += 0.5 * math.log(denom) -
          0.5 * sg2 / se2 * VtXty(i) * VtXty(i) / denom -
          Vtb(i) * VtXty(i) / denom +
          0.5 * Dsq(i) / denom * diagVtMV(i)
        i += 1
      }
      acc
    }
    if (estTausq) {
      var sweep = 0
      var prev = Double.MaxValue
      var cur = f(sigmasq, tausq)
      while (sweep < 30 && prev - cur > 1e-10 * math.max(1.0, math.abs(cur))) {
        prev = cur
        sigmasq = fminbound(x => f(x, tausq), sRange._1, sRange._2)
        tausq = fminbound(x => f(sigmasq, x), tRange._1, tRange._2)
        cur = f(sigmasq, tausq)
        sweep += 1
      }
    } else if (estSigmasq) {
      sigmasq = fminbound(x => f(x, tausq), sRange._1, sRange._2)
    }
    (sigmasq, tausq)
  }

  /** Method-of-moments update for (sigma², tau²)
    * (method/susie_inf.py:237-298).
    */
  private def methodOfMoments(
      PIP: DenseMatrix[Double], mu: DenseMatrix[Double], omega: DenseMatrix[Double],
      sigmasq0: Double, tausq0: Double, n: Int,
      V: DenseMatrix[Double], Dsq: DenseVector[Double],
      VtXty: DenseVector[Double], Xty: DenseVector[Double], yty: Double,
      estSigmasq: Boolean, estTausq: Boolean
  ): (Double, Double) = {
    val p = mu.rows
    val L = mu.cols
    var sigmasq = sigmasq0
    var tausq = tausq0
    val a01 = sum(Dsq)
    val a11 = sum(Dsq.map(x => x * x))
    val b = DenseVector.tabulate(p) { j =>
      var acc = 0.0; var k = 0
      while (k < L) { acc += mu(j, k) * PIP(j, k); k += 1 }
      acc
    }
    val Vtb = V.t * b
    val diagVtMV = Vtb.map(x => x * x)
    val tmpD = DenseVector.zeros[Double](p)
    var l = 0
    while (l < L) {
      val bl = DenseVector.tabulate(p)(j => mu(j, l) * PIP(j, l))
      val Vtbl = V.t * bl
      diagVtMV -= Vtbl.map(x => x * x)
      var j = 0
      while (j < p) { tmpD(j) += PIP(j, l) * (mu(j, l) * mu(j, l) + 1.0 / omega(j, l)); j += 1 }
      l += 1
    }
    // diagVtMV += rowSums((V')² * tmpD): entry k gets Σ_j V(j,k)² tmpD(j)
    var k = 0
    while (k < p) {
      var acc = 0.0; var j = 0
      while (j < p) { acc += V(j, k) * V(j, k) * tmpD(j); j += 1 }
      diagVtMV(k) += acc
      k += 1
    }
    val x0 = yty - 2.0 * sum(b *:* Xty) + sum(Dsq *:* diagVtMV)
    val x1 = sum(Xty.map(v => v * v)) - 2.0 * sum(Vtb *:* VtXty *:* Dsq) +
      sum(Dsq.map(v => v * v) *:* diagVtMV)
    if (estTausq) {
      // solve [[n, a01],[a01, a11]] (s,t)' = (x0,x1)'
      val det = n * a11 - a01 * a01
      val s = (a11 * x0 - a01 * x1) / det
      val t = (n * x1 - a01 * x0) / det
      if (s > 0 && t > 0) { sigmasq = s; tausq = t }
      else { sigmasq = x0 / n; tausq = 0.0 }
    } else if (estSigmasq) {
      sigmasq = (x0 - a01 * tausq) / n
    }
    (sigmasq, tausq)
  }

  /** Credible sets from single-effect PIPs with purity filtering and dedup
    * (method/susie_inf.py:406-470). For credible sets over 100 variants the
    * reference purity-checks a seeded random subsample; we check the top-100
    * by PIP instead (deterministic; documented divergence).
    */
  def credInf(
      PIP: DenseMatrix[Double],
      ld: DenseMatrix[Double],
      coverage: Double = 0.99,
      purity: Double = 0.5,
      dedup: Boolean = true
  ): List[List[Int]] =
    credInfWithEffects(PIP, ld, coverage, purity, dedup).map(_._2)

  /** Like [[credInf]] but keeps the single-effect column index each
    * credible set came from, so callers can read the matching lbf.
    */
  def credInfWithEffects(
      PIP: DenseMatrix[Double],
      ld: DenseMatrix[Double],
      coverage: Double = 0.99,
      purity: Double = 0.5,
      dedup: Boolean = true
  ): List[(Int, List[Int])] = {
    val p = PIP.rows
    var cred = List.empty[(Int, List[Int])]
    for (i <- 0 until PIP.cols) {
      val sortinds = (0 until p).sortBy(j => -PIP(j, i))
      var cum = 0.0
      var ind = -1
      var j = 0
      while (j < p && ind < 0) {
        cum += PIP(sortinds(j), i)
        if (cum >= coverage) ind = j
        j += 1
      }
      if (ind >= 0) {
        val credset = sortinds.take(ind + 1).toList
        if (credset.length == 1) cred :+= ((i, credset))
        else {
          val rows = credset.take(100)
          val minAbs = rows.flatMap(a => rows.map(b => math.abs(ld(a, b)))).min
          if (minAbs > purity) cred :+= ((i, credset.sorted))
        }
      }
    }
    if (dedup) {
      // reference dedups by variant membership; keep the first effect
      // column that produced each distinct set
      val seen = scala.collection.mutable.Set.empty[List[Int]]
      cred.filter { case (_, s) => seen.add(s) }
    } else cred
  }
}
