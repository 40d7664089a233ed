package graft.functions

import org.apache.commons.math3.special.Erf

/** Scalar special-function kernels (commons-math3 backed).
  *
  * For one degree of freedom the chi² distribution reduces to the
  * complementary error function, which keeps full precision for p-values far
  * below double's normal range of `1 - cdf` formulations:
  *   sf(x)  = erfc(sqrt(x/2))
  *   isf(p) = 2 * erfcInv(p)^2
  *
  * Mirrors the reference's scipy kernels (common/udf.py:20-100) without the
  * Python-worker round trip.
  */
object SpecialMath {

  /** chi² survival function, df=1 (p-value from chi² statistic). */
  def chi2Sf(x: Double): Double = Erf.erfc(math.sqrt(x / 2.0))

  /** chi² inverse survival function, df=1 (chi² statistic from p-value).
    *
    * For df=1, sf(x) = 2·Φ̄(√x), so isf(p) = Φ⁻¹(p/2)². Uses [[ndtri]]
    * rather than commons-math's `erfcInv` (which computes `erfInv(1-p)` and
    * collapses to ∞ below p ≈ 1e-17).
    */
  def chi2Isf(p: Double): Double = {
    val z = ndtri(p / 2.0)
    z * z
  }

  /** Standard normal survival function (used by PICS). */
  def normSf(x: Double): Double = 0.5 * Erf.erfc(x / math.sqrt(2.0))

  /** Standard normal inverse survival function. */
  def normIsf(p: Double): Double = -ndtri(p)

  /** Inverse standard normal CDF (quantile), Wichura's algorithm AS 241
    * (PPND16), accurate to ~1e-16 relative over the full double range
    * including the extreme tails (p down to ~1e-316) — the same rational
    * approximation family scipy's `ndtri` uses.
    */
  def ndtri(p: Double): Double = {
    if (p <= 0.0) return Double.NegativeInfinity
    if (p >= 1.0) return Double.PositiveInfinity
    val q = p - 0.5
    if (math.abs(q) <= 0.425) {
      val r = 0.180625 - q * q
      q * (((((((2.5090809287301226727e+3 * r + 3.3430575583588128105e+4) * r +
        6.7265770927008700853e+4) * r + 4.5921953931549871457e+4) * r +
        1.3731693765509461125e+4) * r + 1.9715909503065514427e+3) * r +
        1.3314166789178437745e+2) * r + 3.3871328727963666080e+0) /
        (((((((5.2264952788528545610e+3 * r + 2.8729085735721942674e+4) * r +
          3.9307895800092710610e+4) * r + 2.1213794301586595867e+4) * r +
          5.3941960214247511077e+3) * r + 6.8718700749205790830e+2) * r +
          4.2313330701600911252e+1) * r + 1.0)
    } else {
      var r = if (q < 0.0) p else 1.0 - p
      r = math.sqrt(-math.log(r))
      val v =
        if (r <= 5.0) {
          val s = r - 1.6
          (((((((7.74545014278341407640e-4 * s + 2.27238449892691845833e-2) * s +
            2.41780725177450611770e-1) * s + 1.27045825245236838258e+0) * s +
            3.64784832476320460504e+0) * s + 5.76949722146069140550e+0) * s +
            4.63033784615654529590e+0) * s + 1.42343711074968357734e+0) /
            (((((((1.05075007164441684324e-9 * s + 5.47593808499534494600e-4) * s +
              1.51986665636164571966e-2) * s + 1.48103976427480074590e-1) * s +
              6.89767334985100004550e-1) * s + 1.67638483018380384940e+0) * s +
              2.05319162663775882187e+0) * s + 1.0)
        } else {
          val s = r - 5.0
          (((((((2.01033439929228813265e-7 * s + 2.71155556874348757815e-5) * s +
            1.24266094738807843860e-3) * s + 2.65321895265761230930e-2) * s +
            2.96560571828504891230e-1) * s + 1.78482653991729133580e+0) * s +
            5.46378491116411436990e+0) * s + 6.65790464350110377720e+0) /
            (((((((2.04426310338993978564e-15 * s + 1.42151175831644588870e-7) * s +
              1.84631831751005468180e-5) * s + 7.86869131145613259100e-4) * s +
              1.48753612908506148525e-2) * s + 1.36929880922735805310e-1) * s +
              5.99832206555887937690e-1) * s + 1.0)
        }
      if (q < 0.0) -v else v
    }
  }

  /** Stable log-sum-exp over an array (common/stats.py:23-41). */
  def logsum(arr: Array[Double]): Double = {
    if (arr.isEmpty) return Double.NegativeInfinity
    var max = arr(0)
    var i = 1
    while (i < arr.length) { if (arr(i) > max) max = arr(i); i += 1 }
    if (max.isNegInfinity) return Double.NegativeInfinity
    var s = 0.0
    i = 0
    while (i < arr.length) { s += math.exp(arr(i) - max); i += 1 }
    max + math.log(s)
  }
}
