package graft.align

/** Cubic B-spline interpolation (F2) with mirror-symmetric boundary
  * conditions — the smoothing-free `cspline1d`/`cspline1d_eval` semantics
  * the reference relies on (jagular/alignment.py:43-56), implemented from
  * the standard Unser recursive-filtering formulation: coefficient
  * computation is a single forward/backward IIR pass with pole
  * z1 = √3 − 2; evaluation sums the 4 overlapping cubic basis functions,
  * reflecting out-of-range abscissae.
  */
object Spline {

  private val z1 = math.sqrt(3.0) - 2.0

  /** Cubic-spline coefficients of a signal sampled on 0..n-1. */
  def cspline1d(signal: Array[Double]): Array[Double] = {
    val k = signal.length
    if (k == 1) return Array(signal(0) * 6.0)
    // forward pass; exact init: y+[0] = x[0] + z1 * Σ z1^k x[k]
    val yplus = new Array[Double](k)
    var powerSum = 0.0
    var p = 1.0
    var i = 0
    while (i < k) { powerSum += p * signal(i); p *= z1; i += 1 }
    yplus(0) = signal(0) + z1 * powerSum
    i = 1
    while (i < k) { yplus(i) = signal(i) + z1 * yplus(i - 1); i += 1 }
    // backward pass
    val out = new Array[Double](k)
    out(k - 1) = z1 / (z1 - 1.0) * yplus(k - 1)
    i = k - 2
    while (i >= 0) { out(i) = z1 * (out(i + 1) - yplus(i)); i -= 1 }
    var j = 0
    while (j < k) { out(j) *= 6.0; j += 1 }
    out
  }

  /** Centered cubic B-spline basis. */
  private def cubicBasis(x: Double): Double = {
    val ax = math.abs(x)
    if (ax < 1.0) 2.0 / 3.0 - ax * ax + ax * ax * ax / 2.0
    else if (ax < 2.0) { val t = 2.0 - ax; t * t * t / 6.0 }
    else 0.0
  }

  /** Evaluate the spline at one (possibly out-of-range) abscissa;
    * out-of-range values are mirror-reflected about the ends. */
  def evalAt(coeffs: Array[Double], x0: Double): Double = {
    val n = coeffs.length
    var x = x0
    // mirror reflection (repeat until inside; converges since the
    // reflections fold the line onto [0, n-1])
    var guard = 0
    while ((x < 0 || x > n - 1) && guard < 64) {
      if (x < 0) x = -x
      if (x > n - 1) x = 2.0 * (n - 1) - x
      guard += 1
    }
    val jlower = math.floor(x - 2.0).toInt + 1
    var res = 0.0
    var i = 0
    while (i < 4) {
      val thisj = jlower + i
      val indj = math.min(math.max(thisj, 0), n - 1)
      res += coeffs(indj) * cubicBasis(x - thisj)
      i += 1
    }
    res
  }

  def eval(coeffs: Array[Double], xs: Array[Double]): Array[Double] =
    xs.map(evalAt(coeffs, _))

  /** Linear interpolation on integer abscissae 0..n-1 (the reference's
    * `kind='linear'` mode, bounds_error=True). */
  def evalLinear(signal: Array[Double], x: Double): Double = {
    val n = signal.length
    require(x >= 0 && x <= n - 1, s"x=$x out of bounds [0, ${n - 1}]")
    val i = math.floor(x).toInt
    if (i == n - 1) signal(n - 1)
    else signal(i) + (x - i) * (signal(i + 1) - signal(i))
  }
}
