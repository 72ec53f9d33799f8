package graft.kernels

/** FLUSS semantic segmentation: corrected arc curve + regime extraction
  * (ref: /root/reference/matrixprofile/algorithms/regimes.py).
  */
object Fluss {

  /** Parabola of width n, height n/2 (ref regimes.py:16-40). Squares are
    * written as plain multiplication (not math.pow) so the expression is
    * bit-reproducible by the DuckDB oracle mirror (OracleSqlGen.q10) —
    * pow(x, 2) is not guaranteed correctly rounded in either engine.
    */
  def idealizedArcCurve(width: Double, index: Double): Double = {
    val height = width / 2.0
    val c = width / 2.0
    val b = height
    val a = height / ((width / 2.0) * (width / 2.0))
    -(a * ((index - c) * (index - c))) + b
  }

  /** Corrected arc curve from the profile index (ref regimes.py:43-91). */
  def cac(pi: Array[Long], w: Int): Array[Double] = {
    val n = pi.length
    val nnmark = new Array[Double](n)
    var i = 0
    while (i < n) {
      val small = math.min(i.toLong, pi(i)).toInt
      val large = math.max(i.toLong, pi(i)).toInt
      // small+1 == n only if a profile index self-points (impossible under
      // a self-join exclusion zone; the reference would raise IndexError)
      if (small + 1 < n) nnmark(small + 1) += 1
      nnmark(large) -= 1
      i += 1
    }
    val out = new Array[Double](n)
    var cum = 0.0
    i = 0
    while (i < n) {
      cum += nnmark(i)
      val v = cum / idealizedArcCurve(n, i)
      out(i) = if (v > 1) 1.0 else v
      i += 1
    }
    i = 0
    while (i < w) { out(i) = 1.0; i += 1 }
    i = n - w
    while (i < n) { out(i) = 1.0; i += 1 }
    out
  }

  /** Regime boundaries: iterative argmin of the CAC with exclusion zone
    * 5*w (ref regimes.py:94-152).
    */
  def extractRegimes(cacIn: Array[Double], w: Int, numRegimes: Int = 3): Array[Long] = {
    val ez = w * 5
    val tmp = cacIn.clone()
    val n = tmp.length
    val regimes = new Array[Long](numRegimes)
    var r = 0
    while (r < numRegimes) {
      val minIdx = Core.argmin(tmp)
      regimes(r) = minIdx.toLong
      var j = math.max(0, minIdx - ez)
      val end = math.min(n, minIdx + ez)
      while (j < end) { tmp(j) = Double.PositiveInfinity; j += 1 }
      r += 1
    }
    regimes
  }
}
