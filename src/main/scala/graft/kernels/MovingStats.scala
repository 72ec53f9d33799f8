package graft.kernels

/** Rolling-window statistics kernels.
  *
  * Numeric semantics follow the reference library's Cython kernels
  * (`/root/reference/matrixprofile/cycore.pyx:24-155`): `muinvn` uses
  * Neumaier-compensated summation and returns the *inverse* standard
  * deviation, `movingAvgStd` uses the plain cumulative-sum recurrence with
  * a negative-variance clamp. Both must stay bit-compatible with the
  * reference because the matrix-profile kernels' golden tests
  * (tests/test_cycore.py, tests/test_mpx.py) pin their outputs.
  *
  * Pure JVM double arithmetic, no Spark imports — callable from inside
  * `mapGroups`/`mapPartitions` kernels and directly unit-testable.
  */
object MovingStats {

  /** Moving mean + *inverse* std `1/sqrt(sum((x-mu)^2))` with compensated
    * summation (ref: cycore.pyx:24-100 `muinvn`). sig(i)=0 for constant
    * windows.
    */
  def muinvn(a: Array[Double], w: Int): (Array[Double], Array[Double]) = {
    val n = a.length
    val profileLen = n - w + 1
    val h = new Array[Double](n)
    val r = new Array[Double](n)
    val mu = new Array[Double](profileLen)
    val sig = new Array[Double](profileLen)

    // moving mean, Neumaier-compensated add/remove
    var p = a(0)
    var s = 0.0
    var i = 1
    while (i < w) {
      val x = p + a(i)
      val z = x - p
      s = s + ((p - (x - z)) + (a(i) - z))
      p = x
      i += 1
    }
    mu(0) = (p + s) / w
    i = w
    while (i < n) {
      var x = p - a(i - w + 1)
      var z = x - p
      s = s + ((p - (x - z)) - (a(i - w) + z))
      p = x

      x = p + a(i)
      z = x - p
      s = s + ((p - (x - z)) + (a(i) - z))
      p = x

      mu(i - w + 1) = (p + s) / w
      i += 1
    }

    // moving inverse std via two-product (Dekker split) residuals
    val split = math.pow(2, 27) + 1
    i = 0
    while (i < profileLen) {
      var j = i
      while (j < i + w) {
        val muA = a(j) - mu(i)
        h(j) = muA * muA
        val c = split * muA
        val a1 = c - (c - muA)
        val a2 = muA - a1
        val a3 = a1 * a2
        r(j) = a2 * a2 - (((h(j) - a1 * a1) - a3) - a3)
        j += 1
      }
      var pp = h(i)
      var ss = r(i)
      j = i + 1
      while (j < i + w) {
        val x = pp + h(j)
        val z = x - pp
        ss = ss + (((pp - (x - z)) + (h(j) - z)) + r(j))
        pp = x
        j += 1
      }
      sig(i) = if (pp + ss == 0) 0.0 else 1.0 / math.sqrt(pp + ss)
      i += 1
    }
    (mu, sig)
  }

  /** Moving mean + std via cumulative sums, sigma^2 clamped at 0
    * (ref: cycore.pyx:105-155 `moving_avg_std`).
    */
  def movingAvgStd(a: Array[Double], w: Int): (Array[Double], Array[Double]) = {
    val n = a.length
    val profileLen = n - w + 1
    val cumsum = new Array[Double](n)
    val sqCumsum = new Array[Double](n)
    cumsum(0) = a(0)
    sqCumsum(0) = a(0) * a(0)
    var i = 1
    while (i < n) {
      cumsum(i) = a(i) + cumsum(i - 1)
      sqCumsum(i) = a(i) * a(i) + sqCumsum(i - 1)
      i += 1
    }
    val sums = new Array[Double](profileLen)
    val sqSums = new Array[Double](profileLen)
    sums(0) = cumsum(w - 1)
    sqSums(0) = sqCumsum(w - 1)
    i = 0
    while (i < n - w) {
      sums(i + 1) = cumsum(w + i) - cumsum(i)
      sqSums(i + 1) = sqCumsum(w + i) - sqCumsum(i)
      i += 1
    }
    val mu = new Array[Double](profileLen)
    val sig = new Array[Double](profileLen)
    i = 0
    while (i < profileLen) {
      mu(i) = sums(i) / w
      val sigSq = sqSums(i) / w - mu(i) * mu(i)
      sig(i) = if (sigSq < 0) 0.0 else math.sqrt(sigSq)
      i += 1
    }
    (mu, sig)
  }

  /** Moving minimum over window w via monotonic deque, O(n)
    * (semantics of ref core.py:318-337 `moving_min`). */
  def movingMin(a: Array[Double], w: Int): Array[Double] = movingExtreme(a, w, isMin = true)

  /** Moving maximum over window w (ref core.py:340-357 semantics). */
  def movingMax(a: Array[Double], w: Int): Array[Double] = movingExtreme(a, w, isMin = false)

  private def movingExtreme(a: Array[Double], w: Int, isMin: Boolean): Array[Double] = {
    val n = a.length
    val m = n - w + 1
    val out = new Array[Double](m)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      while (tail > head && deque(head) <= i - w) head += 1
      while (tail > head &&
        (if (isMin) a(deque(tail - 1)) >= a(i) else a(deque(tail - 1)) <= a(i))) tail -= 1
      deque(tail) = i
      tail += 1
      if (i >= w - 1) out(i - w + 1) = a(deque(head))
      i += 1
    }
    out
  }

  /** Exact moving median (ref core.py:360-394 `moving_median` =
    * np.median per window: mean of the two middle order statistics for
    * even w). O(n·w log w) — used on small windows only.
    */
  def movingMedian(a: Array[Double], w: Int): Array[Double] = {
    val n = a.length
    val m = n - w + 1
    val out = new Array[Double](m)
    val buf = new Array[Double](w)
    var i = 0
    while (i < m) {
      System.arraycopy(a, i, buf, 0, w)
      java.util.Arrays.sort(buf)
      out(i) = if (w % 2 == 1) buf(w / 2) else (buf(w / 2 - 1) + buf(w / 2)) / 2.0
      i += 1
    }
    out
  }

  /** np.median of the whole array. */
  def median(a: Array[Double]): Double = {
    val buf = a.clone()
    java.util.Arrays.sort(buf)
    val n = buf.length
    if (n % 2 == 1) buf(n / 2) else (buf(n / 2 - 1) + buf(n / 2)) / 2.0
  }

  /** Population mean. */
  def mean(a: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i); i += 1 }
    s / a.length
  }

  /** Population std (np.std default ddof=0). */
  def std(a: Array[Double]): Double = {
    val mu = mean(a)
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - mu; s += d * d; i += 1 }
    math.sqrt(s / a.length)
  }
}
