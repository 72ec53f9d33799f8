package graft.kernels

/** SKIMP pan-matrix-profile over a set of windows, plus the
  * maximum-subsequence upper-window search
  * (ref: /root/reference/matrixprofile/algorithms/skimp.py).
  *
  * The PMP here is kept in long form (one (window, mp, pi) row per window)
  * rather than a dense 2-D matrix; the distributed layer computes each
  * window's MP as an independent task. BFS window ordering (binarySplit) is
  * an anytime-progress ordering only — exact runs are order-independent.
  */
object Skimp {

  /** BFS ordering of 0..n-1 (ref skimp.py:45-93 `binary_split`). */
  def binarySplit(n: Int): Array[Int] = {
    if (n < 2) return Array(0)
    val index = scala.collection.mutable.ArrayBuffer(0)
    val intervals = scala.collection.mutable.Queue((1, n - 1))
    while (intervals.nonEmpty) {
      val (lo, hi) = intervals.dequeue()
      val mid = (lo + hi) / 2
      index += mid
      if (lo != hi) {
        if (lo != mid) intervals.enqueue((lo, mid - 1))
        if (hi != mid) intervals.enqueue((mid + 1, hi))
      }
    }
    index.toArray
  }

  /** One PMP row, aligned/padded to series length n: mp padded with ∞, pi
    * padded with -1 (reference pads pi with NaN cast to int; we use -1 as
    * the explicit "no index" sentinel).
    */
  final case class PmpRow(window: Int, mp: Array[Double], pi: Array[Long])

  def padRow(window: Int, mp: Array[Double], pi: Array[Long], n: Int,
      toEuclidean: Boolean): PmpRow = {
    val mpOut = Array.fill(n)(Double.PositiveInfinity)
    val piOut = Array.fill(n)(-1L)
    val src = if (toEuclidean) Core.pearsonToEuclidean(mp, window) else mp
    System.arraycopy(src, 0, mpOut, 0, src.length)
    System.arraycopy(pi, 0, piOut, 0, pi.length)
    PmpRow(window, mpOut, piOut)
  }

  /** Exact SKIMP: MPX per window (ref skimp.py:96-242 at sample_pct=1),
    * reusing rows from `prior` when the window was already computed
    * (skimp.py:193-205 memoization).
    */
  def skimp(ts: Array[Double], windows: Array[Int],
      crossCorrelation: Boolean = false,
      prior: Map[Int, PmpRow] = Map.empty): Seq[PmpRow] = {
    val n = ts.length
    windows.toSeq.map { w =>
      prior.getOrElse(w, {
        val (mp, pi) = Mpx.mpxSelf(ts, w, crossCorrelation)
        padRow(w, mp, pi, n, toEuclidean = false)
      })
    }
  }

  /** Project one window's MP out of a PMP: select the row and trim the
    * padding back to profile length n-w+1 (ref utils.py:45-100 `pick_mp`).
    */
  def pickMp(rows: Seq[PmpRow], w: Int, n: Int): Option[(Array[Double], Array[Long])] =
    rows.find(_.window == w).map { r =>
      val plen = n - w + 1
      (java.util.Arrays.copyOf(r.mp, plen), java.util.Arrays.copyOf(r.pi, plen))
    }

  /** Upper-window search: double from `lowerWindow` while max Pearson ≥
    * threshold, then refine in +refineStepsize increments, windows kept
    * even (ref skimp.py:245-381 `maximum_subsequence`).
    */
  def maximumSubsequence(ts: Array[Double], threshold: Double = 0.95,
      refineStepsize: Double = 0.05, lowerWindow: Int = 8): Int = {
    val maxWindow = math.floor(ts.length / 2.0).toInt
    var windowSize = lowerWindow
    val windows = scala.collection.mutable.ArrayBuffer.empty[Int]
    val pearson = scala.collection.mutable.ArrayBuffer.empty[Double]

    def maxCorr(w: Int): Double = {
      val (mp, _) = Mpx.mpxSelf(ts, w, crossCorrelation = true)
      var best = Double.NegativeInfinity
      var i = 0
      while (i < mp.length) {
        if (!mp(i).isInfinite && mp(i) > best) best = mp(i)
        i += 1
      }
      best
    }

    var break = false
    while (windowSize <= maxWindow && !break) {
      val corr = maxCorr(windowSize)
      windows += windowSize
      pearson += corr
      if (corr < threshold) break = true else windowSize *= 2
    }

    val kept = windows.zip(pearson).filter(_._2 > threshold).map(_._1)
    if (kept.isEmpty) return -1 // reference warns and returns NaN
    windowSize = kept.last

    // refinement: windows at +5%..+100% of the last in-threshold window,
    // rounded down and bumped to even (skimp.py:349-360)
    val testWindows = ((BigDecimal(refineStepsize) until BigDecimal(1.0) by
      BigDecimal(refineStepsize)).map(_.toDouble) :+ 1.0)
      .map(p => math.floor((1.0 + p) * windowSize).toInt)
      .map(wv => if (wv % 2 == 1) wv + 1 else wv)

    var result = windowSize
    break = false
    for (wv <- testWindows if !break) {
      val corr = maxCorr(wv)
      result = wv
      if (corr < threshold) break = true
    }
    result
  }
}
