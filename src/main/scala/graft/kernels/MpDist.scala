package graft.kernels

/** MPDist series-to-series distance and its sliding-vector form
  * (ref: /root/reference/matrixprofile/algorithms/mpdist.py).
  */
object MpDist {

  /** MPDist = k-th smallest of concat(AB, BA) join profiles with
    * k = ceil(threshold*(|a|+|b|)) - 1 (ref mpdist.py:20-77). Exact
    * selection — the reference's golden test pins 1.46e-7.
    */
  def mpdist(ts: Array[Double], tsB: Array[Double], w: Int,
      threshold: Double = 0.05): Double = {
    val (mpA, _, mpB, _) = Mpx.mpxAb(ts, tsB, w)
    val abba = new Array[Double](mpA.length + mpB.length)
    System.arraycopy(mpA, 0, abba, 0, mpA.length)
    System.arraycopy(mpB, 0, abba, mpA.length, mpB.length)
    val clean = abba.filter(v => !v.isNaN && !v.isInfinite)
    if (clean.isEmpty) Double.PositiveInfinity
    else {
      java.util.Arrays.sort(clean)
      val upperIdx = math.ceil(threshold * (ts.length + tsB.length)).toInt - 1
      clean(math.min(clean.length - 1, upperIdx))
    }
  }

  /** All-pairs MASS profiles: one row per query subsequence
    * (ref mpdist.py:80-106).
    */
  def massDistanceMatrix(ts: Array[Double], query: Array[Double], w: Int): Array[Array[Double]] = {
    val rows = query.length - w + 1
    val out = new Array[Array[Double]](rows)
    val prep = Mass2.prepare(ts, w) // fft(ts) + rolling stats shared by all rows
    var i = 0
    while (i < rows) {
      out(i) = Mass2.mass2Prepared(prep, java.util.Arrays.copyOfRange(query, i, i + w))
      i += 1
    }
    out
  }

  /** MPDist from an already-built profile (ref mpdist.py:109-142). Note the
    * selection index here is ceil(threshold*len) (no -1), per the
    * reference. The k-th order statistic is found by in-place quickselect —
    * value-identical to the reference's sort-then-index, ~5x cheaper on the
    * snippets hot path (one selection per dv offset) — so `profile` is
    * MUTATED (compacted + partially reordered); callers refill it.
    */
  def calculateMpdist(profile: Array[Double], threshold: Double, dataLength: Int): Double = {
    val distLoc = math.ceil(threshold * dataLength).toInt
    // compact finite values in place
    var n = 0
    var i = 0
    while (i < profile.length) {
      val v = profile(i)
      if (!v.isNaN && !v.isInfinite) { profile(n) = v; n += 1 }
      i += 1
    }
    if (n < 1) Double.PositiveInfinity
    else if (n > distLoc) kthSmallest(profile, n, distLoc)
    else {
      // reference behavior: fewer values than the selection index -> max
      // (sorted last); n == distLoc would index out of bounds there too
      require(n != distLoc || distLoc == 0,
        s"selection index $distLoc == profile length (reference would throw)")
      if (n == 0) Double.PositiveInfinity
      else {
        var mx = profile(0)
        var j = 1
        while (j < n) { if (profile(j) > mx) mx = profile(j); j += 1 }
        mx
      }
    }
  }

  /** In-place quickselect: the element that would sit at `a(k)` after
    * sorting `a(0 until len)` ascending. Values must be NaN-free.
    */
  private def kthSmallest(a: Array[Double], len: Int, k: Int): Double = {
    var lo = 0
    var hi = len - 1
    while (lo < hi) {
      // median-of-3 pivot
      val mid = (lo + hi) >>> 1
      var pivot = a(mid)
      val l0 = a(lo); val h0 = a(hi)
      if ((pivot < l0) == (pivot < h0)) pivot = if ((l0 < pivot) == (l0 < h0)) h0 else l0
      var i = lo
      var j = hi
      while (i <= j) {
        while (a(i) < pivot) i += 1
        while (a(j) > pivot) j -= 1
        if (i <= j) {
          val t = a(i); a(i) = a(j); a(j) = t
          i += 1; j -= 1
        }
      }
      if (k <= j) hi = j
      else if (k >= i) lo = i
      else return a(k)
    }
    a(k)
  }

  /** All-pairs distance matrix by rolling-diagonal exact dot products —
    * value-equivalent to [[massDistanceMatrix]] (same rolling stats, the
    * same distance algebra and constant-window fixes as mass2.py:66-85;
    * the only delta is the FFT convolution's ~1e-12 rounding residue,
    * which MASS itself carries as a complex component and discards). One
    * O(w) seed per diagonal plus O(1) per cell (the STOMP recurrence,
    * ref stomp.py:146-156) replaces one length-n FFT per query row —
    * ~25x less work and no per-row transform state, which is what lets
    * snippet tile tasks run hundreds of rows in bounded memory.
    */
  def dotDistanceMatrix(ts: Array[Double], query: Array[Double],
      w: Int): Array[Array[Double]] = {
    val rows = query.length - w + 1
    val cols = ts.length - w + 1
    val (muT, sigT) = MovingStats.movingAvgStd(ts, w)
    val (muQ, sigQ) = MovingStats.movingAvgStd(query, w)
    val out = Array.ofDim[Double](rows, cols)
    val threshold = Mass2.DefaultThreshold
    // diagonals d = c - r, one O(w) seed at the first cell of each
    var d = -(rows - 1)
    while (d < cols) {
      var r = math.max(0, -d)
      var c = r + d
      var dot = 0.0
      var k = 0
      while (k < w) { dot += query(r + k) * ts(c + k); k += 1 }
      var first = true
      while (r < rows && c < cols) {
        if (!first)
          dot += query(r + w - 1) * ts(c + w - 1) - query(r - 1) * ts(c - 1)
        first = false
        var tmp = sigT(c) * sigQ(r)
        if (tmp == 0) tmp = 1e-12
        var dr = 2.0 * (w - (dot - w * muT(c) * muQ(r)) / tmp)
        if (sigT(c) < threshold)
          dr = if (sigQ(r) < threshold) 0.0 else w.toDouble
        out(r)(c) = math.sqrt(math.max(dr, 0.0))
        r += 1
        c += 1
      }
      d += 1
    }
    out
  }

  /** Sliding MPDist of tsB against every offset of ts (ref
    * mpdist.py:145-184): column minima of the pair-distance matrix +
    * per-row moving minima over a window of `rows`. The matrix comes from
    * [[dotDistanceMatrix]] (exact dots; the reference composes
    * mass_distance_matrix here, an anytime-friendly choice this engine
    * does not need for the full-matrix case).
    */
  def mpdistVector(ts: Array[Double], tsB: Array[Double], w: Int): Array[Double] =
    mpdistVectorFromMatrix(dotDistanceMatrix(ts, tsB, w), ts.length, tsB.length, w)

  /** The column-min + per-row moving-min + per-offset selection pipeline of
    * [[mpdistVector]] over an already-built distance matrix — shared with
    * DistributedSnippets (tile tasks build their matrices with prepared
    * query transforms) and mirrored by BruteMp's SQL twin.
    */
  def mpdistVectorFromMatrix(matrix: Array[Array[Double]], tsLen: Int,
      tsBLen: Int, w: Int): Array[Double] = {
    val rows = matrix.length
    val cols = matrix(0).length

    // column minima across rows
    val allRightHist = new Array[Double](cols)
    java.util.Arrays.fill(allRightHist, Double.PositiveInfinity)
    var i = 0
    while (i < rows) {
      var j = 0
      while (j < cols) {
        if (matrix(i)(j) < allRightHist(j)) allRightHist(j) = matrix(i)(j)
        j += 1
      }
      i += 1
    }
    // moving min over each row with window = rows
    val massMinimums = new Array[Array[Double]](rows)
    i = 0
    while (i < rows) {
      massMinimums(i) = MovingStats.movingMin(matrix(i), rows)
      i += 1
    }

    val mpdistLength = tsLen - tsBLen + 1
    val rightHistLength = tsBLen - w + 1
    val out = new Array[Double](mpdistLength)
    // one scratch, fully refilled per offset (calculateMpdist mutates it)
    val profile = new Array[Double](rows + rightHistLength)
    i = 0
    while (i < mpdistLength) {
      var j = 0
      while (j < rows) { profile(j) = massMinimums(j)(i); j += 1 }
      j = 0
      while (j < rightHistLength) { profile(rows + j) = allRightHist(i + j); j += 1 }
      out(i) = calculateMpdist(profile, 0.05, 2 * tsBLen)
      i += 1
    }
    out
  }
}
