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
    * DistributedSnippets' tile tasks and mirrored by BruteMp's SQL twin.
    *
    * Fused single sweep over columns: per-row ascending-minima deques give
    * each row's moving minimum (window = rows) the moment its window
    * completes, and a ring buffer holds the last `rows` column minima — so
    * nothing rows×cols beyond the input matrix is ever materialized (the
    * r3 shape allocated a second full moving-minima matrix). Min
    * bookkeeping is comparison-only, so outputs are value-identical to
    * the unfused reference pipeline (mpdist.py:145-184).
    */
  def mpdistVectorFromMatrix(matrix: Array[Array[Double]], tsLen: Int,
      tsBLen: Int, w: Int): Array[Double] = {
    val rows = matrix.length
    val cols = matrix(0).length
    val mpdistLength = tsLen - tsBLen + 1
    val rightHistLength = tsBLen - w + 1
    // the ring sizes below assume the mpdist-vector shape, where the
    // moving-min window and the right-hist span are both tsB's profile
    // length — true for every matrix built from a tsB query
    require(rightHistLength == rows,
      s"matrix rows $rows != right-hist span $rightHistLength")
    // every output offset must see a complete window; a matrix narrower
    // than tsLen implies would otherwise leave silent 0.0 distances
    // (= "perfect match") where the unfused code failed loudly
    require(cols - rows + 1 >= mpdistLength,
      s"matrix cols $cols too narrow for $mpdistLength offsets (rows=$rows)")
    val out = new Array[Double](mpdistLength)
    // per-row ascending-minima deque (values + column ids, ring storage)
    val dqv = Array.ofDim[Double](rows, rows + 1)
    val dqc = Array.ofDim[Int](rows, rows + 1)
    val head = new Array[Int](rows)
    val tail = new Array[Int](rows)
    // ring of the last `rows` column minima
    val colMin = new Array[Double](rows)
    // scratch, fully refilled per offset (calculateMpdist mutates it)
    val profile = new Array[Double](rows + rightHistLength)
    val cap = rows + 1
    var ring = 0 // c % rows, maintained without division
    var c = 0
    while (c < cols) {
      var cm = Double.PositiveInfinity
      var r = 0
      while (r < rows) {
        val dv = dqv(r)
        val dc = dqc(r)
        val v = matrix(r)(c)
        if (v < cm) cm = v
        // pop dominated tail entries, push (v, c)
        var t = tail(r)
        val h = head(r)
        var p = if (t == 0) cap - 1 else t - 1
        while (t != h && dv(p) >= v) {
          t = p
          p = if (t == 0) cap - 1 else t - 1
        }
        dv(t) = v
        dc(t) = c
        t += 1
        tail(r) = if (t == cap) 0 else t
        // evict entries that left the window [c-rows+1, c]
        if (dc(h) <= c - rows) {
          val h2 = h + 1
          head(r) = if (h2 == cap) 0 else h2
        }
        r += 1
      }
      colMin(ring) = cm
      val i = c - rows + 1
      if (i >= 0 && i < mpdistLength) {
        var j = 0
        while (j < rows) { profile(j) = dqv(j)(head(j)); j += 1 }
        // colmins for [i, i+rows) start right after the slot just written
        var k = ring + 1
        j = 0
        while (j < rightHistLength) {
          if (k == rows) k = 0
          profile(rows + j) = colMin(k)
          k += 1
          j += 1
        }
        out(i) = calculateMpdist(profile, 0.05, 2 * tsBLen)
      }
      ring += 1
      if (ring == rows) ring = 0
      c += 1
    }
    out
  }
}
