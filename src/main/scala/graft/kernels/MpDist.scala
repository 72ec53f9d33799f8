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
    * selection index here is ceil(threshold*len) (no -1), per the reference.
    */
  def calculateMpdist(profile: Array[Double], threshold: Double, dataLength: Int): Double = {
    val distLoc = math.ceil(threshold * dataLength).toInt
    val clean = profile.filter(v => !v.isNaN && !v.isInfinite)
    if (clean.length < 1) Double.PositiveInfinity
    else {
      java.util.Arrays.sort(clean)
      if (clean.length >= distLoc) clean(distLoc) else clean(clean.length - 1)
    }
  }

  /** Sliding MPDist of tsB against every offset of ts (ref
    * mpdist.py:145-184): column minima of the MASS matrix + per-row moving
    * minima over a window of `rows`.
    */
  def mpdistVector(ts: Array[Double], tsB: Array[Double], w: Int): Array[Double] = {
    val matrix = massDistanceMatrix(ts, tsB, w)
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

    val mpdistLength = ts.length - tsB.length + 1
    val rightHistLength = tsB.length - w + 1
    val out = new Array[Double](mpdistLength)
    i = 0
    while (i < mpdistLength) {
      val profile = new Array[Double](rows + rightHistLength)
      var j = 0
      while (j < rows) { profile(j) = massMinimums(j)(i); j += 1 }
      j = 0
      while (j < rightHistLength) { profile(rows + j) = allRightHist(i + j); j += 1 }
      out(i) = calculateMpdist(profile, 0.05, 2 * tsB.length)
      i += 1
    }
    out
  }
}
