package graft.kernels

/** MASS2 distance profile (ref: algorithms/mass2.py:14-96).
  *
  * Carries complex arithmetic through the distance algebra exactly like the
  * reference: the FFT product's imaginary residue makes slightly-negative
  * radicands produce near-zero real distances (complex sqrt) instead of NaN.
  * `mass2` returns the real component, which is what every internal consumer
  * of the reference uses (mpdist.py:104 `np.real`, top_k_motifs.py:141).
  */
object Mass2 {

  val DefaultThreshold = 1e-10

  /** Precomputed per-(ts, m) state for repeated MASS queries against the
    * same series: fft(ts) and the rolling stats are shared across all
    * queries of length m (MpDist.massDistanceMatrix issues one query per
    * subsequence — without this, fft(ts) is recomputed per row). Values
    * are identical to the one-shot path: same transforms, same order.
    */
  final class PreparedTs(val ts: Array[Double], val m: Int) {
    val n: Int = ts.length
    val x: Array[Double] = Fft.fftReal(ts)
    val stats: (Array[Double], Array[Double]) = MovingStats.movingAvgStd(ts, m)
  }

  def prepare(ts: Array[Double], m: Int): PreparedTs = new PreparedTs(ts, m)

  /** Complex distance profile as (re, im) arrays. */
  def mass2Complex(ts: Array[Double], query: Array[Double],
      threshold: Double = DefaultThreshold): (Array[Double], Array[Double]) =
    mass2PreparedComplex(prepare(ts, query.length), query, threshold)

  /** Real part of the MASS2 profile against a prepared series. */
  def mass2Prepared(prep: PreparedTs, query: Array[Double],
      threshold: Double = DefaultThreshold): Array[Double] =
    mass2PreparedComplex(prep, query, threshold)._1

  def mass2PreparedComplex(prep: PreparedTs, query: Array[Double],
      threshold: Double = DefaultThreshold): (Array[Double], Array[Double]) = {
    val n = prep.n
    val m = query.length
    require(m == prep.m, s"prepared for m=${prep.m}, got query of length $m")
    val meany = MovingStats.mean(query)
    val sigmay = MovingStats.std(query)
    val (meanx, sigmax) = prep.stats

    // fft(rev(query) ++ 0s) * fft(ts), inverse — fft(ts) from the prep
    val yt = new Array[Double](n)
    var qi = 0
    while (qi < m) { yt(qi) = query(m - 1 - qi); qi += 1 }
    val y = Fft.fftReal(yt)
    val z = Fft.complexMult(prep.x, y)
    Fft.ifftComplex(z)
    val plen = n - m + 1
    val re = new Array[Double](plen)
    val im = new Array[Double](plen)
    var i = 0
    while (i < plen) {
      var tmp = sigmax(i) * sigmay
      if (tmp == 0) tmp = 1e-12
      val zr = z(2 * (m - 1 + i))
      val zi = z(2 * (m - 1 + i) + 1)
      // dist = 2 * (m - (z - m*meanx*meany) / tmp)
      var dr = 2.0 * (m - (zr - m * meanx(i) * meany) / tmp)
      var di = 2.0 * (-zi / tmp)
      // constant-window fixes (mass2.py:79-82)
      if (sigmax(i) < threshold) {
        dr = if (sigmay < threshold) 0.0 else m.toDouble
        di = 0.0
      }
      // complex sqrt
      val mag = math.hypot(dr, di)
      val sr = math.sqrt(math.max((mag + dr) / 2.0, 0.0))
      val si = {
        val v = math.sqrt(math.max((mag - dr) / 2.0, 0.0))
        if (di < 0) -v else v
      }
      re(i) = sr
      im(i) = si
      i += 1
    }
    (re, im)
  }

  /** Real part of the MASS2 distance profile. */
  def mass2(ts: Array[Double], query: Array[Double],
      threshold: Double = DefaultThreshold): Array[Double] =
    mass2Complex(ts, query, threshold)._1
}
