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

  /** Complex distance profile as (re, im) arrays. */
  def mass2Complex(ts: Array[Double], query: Array[Double],
      threshold: Double = DefaultThreshold): (Array[Double], Array[Double]) = {
    val n = ts.length
    val m = query.length
    val meany = MovingStats.mean(query)
    val sigmay = MovingStats.std(query)
    val (meanx, sigmax) = MovingStats.movingAvgStd(ts, m)

    val z = Fft.fftConvolveComplex(ts, query) // interleaved, length 2n
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
