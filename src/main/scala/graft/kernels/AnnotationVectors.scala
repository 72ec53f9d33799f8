package graft.kernels

/** Annotation vectors and corrected matrix profile
  * (ref: /root/reference/matrixprofile/transform.py).
  */
object AnnotationVectors {

  /** All ones (ref transform.py:90-125). */
  def makeDefaultAv(ts: Array[Double], w: Int): Array[Double] =
    Array.fill(ts.length - w + 1)(1.0)

  /** Complexity estimate sqrt(sum(diff^2)) per window, min-max normalized by
    * (av - min)/max (ref transform.py:128-178 — note the reference divides
    * by max, not max-min).
    */
  def makeComplexityAv(ts: Array[Double], w: Int): Array[Double] = {
    val plen = ts.length - w + 1
    val av = new Array[Double](plen)
    var i = 0
    while (i < plen) {
      var ce = 0.0
      var j = i + 1
      while (j < i + w) {
        val d = ts(j) - ts(j - 1)
        ce += d * d
        j += 1
      }
      av(i) = math.sqrt(ce)
      i += 1
    }
    val maxV = av.max
    val minV = av.min
    if (maxV == 0) Array.fill(plen)(0.0)
    else av.map(v => (v - minV) / maxV)
  }

  /** 1 where window std < mean(all window stds), else 0
    * (ref transform.py:181-229).
    */
  def makeMeanStdAv(ts: Array[Double], w: Int): Array[Double] = {
    val (_, sig) = MovingStats.movingAvgStd(ts, w)
    val mu = MovingStats.mean(sig)
    sig.map(s => if (s < mu) 1.0 else 0.0)
  }

  /** 1 - normalized count of values equal to the global min/max per window
    * (ref transform.py:232-285).
    */
  def makeClippingAv(ts: Array[Double], w: Int): Array[Double] = {
    val plen = ts.length - w + 1
    val gMax = ts.max
    val gMin = ts.min
    val av = new Array[Double](plen)
    var i = 0
    while (i < plen) {
      var clip = 0.0
      var j = i
      while (j < i + w) {
        if (ts(j) == gMax || ts(j) == gMin) clip += 1
        j += 1
      }
      av(i) = clip
      i += 1
    }
    val minV = av.min
    for (j <- av.indices) av(j) -= minV
    val maxV = av.max
    if (maxV == 0) Array.fill(plen)(0.0) else av.map(v => 1.0 - v / maxV)
  }

  /** Corrected MP: cmp = mp + (1 - av) * max(mp) (ref transform.py:78-83).
    * Requires av values in [0,1] and len(av) == len(mp).
    */
  def applyAv(mp: Array[Double], av: Array[Double]): Array[Double] = {
    require(av.length == mp.length, "Lengths of annotation vector and mp are different")
    require(av.forall(v => v >= 0.0 && v <= 1.0),
      "Annotation vector values must be between 0 and 1")
    val maxVal = mp.max
    Array.tabulate(mp.length)(i => mp(i) + (1.0 - av(i)) * maxVal)
  }
}
