package graft.kernels

/** Global + moving statistics bundle
  * (ref: /root/reference/matrixprofile/algorithms/statistics.py:15-90).
  * The SQL-expressible twin of this kernel lives in graft.ops (window
  * aggregates); this array form feeds the in-kernel MP paths.
  */
object Statistics {

  final case class Stats(
      min: Double, max: Double, mean: Double, std: Double, median: Double,
      movingMin: Array[Double], movingMax: Array[Double],
      movingMean: Array[Double], movingStd: Array[Double],
      movingMedian: Array[Double], windowSize: Int)

  def statistics(ts: Array[Double], windowSize: Int): Stats = {
    require(windowSize >= 3, "Window size cannot be less than 3")
    require(windowSize <= ts.length, "Window size cannot be greater than len(ts)")
    val (mu, sig) = MovingStats.movingAvgStd(ts, windowSize)
    Stats(
      min = ts.min,
      max = ts.max,
      mean = MovingStats.mean(ts),
      std = MovingStats.std(ts),
      median = MovingStats.median(ts),
      movingMin = MovingStats.movingMin(ts, windowSize),
      movingMax = MovingStats.movingMax(ts, windowSize),
      movingMean = mu,
      movingStd = sig,
      movingMedian = MovingStats.movingMedian(ts, windowSize),
      windowSize = windowSize)
  }
}
