package graft.run

import graft.kernels.{Mpx, Stomp, Scrimp}

/** Single-series kernel throughput at the reference's own benchmark
  * config (BASELINE.md: random uniform, n=2^15, w=32, single thread).
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1 << 15
    val w = if (args.length > 1) args(1).toInt else 32
    val rng = new java.util.Random(42)
    val ts = Array.fill(n)(rng.nextDouble())

    def time[T](name: String)(body: => T): Unit = {
      body // warmup
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      val plen = n - w + 1
      println(f"$name%-10s n=$n w=$w: $sec%.3f s  (${plen / sec}%.0f subseq/s)")
    }

    time("mpx")(Mpx.mpxSelf(ts, w))
    time("stomp")(Stomp.stomp(ts, w))
    if (n <= (1 << 15)) time("scrimp++")(Scrimp.scrimpPlusPlus(ts, w))
  }
}
