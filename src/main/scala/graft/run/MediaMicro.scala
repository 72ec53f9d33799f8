package graft.run

/** Microbenchmark for the JDK media codecs outside Spark: per-op cost of
  * PNG encode / PNG decode / WAV encode / WAV decode at 1 vs N threads —
  * isolates JDK-static contention from Spark overheads.
  */
object MediaMicro {
  def main(args: Array[String]): Unit = {
    val nOps = if (args.nonEmpty) args(0).toInt else 500
    val threads = if (args.length > 1) args(1).toInt else 32
    import graft.ops.Multimodal._
    val pngs = (0 until nOps).map(i => encodePng(i * 3L)).toArray
    val wavs = (0 until nOps).map(i => encodeWav(i * 3L + 1)).toArray

    def bench(what: String, nThreads: Int)(op: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val futs = (0 until nOps).map(i =>
        pool.submit(new Runnable { def run(): Unit = op(i) }))
      futs.foreach(_.get())
      pool.shutdown()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $what threads=$nThreads ops=$nOps wall=$dt%.3f " +
        f"perOpMs=${dt * 1000 / nOps}%.3f")
    }

    for (t <- Seq(1, threads)) {
      bench("png_encode", t)(i => { encodePng(i * 3L); () })
      bench("png_decode", t)(i => { decodeImage(i * 3L, pngs(i)); () })
      bench("img_vec", t)(i => { imageDedupVec(i * 3L, pngs(i)); () })
      bench("wav_encode", t)(i => { encodeWav(i * 3L + 1); () })
      bench("wav_decode", t)(i => { decodeAudio(i * 3L + 1, wavs(i)); () })
      bench("wav_vec", t)(i => { audioDedupVec(i * 3L + 1, wavs(i)); () })
    }
  }
}
