package graft.run

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md): run the transcript-corpus
  * rollup+MP pipeline `trials` times in one JVM and report the best trial
  * (min time ≙ least host noise — the sandbox host is shared, so single
  * shots vary several-fold). The driver script runs this at
  * SPARK_GRAFT_CPUS = N and 4N on the same input and computes
  * efficiency = (throughput@4N / throughput@N) / 4.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "2000").toInt
    val turnsScale = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS_SCALE", "20").toInt
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs = (1 to trials).map { t =>
      val r = graft.Bench.pipelineBench(spark, convs, turnsScale)
      System.err.println(f"[scaling] trial $t cpus=$cpus rollup=${r._4}%.2fs mp=${r._5}%.2fs")
      r
    }
    val nPoints = runs.head._1
    val nSubseq = runs.head._3
    val bestRollup = runs.map(_._4).min
    val bestMp = runs.map(_._5).min
    println(f"""{"bench":"scaling","cpus":$cpus,"convs":$convs,"turns_scale":$turnsScale,""" +
      f""""trials":$trials,"points":$nPoints,"subsequences":$nSubseq,""" +
      f""""rollup_sec":$bestRollup%.3f,"points_per_sec":${nPoints / bestRollup}%.0f,""" +
      f""""mp_sec":$bestMp%.3f,"subseq_per_sec":${nSubseq / bestMp}%.0f}""")
    spark.stop()
  }
}
