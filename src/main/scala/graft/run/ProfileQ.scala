package graft.run

import org.apache.spark.sql.SparkSession

/** Scratch profiler for one query: one cold rep (rep=0) plus `reps` warm
  * reps, printing per-rep wall, Spark job/stage/task counts and summed
  * task time from a listener — the evidence for where a small-data
  * query's seconds actually go.
  * Usage: `runMain graft.run.ProfileQ <query> [reps]`.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q39_media_dedup"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = e.stageInfo
        val ms = si.taskMetrics.executorRunTime
        if (ms > 300)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"runSec=${ms / 1000.0}%.2f gcSec=${si.taskMetrics.jvmGCTime / 1000.0}%.2f " +
            s"name=${si.name take 80}")
        ()
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) {
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
          gcMs.addAndGet(e.taskMetrics.jvmGCTime)
        }
        ()
      }
    })
    val fn = graft.SparkEntry.queries(name)
    for (r <- 0 to reps) {
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain listener bus
      println(f"[profileq] rep=$r wall=$dt%.3f rows=$n jobs=${jobs.get()} " +
        f"stages=${stages.get()} tasks=${tasks.get()} " +
        f"taskTimeSec=${taskMs.get() / 1000.0}%.2f gcSec=${gcMs.get() / 1000.0}%.2f")
      graft.util.StageCache.release(spark)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
