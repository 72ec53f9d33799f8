package graft.run

import org.apache.spark.sql.SparkSession

/** Repeat-run a single SparkEntry query to separate cold-start (codegen,
  * JIT, scan warmup) from steady-state cost.
  *
  * Usage: runMain graft.run.QueryBench <sfDir> <queryName> [reps]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      // sample load BEFORE the rep: read after, the 1-minute average
      // mostly echoes this process's own just-finished usage
      val ld = graft.Bench.load1()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.util.StageCache.release(spark)
      spark.catalog.clearCache()
      println(f"[qbench] $name rep=$r rows=$n sec=$dt%.3f load1=$ld%.2f")
    }
    spark.stop()
  }
}
