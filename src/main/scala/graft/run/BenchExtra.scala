package graft.run

import org.apache.spark.sql.SparkSession

/** Focused per-query timing for optimization iteration (guide §1.4):
  * same session shape and rep discipline as graft.Bench (count() action,
  * StageCache.release + clearCache between reps) but over a chosen query
  * subset with a configurable rep count — so a single query's before/after
  * can be measured in seconds instead of re-running the full battery.
  * Usage: `runMain graft.run.BenchExtra <reps> <query...>`; with no query
  * args, runs the full set. Prints one JSON line of warm medians.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed pre-passes, identical to Bench: page inputs, materialize the
    // q36 bucket layout
    Seq("events", "documents", "embeddings", "lineitem").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    try graft.SparkEntry.bucketedPoints(spark, sfDir).count()
    catch { case _: Throwable => }

    val out = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def rep(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.util.StageCache.release(spark)
        spark.catalog.clearCache()
        dt
      }
      val cold = rep()
      val warm = Vector.fill(reps)(rep()).sorted
      val med = warm((warm.length - 1) / 2)
      f""""$name":{"cold":$cold%.3f,"warm_med":$med%.3f,"warm_min":${warm.head}%.3f,"warm_max":${warm.last}%.3f}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
