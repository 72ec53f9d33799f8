package graft.run

import org.apache.spark.sql.SparkSession

/** Dump each declared query's full `explain("formatted")` output to one
  * file per query — the round's plan evidence artifacts
  * (`plans/rNN/<query>_<tag>.txt`). Usage:
  * `runMain graft.run.ExplainDump <outDir> <tag> [sfDir] [queryPrefix]`.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "plans/r08"
    val tag = if (args.length > 1) args(1) else "before"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val prefix = if (args.length > 3) args(3) else "q"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        val text =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          catch { case e: Throwable => s"ERROR: ${e.getClass.getName}: ${e.getMessage}\n" }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), text)
        graft.util.StageCache.release(spark)
        spark.catalog.clearCache()
      }
    spark.stop()
  }
}
