package graft.run

import org.apache.spark.sql.SparkSession

/** Prints the pipeline plan digests (exchange/broadcast/scan/codegen
  * counts) at an arbitrary corpus size WITHOUT executing the legs —
  * plan-build only. The scale-up evidence pairs this at 1× and 10×: the
  * digests must be identical (only task counts grow with data), proving
  * the 250M-point plan IS the 25M-point plan.
  *
  * Args: numConvs turnsScale (defaults 8000 25).
  */
object DigestMain {
  def main(args: Array[String]): Unit = {
    val convs = if (args.length > 0) args(0).toInt else 8000
    val turnsScale = if (args.length > 1) args(1).toInt else 25
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .appName("graft-digest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"""{"convs":$convs,"turns_scale":$turnsScale,""" +
      s""""digest":${graft.Bench.pipelineDigests(spark, convs, turnsScale)}}""")
    spark.stop()
  }
}
