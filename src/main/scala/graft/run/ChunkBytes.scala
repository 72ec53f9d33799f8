package graft.run

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off evidence tool: chunk-encode a bucketed points table and print
  * total encoded bytes vs points — the page format's bytes/point and
  * compression ratio vs raw (8B value + 8B timestamp per point).
  * Usage: `runMain graft.run.ChunkBytes [table] [cpus]`.
  */
object ChunkBytes {
  def main(args: Array[String]): Unit = {
    val table = if (args.nonEmpty) args(0)
      else "graft_storage_rollup_8000_250_64"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!spark.catalog.tableExists(table)) {
      // re-register the external bucketed table written by
      // StorageScalingBench (data survives; the in-memory catalog doesn't)
      val path = s"/tmp/graft_storage_rollup/$table"
      val buckets = table.split("_").last.toInt
      spark.sql(
        s"""CREATE TABLE $table
           |(conv_id STRING, kind STRING, bucket BIGINT, value DOUBLE)
           |USING parquet
           |CLUSTERED BY (conv_id) SORTED BY (conv_id, kind, bucket)
           |INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    import spark.implicits._
    val pts = spark.table(table).as[graft.schema.SeriesPoint]
    val n = pts.count()
    val r = graft.compress.Chunks.encode(pts)
      .select(count(lit(1)).as("chunks"),
        sum(length($"tsBytes") + length($"valBytes")).as("bytes"),
        sum($"count").as("pts"))
      .as[(Long, Long, Long)].first()
    val bpp = r._2.toDouble / r._3
    println(f"""{"bench":"chunk_bytes","table":"$table","points":$n,""" +
      f""""chunks":${r._1},"encoded_bytes":${r._2},""" +
      f""""bytes_per_point":$bpp%.3f,""" +
      f""""ratio_vs_raw16":${16.0 / bpp}%.2f}""")
    spark.stop()
  }
}
