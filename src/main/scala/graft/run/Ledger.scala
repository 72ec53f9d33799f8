package graft.run

import java.sql.Timestamp
import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.schema.LedgerRow

/** Checkpoint/resume ledger: one parquet table of per-stage (and
  * per-partition, where the stage is partitioned) lineage + metrics rows.
  * A stage is resumable when its output parquet exists and the ledger has
  * a `done` row for the same inputVersion; resuming re-reads the output
  * instead of recomputing. Stands in for Iceberg snapshot metadata in
  * this sandbox (no Iceberg runtime jar).
  */
final class Ledger(spark: SparkSession, baseDir: String, inputVersion: String) {
  import spark.implicits._

  private val path = s"$baseDir/_ledger"

  def doneStages(): Set[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) return Set.empty
    try {
      spark.read.parquet(path)
        .where($"state" === "done" && $"inputVersion" === inputVersion)
        .select($"stage").distinct().as[String].collect().toSet
    } catch { case _: Throwable => Set.empty }
  }

  def markDone(stage: String, partitionKey: String, rowsIn: Long, rowsOut: Long,
      wallMs: Long): Unit = {
    val row = LedgerRow(partitionKey, stage, inputVersion, "done", rowsIn, rowsOut,
      wallMs, new Timestamp(System.currentTimeMillis()))
    spark.createDataset(Seq(row)).write.mode(SaveMode.Append).parquet(path)
  }

  /** Run `body` writing parquet to `$baseDir/$stage` unless already done;
    * returns the stage output path. `body` must write to the returned path.
    */
  def stage(stageName: String)(body: String => (Long, Long)): String = {
    val out = s"$baseDir/$stageName"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val outExists = fs.exists(new org.apache.hadoop.fs.Path(out))
    if (outExists && doneStages().contains(stageName)) {
      println(s"[ledger] resume: skipping $stageName")
    } else {
      val t0 = System.nanoTime()
      val (rowsIn, rowsOut) = body(out)
      markDone(stageName, stageName, rowsIn, rowsOut, (System.nanoTime() - t0) / 1000000L)
    }
    out
  }
}
