package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ingest.TranscriptGen
import graft.schema.Transcript
import graft.streaming.StreamingRollup

/** Structured-Streaming 1m tier: streamed aggregates equal the batch
  * rollup on the same data; late rows beyond the watermark are dropped.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streamed 1m tier equals batch rollup (AvailableNow, memory sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = TranscriptGen.genConversation(42L, 7) ++
      TranscriptGen.genConversation(42L, 8)

    val source = MemoryStream[Transcript]
    source.addData(rows)
    val tier = StreamingRollup.minuteTier(source.toDS())
    val cp = java.nio.file.Files.createTempDirectory("graft_stream_cp").toString
    val q = StreamingRollup.start(tier, "memory", None, "m1_stream", cp)
    q.awaitTermination()

    val streamed = spark.table("m1_stream")
      .orderBy("conv_id", "bucket").collect()

    // append mode finalizes only buckets past the watermark: buckets whose
    // end <= max(ts) - lateness close; the in-flight tail stays open
    val maxTs = rows.map(_.ts.getTime).max * 1000L
    val cutoff = maxTs - 10L * 60 * 1000000
    val batch = spark.createDataset(rows)
      .groupBy($"conv_id",
        unix_micros(date_trunc("minute", $"ts")).as("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(length($"text")).cast("double").as("sum"),
        min(length($"text")).cast("double").as("min"),
        max(length($"text")).cast("double").as("max"))
      .where($"bucket" + 60000000L <= cutoff)
      .orderBy("conv_id", "bucket").collect()

    assert(batch.length > 0 && streamed.length >= batch.length)
    val streamedClosed = streamed.filter(_.getLong(1) + 60000000L <= cutoff)
    assert(streamedClosed.length == batch.length,
      s"${streamedClosed.length} closed streamed vs ${batch.length} batch")
    streamedClosed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s vs $b") }
  }
}
