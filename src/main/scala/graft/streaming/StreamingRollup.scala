package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.schema.Transcript

/** Structured-Streaming variant of the 1m tier: continuous per-minute
  * aggregates over a transcript stream with event-time watermarking for
  * late turns.
  *
  * The batch reference has no streaming (pure arrays); this is the
  * engine's continuous-ingest path: readStream → watermark → windowed
  * aggregate → append sink. Late rows inside the watermark update their
  * minute bucket; rows later than `lateness` are dropped — the batch
  * backfill (PipelineMain) reconciles them on the next run via the
  * ledger.
  */
object StreamingRollup {

  /** Per-minute continuous aggregate over a streaming transcript source. */
  def minuteTier(stream: Dataset[Transcript], lateness: String = "10 minutes"): DataFrame = {
    import stream.sparkSession.implicits._
    stream
      .withWatermark("ts", lateness)
      .groupBy($"conv_id", window($"ts", "1 minute").as("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(length($"text")).cast("double").as("sum"),
        min(length($"text")).cast("double").as("min"),
        max(length($"text")).cast("double").as("max"))
      .select($"conv_id", unix_micros($"bucket.start").as("bucket"),
        $"cnt", $"sum", $"min", $"max")
  }

  /** Start the stream into an in-memory or parquet sink. */
  def start(tier: DataFrame, sinkFormat: String, path: Option[String],
      queryName: String, checkpoint: String): StreamingQuery = {
    val writer = tier.writeStream
      .outputMode(OutputMode.Append) // finalized buckets only (post-watermark)
      .format(sinkFormat)
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    path.fold(writer)(p => writer.option("path", p)).start()
  }
}
