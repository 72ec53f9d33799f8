package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode/feature-extract
  * runs batch-wise in mapPartitions (the Scala analog of mapInPandas
  * batches).
  *
  * The decode step itself is STUBBED — the sandbox ships no image/audio
  * codecs — behind `decodeStub`, a deterministic fake that hashes payload
  * bytes into a fixed-dim feature vector. The Spark-side plumbing
  * (schema, batching, partition sizing, feature schema) is real and
  * tested; swap `decodeStub` for a JNI/codec call in production.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRateHz: Int)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, dim: Int,
      features: Array[Float])

  /** STUB decode: deterministic feature vector from payload bytes.
    * Replace with a real codec (libjpeg/ffmpeg) outside the sandbox.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1469598103934665603L
    var i = 0
    while (i < payload.length) {
      h = (h ^ payload(i)) * 1099511628211L
      out(i % dim) += ((h >>> 40).toInt & 0xffff) / 65536.0f
      i += 1
    }
    out
  }

  /** Build a synthetic media table from the documents table: payload =
    * UTF-8 bytes (stand-in for image bytes), meta derived from doc stats.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)].map { case (id, text) =>
      MediaRow(id,
        MediaMeta(if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
          width = 64 + (id % 512).toInt, height = 64 + (id % 256).toInt,
          sampleRateHz = if (id % 3 == 1) 16000 else 0),
        text.getBytes("UTF-8"))
    }
  }

  /** Driver-oracled summary: runs the full decode path per row and projects
    * the SQL-checkable facts (id, kind, dim, payload size). The feature
    * values themselves come from the documented stub, so they are asserted
    * in MultimodalSpec rather than hash-compared.
    */
  def featureSummary(media: Dataset[MediaRow], dim: Int = 32): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val features = decodeStub(m.payload, dim)
        (m.media_id, m.meta.kind, features.length, m.payload.length.toLong)
      }
    }.toDF("media_id", "kind", "dim", "payload_bytes")
  }

  /** Batched feature extraction: one decode call per row, batched per
    * partition; output is a narrow typed table safe to shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        MediaFeatures(m.media_id, m.meta.kind, dim, decodeStub(m.payload, dim))
      }
    }
  }
}
