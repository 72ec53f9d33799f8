package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.ColSyntax._

/** Deduplication operators over a documents table: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard verification. All stages are shuffle-lean:
  * candidate generation goes through band/bucket equi-joins (hash
  * shuffles on small keys), never an all-pairs cross join.
  */
object Dedup {

  /** Exact dedup: md5 of the raw text. Returns (doc_id, content_hash,
    * group_size, keep) where keep marks the minimum doc_id per group.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("group_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"content_hash")))
      .withColumn("keep",
        col(idCol) === min(col(idCol)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"content_hash")))
      .select(col(idCol), $"content_hash", $"group_size", $"keep")
  }


  /** MinHash signatures over word-k-shingles. The signature kernel runs
    * typed (one pass over the shingle hashes, `numHashes` splitmix mixes
    * per shingle) — the expression-tree alternative materializes
    * `numHashes` boxed arrays per row and is an order of magnitude
    * slower; banding/join/verify stay declarative.
    */
  def minhashSignature(docs: DataFrame, textCol: String, numHashes: Int = 64,
      shingleK: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = text.trim.toLowerCase.split("\\s+")
          if (toks.length < shingleK) Iterator.empty
          else {
            val nSh = toks.length - shingleK + 1
            val seen = new java.util.HashSet[Long]()
            val shingles = new scala.collection.mutable.ArrayBuffer[Long](nSh)
            val mins = Array.fill(numHashes)(Long.MaxValue)
            var i = 0
            while (i < nSh) {
              var h = 1469598103934665603L
              var j = 0
              while (j < shingleK) {
                h = graft.ingest.TranscriptGen.splitmix64(h ^ toks(i + j).hashCode.toLong)
                j += 1
              }
              if (seen.add(h)) shingles += h
              var f = 0
              while (f < numHashes) {
                val v = graft.ingest.TranscriptGen.splitmix64(h ^ (f * 0x9e3779b97f4a7c15L))
                if (v < mins(f)) mins(f) = v
                f += 1
              }
              i += 1
            }
            Iterator((id, shingles.toArray, mins))
          }
        }
      }
      .toDF("id", "shingles", "minhash")
  }

  /** LSH banding: explode signatures into (band, bucket) keys, self-join
    * on equal buckets to produce candidate pairs (i < j), then verify with
    * exact shingle Jaccard. `threshold` filters verified pairs.
    */
  def minhashLsh(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 64, bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignature(
      docs.withColumnRenamed(idCol, "doc_id"), textCol, numHashes)

    val banded = sigs.select($"id", $"shingles",
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice($"minhash", b * rows + 1, lit(rows)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val l = banded.select($"band", $"bucket", $"id".as("id_a"), $"shingles".as("sh_a"))
    val r = banded.select($"band", $"bucket", $"id".as("id_b"), $"shingles".as("sh_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sh_a", $"sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")))
      .where($"jaccard" >= threshold)
      .select($"id_a", $"id_b", round($"jaccard", 4).as("jaccard"))
  }

  /** SimHash: 64-bit signature from per-token hash bit votes, built with
    * aggregate() over a 64-slot vote array; near-dups = pairs within
    * `maxHamming`, candidates via 4x16-bit band join.
    */
  def simhash(docs: DataFrame, textCol: String): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        transform(acc, (v, i) =>
          v + when(getbit(h, i) === 1, lit(1L)).otherwise(lit(-1L)))
      })
    // fold votes into a 64-bit signature via literal bit masks + bitwise OR
    // (overflow-free under ANSI mode)
    val withVotes = docs.withColumn("sh_votes", votes)
    val sigBits = (0 until 64).map(i =>
      when(element_at(col("sh_votes"), i + 1) > 0, lit(1L << (63 - i)))
        .otherwise(lit(0L)))
    withVotes.withColumn("simhash", sigBits.reduce(_ bitwiseOR _)).drop("sh_votes")
  }

  /** Candidate near-dup pairs by simhash: band on the 4 16-bit quarters
    * (any equal quarter → candidate), verify hamming distance.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs, textCol).select(col(idCol).as("id"), $"simhash")
    val banded = sig.select($"id", $"simhash",
      posexplode(array((0 until 4).map(q =>
        shiftright($"simhash", q * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select($"band", $"bucket", $"id".as("id_a"), $"simhash".as("sig_a"))
    val r = banded.select($"band", $"bucket", $"id".as("id_b"), $"simhash".as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .where($"id_a" < $"id_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count($"sig_a".bitwiseXOR($"sig_b")))
      .where($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }

  /** Embedding near-dup: cosine >= threshold pairs via random-hyperplane
    * LSH bucketing (see Similarity.hyperplaneBucket) + exact verify.
    */
  def embeddingDups(embeds: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 0.95,
      planes: Int = 12): DataFrame = {
    val withB = Similarity.hyperplaneBucket(embeds, vecCol, planes)
      .select(col(idCol).as("id"), col(vecCol).as("v"), $"bucket")
    val l = withB.select($"bucket", $"id".as("id_a"), $"v".as("v_a"))
    val r = withB.select($"bucket", $"id".as("id_b"), $"v".as("v_b"))
    l.join(r, Seq("bucket"))
      .where($"id_a" < $"id_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine", Similarity.cosine($"v_a", $"v_b"))
      .where($"cosine" >= threshold)
      .select($"id_a", $"id_b", round($"cosine", 4).as("cosine"))
  }
}
