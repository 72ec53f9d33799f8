package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.ColSyntax._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k with the small query side
  * broadcast — one scan of the corpus, no shuffle of the big side.
  * Scale path: random-hyperplane LSH bucketing so candidate generation is
  * an equi-join on bucket keys; recall measured against brute force.
  * Dot products run through `aggregate`/`zip_with` (codegen), not UDFs.
  */
object Similarity {

  /** Cosine similarity of two float-array columns in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); corpus side streams.
    * Returns (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(q, $"query_id" =!= $"neighbor_id")
      .withColumn("cosine", cosine($"qv", $"cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id".asc)
    scored.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", round($"cosine", 4).as("cosine"))
  }


  /** Deterministic random hyperplanes: sign-bit bucket of `planes` dot
    * products with key-derived pseudo-random unit directions.
    */
  def hyperplaneBucket(df: DataFrame, vecCol: String, planes: Int): DataFrame = {
    val dim = 64 // embedding dim in this corpus; generalize via size() if needed
    val bucketBits = (0 until planes).map { p =>
      // plane vector component j = hash(p, j) mapped to [-1, 1)
      val dot = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (pmod(xxhash64(lit(p), j), lit(1000000L)).cast("double") / 500000.0) - 1.0),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    df.withColumn("bucket", bucketBits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** LSH-bucketed approximate top-k: candidates share a bucket under any
    * of `tables` independent hyperplane sets. Returns the same schema as
    * bruteForceTopK (ranks within retrieved candidates).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      planes: Int = 10, tables: Int = 4): DataFrame = {
    val tableCols = (0 until tables).map { t =>
      val dim = 64
      val bits = (0 until planes).map { p =>
        val dot = aggregate(
          zip_with(col(vecCol),
            transform(sequence(lit(0), lit(dim - 1)),
              j => (pmod(xxhash64(lit(t * 1000 + p), j), lit(1000000L)).cast("double") / 500000.0) - 1.0),
            (x, h) => x.cast("double") * h),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b)).as(s"b$t")
    }

    def withBuckets(df: DataFrame, prefix: String) = {
      val b = df.select((col(idCol).as(s"${prefix}_id") +: col(vecCol).as(s"${prefix}_v") +:
        tableCols): _*)
      b.select($"${prefix}_id", $"${prefix}_v",
        explode(array((0 until tables).map(t =>
          concat_ws(":", lit(t), col(s"b$t"))): _*)).as("bkey"))
    }

    val qb = broadcast(withBuckets(queries, "q"))
    val cb = withBuckets(corpus, "c")
    val cands = cb.join(qb, Seq("bkey"))
      .where($"q_id" =!= $"c_id")
      .select($"q_id".as("query_id"), $"c_id".as("neighbor_id"), $"q_v", $"c_v")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine($"q_v", $"c_v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id".asc)
    cands.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", round($"cosine", 4).as("cosine"))
  }
}
