package graft.dist

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.dist.DistributedMp.SeriesRow
import graft.kernels.{MpDist, Snippets}

/** Distributed snippets (ref snippets.py:17-126) for long series.
  *
  * The single-task pipeline computes, for each snippet candidate, an
  * MPDist vector over the WHOLE series — one task per series holds n
  * points and does O(candidates · n) MASS work. The scale path here rests
  * on a locality property of `MpDist.mpdistVector`: output offset i
  * depends only on ts[i .. i+size-2] (the column minima window and the
  * row moving-min window both end there) plus the size-1-point candidate.
  * So the fan-out axis is (candidate × tile-group): each task receives a
  * slice of ≤ tilesPerTask·tileSize+size-2 points and one candidate —
  * sub-linear task input, like DistributedMp's halo'd MP tiles — and emits
  * one dv chunk per tileSize tile, computed tile-by-tile with the
  * candidate's per-row query FFTs prepared once per padded length (the
  * dominant MASS cost amortizes across the group's tiles).
  *
  * The greedy min-coverage selection (Snippets.select's loop) then runs
  * as k distributed rounds over the chunk Dataset: per round, one
  * zip_with/aggregate pass computes Σ_j min(dv_i(j), minis(j)) per
  * candidate (codegen, no UDF), a window picks the per-conversation
  * argmin (ties to the lowest candidate, the kernel's strict `>`), and
  * the running elementwise minimum updates by a 1:1 join. Only O(1) rows
  * per conversation per round materialize; no dv vector ever reaches the
  * driver. Neighbor lists (O(n) per snippet) are intentionally not
  * produced at scale — index + fraction are the snippet summary.
  */
object DistributedSnippets {

  final case class SnippetRow(conv_id: String, rank: Int, index: Long,
      fraction: Double)

  /** One (candidate, tile-group) task: `tsSlice` covers dv offsets
    * [g0, g0 + tilesPerTask*tileSize) plus the size-2 halo; `cand` is the
    * size-1-point snippet candidate at global offset ci*size. The task
    * still emits one DvChunk per tileSize tile (the greedy-selection rounds
    * downstream are keyed on per-tile t0), but computes several tiles so
    * the candidate's per-row query FFTs — the dominant cost, one length-P
    * transform per matrix row — prepare once and serve every equal-length
    * tile in the group.
    */
  final case class SnipTile(conv_id: String, ci: Int, g0: Int,
      tsSlice: Array[Double], cand: Array[Double])

  final case class DvChunk(conv_id: String, ci: Int, t0: Int,
      dv: Array[Double])

  private def tileGen(s: SeriesRow, size: Int, tileSize: Int,
      tilesPerTask: Int): Iterator[SnipTile] = {
    if (s.values.length < 2 * size) return Iterator.empty
    val padded = Snippets.pad(s.values, size)
    val padlen = padded.length
    val dvLen = padlen - size + 2 // mpdistVector output length, |tsB| = size-1
    val span = tileSize * tilesPerTask
    val cands = Array.range(0, padlen - size, size)
    for {
      ci <- cands.indices.iterator
      g0 <- (0 until dvLen by span).iterator
    } yield {
      val g1 = math.min(g0 + span, dvLen)
      SnipTile(s.conv_id, ci, g0,
        java.util.Arrays.copyOfRange(padded, g0, math.min(padlen, g1 + size - 2)),
        java.util.Arrays.copyOfRange(padded, cands(ci), cands(ci) + size - 1))
    }
  }

  /** All tileSize-tiles of one group task: per-tile MASS matrices with the
    * candidate's query transforms prepared once per padded length, then the
    * shared mpdistVector pipeline. Per-tile values are identical to the
    * one-tile-per-task computation (same slices, same transforms).
    */
  private def groupChunks(t: SnipTile, w: Int, size: Int,
      tileSize: Int): Iterator[DvChunk] = {
    val nDv = t.tsSlice.length - size + 2
    val rows = t.cand.length - w + 1
    val pqByLen =
      scala.collection.mutable.Map.empty[Int, Array[graft.kernels.Mass2.PreparedQuery]]
    val zByLen = scala.collection.mutable.Map.empty[Int, Array[Double]]
    (0 until nDv by tileSize).iterator.map { rel =>
      val relEnd = math.min(rel + tileSize, nDv)
      val tileSlice = java.util.Arrays.copyOfRange(t.tsSlice, rel,
        math.min(t.tsSlice.length, relEnd + size - 2))
      val prep = graft.kernels.Mass2.prepare(tileSlice, w)
      val pqs = pqByLen.getOrElseUpdate(prep.p, Array.tabulate(rows) { i =>
        graft.kernels.Mass2.prepareQuery(
          java.util.Arrays.copyOfRange(t.cand, i, i + w), prep.p)
      })
      val zBuf = zByLen.getOrElseUpdate(prep.p, new Array[Double](2 * prep.p))
      val plen = prep.n - w + 1
      val matrix = Array.tabulate(rows) { i =>
        val row = new Array[Double](plen)
        graft.kernels.Mass2.mass2BothRealInto(prep, pqs(i), zBuf, row)
        row
      }
      DvChunk(t.conv_id, t.ci, t.g0 + rel,
        MpDist.mpdistVectorFromMatrix(matrix, tileSlice.length, t.cand.length, w))
    }
  }

  /** Σ_j min(a_j, b_j) as a codegen'd expression. */
  private def sumMin(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => least(x, y)), lit(0.0), (acc, v) => acc + v)

  def snippets(series: Dataset[SeriesRow], size: Int, numSnippets: Int = 2,
      windowSize0: Int = 0, tileSize: Int = 1 << 14,
      tilesPerTask: Int = 4): Dataset[SnippetRow] = {
    require(size >= 4, "snippet_size must be an integer >= 4")
    require(tilesPerTask >= 1, "tilesPerTask must be >= 1")
    val w = if (windowSize0 > 0) windowSize0 else math.floor(size / 2.0).toInt
    require(w < size, "window_size must be smaller than snippet_size")
    // snap the tile up so the MASS slice length tileSize+size-2 lands
    // exactly on a power of two: a 16k tile with a 1k snippet otherwise
    // yields 17406-point slices that pad to 32768 — half of every
    // transform spent on padding
    val tileEff = graft.kernels.Fft.fastLength(tileSize + size - 2) - (size - 2)
    val spark = series.sparkSession
    import spark.implicits._

    // fraction denominator per conversation: padlen - size
    val meta = series.map { s =>
      val padlen = (size * math.ceil(s.values.length.toDouble / size)).toInt
      (s.conv_id, padlen)
    }.toDF("conv_id", "padlen")

    // spread group tasks over many more partitions than the session's
    // shuffle default: a handful of heavy (candidate, group) keys hashed
    // into cpus*2 buckets serializes several multi-second kernels into one
    // task and stalls the stage on stragglers
    val groupParts = spark.sparkContext.defaultParallelism * 8
    val chunks = series.flatMap(s => tileGen(s, size, tileEff, tilesPerTask))
      .repartition(groupParts, $"conv_id", $"ci", $"g0")
      .flatMap(t => groupChunks(t, w, size, tileEff))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // greedy rounds: winners per conversation, running elementwise minima
    var minis: DataFrame = null // (conv_id, t0, m: Array[Double])
    var winners: DataFrame = null // (conv_id, ci, rank)
    val byConv = org.apache.spark.sql.expressions.Window
      .partitionBy($"conv_id").orderBy($"s".asc, $"ci".asc)
    for (r <- 1 to numSnippets) {
      val scored =
        if (minis == null)
          chunks.toDF().select($"conv_id", $"ci",
            aggregate($"dv", lit(0.0), (acc, v) => acc + v).as("ps"))
        else
          chunks.toDF().join(minis, Seq("conv_id", "t0"))
            .select($"conv_id", $"ci", sumMin($"dv", $"m").as("ps"))
      val wr = scored.groupBy($"conv_id", $"ci").agg(sum($"ps").as("s"))
        .withColumn("rn", row_number().over(byConv))
        .where($"rn" === 1)
        .select($"conv_id", $"ci", lit(r).as("rank"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      wr.count() // materialize: downstream branches reuse, not recompute
      val pickedChunks = chunks.toDF().join(broadcast(wr), Seq("conv_id", "ci"))
        .select($"conv_id", $"t0", $"dv")
      val next =
        if (minis == null) pickedChunks.select($"conv_id", $"t0", $"dv".as("m"))
        else minis.join(pickedChunks, Seq("conv_id", "t0"))
          .select($"conv_id", $"t0", zip_with($"m", $"dv",
            (x, y) => least(x, y)).as("m"))
      val persisted = next.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.count()
      if (minis != null) minis.unpersist()
      minis = persisted
      winners = if (winners == null) wr else winners.union(wr)
    }

    // fraction accounting (Snippets.select's sequential mask bookkeeping):
    // per (conv, t0) group the picked chunks in rank order plus the final
    // minima (== totalMin), count mask hits, subtracting 1.0 per prior mask
    val pickedAll = chunks.toDF().join(broadcast(winners), Seq("conv_id", "ci"))
      .select($"conv_id", $"t0", $"rank", $"dv")
    val withTotal = pickedAll.unionByName(
      minis.select($"conv_id", $"t0", lit(0).as("rank"), $"m".as("dv")))
    val counts = withTotal.as[(String, Int, Int, Array[Double])]
      .groupByKey { case (conv, t0, _, _) => (conv, t0) }
      .flatMapGroups { (key: (String, Int), it: Iterator[(String, Int, Int, Array[Double])]) =>
        val conv = key._1
        val rows = it.toArray.sortBy(_._3) // rank 0 = totalMin, then picks
        val tm = rows.head._4.clone()
        rows.tail.iterator.map { case (_, _, rank, dv) =>
          var cnt = 0L
          var j = 0
          while (j < dv.length) {
            if (dv(j) <= tm(j)) { cnt += 1; tm(j) -= 1.0 }
            j += 1
          }
          (conv, rank, cnt)
        }
      }
      .toDF("conv_id", "rank", "cnt")
      .groupBy($"conv_id", $"rank").agg(sum($"cnt").as("cnt"))

    val out = counts
      .join(winners, Seq("conv_id", "rank"))
      .join(broadcast(meta), Seq("conv_id"))
      .select($"conv_id", $"rank",
        ($"ci".cast("long") * size).as("index"),
        ($"cnt".cast("double") / ($"padlen" - size)).as("fraction"))
      .as[SnippetRow]
    out
  }
}
