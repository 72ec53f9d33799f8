package graft.dist

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kernels.{Mpx, Stomp}
import graft.schema.MpProfileRow

/** Distributed matrix-profile orchestration.
  *
  * The parallel axis is (conversation, kind, tier, window) —
  * embarrassingly parallel, one kernel call per series (or per
  * (series, window) for SKIMP). Series longer than `splitThreshold`
  * additionally split *within* the series into halo'd 2-D tiles — MPX:
  * (row-block × diagonal-block); STOMP: (row-block × col-block); AB join:
  * (signed-diagonal-block × B-position-block) — where every task receives
  * ONLY its tile's slice (≤ 2·tileSize+w−1 points, never the whole
  * series) and emits a profile SEGMENT that the offset-aware ProfileMerge
  * Aggregators reduce (the reference's per-thread buffers and batch
  * merge — cympx.pyx:72-73, stomp.py:340-357 — lifted to partition
  * granularity).
  *
  * Short and long series flow through ONE plan: a short series emits a
  * single complete partial (merge is identity on it), a long series one
  * segment per tile — one input scan, one shuffle, map-side combine.
  * Each tile re-derives its seed state from its own slice (muinvn stats +
  * O(w) per-diagonal seeds for MPX, one FFT over the column slice for
  * STOMP) exactly like the reference's non-zero batches
  * (stomp.py:103-105), so no state crosses task boundaries; slice-local
  * stats differ from whole-series stats only in final ULPs (gated 1e-8).
  */
object DistributedMp {

  final case class SeriesRow(conv_id: String, kind: String, startBucket: Long,
      values: Array[Double])

  /** MPX self-join profiles for every series with length >= 2w. */
  def mpxProfiles(series: Dataset[SeriesRow], w: Int, tier: String,
      splitThreshold: Int = 1 << 15, tileSize: Int = 1 << 14,
      maxSeriesLen: Int = -1): Dataset[MpProfileRow] =
    skimpProfiles(series, Array(w), tier, splitThreshold, tileSize, maxSeriesLen)

  /** A halo'd MPX tile task: the slice starts at global row `start` and
    * carries just the values the tile's diagonals touch (≤ 2·tileSize +
    * w-1 points), NEVER the whole series — a 10M-point series ships
    * O(n²/tileSize) total task input instead of O(n · tasks).
    */
  final case class MpxTile(conv_id: String, kind: String, w: Int,
      start: Int, dLo: Int, dHi: Int, rowEnd: Int, plen: Int,
      slice: Array[Double], pre: Option[MpxPartialAt])

  /** 2-D (row-block x diagonal-block) tiling of the upper triangle.
    * Each tile re-derives its stats from its own slice (the reference's
    * batch-seeding discipline, stomp.py:100-105) so no state crosses task
    * boundaries; slice-local compensated stats differ from whole-series
    * stats only in final ULPs (gated at 1e-8 by SparkPipelineSpec).
    */
  private def mpxTiles(s: SeriesRow, w: Int, tileSize: Int): Iterator[MpxTile] = {
    val n = s.values.length
    val plen = n - w + 1
    val minlag = math.ceil(w / 4.0).toInt
    val dStart = minlag + 1
    val b = tileSize
    val rTiles = math.ceil(plen.toDouble / b).toInt
    for {
      rb <- (0 until rTiles).iterator
      rLo = rb * b
      db <- (0 until rTiles).iterator
      dLo = math.max(dStart, db * b)
      dHi = math.min((db + 1) * b, plen)
      if dLo < dHi
      rHi = math.min(math.min((rb + 1) * b, plen), plen - dLo)
      if rLo < rHi
    } yield {
      val colMax = math.min(plen - 1, rHi - 1 + dHi - 1)
      val slice = java.util.Arrays.copyOfRange(s.values, rLo, colMax + w)
      MpxTile(s.conv_id, s.kind, w, rLo, dLo, dHi, rHi - rLo, plen, slice, None)
    }
  }

  /** Distributed SKIMP: one mpx self-join per (series, window) pair, fanned
    * out as independent tasks (ref skimp.py:96-242 computes windows
    * sequentially per series; here the (series, window) grid IS the
    * parallel axis, and long series additionally split into halo'd 2-D
    * tiles within a window).
    *
    * Short series take a ZERO-EXCHANGE path: the whole kernel runs and
    * finalizes in the scan stage — their profile partials never ride a
    * shuffle (the repartition + merge exchanges exist to spread TILES of
    * long series; for a complete partial both were identity work that
    * serialized ~2·plen doubles per series twice). The two branches scan
    * `series` independently — persist the input when its upstream plan is
    * expensive (a scan of a parquet/Iceberg table is fine; a derived
    * assembly is worth caching).
    */
  /** `maxSeriesLen`: a caller-known upper bound on series length. When it
    * proves every series takes the short path (bound < splitThreshold),
    * the tile fan-out/merge machinery — a repartition exchange plus a
    * merge aggregation that would process zero rows — is dropped from the
    * plan outright, and the single-consumer input needs no fork guard.
    */
  def skimpProfiles(seriesIn: Dataset[SeriesRow], windows: Array[Int], tier: String,
      splitThreshold: Int = 1 << 15, tileSize: Int = 1 << 14,
      maxSeriesLen: Int = -1): Dataset[MpProfileRow] = {
    val spark = seriesIn.sparkSession
    import spark.implicits._
    val shortOnly = maxSeriesLen > 0 && maxSeriesLen < splitThreshold
    val series =
      if (shortOnly) seriesIn // single consumer: no fork, no persist
      else graft.util.StageCache.forked(seriesIn)
    val shortRows = series.flatMap { s =>
      val n = s.values.length
      windows.iterator.filter(w => n >= 2 * w && n < splitThreshold)
        .map(w => wholeProfileRow(s, w, tier))
    }
    if (shortOnly) return shortRows
    val tiles = series.flatMap { s =>
      val n = s.values.length
      windows.iterator.filter(w => n >= 2 * w && n >= splitThreshold)
        .flatMap(w => mpxTiles(s, w, tileSize))
    }
    shortRows.union(mergeSkimpTasks(tiles, tier))
  }

  /** Whole-series mpx kernel + finalize, identical to the merge path's
    * finish on a single complete partial (clamp is idempotent).
    */
  private def wholeProfileRow(s: SeriesRow, w: Int, tier: String): MpProfileRow = {
    val st = Mpx.selfStats(s.values, w)
    val buf = Mpx.newBuf(st.profileLen)
    Mpx.selfJoinBlock(s.values, w, st, st.minlag + 1, st.profileLen, buf)
    Mpx.clampBuf(buf)
    MpProfileRow(s.conv_id, s.kind, tier, w, math.ceil(w / 4.0).toInt,
      "mpx", "euclidean", join = false,
      Mpx.selfToEuclidean(buf, w), buf.mpi,
      Array.empty, Array.empty, Array.empty, Array.empty)
  }

  /** Spread tiles across tasks, run the tile kernel, tree-merge segments,
    * and finalize Euclidean profile rows.
    */
  private def mergeSkimpTasks(tasks: Dataset[MpxTile], tier: String): Dataset[MpProfileRow] = {
    val spark = tasks.sparkSession
    import spark.implicits._
    val partials = tasks
      .repartition($"conv_id", $"w", $"start", $"dLo") // spread tiles across tasks
      .map { t =>
        val p = t.pre.getOrElse {
          val st = Mpx.selfStats(t.slice, t.w)
          val buf = Mpx.newBuf(t.slice.length - t.w + 1)
          Mpx.selfJoinTile(t.slice, t.w, st, t.dLo, t.dHi, t.rowEnd, buf)
          var i = 0
          while (i < buf.mpi.length) {
            if (buf.mpi(i) >= 0) buf.mpi(i) += t.start
            i += 1
          }
          MpxPartialAt(t.start, t.plen, buf.mp, buf.mpi)
        }
        (t.conv_id, t.kind, t.w, p)
      }

    val mergeAgg = new ProfileMerge.MpxMaxMergeAt().toColumn
    partials
      .groupByKey { case (conv, kind, w, _) => (conv, kind, w) }
      .mapValues { case (_, _, _, p) => p }
      .agg(mergeAgg)
      .map { case ((conv, kind, w), partial) =>
        val ez = math.ceil(w / 4.0).toInt
        val buf = Mpx.PearsonBuf(partial.mp, partial.pi)
        Mpx.clampBuf(buf)
        MpProfileRow(conv, kind, tier, w, ez, "mpx", "euclidean", join = false,
          Mpx.selfToEuclidean(buf, w), buf.mpi,
          Array.empty, Array.empty, Array.empty, Array.empty)
      }
  }

  /** SKIMP memoization (ref skimp.py:193-205): reuse (series, window)
    * profiles already present in a prior PMP — only the missing grid
    * cells are computed, then unioned with the prior rows. The have-set
    * is tiny ((conv, kind) -> window set) and broadcasts; the prior
    * profile rows never reshuffle. Like [[skimpProfiles]], the short and
    * tile branches each scan the joined input — persist `series` when its
    * upstream plan is expensive.
    */
  def skimpProfilesReusing(series: Dataset[SeriesRow], windows: Array[Int],
      tier: String, prior: Dataset[MpProfileRow],
      splitThreshold: Int = 1 << 15, tileSize: Int = 1 << 14): Dataset[MpProfileRow] = {
    val spark = series.sparkSession
    import spark.implicits._
    val have = prior.filter(p => windows.contains(p.w))
    val haveSets = have.groupBy($"conv_id".as("c"), $"kind".as("k"))
      .agg(org.apache.spark.sql.functions.collect_set($"w").as("haveW"))
    val todo = series.joinWith(org.apache.spark.sql.functions.broadcast(haveSets),
        series("conv_id") === haveSets("c") && series("kind") === haveSets("k"),
        "left_outer")
      .map { case (s, row) =>
        val done: Set[Int] =
          if (row == null) Set.empty
          else row.getAs[scala.collection.Seq[Int]]("haveW").toSet
        (s, windows.filterNot(done.contains))
      }
    val shortRows = todo.flatMap { case (s, ws) =>
      val n = s.values.length
      ws.iterator.filter(w => n >= 2 * w && n < splitThreshold)
        .map(w => wholeProfileRow(s, w, tier))
    }
    val tiles = todo.flatMap { case (s, ws) =>
      val n = s.values.length
      ws.iterator.filter(w => n >= 2 * w && n >= splitThreshold)
        .flatMap(w => mpxTiles(s, w, tileSize))
    }
    have.union(shortRows).union(mergeSkimpTasks(tiles, tier))
  }

  /** One AB-join input pair. */
  final case class AbPair(conv_a: String, conv_b: String,
      a: Array[Double], b: Array[Double])

  /** A halo'd AB tile: signed-diagonal block x B-position block, slices
    * only (the AB analog of MpxTile).
    */
  final case class AbTile(conv_a: String, conv_b: String,
      aStart: Int, bLo: Int, bHi: Int, dLo: Int, dHi: Int,
      plenA: Int, plenB: Int,
      aSlice: Array[Double], bSlice: Array[Double],
      preA: Option[MpxPartialAt], preB: Option[MpxPartialAt])

  /** Merged AB similarity-join profiles (Euclidean; -1 → ∞ like
    * cympx.pyx:261-274) for each input pair.
    */
  final case class AbJoinRow(conv_a: String, conv_b: String, w: Int,
      mpA: Array[Double], piA: Array[Long],
      mpB: Array[Double], piB: Array[Long])

  /** Distributed MPX AB-join: short pairs run the whole cympx sweep in
    * one task; long pairs split into halo'd (diagonal-block x
    * B-position-block) tiles — the scale path for the engine's
    * similarity-join / as-of-join analog (ref cympx.pyx:125-284).
    */
  def mpxAbProfiles(pairsIn: Dataset[AbPair], w: Int,
      splitThreshold: Int = 1 << 15, tileSize: Int = 1 << 14,
      maxSeriesLen: Int = -1): Dataset[AbJoinRow] = {
    val spark = pairsIn.sparkSession
    import spark.implicits._
    // caller-proven all-short input: drop the tile fan-out/merge subtree
    // (an exchange + two aggregations over zero rows) and the fork guard
    val shortOnly = maxSeriesLen > 0 && maxSeriesLen < splitThreshold
    val pairs =
      if (shortOnly) pairsIn else graft.util.StageCache.forked(pairsIn)

    // zero-exchange short path: both sweeps + finalize in the scan stage
    val shortRows = pairs.flatMap { p =>
      val plenA = p.a.length - w + 1
      val plenB = p.b.length - w + 1
      if (plenA < 1 || plenB < 1 ||
          math.max(p.a.length, p.b.length) >= splitThreshold) Iterator.empty
      else {
        val sa = Mpx.abStats(p.a, w)
        val sb = Mpx.abStats(p.b, w)
        val bufA = Mpx.newBuf(plenA)
        val bufB = Mpx.newBuf(plenB)
        Mpx.abJoinBlock(p.a, p.b, w, sa, sb, 0, plenA, bufA, bufB)
        Mpx.abJoinBlock(p.b, p.a, w, sb, sa, 0, plenB, bufB, bufA)
        Mpx.clampBuf(bufA)
        Mpx.clampBuf(bufB)
        Iterator(AbJoinRow(p.conv_a, p.conv_b, w,
          Mpx.abToEuclidean(bufA, w), bufA.mpi,
          Mpx.abToEuclidean(bufB, w), bufB.mpi))
      }
    }

    if (shortOnly) return shortRows

    val tasks = pairs.flatMap { p =>
      val plenA = p.a.length - w + 1
      val plenB = p.b.length - w + 1
      if (plenA < 1 || plenB < 1 ||
          math.max(p.a.length, p.b.length) < splitThreshold) Iterator.empty
      else {
        val bTiles = math.ceil(plenB.toDouble / tileSize).toInt
        val dMin = -(plenB - 1)
        val dCount = plenA - 1 - dMin + 1
        val dTiles = math.ceil(dCount.toDouble / tileSize).toInt
        for {
          bb <- (0 until bTiles).iterator
          bLo = bb * tileSize
          bHi = math.min((bb + 1) * tileSize, plenB)
          db <- (0 until dTiles).iterator
          dLo = dMin + db * tileSize
          dHi = math.min(dMin + (db + 1) * tileSize, plenA)
          if math.max(bLo, -(dHi - 1)) < math.min(bHi, plenA - dLo)
          aStart = math.max(0, bLo + dLo)
          aEnd = math.min(p.a.length, (bHi - 1) + (dHi - 1) + w)
          if aStart < aEnd
        } yield AbTile(p.conv_a, p.conv_b, aStart, bLo, bHi, dLo, dHi,
          plenA, plenB,
          java.util.Arrays.copyOfRange(p.a, aStart, aEnd),
          java.util.Arrays.copyOfRange(p.b, bLo, math.min(p.b.length, bHi - 1 + w)),
          None, None)
      }
    }

    val partials = tasks
      .repartition($"conv_a", $"conv_b", $"bLo", $"dLo")
      .flatMap { t =>
        (t.preA, t.preB) match {
          case (Some(pa), Some(pb)) =>
            Iterator((t.conv_a, t.conv_b, "a", pa), (t.conv_a, t.conv_b, "b", pb))
          case _ =>
            val sa = Mpx.abStats(t.aSlice, w)
            val sb = Mpx.abStats(t.bSlice, w)
            val bufA = Mpx.newBuf(sa.profileLen)
            val bufB = Mpx.newBuf(sb.profileLen)
            Mpx.abJoinTile(t.aSlice, t.bSlice, w, sa, sb, t.aStart,
              t.bLo, t.bHi, t.plenA, t.dLo, t.dHi, bufA, bufB)
            Iterator(
              (t.conv_a, t.conv_b, "a", MpxPartialAt(t.aStart, t.plenA, bufA.mp, bufA.mpi)),
              (t.conv_a, t.conv_b, "b", MpxPartialAt(t.bLo, t.plenB, bufB.mp, bufB.mpi)))
        }
      }

    val mergeAgg = new ProfileMerge.MpxMaxMergeAt().toColumn
    shortRows.union(partials
      .groupByKey { case (ca, cb, side, _) => (ca, cb, side) }
      .mapValues { case (_, _, _, p) => p }
      .agg(mergeAgg)
      .groupByKey { case ((ca, cb, _), _) => (ca, cb) }
      .mapGroups { (key: (String, String), it) =>
        val (ca, cb) = key
        var mpA: Array[Double] = Array.empty
        var piA: Array[Long] = Array.empty
        var mpB: Array[Double] = Array.empty
        var piB: Array[Long] = Array.empty
        it.foreach { case ((_, _, side), partial) =>
          val buf = Mpx.clampBuf(Mpx.PearsonBuf(partial.mp, partial.pi))
          if (side == "a") { mpA = Mpx.abToEuclidean(buf, w); piA = buf.mpi }
          else { mpB = Mpx.abToEuclidean(buf, w); piB = buf.mpi }
        }
        AbJoinRow(ca, cb, w, mpA, piA, mpB, piB)
      })
  }

  /** A halo'd STOMP tile: row slice [rLo, rHi-1+w), col slice
    * [cLo, cHi-1+w) — again never the whole series.
    */
  final case class StompTile(conv_id: String, kind: String,
      rLo: Int, rHi: Int, cLo: Int, cHi: Int, plen: Int,
      rowSlice: Array[Double], colSlice: Array[Double],
      pre: Option[StompPartialAt])

  /** STOMP profiles (with left/right profiles); same unified shape. Long
    * series split into (row-block x col-block) tiles, each seeded by one
    * FFT over its column slice (stomp.py:100-105 lifted to 2-D).
    */
  def stompProfiles(series: Dataset[SeriesRow], w: Int, tier: String,
      splitThreshold: Int = 1 << 15, tileSize: Int = 1 << 14): Dataset[MpProfileRow] = {
    val spark = series.sparkSession
    import spark.implicits._
    val ez = math.ceil(w / 2.0).toInt

    // zero-exchange short path: whole kernel + finalize in the scan stage
    val shortRows = series.flatMap { s =>
      val n = s.values.length
      if (n < 2 * w || n >= splitThreshold) Iterator.empty
      else {
        val r = Stomp.stomp(s.values, w)
        Iterator(MpProfileRow(s.conv_id, s.kind, tier, w, ez, "stomp",
          "euclidean", join = false, r.mp, r.pi, r.lmp, r.lpi, r.rmp, r.rpi))
      }
    }

    val tasks = series.flatMap { s =>
      val n = s.values.length
      // same eligibility bar as the short branch: a series below 2w emits
      // nothing regardless of which side of splitThreshold it falls on
      if (n < 2 * w || n < splitThreshold) Iterator.empty
      else {
        val plen = n - w + 1
        val b = tileSize
        val tiles = math.ceil(plen.toDouble / b).toInt
        for {
          rb <- (0 until tiles).iterator
          cb <- (0 until tiles).iterator
          rLo = rb * b
          rHi = math.min((rb + 1) * b, plen)
          cLo = cb * b
          cHi = math.min((cb + 1) * b, plen)
        } yield StompTile(s.conv_id, s.kind, rLo, rHi, cLo, cHi, plen,
          java.util.Arrays.copyOfRange(s.values, rLo, rHi - 1 + w),
          java.util.Arrays.copyOfRange(s.values, cLo, cHi - 1 + w), None)
      }
    }

    val partials = tasks
      .repartition($"conv_id", $"rLo", $"cLo")
      .map { t =>
        val p = t.pre.getOrElse {
          val tile = Stomp.tileCompute(t.rLo, t.rHi, t.cLo, t.cHi,
            t.rowSlice, t.colSlice, w, ez)
          StompPartialAt(t.cLo, t.plen, tile.mp, tile.pi,
            tile.lmp, tile.lpi, tile.rmp, tile.rpi)
        }
        (t.conv_id, t.kind, p)
      }

    val mergeAgg = new ProfileMerge.StompMinMergeAt().toColumn
    shortRows.union(partials
      .groupByKey { case (conv, kind, _) => (conv, kind) }
      .mapValues { case (_, _, p) => p }
      .agg(mergeAgg)
      .map { case ((conv, kind), r) =>
        MpProfileRow(conv, kind, tier, w, ez, "stomp", "euclidean", join = false,
          r.mp, r.pi, r.lmp, r.lpi, r.rmp, r.rpi)
      })
  }
}
