package graft.dist

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.kernels.{Mpx, Stomp}
import graft.schema.MpProfileRow

/** Distributed matrix-profile orchestration.
  *
  * The parallel axis is (conversation, kind, tier) — embarrassingly
  * parallel, one kernel call per series. Series longer than
  * `splitThreshold` additionally split *within* the series: MPX diagonal
  * ranges / STOMP row batches become independent tasks whose partial
  * (profile, index) buffers reduce through the ProfileMerge Aggregators
  * (the reference's per-thread buffers and batch merge — cympx.pyx:72-73,
  * stomp.py:340-357 — lifted to partition granularity).
  *
  * Short and long series flow through ONE plan: a short series emits a
  * single complete partial (merge is identity on it), a long series emits
  * one partial per block — one input scan, one shuffle, map-side combine.
  * Each split task re-derives its seed state (muinvn stats + one O(w·n)
  * scan for MPX, one FFT for STOMP) exactly like the reference's non-zero
  * batches (stomp.py:103-105), so no state crosses task boundaries.
  */
object DistributedMp {

  final case class SeriesRow(conv_id: String, kind: String, startBucket: Long,
      values: Array[Double])

  /** MPX self-join profiles for every series with length >= 2w. */
  def mpxProfiles(series: Dataset[SeriesRow], w: Int, tier: String,
      splitThreshold: Int = 1 << 15, blocksPerSplit: Int = 16): Dataset[MpProfileRow] =
    skimpProfiles(series, Array(w), tier, splitThreshold, blocksPerSplit)

  /** Distributed SKIMP: one mpx self-join per (series, window) pair, fanned
    * out as independent tasks (ref skimp.py:96-242 computes windows
    * sequentially per series; here the (series, window) grid IS the
    * parallel axis, and long series additionally split within a window).
    */
  def skimpProfiles(series: Dataset[SeriesRow], windows: Array[Int], tier: String,
      splitThreshold: Int = 1 << 15, blocksPerSplit: Int = 16): Dataset[MpProfileRow] = {
    val spark = series.sparkSession
    import spark.implicits._

    // one scan: short series compute their complete partial in place; long
    // series emit uncomputed block descriptors that are spread across
    // tasks by the repartition below before the kernel runs
    val tasks = series.flatMap { s =>
      val n = s.values.length
      windows.iterator.filter(w => n >= 2 * w).flatMap { w =>
        if (n < splitThreshold) {
          val st = Mpx.selfStats(s.values, w)
          val buf = Mpx.newBuf(st.profileLen)
          Mpx.selfJoinBlock(s.values, w, st, st.minlag + 1, st.profileLen, buf)
          Iterator((s.conv_id, s.kind, w, -1, -1,
            Array.empty[Double], Some(MpxPartial(buf.mp, buf.mpi))))
        } else {
          val plen = n - w + 1
          val minlag = math.ceil(w / 4.0).toInt
          val total = plen - (minlag + 1)
          val per = math.max(1, math.ceil(total.toDouble / blocksPerSplit).toInt)
          (0 until blocksPerSplit).iterator
            .map { b =>
              val lo = minlag + 1 + b * per
              val hi = math.min(minlag + 1 + (b + 1) * per, plen)
              (lo, hi)
            }
            .filter { case (lo, hi) => lo < hi }
            .map { case (lo, hi) =>
              (s.conv_id, s.kind, w, lo, hi, s.values, None: Option[MpxPartial])
            }
        }
      }
    }

    val partials = tasks
      .repartition($"_1", $"_3", $"_4") // spread one series' blocks across tasks
      .map { case (conv, kind, w, lo, hi, ts, pre) =>
        val p = pre.getOrElse {
          val st = Mpx.selfStats(ts, w)
          val buf = Mpx.newBuf(st.profileLen)
          Mpx.selfJoinBlock(ts, w, st, lo, hi, buf)
          MpxPartial(buf.mp, buf.mpi)
        }
        (conv, kind, w, p)
      }

    val mergeAgg = new ProfileMerge.MpxMaxMerge().toColumn
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

  /** STOMP profiles (with left/right profiles); same unified shape. */
  def stompProfiles(series: Dataset[SeriesRow], w: Int, tier: String,
      splitThreshold: Int = 1 << 15, batchesPerSplit: Int = 16): Dataset[MpProfileRow] = {
    val spark = series.sparkSession
    import spark.implicits._
    val ez = math.ceil(w / 2.0).toInt

    val tasks = series.flatMap { s =>
      val n = s.values.length
      if (n < 2 * w) Iterator.empty
      else if (n < splitThreshold) {
        val r = Stomp.stomp(s.values, w)
        Iterator((s.conv_id, s.kind, -1, -1, Array.empty[Double],
          Some(StompPartial(r.mp, r.pi, r.lmp, r.lpi, r.rmp, r.rpi))))
      } else {
        val plen = n - w + 1
        Stomp.batchRanges(plen, batchesPerSplit).iterator.map { case (lo, hi) =>
          (s.conv_id, s.kind, lo, hi, s.values, None: Option[StompPartial])
        }
      }
    }

    val partials = tasks
      .repartition($"_1", $"_3")
      .map { case (conv, kind, lo, hi, ts, pre) =>
        val p = pre.getOrElse {
          val plen = ts.length - w + 1
          val skip = graft.kernels.Core.findSkipLocations(ts, plen, w)
          val clean = graft.kernels.Core.cleanNanInf(ts)
          val (mu, sig) = graft.kernels.MovingStats.movingAvgStd(clean, w)
          val firstProduct = graft.kernels.Fft.fftConvolve(clean,
            java.util.Arrays.copyOfRange(clean, 0, w))
          val b = Stomp.batchCompute(lo, hi, clean, clean, w, ez, isJoin = false,
            mu, sig, firstProduct, skip)
          StompPartial(b.mp, b.pi, b.lmp, b.lpi, b.rmp, b.rpi)
        }
        (conv, kind, p)
      }

    val mergeAgg = new ProfileMerge.StompMinMerge().toColumn
    partials
      .groupByKey { case (conv, kind, _) => (conv, kind) }
      .mapValues { case (_, _, p) => p }
      .agg(mergeAgg)
      .map { case ((conv, kind), r) =>
        MpProfileRow(conv, kind, tier, w, ez, "stomp", "euclidean", join = false,
          r.mp, r.pi, r.lmp, r.lpi, r.rmp, r.rpi)
      }
  }
}
