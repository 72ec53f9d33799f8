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
  * Each split task re-derives its seed state (muinvn stats + one O(w·n)
  * scan for MPX, one FFT for STOMP) exactly like the reference's non-zero
  * batches (stomp.py:103-105), so no state crosses task boundaries.
  */
object DistributedMp {

  final case class SeriesRow(conv_id: String, kind: String, startBucket: Long,
      values: Array[Double])

  /** MPX self-join profiles for every series. Series with
    * length >= splitThreshold fan out over ~`blocksPerSplit` diagonal-block
    * tasks.
    */
  def mpxProfiles(series: Dataset[SeriesRow], w: Int, tier: String,
      splitThreshold: Int = 1 << 15, blocksPerSplit: Int = 16): Dataset[MpProfileRow] = {
    val spark = series.sparkSession
    import spark.implicits._
    val ez = math.ceil(w / 4.0).toInt

    val small = series.filter(s => s.values.length < splitThreshold && s.values.length >= 2 * w)
      .map { s =>
        val (mp, pi) = Mpx.mpxSelf(s.values, w)
        MpProfileRow(s.conv_id, s.kind, tier, w, ez, "mpx", "euclidean", join = false,
          mp, pi, Array.empty, Array.empty, Array.empty, Array.empty)
      }

    // long series: fan out diagonal blocks, reduce partials via Aggregator
    val blocks = series.filter(_.values.length >= splitThreshold)
      .flatMap { s =>
        val st = Mpx.selfStats(s.values, w)
        val total = st.profileLen - (st.minlag + 1)
        val per = math.max(1, math.ceil(total.toDouble / blocksPerSplit).toInt)
        (0 until blocksPerSplit).iterator.map { b =>
          val lo = st.minlag + 1 + b.toLong * per
          val hi = math.min(st.minlag + 1 + (b + 1).toLong * per, st.profileLen.toLong)
          (s.conv_id, s.kind, lo, hi, s.values)
        }.filter(t => t._3 < t._4)
      }
      .repartition($"_1", $"_3") // spread one series' blocks across tasks
      .map { case (conv, kind, lo, hi, ts) =>
        val st = Mpx.selfStats(ts, w)
        val buf = Mpx.newBuf(st.profileLen)
        Mpx.selfJoinBlock(ts, w, st, lo.toInt, hi.toInt, buf)
        (conv, kind, MpxPartial(buf.mp, buf.mpi))
      }

    val mergeAgg = new ProfileMerge.MpxMaxMerge().toColumn
    val big = blocks
      .groupByKey { case (conv, kind, _) => (conv, kind) }
      .mapValues { case (_, _, p) => p }
      .agg(mergeAgg)
      .map { case ((conv, kind), partial) =>
        val buf = Mpx.PearsonBuf(partial.mp, partial.pi)
        MpProfileRow(conv, kind, tier, w, ez, "mpx", "euclidean", join = false,
          Mpx.selfToEuclidean(buf, w), buf.mpi,
          Array.empty, Array.empty, Array.empty, Array.empty)
      }

    small.union(big)
  }

  /** STOMP profiles (with left/right profiles) for every series; long
    * series split into row batches reduced by elementwise min.
    */
  def stompProfiles(series: Dataset[SeriesRow], w: Int, tier: String,
      splitThreshold: Int = 1 << 15, batchesPerSplit: Int = 16): Dataset[MpProfileRow] = {
    val spark = series.sparkSession
    import spark.implicits._
    val ez = math.ceil(w / 2.0).toInt

    def toRow(conv: String, kind: String, r: StompPartial): MpProfileRow =
      MpProfileRow(conv, kind, tier, w, ez, "stomp", "euclidean", join = false,
        r.mp, r.pi, r.lmp, r.lpi, r.rmp, r.rpi)

    val small = series.filter(s => s.values.length < splitThreshold && s.values.length >= 2 * w)
      .map { s =>
        val r = Stomp.stomp(s.values, w)
        toRow(s.conv_id, s.kind, StompPartial(r.mp, r.pi, r.lmp, r.lpi, r.rmp, r.rpi))
      }

    val batches = series.filter(_.values.length >= splitThreshold)
      .flatMap { s =>
        val plen = s.values.length - w + 1
        Stomp.batchRanges(plen, batchesPerSplit).iterator.map { case (lo, hi) =>
          (s.conv_id, s.kind, lo, hi, s.values)
        }
      }
      .repartition($"_1", $"_3")
      .map { case (conv, kind, lo, hi, tsRaw) =>
        val plen = tsRaw.length - w + 1
        val skip = graft.kernels.Core.findSkipLocations(tsRaw, plen, w)
        val ts = graft.kernels.Core.cleanNanInf(tsRaw)
        val (mu, sig) = graft.kernels.MovingStats.movingAvgStd(ts, w)
        val firstProduct = graft.kernels.Fft.fftConvolve(ts,
          java.util.Arrays.copyOfRange(ts, 0, w))
        val b = Stomp.batchCompute(lo, hi, ts, ts, w, ez, isJoin = false,
          mu, sig, firstProduct, skip)
        (conv, kind, StompPartial(b.mp, b.pi, b.lmp, b.lpi, b.rmp, b.rpi))
      }

    val mergeAgg = new ProfileMerge.StompMinMerge().toColumn
    val big = batches
      .groupByKey { case (conv, kind, _) => (conv, kind) }
      .mapValues { case (_, _, p) => p }
      .agg(mergeAgg)
      .map { case ((conv, kind), partial) => toRow(conv, kind, partial) }

    small.union(big)
  }
}
