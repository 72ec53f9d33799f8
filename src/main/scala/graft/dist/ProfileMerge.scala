package graft.dist

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial profile buffers and their Catalyst Aggregators.
  *
  * These are the engine's cross-partition reduction of (profile, index)
  * pairs: MPX partials merge by elementwise Pearson max
  * (ref cympx.pyx:104-112), STOMP partials by elementwise Euclidean min
  * (ref stomp.py:340-357). Registering them as typed Aggregators gives
  * Spark's partial→final aggregation (map-side combine before the
  * shuffle), so a series chunked over many partitions reduces as a tree,
  * not through a single task.
  */
final case class MpxPartial(mp: Array[Double], pi: Array[Long])

final case class StompPartial(
    mp: Array[Double], pi: Array[Long],
    lmp: Array[Double], lpi: Array[Long],
    rmp: Array[Double], rpi: Array[Long])

object ProfileMerge {

  /** Elementwise Pearson max-merge with clamp at 1.0 on write. */
  class MpxMaxMerge extends Aggregator[MpxPartial, MpxPartial, MpxPartial] {
    override def zero: MpxPartial = MpxPartial(Array.empty, Array.empty)

    private def mergePair(a: MpxPartial, b: MpxPartial): MpxPartial = {
      if (a.mp.isEmpty) return b
      if (b.mp.isEmpty) return a
      var j = 0
      while (j < a.mp.length) {
        if (b.mp(j) > a.mp(j)) {
          a.mp(j) = if (b.mp(j) > 1.0) 1.0 else b.mp(j)
          a.pi(j) = b.pi(j)
        }
        j += 1
      }
      a
    }

    override def reduce(buf: MpxPartial, in: MpxPartial): MpxPartial = mergePair(buf, in)
    override def merge(a: MpxPartial, b: MpxPartial): MpxPartial = mergePair(a, b)
    override def finish(r: MpxPartial): MpxPartial = {
      var j = 0
      while (j < r.mp.length) { if (r.mp(j) > 1.0) r.mp(j) = 1.0; j += 1 }
      r
    }
    override def bufferEncoder: Encoder[MpxPartial] = Encoders.product[MpxPartial]
    override def outputEncoder: Encoder[MpxPartial] = Encoders.product[MpxPartial]
  }

  /** Elementwise Euclidean min-merge carrying all six profile arrays. */
  class StompMinMerge extends Aggregator[StompPartial, StompPartial, StompPartial] {
    override def zero: StompPartial =
      StompPartial(Array.empty, Array.empty, Array.empty, Array.empty, Array.empty, Array.empty)

    private def mergePair(a: StompPartial, b: StompPartial): StompPartial = {
      if (a.mp.isEmpty) return b
      if (b.mp.isEmpty) return a
      var j = 0
      while (j < a.mp.length) {
        if (b.mp(j) < a.mp(j)) { a.mp(j) = b.mp(j); a.pi(j) = b.pi(j) }
        if (a.lmp.nonEmpty && b.lmp.nonEmpty) {
          if (b.lmp(j) < a.lmp(j)) { a.lmp(j) = b.lmp(j); a.lpi(j) = b.lpi(j) }
          if (b.rmp(j) < a.rmp(j)) { a.rmp(j) = b.rmp(j); a.rpi(j) = b.rpi(j) }
        }
        j += 1
      }
      a
    }

    override def reduce(buf: StompPartial, in: StompPartial): StompPartial = mergePair(buf, in)
    override def merge(a: StompPartial, b: StompPartial): StompPartial = mergePair(a, b)
    override def finish(r: StompPartial): StompPartial = r
    override def bufferEncoder: Encoder[StompPartial] = Encoders.product[StompPartial]
    override def outputEncoder: Encoder[StompPartial] = Encoders.product[StompPartial]
  }
}
