package graft.rollup

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.{SeriesPoint, TierAgg}

/** Continuous aggregates at retention tiers raw→1m→1h→1d.
  *
  * Each tier stores the per-bucket struct (cnt, sum, min, max, first,
  * last) so the next tier re-aggregates the previous one instead of
  * rescanning raw data — the rollup analog of SKIMP's window memoization
  * (skimp.py:193-205), and the property that bounds each tier's input to
  * 1/60th of the one below.
  *
  * Skew: hot conversations are handled with salted two-phase aggregation —
  * partials are computed per (conv, bucket, salt) where salt spreads one
  * conversation's rows over `saltBuckets` reducers, then finalized per
  * (conv, bucket). Spark's partial aggregation already map-combines, so
  * salting matters when a single (conv, bucket) group is itself huge or
  * when AQE's skew handling can't split a group; it is kept explicit per
  * the engine contract.
  */
object Rollup {

  val MicrosPerMin: Long = 60L * 1000000L
  val TierStep: Map[String, Long] = Map(
    "1m" -> MicrosPerMin, "1h" -> 60 * MicrosPerMin, "1d" -> 1440 * MicrosPerMin)

  /** raw points → 1m tier. `points.bucket` is the event time in µs.
    *
    * `saltBuckets > 1` enables the salted two-phase plan for genuinely hot
    * (conv, bucket) groups; Spark's map-side partial aggregation already
    * combines before the shuffle, so the default single-exchange plan is
    * the right one unless a single group overwhelms one reducer.
    */
  def rollupRaw(points: Dataset[SeriesPoint], tier: String,
      saltBuckets: Int = 1): Dataset[TierAgg] = {
    val spark = points.sparkSession
    import spark.implicits._
    val step = TierStep(tier)

    if (saltBuckets <= 1) {
      return points
        .select($"conv_id", $"kind",
          ($"bucket" - pmod($"bucket", lit(step))).as("bucket"),
          $"bucket".as("t"), $"value")
        .groupBy($"conv_id", $"kind", $"bucket")
        .agg(
          count(lit(1)).as("cnt"),
          sum($"value").as("sum"),
          min($"value").as("min"),
          max($"value").as("max"),
          min_by($"value", $"t").as("first"),
          max_by($"value", $"t").as("last"))
        .withColumn("tier", lit(tier))
        .select($"conv_id", $"kind", $"tier", $"bucket",
          $"cnt", $"sum", $"min", $"max", $"first", $"last")
        .as[TierAgg]
    }

    // phase 1: partial aggregate per (conv, kind, bucket, salt); the salt
    // derives from the raw bucket so replays are deterministic
    val partial = points
      .select($"conv_id", $"kind",
        ($"bucket" - pmod($"bucket", lit(step))).as("bucket"),
        $"bucket".as("t"), $"value",
        pmod(hash($"bucket"), lit(saltBuckets)).as("salt"))
      .groupBy($"conv_id", $"kind", $"bucket", $"salt")
      .agg(
        count(lit(1)).as("cnt"),
        sum($"value").as("sum"),
        min($"value").as("min"),
        max($"value").as("max"),
        min_by($"value", $"t").as("first"),
        max_by($"value", $"t").as("last"),
        min($"t").as("first_t"),
        max($"t").as("last_t"))

    // phase 2: final merge per (conv, kind, bucket)
    partial
      .groupBy($"conv_id", $"kind", $"bucket")
      .agg(
        sum($"cnt").as("cnt"),
        sum($"sum").as("sum"),
        min($"min").as("min"),
        max($"max").as("max"),
        min_by($"first", $"first_t").as("first"),
        max_by($"last", $"last_t").as("last"))
      .withColumn("tier", lit(tier))
      .select($"conv_id", $"kind", $"tier", $"bucket",
        $"cnt", $"sum", $"min", $"max", $"first", $"last")
      .as[TierAgg]
  }

  /** Zero-shuffle rollup for conv-bucketed input: when every row of a
    * conversation lives in one partition (an Iceberg table partitioned by
    * bucket(conv_id) read with storage-partitioned scans — which the
    * deterministic generator reproduces), the tier aggregate is a
    * partition-local hash aggregation, no exchange. This is the plan shape
    * the engine runs at full scale; `rollupRaw` is the generic-layout
    * fallback.
    */
  def rollupColocated(points: Dataset[SeriesPoint], tier: String): Dataset[TierAgg] = {
    val spark = points.sparkSession
    import spark.implicits._
    val step = TierStep(tier)
    // rows arrive sorted (conv_id, kind, bucket) within a partition (table
    // sort order conv_id, ts) → streaming aggregation with O(1) state
    points.mapPartitions { it =>
      new Iterator[TierAgg] {
        private var cur: TierAgg = null
        private var pending: TierAgg = null

        private def absorb(p: SeriesPoint): Unit = {
          val b = p.bucket - math.floorMod(p.bucket, step)
          if (cur == null || cur.conv_id != p.conv_id || cur.kind != p.kind ||
              cur.bucket != b) {
            pending = cur
            cur = TierAgg(p.conv_id, p.kind, tier, b, 1L, p.value, p.value,
              p.value, p.value, p.value)
          } else {
            cur = cur.copy(cnt = cur.cnt + 1, sum = cur.sum + p.value,
              min = math.min(cur.min, p.value), max = math.max(cur.max, p.value),
              last = p.value)
          }
        }

        def hasNext: Boolean = pending != null || cur != null || it.hasNext
        def next(): TierAgg = {
          while (pending == null && it.hasNext) absorb(it.next())
          if (pending != null) { val r = pending; pending = null; r }
          else { val r = cur; cur = null; r }
        }
      }
    }
  }

  /** Chain: aggregate a finer tier into a coarser one (1m→1h, 1h→1d)
    * without touching raw data.
    */
  def rollupTier(finer: Dataset[TierAgg], tier: String): Dataset[TierAgg] = {
    val spark = finer.sparkSession
    import spark.implicits._
    val step = TierStep(tier)
    finer
      .withColumn("fbucket", $"bucket") // finer bucket, for first/last order
      .groupBy($"conv_id", $"kind",
        ($"bucket" - pmod($"bucket", lit(step))).as("bucket"))
      .agg(
        sum($"cnt").as("cnt"),
        sum($"sum").as("sum"),
        min($"min").as("min"),
        max($"max").as("max"),
        min_by($"first", $"fbucket").as("first"),
        max_by($"last", $"fbucket").as("last"))
      .withColumn("tier", lit(tier))
      .select($"conv_id", $"kind", $"tier", $"bucket",
        $"cnt", $"sum", $"min", $"max", $"first", $"last")
      .as[TierAgg]
  }

  /** Zero-shuffle tier chaining for conv-bucketed tiers (see
    * rollupColocated): merge finer structs into coarser buckets
    * partition-locally.
    */
  def rollupTierColocated(finer: Dataset[TierAgg], tier: String): Dataset[TierAgg] = {
    val spark = finer.sparkSession
    import spark.implicits._
    val step = TierStep(tier)
    // finer rows arrive sorted (conv, kind, bucket) within a partition
    // (streaming output of rollupColocated) → streaming merge
    finer.mapPartitions { it =>
      new Iterator[TierAgg] {
        private var cur: TierAgg = null
        private var pending: TierAgg = null

        private def absorb(r: TierAgg): Unit = {
          val b = r.bucket - math.floorMod(r.bucket, step)
          if (cur == null || cur.conv_id != r.conv_id || cur.kind != r.kind ||
              cur.bucket != b) {
            pending = cur
            cur = TierAgg(r.conv_id, r.kind, tier, b, r.cnt, r.sum, r.min,
              r.max, r.first, r.last)
          } else {
            cur = cur.copy(cnt = cur.cnt + r.cnt, sum = cur.sum + r.sum,
              min = math.min(cur.min, r.min), max = math.max(cur.max, r.max),
              last = r.last)
          }
        }

        def hasNext: Boolean = pending != null || cur != null || it.hasNext
        def next(): TierAgg = {
          while (pending == null && it.hasNext) absorb(it.next())
          if (pending != null) { val r = pending; pending = null; r }
          else { val r = cur; cur = null; r }
        }
      }
    }
  }

  /** Tier value series (bucket mean) for the per-tier matrix profiles. */
  def tierSeries(tiers: Dataset[TierAgg]): Dataset[SeriesPoint] = {
    val spark = tiers.sparkSession
    import spark.implicits._
    tiers.select($"conv_id",
      concat($"kind", lit("@"), $"tier").as("kind"),
      $"bucket", ($"sum" / $"cnt").as("value")).as[SeriesPoint]
  }

  /** Retention: drop buckets older than `cutoffMicros` from a tier — the
    * raw/fine tiers keep short horizons, coarse tiers keep long ones.
    */
  def applyRetention(tiers: Dataset[TierAgg], cutoffMicros: Long): Dataset[TierAgg] = {
    import tiers.sparkSession.implicits._
    tiers.where($"bucket" >= cutoffMicros)
  }
}
