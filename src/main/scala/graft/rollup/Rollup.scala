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

  /** Loud-failure guard for the colocated paths' input contract: within a
    * partition each (conv, kind) series must arrive as ONE contiguous run
    * with non-decreasing time. A violated contract used to emit split
    * buckets (duplicate rows per bucket) and silently wrong first/last —
    * now a WITHIN-PARTITION violation (unsorted rows, interleaved
    * conversations) throws with the offending key instead of producing
    * quietly corrupt rollups. The guard is necessarily partition-local:
    * a conversation SPLIT ACROSS partitions (each piece internally
    * sorted) still emits one row per piece undetected — detecting that
    * requires the very shuffle this path exists to avoid, so colocation
    * itself remains the caller's contract (an Iceberg bucket(conv_id)
    * layout provides it by construction; the storage-layout spec proves
    * that path, and rollupRaw is the layout-agnostic fallback). State per
    * partition: one set entry per (conv, kind) group — bounded by the
    * partition's group count, the same order as the aggregation state
    * itself.
    */
  private final class SortGuard(what: String) {
    private val seen = new java.util.HashSet[String]()
    private var curConv: String = null
    private var curKind: String = null
    private var lastT = Long.MinValue
    def check(conv: String, kind: String, t: Long): Unit = {
      if (curConv == null || conv != curConv || kind != curKind) {
        if (!seen.add(conv + "\u0000" + kind))
          throw new IllegalArgumentException(
            s"$what: input is not colocated-sorted — series ($conv, $kind) " +
              "reappears after other rows in the same partition; feed a " +
              "bucket(conv_id)-partitioned, (conv_id, kind, ts)-sorted table " +
              "or use the generic rollupRaw/rollupTier path")
        curConv = conv; curKind = kind; lastT = Long.MinValue
      } else if (t < lastT)
        throw new IllegalArgumentException(
          s"$what: input is not time-sorted within ($conv, $kind) — " +
            s"timestamp $t arrived after $lastT; feed a (conv_id, kind, ts)-" +
            "sorted table or use the generic rollupRaw/rollupTier path")
      lastT = t
    }
  }

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
        // mutable accumulator: one TierAgg allocation per emitted bucket,
        // zero per-row allocation
        private val guard = new SortGuard("rollupColocated")
        private var conv: String = null
        private var kind: String = null
        private var bucket = 0L
        private var cnt = 0L
        private var sum, mn, mx, first, last = 0.0
        private var pending: TierAgg = null

        private def flush(): Unit =
          if (conv != null)
            pending = TierAgg(conv, kind, tier, bucket, cnt, sum, mn, mx, first, last)

        private def absorb(p: SeriesPoint): Unit = {
          guard.check(p.conv_id, p.kind, p.bucket)
          val b = p.bucket - math.floorMod(p.bucket, step)
          if (conv == null || conv != p.conv_id || kind != p.kind || bucket != b) {
            flush()
            conv = p.conv_id; kind = p.kind; bucket = b
            cnt = 1L; sum = p.value; mn = p.value; mx = p.value
            first = p.value; last = p.value
          } else {
            cnt += 1; sum += p.value
            if (p.value < mn) mn = p.value
            if (p.value > mx) mx = p.value
            last = p.value
          }
        }

        def hasNext: Boolean = pending != null || conv != null || it.hasNext
        def next(): TierAgg = {
          while (pending == null && it.hasNext) absorb(it.next())
          if (pending == null) { flush(); conv = null }
          val r = pending; pending = null; r
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

  /** Incremental continuous-aggregate maintenance: merge a DELTA of
    * newly-arrived raw points into an existing tier table WITHOUT
    * recomputing untouched buckets — the operation a 100 TB deployment
    * runs on every ingest batch instead of rescanning history.
    *
    * Contract: append-only per bucket — every delta point in a
    * (conv, kind, bucket) group arrives at a raw time ≥ every base point
    * already aggregated into that group (the shape of time-ordered
    * ingest; late data is the streaming tier's watermark problem, not
    * this operator's). Under it the merge is exact: cnt/sum add,
    * min/max combine, `first` keeps the base's value when the bucket
    * existed, `last` takes the delta's.
    *
    * Scale shape (the point of the operator): the base NEVER shuffles.
    * The delta's touched keys are broadcast; untouched base rows pass
    * through an anti-join unchanged (at 100 TB: their Iceberg data files
    * are simply not rewritten), and only the affected slice — bounded by
    * the delta's key count, not the base's size — enters the merge
    * aggregation.
    */
  /** Broadcasting more touched keys than this falls back to a shuffle
    * join: an unguarded broadcast of a huge backfill delta's key set
    * would OOM the driver long before Spark's own 8 GB broadcast cap
    * fires. ~4M three-column keys is comfortably inside a few hundred MB
    * built relation; a real deployment tunes this with its driver size.
    */
  val MaxBroadcastKeys: Long = 4L * 1000 * 1000

  /** Deltas whose PLAN-TIME size estimate is under this skip the exact
    * touched-key count: even if every input row touched a distinct
    * bucket, the key set is safely broadcastable. Keeps the designed
    * micro-batch path free of any extra action; only a plausibly
    * backfill-sized delta pays one count() (amortized by the big job it
    * gates). Estimates can be wrong, but only by enough to matter when
    * the input is ALREADY large — which is exactly when they are real
    * file-scan sizes.
    */
  val SmallDeltaBytes: Long = 64L * 1024 * 1024

  def maintainTier(base: Dataset[TierAgg], delta: Dataset[SeriesPoint],
      tier: String, saltBuckets: Int = 1,
      maxBroadcastKeys: Long = MaxBroadcastKeys,
      smallDeltaBytes: Long = SmallDeltaBytes): Dataset[TierAgg] = {
    val spark = base.sparkSession
    import spark.implicits._
    // the delta rollup's rows ARE the touched keys (one per (conv, kind,
    // bucket)), so no separate distinct is needed. Left unpersisted: the
    // micro-batch path must stay free of extra jobs and cache encoding
    // (a lazy persist here measured +0.3 s on q40); the exact count below
    // recomputes it once, but only on the plausibly-backfill path where
    // that cost is noise against the job it gates.
    val deltaAgg = rollupRaw(delta, tier, saltBuckets)
    val estBytes = delta.queryExecution.optimizedPlan.stats.sizeInBytes
    val bcast = estBytes <= smallDeltaBytes ||
      deltaAgg.count() <= maxBroadcastKeys
    val keys = Seq("conv_id", "kind", "bucket")
    val touchedKeys = deltaAgg.select($"conv_id", $"kind", $"bucket")
    // micro-batch ingest (the designed use) broadcasts: base never
    // shuffles. A backfill-sized delta falls back to a shuffle join —
    // slower but bounded by executor memory, not the driver heap.
    val touched = if (bcast) broadcast(touchedKeys) else touchedKeys
    val untouched = base.join(touched, keys, "left_anti").as[TierAgg]
    val affected = base.join(touched, keys, "left_semi").as[TierAgg]
    // src orders first/last across the two sides: the append-only
    // contract puts every base point before every delta point within a
    // bucket, so `first` comes from the base row when one exists (src 0)
    // and `last` from the delta row (src 1)
    val merged = affected.toDF().withColumn("src", lit(0))
      .unionByName(deltaAgg.toDF().withColumn("src", lit(1)))
      .groupBy($"conv_id", $"kind", $"bucket")
      .agg(
        sum($"cnt").as("cnt"),
        sum($"sum").as("sum"),
        min($"min").as("min"),
        max($"max").as("max"),
        min_by($"first", $"src").as("first"),
        max_by($"last", $"src").as("last"))
      .withColumn("tier", lit(tier))
      .select($"conv_id", $"kind", $"tier", $"bucket",
        $"cnt", $"sum", $"min", $"max", $"first", $"last")
      .as[TierAgg]
    untouched.unionByName(merged)
  }

  /** Chained incremental maintenance of ALL tiers for one ingest delta:
    * the 1m tier absorbs the delta via [[maintainTier]]; each coarser
    * tier then REFRESHES only the buckets the delta touched, recomputed
    * from the (already-maintained) finer tier — replacement, not
    * addition, because a touched coarse bucket's old row already
    * contains the finer buckets that just changed. first/last at coarse
    * tiers come from rollupTier's fbucket ordering, so only the 1m merge
    * needs the append-only contract.
    *
    * Scale shape: no base tier ever shuffles. Every touched-key set
    * derives from the DELTA (small → broadcast); each coarse recompute
    * reads only the finer tier's affected slice — cost is bounded by
    * delta keys × tier fan-in (≤60/≤24), independent of base size.
    */
  def maintainAllTiers(base1m: Dataset[TierAgg], base1h: Dataset[TierAgg],
      base1d: Dataset[TierAgg], delta: Dataset[SeriesPoint],
      saltBuckets: Int = 1,
      maxBroadcastKeys: Long = MaxBroadcastKeys,
      smallDeltaBytes: Long = SmallDeltaBytes):
      (Dataset[TierAgg], Dataset[TierAgg], Dataset[TierAgg]) = {
    val spark = base1m.sparkSession
    import spark.implicits._
    val m = maintainTier(base1m, delta, "1m", saltBuckets, maxBroadcastKeys,
      smallDeltaBytes)

    def refresh(baseCoarse: Dataset[TierAgg], finer: Dataset[TierAgg],
        tier: String): Dataset[TierAgg] = {
      val step = TierStep(tier)
      // broadcast gated the same two-tier way as maintainTier (free size
      // estimate, exact count only for plausibly-large deltas) — a
      // backfill must not ride an unguarded driver broadcast
      val touchedKeys = delta
        .select($"conv_id", $"kind",
          ($"bucket" - pmod($"bucket", lit(step))).as("bucket"))
        .distinct()
      val bcast =
        delta.queryExecution.optimizedPlan.stats.sizeInBytes <= smallDeltaBytes ||
          touchedKeys.count() <= maxBroadcastKeys
      def side(df: org.apache.spark.sql.DataFrame) =
        if (bcast) broadcast(df) else df
      val keys = Seq("conv_id", "kind", "bucket")
      val untouched = baseCoarse
        .join(side(touchedKeys.toDF()), keys, "left_anti").as[TierAgg]
      // affected slice of the finer tier: its rows whose COARSE bucket is
      // touched (join on the derived coarse key, finer bucket preserved)
      val affectedFiner = finer
        .withColumn("cb", $"bucket" - pmod($"bucket", lit(step)))
        .join(side(touchedKeys.toDF("conv_id", "kind", "cb")),
          Seq("conv_id", "kind", "cb"), "left_semi")
        .drop("cb").as[TierAgg]
      untouched.unionByName(rollupTier(affectedFiner, tier))
    }

    val h = refresh(base1h, m, "1h")
    val d = refresh(base1d, h, "1d")
    (m, h, d)
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
        private val guard = new SortGuard("rollupTierColocated")
        private var conv: String = null
        private var kind: String = null
        private var bucket = 0L
        private var cnt = 0L
        private var sum, mn, mx, first, last = 0.0
        private var pending: TierAgg = null

        private def flush(): Unit =
          if (conv != null)
            pending = TierAgg(conv, kind, tier, bucket, cnt, sum, mn, mx, first, last)

        private def absorb(r: TierAgg): Unit = {
          guard.check(r.conv_id, r.kind, r.bucket)
          val b = r.bucket - math.floorMod(r.bucket, step)
          if (conv == null || conv != r.conv_id || kind != r.kind || bucket != b) {
            flush()
            conv = r.conv_id; kind = r.kind; bucket = b
            cnt = r.cnt; sum = r.sum; mn = r.min; mx = r.max
            first = r.first; last = r.last
          } else {
            cnt += r.cnt; sum += r.sum
            if (r.min < mn) mn = r.min
            if (r.max > mx) mx = r.max
            last = r.last
          }
        }

        def hasNext: Boolean = pending != null || conv != null || it.hasNext
        def next(): TierAgg = {
          while (pending == null && it.hasNext) absorb(it.next())
          if (pending == null) { flush(); conv = null }
          val r = pending; pending = null; r
        }
      }
    }
  }

  /** Fused single-scan rollup for conv-bucketed sorted input: one pass
    * emits the 1m, 1h, and 1d tiers together by cascading each finished
    * fine bucket into the coarser accumulator — no intermediate
    * materialization between tiers.
    */
  def rollupAllColocated(points: Dataset[SeriesPoint]): Dataset[TierAgg] = {
    val spark = points.sparkSession
    import spark.implicits._
    val steps = Array("1m" -> TierStep("1m"), "1h" -> TierStep("1h"), "1d" -> TierStep("1d"))
    points.mapPartitions { it =>
      new Iterator[TierAgg] {
        private val L = steps.length
        private val conv = new Array[String](L)
        private val kind = new Array[String](L)
        private val bucket = new Array[Long](L)
        private val cnt = new Array[Long](L)
        private val sum = new Array[Double](L)
        private val mn = new Array[Double](L)
        private val mx = new Array[Double](L)
        private val first = new Array[Double](L)
        private val last = new Array[Double](L)
        private val queue = new scala.collection.mutable.ArrayDeque[TierAgg](4)
        private val guard = new SortGuard("rollupAllColocated")

        /** flush level l into the queue and cascade into level l+1. */
        private def flush(l: Int): Unit = {
          if (conv(l) == null) return
          queue.append(TierAgg(conv(l), kind(l), steps(l)._1, bucket(l),
            cnt(l), sum(l), mn(l), mx(l), first(l), last(l)))
          if (l + 1 < L) mergeUp(l + 1, conv(l), kind(l), bucket(l),
            cnt(l), sum(l), mn(l), mx(l), first(l), last(l))
          conv(l) = null
        }

        private def mergeUp(l: Int, c: String, k: String, fineBucket: Long,
            n: Long, s: Double, lo: Double, hi: Double, f: Double, la: Double): Unit = {
          val b = fineBucket - math.floorMod(fineBucket, steps(l)._2)
          if (conv(l) == null || conv(l) != c || kind(l) != k || bucket(l) != b) {
            flush(l)
            conv(l) = c; kind(l) = k; bucket(l) = b
            cnt(l) = n; sum(l) = s; mn(l) = lo; mx(l) = hi
            first(l) = f; last(l) = la
          } else {
            cnt(l) += n; sum(l) += s
            if (lo < mn(l)) mn(l) = lo
            if (hi > mx(l)) mx(l) = hi
            last(l) = la
          }
        }

        private def absorb(p: SeriesPoint): Unit = {
          guard.check(p.conv_id, p.kind, p.bucket)
          val b = p.bucket - math.floorMod(p.bucket, steps(0)._2)
          if (conv(0) == null || conv(0) != p.conv_id || kind(0) != p.kind ||
              bucket(0) != b) {
            flush(0)
            conv(0) = p.conv_id; kind(0) = p.kind; bucket(0) = b
            cnt(0) = 1L; sum(0) = p.value; mn(0) = p.value; mx(0) = p.value
            first(0) = p.value; last(0) = p.value
          } else {
            cnt(0) += 1; sum(0) += p.value
            if (p.value < mn(0)) mn(0) = p.value
            if (p.value > mx(0)) mx(0) = p.value
            last(0) = p.value
          }
        }

        def hasNext: Boolean =
          queue.nonEmpty || conv.exists(_ != null) || it.hasNext
        def next(): TierAgg = {
          while (queue.isEmpty && it.hasNext) absorb(it.next())
          if (queue.isEmpty) (0 until L).foreach(flush) // end of partition
          queue.removeHead()
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
