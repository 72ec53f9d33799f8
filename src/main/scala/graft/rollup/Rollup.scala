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

  /** raw points → 1m tier (salted two-phase). `bucketMicros` of the raw
    * points is the event time in µs.
    */
  def rollupRaw(points: Dataset[SeriesPoint], tier: String,
      saltBuckets: Int = 16): Dataset[TierAgg] = {
    val spark = points.sparkSession
    import spark.implicits._
    val step = TierStep(tier)

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
