package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs the SparkEntry queries on
  * SPARK_GRAFT_SF_DIR and the transcript-corpus rollup+MP pipeline, then
  * prints ONE JSON line.
  *
  * Headline metrics follow BASELINE.md: rolled-up points/sec across the
  * raw→1m→1h→1d tiers and matrix-profile subsequences/sec on the
  * synthetic transcript corpus. Scaling evidence (same job at local[N]
  * vs local[4N]) is produced by running this main at two
  * SPARK_GRAFT_CPUS values — see BENCH.md.
  */
object Bench {

  /** Transcript-corpus benchmark: returns (points, rolledRows, subseqs,
    * rollupSec, mpSec).
    */
  def pipelineBench(spark: SparkSession, numConvs: Int,
      turnsScale: Int = 1): (Long, Long, Long, Double, Double) = {
    import spark.implicits._
    import graft.ingest.TranscriptGen
    import graft.rollup.Rollup
    import graft.schema.SeriesPoint
    import graft.dist.DistributedMp
    import graft.dist.DistributedMp.SeriesRow

    // string-free points generation (values identical to deriving
    // length(text) from the transcript table — asserted in tests)
    val points = TranscriptGen.generatePoints(spark, numConvs,
      turnsScale = turnsScale).cache()
    val nPoints = points.count()

    // generator output is conv-bucketed (one conversation per partition),
    // matching an Iceberg bucket(conv_id) table read with storage-
    // partitioned scans → the zero-shuffle tier plan applies; set
    // SPARK_GRAFT_BENCH_GENERIC=1 to measure the generic-layout plan
    val colocated = !sys.env.contains("SPARK_GRAFT_BENCH_GENERIC")
    var t0 = System.nanoTime()
    var rolled = 0L
    var cached: org.apache.spark.sql.Dataset[_] = null
    val m1 =
      if (colocated) {
        // fused single-scan plan: one pass emits all three tiers
        val all = Rollup.rollupAllColocated(points).cache()
        cached = all
        rolled = all.count()
        all.where($"tier" === "1m").as[graft.schema.TierAgg]
      } else {
        val m = Rollup.rollupRaw(points, "1m").cache()
        cached = m
        val h = Rollup.rollupTier(m, "1h").cache()
        rolled = m.count() + h.count() + Rollup.rollupTier(h, "1d").count()
        h.unpersist()
        m
      }
    val rollupSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val tierPts = Rollup.tierSeries(m1)
    val series = (if (colocated) graft.series.Derive.assembleColocated(tierPts)
                  else graft.series.Derive.assemble(tierPts))
      .map { case (c, k, s, v) => SeriesRow(c, k, s, v) }
    val profiles = DistributedMp.mpxProfiles(series, 16, "1m").cache()
    val nSubseq = profiles.select(sum(size($"mp"))).as[Long].first()
    val mpSec = (System.nanoTime() - t0) / 1e9

    points.unpersist()
    if (cached != null) cached.unpersist()
    profiles.unpersist()
    (nPoints, rolled, nSubseq, rollupSec, mpSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // defaults sized so the pipeline leg measures sustained throughput
    // (~6M points), not task-launch latency
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "4000").toInt
    val turnsScale = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS_SCALE", "12").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")
    if (!skipQueries) {
      // warm up the JVM/codegen and page the inputs so the first timed
      // query doesn't absorb session startup
      Seq("events", "documents", "embeddings", "lineitem").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => }
      }
    }
    val results =
      if (skipQueries) Seq.empty
      else SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // queries persist shared intermediates (LSH signatures, quantized
        // series) — drop them so each query is timed cold and caches don't
        // accumulate across the suite
        spark.catalog.clearCache()
        name -> dt
      }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    val (nPoints, rolled, nSubseq, rollupSec, mpSec) =
      pipelineBench(spark, benchConvs, turnsScale)
    val pointsPerSec = nPoints / rollupSec
    val subseqPerSec = nSubseq / mpSec

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""sf":"$sfDir","cpus":$cpus,"bench_convs":$benchConvs,""" +
      f""""rollup_points":$nPoints,"rolled_rows":$rolled,"rollup_sec":$rollupSec%.3f,""" +
      f""""points_per_sec":$pointsPerSec%.0f,""" +
      f""""mp_subsequences":$nSubseq,"mp_sec":$mpSec%.3f,""" +
      f""""subseq_per_sec":$subseqPerSec%.0f}""")
    spark.stop()
  }
}
