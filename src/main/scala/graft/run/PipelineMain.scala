package graft.run

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.TranscriptGen
import graft.series.Derive
import graft.rollup.Rollup
import graft.compress.Chunks
import graft.dist.DistributedMp
import graft.dist.DistributedMp.SeriesRow
import graft.kernels.{Fluss, TopK}
import graft.schema._

/** End-to-end rollup + matrix-profile pipeline over the synthetic
  * transcript table, checkpoint-resumable via the Ledger.
  *
  * Stages: transcripts → series (token_len, gap_s, turn_rate) →
  * gap-fill → Gorilla chunks → tiers 1m→1h→1d → per-tier MP (mpx) →
  * discords/regimes per profile. Usage:
  *   runMain graft.run.PipelineMain [numConvs] [outDir] [window]
  */
object PipelineMain {

  /** Thrown by the `abortAfter` crash hook (ResumeBench's kill-resume
    * evidence): everything up to and including the named stage has
    * committed its ledger row; nothing after has run.
    */
  final class SimulatedCrash(stage: String)
    extends RuntimeException(s"simulated crash after stage '$stage'")

  def run(spark: SparkSession, numConvs: Int, outDir: String, w: Int,
      resume: Boolean = true, abortAfter: Option[String] = None): Unit = {
    import spark.implicits._
    def maybeAbort(stage: String): Unit =
      if (abortAfter.contains(stage)) throw new SimulatedCrash(stage)
    val ledger = new Ledger(spark, outDir, s"gen:v1:convs=$numConvs")
    if (!resume) {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(outDir), true)
    }
    val t0 = System.nanoTime()

    // stage 1: transcript table (the production engine scans Iceberg here)
    val transcriptsPath = ledger.stage("transcripts") { out =>
      val ds = TranscriptGen.generate(spark, numConvs)
      ds.write.mode(SaveMode.Overwrite).parquet(out)
      (0L, spark.read.parquet(out).count())
    }
    maybeAbort("transcripts")
    val transcripts = spark.read.parquet(transcriptsPath).as[Transcript]

    // stage 2: derived series points (time-indexed for rollup, position-
    // indexed token_len/gap_s for golden-gated profiles)
    val pointsPath = ledger.stage("series_points") { out =>
      val timed = transcripts.select($"conv_id", lit("token_len_t").as("kind"),
        unix_micros($"ts").as("bucket"), length($"text").cast("double").as("value"))
        .as[SeriesPoint]
      val tok = Derive.tokenLen(transcripts)
      val gap = Derive.gapSeconds(transcripts)
      val rate = Derive.gapFill(Derive.turnRate(transcripts), Rollup.MicrosPerMin, Some(0.0))
      val all = timed.union(tok).union(gap).union(rate)
      all.write.mode(SaveMode.Overwrite).partitionBy("kind").parquet(out)
      (transcripts.count(), spark.read.parquet(out).count())
    }
    maybeAbort("series_points")
    val points = spark.read.parquet(pointsPath).as[SeriesPoint]

    // stage 3: Gorilla-compressed chunk structs for the raw tier
    val chunksPath = ledger.stage("chunks_raw") { out =>
      val ch = Chunks.encode(points.where($"kind" === "token_len_t"))
      ch.write.mode(SaveMode.Overwrite).parquet(out)
      (0L, spark.read.parquet(out).count())
    }

    maybeAbort("chunks_raw")

    // stage 4: continuous aggregates 1m -> 1h -> 1d (chained, salted),
    // then retention: coarse tiers are derived from the FULL fine tier
    // first, after which the fine tiers keep only their horizon
    // (1m: 3 days, 1h: 30 days, 1d: forever — the north rule's
    // "retention drops old fine-tier buckets")
    val tiersPath = ledger.stage("tiers") { out =>
      val raw = points.where($"kind" === "token_len_t")
      val m1 = Rollup.rollupRaw(raw, "1m")
      m1.write.mode(SaveMode.Overwrite).parquet(s"$out/m1_full")
      val m1r = spark.read.parquet(s"$out/m1_full").as[TierAgg]
      val h1 = Rollup.rollupTier(m1r, "1h")
      h1.write.mode(SaveMode.Overwrite).parquet(s"$out/h1_full")
      val h1r = spark.read.parquet(s"$out/h1_full").as[TierAgg]
      val d1 = Rollup.rollupTier(h1r, "1d")
      d1.write.mode(SaveMode.Overwrite).parquet(s"$out/d1")
      val maxBucket = m1r.agg(max($"bucket")).as[Long].first()
      val day = 24L * 3600 * 1000000
      Rollup.applyRetention(m1r, maxBucket - 3 * day)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/m1")
      Rollup.applyRetention(h1r, maxBucket - 30 * day)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/h1")
      (raw.count(), m1r.count())
    }

    maybeAbort("tiers")

    // stage 5: per-tier matrix profiles (mpx with chunk min/max-merge)
    val profilesPath = ledger.stage("profiles") { out =>
      // cache both assemblies: mpxProfiles scans its input twice (the
      // zero-exchange short branch and the tile branch)
      val posSeries = Derive.assemble(points.where($"kind".isin("token_len", "gap_s", "turn_rate")))
        .map { case (c, k, s, v) => SeriesRow(c, k, s, v) }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tierSeries = Derive.assemble(
          Rollup.tierSeries(spark.read.parquet(s"$tiersPath/m1").as[TierAgg])
            .union(Rollup.tierSeries(spark.read.parquet(s"$tiersPath/h1").as[TierAgg]))
            .union(Rollup.tierSeries(spark.read.parquet(s"$tiersPath/d1").as[TierAgg])))
        .map { case (c, k, s, v) => SeriesRow(c, k, s, v) }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

      val profiles = DistributedMp.mpxProfiles(posSeries, w, "raw")
        .union(DistributedMp.mpxProfiles(tierSeries, w, "tier"))
      profiles.write.mode(SaveMode.Overwrite).parquet(out)
      posSeries.unpersist()
      tierSeries.unpersist()
      (0L, spark.read.parquet(out).count())
    }

    maybeAbort("profiles")

    // stage 6: discovery — top-k discords + regimes per profile
    val discoveryPath = ledger.stage("discovery") { out =>
      val profiles = spark.read.parquet(profilesPath).as[MpProfileRow]
      val found = profiles.map { p =>
        val discords = TopK.mpTopKDiscords(p.mp, p.ez, k = 3)
        val regimes =
          if (p.pi.length > 2 * p.w) Fluss.extractRegimes(Fluss.cac(p.pi, p.w), p.w, 3)
          else Array.empty[Long]
        (p.conv_id, p.kind, p.tier, p.w, discords, regimes)
      }.toDF("conv_id", "kind", "tier", "w", "discords", "regimes")
      found.write.mode(SaveMode.Overwrite).parquet(out)
      (0L, spark.read.parquet(out).count())
    }

    val wallS = (System.nanoTime() - t0) / 1e9
    val nPoints = points.count()
    val nProfiles = spark.read.parquet(profilesPath).count()
    val nSubseq = spark.read.parquet(profilesPath)
      .select(sum(size($"mp"))).as[Long].first()
    println(f"[pipeline] convs=$numConvs points=$nPoints profiles=$nProfiles " +
      f"subsequences=$nSubseq discovery=${spark.read.parquet(discoveryPath).count()} " +
      f"wall=${wallS}%.1fs points/s=${nPoints / wallS}%.0f")
  }

  def main(args: Array[String]): Unit = {
    val numConvs = if (args.length > 0) args(0).toInt else 200
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_pipeline"
    val w = if (args.length > 2) args(2).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, numConvs, outDir, w, resume = sys.env.get("GRAFT_NO_RESUME").isEmpty)
    spark.stop()
  }
}
