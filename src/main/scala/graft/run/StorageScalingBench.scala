package graft.run

import org.apache.spark.sql.SparkSession

/** The north-rule scaling measurement in the PRODUCTION shape: the same
  * bucket(conv_id), (conv_id,kind,bucket)-sorted parquet table scanned
  * from storage by the fused colocated rollup at TWO parallelism levels
  * (local[N] / local[4N]), interleaved within the same noise windows like
  * ScalingBench. Because the timed leg is a pure storage scan → fused
  * aggregate → count (zero exchanges, nothing persisted), none of the
  * cache pathologies that invalidated the in-memory 10× trials can occur
  * — no eviction, no regeneration, no storage-level sensitivity — and
  * per-trial fixed cost is a single job submission (~0.1–0.3 s), small
  * against a ≥6 s hi leg. This is the exact plan a 1000-executor cluster
  * runs against an Iceberg bucket(conv_id) table, so its lo→hi ratio is
  * the honest stand-in for the N→4N cluster-size criterion.
  *
  * The bucketed table is written ONCE (untimed ingest, reported) and
  * re-registered in each fresh session via external-table DDL — the data
  * files carry their bucket ids in the filenames, so re-registration
  * preserves the zero-exchange bucketed scan across JVM restarts.
  *
  * Args: numConvs turnsScale buckets rounds repsPerTrial
  *       (defaults 8000 250 64 3 2).
  * Env: SPARK_GRAFT_CPUS_LO (8), SPARK_GRAFT_CPUS_HI (32),
  *      SPARK_GRAFT_STORAGE_SCALING_CKPT (per-trial resume jsonl).
  */
object StorageScalingBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-storage-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Register (writing first if absent) the bucketed table and return it. */
  private def bucketedTable(spark: SparkSession, convs: Int,
      turnsScale: Int, buckets: Int): (String, Double) = {
    import spark.implicits._
    // buckets is part of the identity: reusing files written with a
    // different bucket count under new CLUSTERED BY metadata would make
    // Spark trust wrong bucket ids for the zero-exchange scan
    val table = s"graft_storage_rollup_${convs}_${turnsScale}_$buckets"
    val path = s"/tmp/graft_storage_rollup/$table"
    var writeSec = Double.NaN
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS"))) {
      val t0 = System.nanoTime()
      graft.ingest.TranscriptGen.generatePoints(spark, convs, turnsScale = turnsScale)
        .repartition(buckets, $"conv_id")
        .write.bucketBy(buckets, "conv_id").sortBy("conv_id", "kind", "bucket")
        .option("path", path)
        .mode("overwrite").saveAsTable(table)
      writeSec = (System.nanoTime() - t0) / 1e9
    } else if (!spark.catalog.tableExists(table)) {
      // data survives JVM restarts; the in-memory catalog does not —
      // re-register as an external bucketed table so the scan keeps its
      // bucket-distribution metadata (files carry bucket ids in names)
      spark.sql(
        s"""CREATE TABLE $table
           |(conv_id STRING, kind STRING, bucket BIGINT, value DOUBLE)
           |USING parquet
           |CLUSTERED BY (conv_id) SORTED BY (conv_id, kind, bucket)
           |INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    (table, writeSec)
  }

  final case class Trial(cpus: Int, round: Int, load: Double, steal: Double,
      ext: Double, sec: Double, rolled: Long, chunksSec: Double, chunks: Long)

  private def trialJson(t: Trial, convs: Int, turnsScale: Int,
      buckets: Int): String =
    f"""{"cpus":${t.cpus},"round":${t.round},"load":${t.load}%.2f,""" +
      f""""steal_pct":${t.steal}%.4f,"ext_pct":${t.ext}%.4f,""" +
      f""""rollup_sec":${t.sec}%.3f,"rolled":${t.rolled},""" +
      s""""convs":$convs,"turns_scale":$turnsScale,"buckets":$buckets,""" +
      s""""chunks_sec":${ScalingBench.jnum(t.chunksSec)},"chunks":${t.chunks}}"""

  /** Checkpoint lines from a different workload config (or the old
    * config-less format) are rejected — resumed trials must be
    * comparable with the current run's.
    */
  private def parseTrial(line: String, convs: Int, turnsScale: Int,
      buckets: Int): Option[Trial] = {
    def f(k: String): Option[String] =
      ("\"" + k + "\":(-?[0-9.eE+NaN]+)").r.findFirstMatchIn(line).map(_.group(1))
    val configOk = f("convs").contains(convs.toString) &&
      f("turns_scale").contains(turnsScale.toString) &&
      f("buckets").contains(buckets.toString)
    if (!configOk) {
      if (line.trim.nonEmpty)
        System.err.println("[storage-scaling] ignoring checkpoint line with " +
          s"different/missing config (want convs=$convs, " +
          s"turns_scale=$turnsScale, buckets=$buckets): ${line.take(120)}")
      return None
    }
    try for {
      c <- f("cpus"); r <- f("round"); l <- f("load"); s <- f("steal_pct")
      e <- f("ext_pct"); sec <- f("rollup_sec"); ro <- f("rolled")
    } yield Trial(c.toInt, r.toInt, l.toDouble, s.toDouble, e.toDouble,
      sec.toDouble, ro.toLong,
      f("chunks_sec").map(_.toDouble).getOrElse(Double.NaN),
      f("chunks").map(_.toLong).getOrElse(0L))
    catch { case _: Throwable => None }
  }

  /** Whole-number JSON value; NaN (a leg that did not run) emits null. */
  private def jwhole(v: Double): String = if (v.isNaN) "null" else f"$v%.0f"

  def main(args: Array[String]): Unit = {
    val convs = if (args.length > 0) args(0).toInt else 8000
    val turnsScale = if (args.length > 1) args(1).toInt else 250
    val buckets = if (args.length > 2) args(2).toInt else 64
    val rounds = if (args.length > 3) args(3).toInt else 3
    val reps = if (args.length > 4) args(4).toInt else 2
    val lo = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS_HI", "32").toInt
    val ckptPath = sys.env.getOrElse("SPARK_GRAFT_STORAGE_SCALING_CKPT", "")

    val trials = scala.collection.mutable.ArrayBuffer.empty[Trial]
    if (ckptPath.nonEmpty) {
      val p = java.nio.file.Paths.get(ckptPath)
      if (java.nio.file.Files.exists(p)) {
        trials ++= scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
          .flatMap(parseTrial(_, convs, turnsScale, buckets))
        System.err.println(s"[storage-scaling] resumed ${trials.size} trials")
      }
    }
    def done(round: Int, cpus: Int): Boolean =
      trials.exists(t => t.round == round && t.cpus == cpus)
    def checkpoint(t: Trial): Unit = if (ckptPath.nonEmpty) {
      val p = java.nio.file.Paths.get(ckptPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        (trialJson(t, convs, turnsScale, buckets) + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }

    var writeSecOnce = Double.NaN
    var nPoints = 0L
    var digest: String = "null"
    for (round <- 1 to rounds; cpus <- Seq(lo, hi) if !done(round, cpus)) {
      val spark = session(cpus)
      val (table, w) = bucketedTable(spark, convs, turnsScale, buckets)
      if (!w.isNaN) writeSecOnce = w
      val pts = spark.table(table).as[graft.schema.SeriesPoint](
        org.apache.spark.sql.Encoders.product[graft.schema.SeriesPoint])
      if (nPoints == 0L) nPoints = pts.count()
      if (digest == "null")
        digest = PlanDigest.of(graft.rollup.Rollup.rollupAllColocated(pts).toDF()).json
      // best-of-reps inside the trial: each rep is an independent pure
      // scan job, so a rep perturbed by a host blip doesn't sink the trial
      var bestSec = Double.MaxValue
      var bestChunksSec = Double.MaxValue
      var rolled = 0L
      var nChunks = 0L
      var worstLoad = 0.0; var worstSteal = -1.0; var worstExt = -1.0
      val withChunks = sys.env.getOrElse("SPARK_GRAFT_STORAGE_LEGS", "rollup")
        .split(",").contains("chunks")
      for (_ <- 1 to reps) {
        val ld = graft.Bench.load1()
        val (s0, b0, t0j) = graft.Bench.cpuJiffies()
        val self0 = graft.Bench.selfJiffies()
        val t0 = System.nanoTime()
        rolled = graft.rollup.Rollup.rollupAllColocated(pts).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // production write path: Gorilla XOR + delta-of-delta chunk encode
        // of the scanned points — the CPU-dense leg of the ingest pipeline
        // (north star: "compressed into per-partition chunk structs")
        val chunksSec = if (!withChunks) Double.NaN else {
          val t1 = System.nanoTime()
          nChunks = graft.compress.Chunks.encode(pts).count()
          (System.nanoTime() - t1) / 1e9
        }
        val (s1, b1, t1j) = graft.Bench.cpuJiffies()
        val self1 = graft.Bench.selfJiffies()
        val bad = s0 < 0 || s1 < 0 || t1j <= t0j
        val steal = if (bad) -1.0 else (s1 - s0).toDouble / (t1j - t0j)
        val ext = if (bad || self0 < 0 || self1 < 0) -1.0
          else math.max(0.0, ((b1 - b0) - (self1 - self0)).toDouble / (t1j - t0j))
        bestSec = math.min(bestSec, sec)
        if (!chunksSec.isNaN) bestChunksSec = math.min(bestChunksSec, chunksSec)
        worstLoad = math.max(worstLoad, ld)
        worstSteal = math.max(worstSteal, steal)
        worstExt = math.max(worstExt, ext)
      }
      val t = Trial(cpus, round, worstLoad, worstSteal, worstExt, bestSec,
        rolled, if (withChunks) bestChunksSec else Double.NaN, nChunks)
      trials += t
      checkpoint(t)
      System.err.println(f"[storage-scaling] round=$round cpus=$cpus " +
        f"load=$worstLoad%.1f steal=$worstSteal%.3f ext=$worstExt%.3f " +
        f"rollup=$bestSec%.2fs rolled=$rolled chunks=$bestChunksSec%.2fs")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    require(trials.map(_.rolled).distinct.size == 1,
      s"parallelism-variant output: ${trials.map(_.rolled).distinct}")
    require(trials.filter(_.chunks > 0).map(_.chunks).distinct.size <= 1,
      s"parallelism-variant chunk count: ${trials.map(_.chunks).distinct}")

    def best(cpus: Int): Trial = trials.filter(_.cpus == cpus).minBy(_.sec)
    val bLo = best(lo); val bHi = best(hi)
    val factor = hi.toDouble / lo
    val eff = (bLo.sec / bHi.sec) / factor
    // chunks-leg best-of (NaN-safe: trials without the leg never win)
    def bestChunks(cpus: Int): Double = {
      val xs = trials.filter(t => t.cpus == cpus && !t.chunksSec.isNaN)
      if (xs.isEmpty) Double.NaN else xs.map(_.chunksSec).min
    }
    val cLoSec = bestChunks(lo); val cHiSec = bestChunks(hi)
    val effChunks = (cLoSec / cHiSec) / factor
    // cleanest interleaved pair by worst contention (steal/ext), round 1
    // included: there is no cache to warm, JIT warms within the reps
    val pairs = trials.groupBy(_.round).collect {
      case (rd, ts) if ts.exists(_.cpus == lo) && ts.exists(_.cpus == hi) =>
        val tLo = ts.find(_.cpus == lo).get
        val tHi = ts.find(_.cpus == hi).get
        def k(t: Trial) = math.max(if (t.steal < 0) 1.0 else t.steal,
          if (t.ext < 0) 1.0 else t.ext)
        (rd, tLo, tHi, math.max(tLo.load, tHi.load), math.max(k(tLo), k(tHi)))
    }.toSeq
    val (cleanRd, cLo, cHi, cLoad, cCont) = pairs.minBy(t => (t._5, t._4))
    val effPair = (cLo.sec / cHi.sec) / factor

    val rows = trials.map(trialJson(_, convs, turnsScale, buckets)).mkString(",")
    println(f"""{"bench":"storage_scaling","cpus_lo":$lo,"cpus_hi":$hi,""" +
      f""""convs":$convs,"turns_scale":$turnsScale,"buckets":$buckets,""" +
      f""""rounds":$rounds,"reps_per_trial":$reps,"points":$nPoints,""" +
      s""""rolled_rows":${bLo.rolled},"write_sec":${ScalingBench.jnum(writeSecOnce)},""" +
      f""""rollup_sec_lo":${bLo.sec}%.3f,"rollup_sec_hi":${bHi.sec}%.3f,""" +
      f""""pps_lo":${nPoints / bLo.sec}%.0f,"pps_hi":${nPoints / bHi.sec}%.0f,""" +
      f""""efficiency_rollup":$eff%.3f,""" +
      s""""chunks_sec_lo":${ScalingBench.jnum(cLoSec)},"chunks_sec_hi":${ScalingBench.jnum(cHiSec)},""" +
      s""""chunks_pps_lo":${jwhole(nPoints / cLoSec)},"chunks_pps_hi":${jwhole(nPoints / cHiSec)},""" +
      s""""efficiency_chunks":${ScalingBench.jnum(effChunks)},""" +
      f""""cleanest_round":$cleanRd,"cleanest_round_load":$cLoad%.2f,""" +
      f""""cleanest_round_contention":$cCont%.4f,""" +
      f""""efficiency_rollup_cleanpair":$effPair%.3f,""" +
      f""""digest":$digest,"trials":[$rows]}""")
  }
}
