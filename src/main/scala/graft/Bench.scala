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
    * rollupSec, genericSec, mpSec). Both rollup layouts are timed: the
    * fused colocated zero-shuffle plan (the 100 TB scale plan — an Iceberg
    * bucket(conv_id) table read with storage-partitioned scans) is the
    * headline, and the generic shuffle chain (what a non-bucketed layout
    * pays) is reported alongside for the plan-choice evidence.
    */
  def pipelineBench(spark: SparkSession, numConvs: Int,
      turnsScale: Int = 1,
      withGeneric: Boolean = true): (Long, Long, Long, Double, Double, Double) = {
    import spark.implicits._
    import graft.ingest.TranscriptGen
    import graft.rollup.Rollup
    import graft.schema.SeriesPoint
    import graft.dist.DistributedMp
    import graft.dist.DistributedMp.SeriesRow

    // Storage level for the corpus + rollup caches. Default MEMORY_ONLY
    // matches r2–r6 batteries. At corpus sizes where the deserialized
    // caches outgrow the storage pool (≈250M points in an 80g heap),
    // MEMORY_ONLY evicts under execution-memory pressure and the timed
    // legs silently pay REGENERATION of evicted partitions — measured at
    // 249M points/local[32]: rollup 83→123 s across two trials of one
    // corpus, i.e. the bench was timing the generator, not the engine.
    // MEMORY_AND_DISK_SER spills compactly instead (the storage-backed
    // shape a real Iceberg scan has): set SPARK_GRAFT_POINTS_STORAGE=
    // MEMORY_AND_DISK_SER for big-corpus runs and say so in BENCH.md.
    val storage = org.apache.spark.storage.StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_POINTS_STORAGE", "MEMORY_ONLY"))

    // string-free points generation (values identical to deriving
    // length(text) from the transcript table — asserted in tests)
    val points = TranscriptGen.generatePoints(spark, numConvs,
      turnsScale = turnsScale).persist(storage)
    val nPoints = points.count()

    // headline leg: generator output is conv-bucketed (one conversation
    // per partition) → fused single-scan plan, one pass emits all tiers.
    // SPARK_GRAFT_ROLLUP_PURE=1 times the leg as pure compute (count
    // only) and materializes the cache for the MP leg OUTSIDE the timed
    // window: the r7 batteries showed the default persist-inside-timing
    // is at the mercy of storage-pool state at ≥16 threads (eviction +
    // regeneration made identical legs read 16 s or 216 s). Default off
    // for r2–r7 battery comparability.
    val pureRollup = sys.env.get("SPARK_GRAFT_ROLLUP_PURE").contains("1")
    var t0 = System.nanoTime()
    var rolled = 0L
    if (pureRollup) rolled = Rollup.rollupAllColocated(points).count()
    val all = Rollup.rollupAllColocated(points).persist(storage)
    if (!pureRollup) rolled = all.count()
    val rollupSec = (System.nanoTime() - t0) / 1e9
    if (pureRollup) all.count(): Unit // untimed cache materialization
    val m1 = all.where($"tier" === "1m").as[graft.schema.TierAgg]

    // comparison leg: generic chained shuffle plan on the same input
    val genericSec = if (!withGeneric) Double.NaN else {
      t0 = System.nanoTime()
      val gm = Rollup.rollupRaw(points, "1m").cache()
      val gh = Rollup.rollupTier(gm, "1h").cache()
      val genRolled = gm.count() + gh.count() + Rollup.rollupTier(gh, "1d").count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(genRolled == rolled, s"plan mismatch: $genRolled vs $rolled rows")
      gh.unpersist(); gm.unpersist()
      sec
    }

    t0 = System.nanoTime()
    val tierPts = Rollup.tierSeries(m1)
    // cache the assembled series: the distributed MP entry scans its input
    // twice (zero-exchange short branch + tile branch), and re-assembling
    // per branch would double the upstream pass
    val series = graft.series.Derive.assembleColocated(tierPts)
      .map { case (c, k, s, v) => SeriesRow(c, k, s, v) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val profiles = DistributedMp.mpxProfiles(series, 16, "1m").cache()
    val nSubseq = profiles.select(sum(size($"mp"))).as[Long].first()
    val mpSec = (System.nanoTime() - t0) / 1e9

    points.unpersist()
    all.unpersist()
    series.unpersist()
    profiles.unpersist()
    (nPoints, rolled, nSubseq, rollupSec, genericSec, mpSec)
  }

  /** Plan digests of the two pipeline legs at the given corpus size —
    * the scale-up evidence that the 250M-point plan IS the 25M-point
    * plan (exchange/scan/codegen counts identical; only task counts
    * grow). Plan-build only, no leg execution.
    */
  def pipelineDigests(spark: SparkSession, numConvs: Int,
      turnsScale: Int): String = {
    import spark.implicits._
    import graft.ingest.TranscriptGen
    import graft.rollup.Rollup
    import graft.dist.DistributedMp
    import graft.dist.DistributedMp.SeriesRow
    val points = TranscriptGen.generatePoints(spark, numConvs,
      turnsScale = turnsScale)
    val all = Rollup.rollupAllColocated(points)
    val m1 = all.where($"tier" === "1m").as[graft.schema.TierAgg]
    val series = graft.series.Derive.assembleColocated(Rollup.tierSeries(m1))
      .map { case (c, k, s, v) => SeriesRow(c, k, s, v) }
    val profiles = DistributedMp.mpxProfiles(series, 16, "1m")
    s"""{"rollup":${graft.run.PlanDigest.of(all.toDF()).json},""" +
      s""""mp":${graft.run.PlanDigest.of(profiles.toDF()).json}}"""
  }

  /** JSON string escape for embedded error messages: Spark exception
    * text routinely contains newlines (stack fragments, plan dumps), and
    * an unescaped control char makes the whole session JSON invalid in
    * exactly the error case it exists to record. Also drops a trailing
    * unpaired high surrogate left by a character-count truncation.
    */
  def jsonEscape(raw: String): String = {
    val s =
      if (raw.nonEmpty && Character.isHighSurrogate(raw.last)) raw.dropRight(1)
      else raw
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Fresh 1-minute load average — sampled BEFORE every rep, so each
    * timed number carries its own recording conditions (the r4 lesson: one
    * start-of-run sample can't defend individual queries against a burst
    * of contention mid-battery).
    */
  def load1(): Double = try {
    scala.io.Source.fromFile("/proc/loadavg").mkString.split(" ")(0).toDouble
  } catch { case _: Throwable => -1.0 }

  /** (steal, busy, total) jiffies from /proc/stat's aggregate cpu line.
    * Load average only sees THIS VM's runqueue; on a shared host the
    * hypervisor can starve the VM with nothing visible in loadavg —
    * steal time measured ACROSS a rep is the direct evidence (r5 saw a
    * local[4] trial take 288 s at pre-trial load 0.5). `busy` is every
    * non-idle, non-iowait, non-steal jiffy (user+nice+system+irq+
    * softirq+guest) — combined with the process's own jiffies it yields
    * the EXTERNAL busy share, the r6 cleanliness criterion.
    */
  def cpuJiffies(): (Long, Long, Long) = try {
    val parts = scala.io.Source.fromFile("/proc/stat").getLines()
      .next().trim.split("\\s+")
    val vals = parts.drop(1).map(_.toLong)
    def at(i: Int) = if (vals.length > i) vals(i) else 0L
    // columns: user nice system idle iowait irq softirq steal guest gnice.
    // The kernel already folds guest/guest_nice into user/nice, so both
    // busy and total must use the explicit first-eight columns only —
    // vals.sum would double-count guest time on hosts running nested VMs.
    val steal = at(7)
    val busy = at(0) + at(1) + at(2) + at(5) + at(6)
    val total = busy + at(3) + at(4) + steal
    (steal, busy, total)
  } catch { case _: Throwable => (-1L, -1L, -1L) }

  /** This process's own (utime+stime) jiffies from /proc/self/stat —
    * all JVM threads included. Parsed after the last ')' because comm
    * may contain spaces.
    */
  def selfJiffies(): Long = try {
    val line = scala.io.Source.fromFile("/proc/self/stat").mkString
    val rest = line.substring(line.lastIndexOf(')') + 2).split(" ")
    rest(11).toLong + rest(12).toLong // utime, stime (fields 14, 15)
  } catch { case _: Throwable => -1L }

  /** One timed rep: seconds, load1 sampled immediately before, the
    * fraction of CPU time the hypervisor stole DURING the rep, the
    * EXTERNAL busy share (machine CPU consumed by processes other than
    * this JVM during the rep — -1 when /proc is unreadable), and the
    * error if run() threw — a broken query must never masquerade as a
    * fast one in the artifact of record.
    */
  final case class Rep(sec: Double, load: Double, steal: Double,
      ext: Double = 0.0, err: Option[String] = None)

  /** A rep recorded under both guard limits with READABLE samplers; a -1
    * sentinel is unknown conditions, never clean. Cleanliness is judged
    * on what actually competes with the measurement — hypervisor steal
    * and external processes' CPU share — NOT on load1: a full battery at
    * local[32] keeps its OWN decaying 1-minute average above any fixed
    * limit from mid-battery on (r6 measured the same q20+ cut-point in
    * two consecutive batteries), so a load gate structurally can't land
    * clean in the battery's second half even on an idle host, and the
    * battery-level retry defeats itself: each retried query's reps push
    * load1 back over the limit for every row queued behind it.
    */
  def isClean(r: Rep): Boolean =
    r.steal >= 0 && r.steal <= StealLimit && r.ext >= 0 && r.ext <= ExtLimit

  /** Per-query outcome: cold rep, chosen warm stat, the rep BEHIND the
    * warm stat (so the battery can tell whether the guard ever landed a
    * clean rep), max load and max steal fraction seen across all reps,
    * extra reps run by the contamination guard, which stat was used
    * ("median" on a clean run, "minload" when the guard fired), and the
    * first error any rep threw.
    */
  final case class QResult(name: String, cold: Rep, warm: Double,
      loadMax: Double, stealMax: Double, extMax: Double, extraReps: Int,
      stat: String, chosen: Rep, err: Option[String]) {
    /** True when the reported warm number was recorded under both guard
      * limits — the battery-level retry requeues rows where this is false.
      */
    def chosenClean: Boolean = isClean(chosen)
  }

  /** Contamination guard thresholds: a rep with more than StealLimit of
    * its CPU stolen by the hypervisor, external processes consuming more
    * than ExtLimit of machine capacity during the rep, or warm reps
    * spreading more than SpreadLimit× trigger extra reps; the reported
    * warm number is then the rep recorded under the least contention
    * (lowest steal, then lowest external share, ties → fastest), not a
    * median over garbage. LoadLimit is retained for the r03–r05
    * continuity fields and the pre-battery quiet wait only — load1 is
    * recorded per rep but no longer gates cleanliness (see isClean).
    */
  val LoadLimit = 2.0
  val SpreadLimit = 2.0
  val StealLimit = 0.05
  val ExtLimit = 0.10

  def measureQuery(name: String, warmReps: Int, maxExtra: Int,
      loadSampler: () => Double = () => load1(),
      jiffySampler: () => (Long, Long, Long) = () => cpuJiffies(),
      selfSampler: () => Long = () => selfJiffies())
      (run: () => Unit)(cleanup: () => Unit = () => ()): QResult = {
    def rep(): Rep = {
      val ld = loadSampler()
      val (s0, b0, t0j) = jiffySampler()
      val self0 = selfSampler()
      val t0 = System.nanoTime()
      val err = try { run(); None } catch {
        case e: Throwable =>
          Some((e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("")).take(160))
      }
      val dt = (System.nanoTime() - t0) / 1e9 // cleanup is untimed
      val (s1, b1, t1j) = jiffySampler()
      val self1 = selfSampler()
      val bad = s0 < 0 || s1 < 0 || t1j <= t0j
      val steal = if (bad) -1.0 else (s1 - s0).toDouble / (t1j - t0j)
      val ext =
        if (bad || self0 < 0 || self1 < 0 || b0 < 0 || b1 < 0) -1.0
        else math.max(0.0,
          ((b1 - b0) - (self1 - self0)).toDouble / (t1j - t0j))
      try cleanup() catch { case _: Throwable => () }
      Rep(dt, ld, steal, ext, err)
    }
    val cold = rep()
    var warm = Vector.tabulate(math.max(0, warmReps))(_ => rep())
    // a rep whose run() threw records its (near-zero) wall time for the
    // error ledger only — it must NEVER compete in the warm selection,
    // or a query that fails fast on every rep reports a tiny warm number
    def ok(rs: Seq[Rep]): Seq[Rep] = rs.filter(_.err.isEmpty)
    def contaminated(rs: Seq[Rep]): Boolean = {
      val good = ok(rs)
      good.nonEmpty && (
        good.exists(r => r.steal > StealLimit || r.ext > ExtLimit) ||
          good.map(_.sec).max > SpreadLimit * good.map(_.sec).min)
    }
    var extra = 0
    val triggered = contaminated(warm)
    if (triggered) {
      // re-run until ONE rep lands under both limits (that rep will be
      // the minload winner — further extras only waste battery time), up
      // to maxExtra; a failed steal/ext read (-1) is unknown, not clean,
      // and when the samplers are permanently blind the loop can never
      // prove cleanliness — stop after one extra instead of burning the
      // full budget on unknowable conditions
      var clean = false
      var blind = false
      while (extra < maxExtra && !clean && !blind) {
        val r = rep()
        warm :+= r
        extra += 1
        clean = isClean(r)
        blind = r.steal < 0 && r.ext < 0
      }
    }
    // a -1 sentinel (unreadable /proc) must sort as UNKNOWN, never as
    // the cleanest rep
    def key(v: Double): Double = if (v < 0) Double.MaxValue else v
    val okWarm = ok(warm)
    val (chosen, stat) =
      if (warm.isEmpty) (cold, "cold")
      else if (okWarm.isEmpty)
        // every warm rep threw: report the SLOWEST wall so a broken query
        // can never masquerade as a fast one; stat names the condition
        (warm.maxBy(_.sec), "errored")
      else if (triggered)
        (okWarm.minBy(r => (key(r.steal), key(r.ext), r.sec)), "minload")
      else {
        val s = okWarm.sortBy(_.sec)
        (s((s.length - 1) / 2), if (okWarm.length >= 3) "median" else "best")
      }
    val loadMax = (cold +: warm).map(_.load).max
    val stealMax = (cold +: warm).map(_.steal).max
    val extMax = (cold +: warm).map(_.ext).max
    val firstErr = (cold +: warm).flatMap(_.err).headOption
    QResult(name, cold, chosen.sec, loadMax, stealMax, extMax, extra,
      stat, chosen, firstErr)
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

    // start-of-run load: kept for continuity with r03/r04 artifacts; the
    // per-query map below is the authoritative contamination evidence
    val startLoad = load1()

    val skipQueries = sys.env.contains("SPARK_GRAFT_SKIP_QUERIES")
    // warm reps per query: the first run is cold (codegen + JIT + scan
    // warmup); `warmReps` further runs give the warm stat. Spark caches
    // are cleared between EVERY rep, so warm numbers measure the full
    // recompute in a warmed JVM, never cache hits. Default 3 so the
    // median is a true middle rep (2 would silently report best-of-2);
    // round-over-round comparability rules live in BENCH.md.
    val warmReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val maxExtra = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_EXTRA", "3").toInt
    if (!skipQueries) {
      // page the inputs so the first timed query doesn't absorb file I/O
      Seq("events", "documents", "embeddings", "lineitem").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").count()
        catch { case _: Throwable => }
      }
      // materialize the q36 bucket(conv_id) storage layout UNTIMED: the
      // one-time bucketBy write is ingest cost, not query cost — without
      // this pre-pass the cold rep of q36_rollup_colocated times the
      // parquet write instead of the zero-exchange scan it exists to show
      try SparkEntry.bucketedPoints(spark, sfDir).count()
      catch { case _: Throwable => }
    }
    def runQuery(name: String): QResult =
      measureQuery(name, warmReps, maxExtra) { () =>
        SparkEntry.queries(name)(spark, sfDir).count()
      } { () =>
        // queries persist shared intermediates (LSH signatures, quantized
        // series) — drop them so no rep ever reads another's cache;
        // untimed so the release cost never pollutes the measurement
        graft.util.StageCache.release(spark)
        spark.catalog.clearCache()
      }
    var results =
      if (skipQueries) Seq.empty
      else SparkEntry.queries.keys.toSeq.sorted.map(runQuery)

    // Battery-level retry (r5 verdict #1): a query whose guard exhausted
    // its extras without ever landing a clean rep reports the least-bad
    // contaminated rep — correct behavior, but not a comparable number.
    // Requeue exactly those rows ONCE after a cool-down (wait for load1
    // to drop under the limit, bounded), keeping the original cold (the
    // retry runs in a warmed JVM so its first rep is not a cold number)
    // and whichever run's chosen warm rep was recorded cleaner.
    var retriedNames = Vector.empty[String]
    val dirty = results.filter(r => r.stat == "minload" && !r.chosenClean)
      .map(_.name).toSet
    if (dirty.nonEmpty && !sys.env.contains("SPARK_GRAFT_NO_BATTERY_RETRY")) {
      val deadline = System.nanoTime() +
        sys.env.getOrElse("SPARK_GRAFT_COOLDOWN_SEC", "180").toLong * 1000000000L
      // wait for measured EXTERNAL quiet (a 1 s steal+ext sample), not
      // load1 — the battery's own decaying load average would otherwise
      // hold the retry hostage on an idle host
      def externalQuiet(): Boolean = {
        val (s0, b0, t0) = cpuJiffies(); val self0 = selfJiffies()
        Thread.sleep(1000)
        val (s1, b1, t1) = cpuJiffies(); val self1 = selfJiffies()
        if (s0 < 0 || s1 < 0 || t1 <= t0) true // blind: don't spin forever
        else {
          val steal = (s1 - s0).toDouble / (t1 - t0)
          val ext = math.max(0.0,
            ((b1 - b0) - (self1 - self0)).toDouble / (t1 - t0))
          steal <= StealLimit && ext <= ExtLimit
        }
      }
      while (!externalQuiet() && System.nanoTime() < deadline)
        Thread.sleep(9000)
      def cleanKey(q: QResult): (Int, Double, Double) = (
        if (q.chosenClean) 0 else 1,
        if (q.chosen.steal < 0) Double.MaxValue else q.chosen.steal,
        if (q.chosen.ext < 0) Double.MaxValue else q.chosen.ext)
      results = results.map { r =>
        if (!dirty.contains(r.name)) r
        else {
          retriedNames :+= r.name
          val rr = runQuery(r.name)
          if (Ordering[(Int, Double, Double)].lt(cleanKey(rr), cleanKey(r)))
            rr.copy(cold = r.cold) else r
        }
      }
    }
    def jmap(f: QResult => String): String =
      results.map(r => "\"" + r.name + "\":" + f(r)).mkString("{", ",", "}")
    val qs = jmap(r => f"${r.cold.sec}%.3f")
    val qsWarm = jmap(r => f"${r.warm}%.3f")
    val qsLoad = jmap(r => f"${r.loadMax}%.2f")
    val qsSteal = jmap(r => f"${r.stealMax}%.3f")
    val qsExt = jmap(r => f"${r.extMax}%.3f")
    val qsExtra = jmap(r => s"${r.extraReps}")
    val qsStat = jmap(r => "\"" + r.stat + "\"")
    val qsClean = jmap(r => s"${r.chosenClean}")
    val qErrors = results.filter(_.err.nonEmpty)
      .map(r => "\"" + r.name + "\":\"" + jsonEscape(r.err.get) + "\"")
      .mkString("{", ",", "}")
    val nErrors = results.count(_.err.nonEmpty)
    // a battery with ANY error is not a clean artifact of record — the
    // erroring query's numbers (slowest-errored-rep wall) are sentinels,
    // not measurements
    val batteryClean = nErrors == 0 &&
      results.forall(r => r.stat != "minload" || r.chosenClean)
    val retriedJson = retriedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_.cold.sec).sum
    val totalWarm = results.map(_.warm).sum
    // artifact honesty: the warm key says what the value IS — a median
    // only when >= 3 clean reps back it
    val warmKey = if (warmReps >= 3) "queries_warm_median" else "queries_warm_best"

    // pipeline legs: rep 1 is the round-over-round-comparable cold number
    // (identical harness to r01-r03); further reps give the warm best.
    // Each rep's pre-sampled load is emitted so a contaminated rep is
    // visible in the artifact; one extra rep runs only if EVERY warm rep
    // was recorded over the load limit (one clean rep already supplies
    // the best-of).
    val pipelineReps = sys.env.getOrElse("SPARK_GRAFT_PIPELINE_REPS", "2").toInt
    var pipeLoads = Vector.empty[Double]
    var pipeSteals = Vector.empty[Double]
    var pipeExts = Vector.empty[Double]
    def pipeRep(first: Boolean): (Long, Long, Long, Double, Double, Double) = {
      pipeLoads :+= load1()
      val (s0, b0, t0j) = cpuJiffies()
      val self0 = selfJiffies()
      // the generic-rollup comparison leg informs plan choice, not warm
      // timing — run it once
      val r = pipelineBench(spark, benchConvs, turnsScale, withGeneric = first)
      val (s1, b1, t1j) = cpuJiffies()
      val self1 = selfJiffies()
      val bad = s0 < 0 || s1 < 0 || t1j <= t0j
      pipeSteals :+= (if (bad) -1.0 else (s1 - s0).toDouble / (t1j - t0j))
      pipeExts :+= (if (bad || self0 < 0 || self1 < 0) -1.0
        else math.max(0.0, ((b1 - b0) - (self1 - self0)).toDouble / (t1j - t0j)))
      graft.util.StageCache.release(spark)
      spark.catalog.clearCache()
      r
    }
    def pipeDirty(i: Int): Boolean =
      pipeSteals(i) > StealLimit || pipeExts(i) > ExtLimit
    var pipeRuns = (1 to math.max(1, pipelineReps)).map(i => pipeRep(i == 1)).toVector
    if (pipeRuns.length > 1 && pipeRuns.indices.tail.forall(pipeDirty))
      pipeRuns :+= pipeRep(false) // every warm rep contaminated: one retry
    val (nPoints, rolled, nSubseq, rollupSec, genericSec, mpSec) = pipeRuns.head
    // warm = best of the post-cold reps only; with a single rep there is
    // no warm measurement, so fall back to the cold number explicitly
    val warmRuns = if (pipeRuns.length > 1) pipeRuns.tail else pipeRuns
    val rollupWarm = warmRuns.map(_._4).min
    val mpWarm = warmRuns.map(_._6).min
    val pointsPerSec = nPoints / rollupSec
    val pointsPerSecGeneric = nPoints / genericSec
    val subseqPerSec = nSubseq / mpSec
    val pipeLoadJson = pipeLoads.map(l => f"$l%.2f").mkString("[", ",", "]")
    val pipeStealJson = pipeSteals.map(s => f"$s%.3f").mkString("[", ",", "]")
    val pipeExtJson = pipeExts.map(s => f"$s%.3f").mkString("[", ",", "]")

    // Full rich session JSON → a FILE (r5 lesson: the driver's BENCH_rNN
    // capture keeps only a ~2 KB tail of stdout, so the 6 KB line of r5
    // got truncated mid-object and committed as the artifact of record).
    // The stdout line below carries the driver-contract fields and the
    // headline numbers and stays comfortably under the tail window; the
    // session file carries every per-query condition map.
    // optional pipeline plan digest (scale-up evidence): plan-build only
    val pipeDigest =
      if (!sys.env.get("SPARK_GRAFT_PIPELINE_DIGEST").contains("1")) ""
      else try {
        val d = pipelineDigests(spark, benchConvs, turnsScale)
        graft.util.StageCache.release(spark)
        s""""pipeline_digest":$d,"""
      } catch { case e: Throwable =>
        s""""pipeline_digest":{"error":"${e.getClass.getSimpleName}"},"""
      }

    val sessionJson =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      pipeDigest +
      f""""$warmKey":$qsWarm,"total_warm":$totalWarm%.3f,""" +
      f""""queries_load1":$qsLoad,"queries_steal_pct":$qsSteal,""" +
      f""""queries_ext_pct":$qsExt,""" +
      f""""queries_extra_reps":$qsExtra,""" +
      f""""queries_warm_stat":$qsStat,""" +
      f""""queries_chosen_clean":$qsClean,""" +
      f""""queries_errors":$qErrors,""" +
      f""""battery_clean":$batteryClean,"battery_retried":$retriedJson,""" +
      f""""warm_reps":$warmReps,"host_load1":$startLoad%.2f,""" +
      f""""sf":"$sfDir","cpus":$cpus,"bench_convs":$benchConvs,""" +
      f""""rollup_points":$nPoints,"rolled_rows":$rolled,"rollup_sec":$rollupSec%.3f,""" +
      f""""points_per_sec":$pointsPerSec%.0f,""" +
      f""""rollup_generic_sec":$genericSec%.3f,""" +
      f""""points_per_sec_generic":$pointsPerSecGeneric%.0f,""" +
      f""""mp_subsequences":$nSubseq,"mp_sec":$mpSec%.3f,""" +
      f""""subseq_per_sec":$subseqPerSec%.0f,""" +
      f""""pipeline_load1":$pipeLoadJson,"pipeline_steal_pct":$pipeStealJson,""" +
      f""""pipeline_ext_pct":$pipeExtJson,""" +
      f""""rollup_sec_warm":$rollupWarm%.3f,"mp_sec_warm":$mpWarm%.3f,""" +
      f""""points_per_sec_warm":${nPoints / rollupWarm}%.0f,""" +
      f""""subseq_per_sec_warm":${nSubseq / mpWarm}%.0f}"""
    val sessionPath = sys.env.getOrElse("SPARK_GRAFT_SESSION_OUT",
      "/root/repo/bench_session.json")
    try {
      val p = java.nio.file.Paths.get(sessionPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, (sessionJson + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] session write failed: ${e.getMessage}")
    }

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      f""""total_warm":$totalWarm%.3f,"warm_reps":$warmReps,""" +
      f""""battery_clean":$batteryClean,"query_errors":$nErrors,""" +
      f""""host_load1":$startLoad%.2f,""" +
      f""""sf":"$sfDir","cpus":$cpus,"bench_convs":$benchConvs,""" +
      f""""rollup_points":$nPoints,"rolled_rows":$rolled,"rollup_sec":$rollupSec%.3f,""" +
      f""""points_per_sec":$pointsPerSec%.0f,""" +
      f""""mp_subsequences":$nSubseq,"mp_sec":$mpSec%.3f,""" +
      f""""subseq_per_sec":$subseqPerSec%.0f,""" +
      f""""rollup_sec_warm":$rollupWarm%.3f,"mp_sec_warm":$mpWarm%.3f,""" +
      f""""points_per_sec_warm":${nPoints / rollupWarm}%.0f,""" +
      f""""subseq_per_sec_warm":${nSubseq / mpWarm}%.0f,""" +
      f""""session_file":"$sessionPath"}""")

    // plan-digest artifact (verdict r4 #8): dump each query's plan summary
    // AFTER the timed battery so digest plan-building never warms the cold
    // reps; exchange/broadcast regressions become diffable per round
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      val out = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_OUT", "plan_digest.json")
      try graft.run.PlanDigest.writeAll(spark, sfDir, out)
      catch { case e: Throwable =>
        System.err.println(s"[bench] plan digest failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
