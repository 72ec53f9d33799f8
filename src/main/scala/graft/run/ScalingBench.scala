package graft.run

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md): the sandbox host is shared
  * and its load swings several-fold on ~10-minute cycles, so measuring N
  * and 4N cores in separate runs systematically punishes whichever level
  * lands on a spike. This main therefore INTERLEAVES the two parallelism
  * levels within the same noise windows — alternating local[N] / local[4N]
  * trials in one process (the SparkContext is rebuilt per switch), with
  * the 1-minute host load recorded before each trial — and reports
  * best-of per level plus efficiency = (tp@4N / tp@N) / (4N/N).
  *
  * Under SUSTAINED external contention best-of is biased LOW: load that
  * leaves (32 - load) free cores barely slows a local[4] trial but
  * starves a local[16] one, so the lo-side best keeps improving while
  * the hi-side best can't — the r5 sessions measured this directly
  * (external bursts of 7–13 for most trials). The JSON therefore also
  * reports a cleanest-PAIR efficiency: the single interleaved round
  * whose worst trial-load is lowest, with that load attached — the
  * reader picks the estimator whose recording conditions they accept.
  *
  * Env: SPARK_GRAFT_CPUS_LO (4), SPARK_GRAFT_CPUS_HI (16),
  * SPARK_GRAFT_BENCH_CONVS, SPARK_GRAFT_BENCH_TURNS_SCALE,
  * SPARK_GRAFT_BENCH_TRIALS (interleaved rounds per level).
  */
object ScalingBench {

  private def load1: Double = graft.Bench.load1() // shared sentinel rules

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  final case class Trial(cpus: Int, round: Int, load: Double,
      steal: Double, ext: Double, rollupSec: Double, mpSec: Double,
      points: Long, subseq: Long, genericSec: Double = Double.NaN)

  /** RFC 8259-valid number: NaN (a leg that did not run) emits null —
    * a bare NaN token is rejected by jq/JSON.parse and invalidated the
    * r7 SCALING jsonl artifacts.
    */
  private[run] def jnum(v: Double): String =
    if (v.isNaN) "null" else f"$v%.3f"

  private def trialJson(t: Trial, convs: Int, turnsScale: Int): String =
    f"""{"cpus":${t.cpus},"round":${t.round},"load":${t.load}%.2f,""" +
      f""""steal_pct":${t.steal}%.4f,"ext_pct":${t.ext}%.4f,""" +
      f""""rollup_sec":${t.rollupSec}%.3f,"mp_sec":${t.mpSec}%.3f,""" +
      s""""generic_sec":${jnum(t.genericSec)},""" +
      s""""convs":$convs,"turns_scale":$turnsScale,""" +
      f""""points":${t.points},"subseq":${t.subseq}}"""

  /** Parse a checkpoint line; lines recorded under a DIFFERENT workload
    * config (or an old config-less format) are rejected so a resumed
    * battery can never merge incomparable trials into one summary.
    */
  private def parseTrial(line: String, convs: Int,
      turnsScale: Int): Option[Trial] = {
    def f(k: String): Option[String] =
      ("\"" + k + "\":(-?[0-9.eE+NaN]+)").r
        .findFirstMatchIn(line).map(_.group(1))
    val configOk =
      f("convs").contains(convs.toString) &&
        f("turns_scale").contains(turnsScale.toString)
    if (!configOk) {
      if (line.trim.nonEmpty)
        System.err.println(s"[scaling] ignoring checkpoint line with " +
          s"different/missing workload config (want convs=$convs, " +
          s"turns_scale=$turnsScale): ${line.take(120)}")
      return None
    }
    try for {
      c <- f("cpus"); r <- f("round"); l <- f("load"); s <- f("steal_pct")
      e <- f("ext_pct"); ro <- f("rollup_sec"); m <- f("mp_sec")
      p <- f("points"); sub <- f("subseq")
    } yield Trial(c.toInt, r.toInt, l.toDouble, s.toDouble, e.toDouble,
      ro.toDouble, m.toDouble, p.toLong, sub.toLong,
      f("generic_sec").map(_.toDouble).getOrElse(Double.NaN))
    catch { case _: Throwable => None }
  }

  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_CPUS_LO", "4").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS_HI", "16").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "2000").toInt
    val turnsScale = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS_SCALE", "20").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "6").toInt

    // Per-trial checkpoint (r6 lesson: the 10× interleaved battery died
    // at a 60-min harness timeout with 1 of 3 rounds done and NOTHING
    // recorded). Every completed trial is appended to the jsonl
    // immediately; a rerun with the same path skips (round, cpus) pairs
    // already on disk, so a killed battery resumes instead of restarting.
    val ckptPath = sys.env.getOrElse("SPARK_GRAFT_SCALING_CKPT", "")
    val trials = scala.collection.mutable.ArrayBuffer.empty[Trial]
    if (ckptPath.nonEmpty) {
      val p = java.nio.file.Paths.get(ckptPath)
      if (java.nio.file.Files.exists(p)) {
        val prior = scala.jdk.CollectionConverters
          .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
          .flatMap(parseTrial(_, convs, turnsScale))
        trials ++= prior
        System.err.println(s"[scaling] resumed ${prior.size} trials from $ckptPath")
      }
    }
    def done(round: Int, cpus: Int): Boolean =
      trials.exists(t => t.round == round && t.cpus == cpus)
    def checkpoint(t: Trial): Unit = if (ckptPath.nonEmpty) {
      val p = java.nio.file.Paths.get(ckptPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        (trialJson(t, convs, turnsScale) + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    for (round <- 1 to rounds; cpus <- Seq(lo, hi) if !done(round, cpus)) {
      val spark = session(cpus)
      val ld = load1
      val (s0, b0, t0j) = graft.Bench.cpuJiffies()
      val self0 = graft.Bench.selfJiffies()
      // scaling trials time the headline colocated plan by default;
      // SPARK_GRAFT_SCALING_GENERIC=1 also times the generic shuffle
      // chain (the engine's rollup for non-bucketed layouts — the
      // salted-repartition path, compute/serialization-dense, so its
      // core-scaling is not masked by the socket's memory bandwidth
      // the way the lean zero-exchange fused plan's is)
      val withGen = sys.env.get("SPARK_GRAFT_SCALING_GENERIC").contains("1")
      val r = graft.Bench.pipelineBench(spark, convs, turnsScale, withGeneric = withGen)
      val (s1, b1, t1j) = graft.Bench.cpuJiffies()
      val self1 = graft.Bench.selfJiffies()
      val bad = s0 < 0 || s1 < 0 || t1j <= t0j
      val steal = if (bad) -1.0 else (s1 - s0).toDouble / (t1j - t0j)
      // external busy share: CPU consumed by processes other than this
      // JVM during the trial — the contention measure load1 can't give
      // (the interleaved battery's own decaying average dominates load1)
      val ext = if (bad || self0 < 0 || self1 < 0) -1.0
        else math.max(0.0, ((b1 - b0) - (self1 - self0)).toDouble / (t1j - t0j))
      val t = Trial(cpus, round, ld, steal, ext, r._4, r._6, r._1, r._3, r._5)
      trials += t
      checkpoint(t)
      System.err.println(f"[scaling] round=$round cpus=$cpus load=$ld%.1f " +
        f"steal=$steal%.3f ext=$ext%.3f rollup=${r._4}%.2fs mp=${r._6}%.2fs " +
        f"generic=${r._5}%.2fs")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    def best(cpus: Int, f: Trial => Double): Trial =
      trials.filter(_.cpus == cpus).minBy(f)
    val rLo = best(lo, _.rollupSec)
    val rHi = best(hi, _.rollupSec)
    val mLo = best(lo, _.mpSec)
    val mHi = best(hi, _.mpSec)
    val factor = hi.toDouble / lo
    val effRollup = (rLo.rollupSec / rHi.rollupSec) / factor
    val effMp = (mLo.mpSec / mHi.mpSec) / factor
    // generic-chain best-of (NaN-safe: trials without the leg never win)
    def bestGen(cpus: Int): Double = {
      val xs = trials.filter(t => t.cpus == cpus && !t.genericSec.isNaN)
      if (xs.isEmpty) Double.NaN else xs.map(_.genericSec).min
    }
    val gLo = bestGen(lo); val gHi = bestGen(hi)
    val effGeneric = (gLo / gHi) / factor

    // cleanest interleaved round: both trials of one round share a noise
    // window; pick the round whose WORST pre-trial load is lowest. Round 1
    // is excluded — it is always JIT-cold on both levels (unequally, so
    // its ratio is meaningless) — unless it is the only round.
    val byRound = trials.groupBy(_.round).collect {
      case (rd, ts) if (rd > 1 || rounds == 1) &&
          ts.exists(_.cpus == lo) && ts.exists(_.cpus == hi) =>
        val tLo = ts.find(_.cpus == lo).get
        val tHi = ts.find(_.cpus == hi).get
        def sk(t: Trial) = if (t.steal < 0) 1.0 else t.steal
        def ek(t: Trial) = if (t.ext < 0) 1.0 else t.ext
        (rd, tLo, tHi, math.max(tLo.load, tHi.load),
          math.max(math.max(sk(tLo), sk(tHi)), math.max(ek(tLo), ek(tHi))))
    }.toSeq
    // least-contended round first (worst of steal and external-busy share
    // across the pair — both are direct contention measures), load as the
    // tie-breaker
    val (cleanRd, cLo, cHi, cLoad, cCont) = byRound.minBy(t => (t._5, t._4))
    val effRollupPair = (cLo.rollupSec / cHi.rollupSec) / factor
    val effMpPair = (cLo.mpSec / cHi.mpSec) / factor

    val rows = trials.map(t =>
      f"""{"cpus":${t.cpus},"round":${t.round},"load":${t.load}%.2f,""" +
        f""""steal_pct":${t.steal}%.3f,"ext_pct":${t.ext}%.3f,""" +
        f""""rollup_sec":${t.rollupSec}%.3f,"mp_sec":${t.mpSec}%.3f}""").mkString(",")
    println(f"""{"bench":"scaling_interleaved","cpus_lo":$lo,"cpus_hi":$hi,""" +
      f""""convs":$convs,"turns_scale":$turnsScale,"rounds":$rounds,""" +
      f""""points":${rLo.points},"subsequences":${mLo.subseq},""" +
      f""""rollup_pps_lo":${rLo.points / rLo.rollupSec}%.0f,""" +
      f""""rollup_pps_hi":${rHi.points / rHi.rollupSec}%.0f,""" +
      f""""mp_sps_lo":${mLo.subseq / mLo.mpSec}%.0f,""" +
      f""""mp_sps_hi":${mHi.subseq / mHi.mpSec}%.0f,""" +
      f""""efficiency_rollup":$effRollup%.3f,"efficiency_mp":$effMp%.3f,""" +
      s""""generic_sec_lo":${jnum(gLo)},"generic_sec_hi":${jnum(gHi)},""" +
      s""""efficiency_generic":${jnum(effGeneric)},""" +
      f""""cleanest_round":$cleanRd,"cleanest_round_load":$cLoad%.2f,""" +
      f""""cleanest_round_contention":$cCont%.3f,""" +
      f""""efficiency_rollup_cleanpair":$effRollupPair%.3f,""" +
      f""""efficiency_mp_cleanpair":$effMpPair%.3f,""" +
      f""""trials":[$rows]}""")
  }
}
