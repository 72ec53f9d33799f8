package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for Bench's contamination guard (no SparkSession): the
  * artifact-of-record logic that decides which warm number gets reported
  * must be deterministic and honest about its conditions.
  *
  * Since r6 the cleanliness criterion is (steal ≤ StealLimit AND
  * external-busy share ≤ ExtLimit) — what actually competes with the
  * measurement — NOT load1: a full battery at local[32] keeps its OWN
  * decaying 1-minute average above any fixed load limit from mid-battery
  * on, so a load gate can never land clean in the second half even on an
  * idle host. load1 is still recorded per rep for continuity.
  */
class BenchGuardSpec extends AnyFunSuite {

  /** Drives measureQuery with scripted (durationMs, load, stealPct,
    * extPct) reps: each rep burns `durMs` via a monotonic spin so the
    * measured seconds track the script closely enough for ordering
    * assertions; the jiffy/self samplers replay the scripted steal and
    * external-busy fractions across each rep.
    */
  private def scripted(reps: Seq[(Int, Double, Double, Double)], warmReps: Int,
      maxExtra: Int): Bench.QResult = {
    val it = Iterator(reps: _*) ++ Iterator.continually(reps.last)
    var cur: (Int, Double, Double, Double) = null
    var jBefore = true
    var sBefore = true
    var stealAcc = 0L
    var busyAcc = 0L
    var totAcc = 0L
    var selfAcc = 0L
    // per rep: total advances 10000 jiffies; steal takes its scripted
    // share; self takes a fixed half; busy = self + scripted external
    val jiffy = () =>
      if (jBefore) { jBefore = false; (stealAcc, busyAcc, totAcc) }
      else {
        jBefore = true
        stealAcc += (cur._3 * 10000).toLong
        busyAcc += 5000L + (cur._4 * 10000).toLong
        totAcc += 10000
        (stealAcc, busyAcc, totAcc)
      }
    val self = () => {
      if (!sBefore) selfAcc += 5000L // the rep's own spin burned CPU
      sBefore = !sBefore
      selfAcc
    }
    Bench.measureQuery("t", warmReps, maxExtra,
      loadSampler = () => { cur = it.next(); cur._2 },
      jiffySampler = jiffy, selfSampler = self) { () =>
      val until = System.nanoTime() + cur._1.toLong * 1000000L
      while (System.nanoTime() < until) {}
    }()
  }

  test("clean run reports the true median and zero extra reps") {
    // equal scripted durations: the spread trigger needs a 2x gap, so
    // only extreme (>2x) preemption of one spin could flip this — the
    // assertions tolerate ordinary shared-host jitter
    val r = scripted(Seq((120, 1.0, 0.0, 0.0), (50, 1.0, 0.0, 0.0),
      (50, 1.0, 0.0, 0.0), (50, 1.0, 0.0, 0.0)),
      warmReps = 3, maxExtra = 3)
    assert(r.stat == "median")
    assert(r.extraReps == 0)
    assert(r.warm >= 0.050 && r.warm < 0.100, s"median should be ~50ms, got ${r.warm}")
    assert(r.cold.sec >= 0.110, s"cold should be ~120ms, got ${r.cold.sec}")
    assert(r.loadMax == 1.0)
  }

  test("high load1 alone does NOT trigger the guard (a battery's own " +
      "decaying average is not contention)") {
    val r = scripted(Seq((10, 8.0, 0.0, 0.0), (50, 8.0, 0.0, 0.0),
      (50, 8.0, 0.0, 0.0), (50, 8.0, 0.0, 0.0)),
      warmReps = 3, maxExtra = 3)
    assert(r.stat == "median")
    assert(r.extraReps == 0)
    assert(r.chosenClean, "self-load must not mark a rep dirty")
    assert(r.loadMax == 8.0) // ...but it IS still recorded
  }

  test("an externally-busy warm rep triggers extra reps and the " +
      "least-contended rep wins") {
    // warm reps with 40% external busy share, then a quiet extra
    val r = scripted(Seq((10, 1.0, 0.0, 0.0), (50, 1.0, 0.0, 0.4),
      (55, 1.0, 0.0, 0.4), (52, 1.0, 0.0, 0.4), (15, 1.0, 0.0, 0.0)),
      warmReps = 3, maxExtra = 3)
    assert(r.stat == "minload")
    assert(r.extraReps >= 1)
    assert(r.warm < 0.030, s"the quiet extra rep (~15ms) should win, got ${r.warm}")
    assert(r.extMax >= 0.39 && r.extMax <= 0.41)
  }

  test("a >2x warm spread triggers the guard even under quiet conditions") {
    val r = scripted(Seq((10, 1.0, 0.0, 0.0), (10, 1.0, 0.0, 0.0),
      (45, 1.0, 0.0, 0.0), (12, 1.0, 0.0, 0.0), (11, 1.0, 0.0, 0.0)),
      warmReps = 3, maxExtra = 2)
    assert(r.stat == "minload")
    assert(r.extraReps >= 1)
  }

  test("extra reps are capped at maxExtra") {
    // permanently contended: guard fires but gives up after maxExtra
    val r = scripted(Seq.fill(7)((5, 1.0, 0.0, 0.5)),
      warmReps = 3, maxExtra = 2)
    assert(r.extraReps == 2)
    assert(r.stat == "minload")
  }

  test("a stolen-CPU rep triggers the guard even at load 1 (loadavg is " +
      "blind to hypervisor steal)") {
    // warm reps: 20% of CPU stolen at load 1 -> guard fires; the extra
    // rep is steal-free and wins
    val r = scripted(Seq((10, 1.0, 0.0, 0.0), (50, 1.0, 0.2, 0.0),
      (52, 1.0, 0.2, 0.0), (51, 1.0, 0.2, 0.0), (15, 1.0, 0.0, 0.0)),
      warmReps = 3, maxExtra = 3)
    assert(r.stat == "minload")
    assert(r.extraReps >= 1)
    assert(r.warm < 0.030, s"the steal-free extra rep (~15ms) should win, got ${r.warm}")
    assert(r.stealMax >= 0.19 && r.stealMax <= 0.21)
  }

  test("zero warm reps falls back to the cold number") {
    val r = scripted(Seq((10, 1.0, 0.0, 0.0)), warmReps = 0, maxExtra = 3)
    assert(r.stat == "cold")
    assert(r.warm == r.cold.sec)
  }

  test("a throwing query is recorded with an error, never as a fast clean rep") {
    var calls = 0
    val r = Bench.measureQuery("boom", warmReps = 2, maxExtra = 3,
      loadSampler = () => 1.0, jiffySampler = () => (0L, 0L, 0L),
      selfSampler = () => 0L) { () =>
      calls += 1
      sys.error("query exploded")
    }()
    assert(calls >= 3) // cold + 2 warm at minimum
    assert(r.err.nonEmpty, "error must surface in QResult")
    assert(r.err.get.contains("query exploded"))
  }

  test("chosenClean is false when every rep ran contaminated") {
    val r = scripted(Seq.fill(7)((5, 1.0, 0.3, 0.0)),
      warmReps = 3, maxExtra = 2)
    assert(r.stat == "minload" && !r.chosenClean)
  }

  test("chosenClean is true once an extra rep lands under both limits") {
    val r = scripted(Seq((10, 1.0, 0.0, 0.0), (50, 1.0, 0.0, 0.4),
      (55, 1.0, 0.0, 0.4), (52, 1.0, 0.0, 0.4), (15, 1.0, 0.0, 0.0)),
      warmReps = 3, maxExtra = 3)
    assert(r.stat == "minload" && r.chosenClean)
  }

  test("blind samplers (-1 everywhere) stop the extras loop after one rep " +
      "instead of burning the full budget on unknowable conditions") {
    var runs = 0
    val r = Bench.measureQuery("blind", warmReps = 3, maxExtra = 5,
      loadSampler = () => -1.0, jiffySampler = () => (-1L, -1L, -1L),
      selfSampler = () => -1L) { () =>
      runs += 1
      // >2x spread forces the guard to trigger even with unknown load
      val until = System.nanoTime() + (if (runs == 2) 45 else 10) * 1000000L
      while (System.nanoTime() < until) {}
    }()
    assert(r.extraReps <= 1,
      s"blind conditions must short-circuit extras, ran ${r.extraReps}")
    assert(!r.chosenClean) // unknown is never clean
  }

  test("every-warm-rep-errored reports stat=errored, never a fast clean number") {
    var n = 0
    val r = Bench.measureQuery("allboom", warmReps = 3, maxExtra = 0,
      loadSampler = () => 1.0, jiffySampler = () => (0L, 0L, 0L),
      selfSampler = () => 0L) { () =>
      n += 1
      if (n == 1) { // cold rep succeeds slowly
        val until = System.nanoTime() + 60L * 1000000L
        while (System.nanoTime() < until) {}
      } else sys.error("fails fast") // every warm rep throws near-instantly
    }()
    assert(r.stat == "errored",
      s"all-errored warm reps must be labeled, got '${r.stat}'")
    assert(r.err.nonEmpty)
    assert(!r.chosenClean)
  }

  test("a fast-failing warm rep never competes with healthy reps for the warm stat") {
    var n = 0
    val r = Bench.measureQuery("mixed", warmReps = 3, maxExtra = 0,
      loadSampler = () => 1.0, jiffySampler = () => (0L, 0L, 0L),
      selfSampler = () => 0L) { () =>
      n += 1
      if (n == 3) sys.error("transient blowup") // one warm rep fails instantly
      else {
        val until = System.nanoTime() + 60L * 1000000L
        while (System.nanoTime() < until) {}
      }
    }()
    assert(r.err.nonEmpty, "the transient error must still surface")
    assert(r.warm >= 0.05,
      f"warm=${r.warm}%.4f s must come from a healthy rep, not the errored near-zero one")
  }

  test("jsonEscape neutralizes control chars, quotes, and dangling surrogates") {
    val msg = "line1\nline2\tq\"uoted\" back\\slash \u0001\r" + "\ud83d"
    val esc = Bench.jsonEscape(msg)
    assert(!esc.exists(_ < 0x20), "no raw control chars may survive")
    assert(esc.contains("\\n") && esc.contains("\\r") && esc.contains("\\t"))
    assert(esc.contains("\\\"") && esc.contains("\\\\"))
    assert(esc.contains("\\u0001"))
    assert(!esc.exists(Character.isHighSurrogate),
      "a truncation-split surrogate pair must not leak into the JSON")
  }
}
