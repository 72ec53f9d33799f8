package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit gates for Bench's contamination guard (no SparkSession): the
  * artifact-of-record logic that decides which warm number gets reported
  * must be deterministic and honest about its conditions.
  */
class BenchGuardSpec extends AnyFunSuite {

  /** Drives measureQuery with scripted (duration, load, stealPct) reps:
    * each rep burns `durMs` via a monotonic spin so the measured seconds
    * track the script closely enough for ordering assertions; the jiffy
    * sampler replays the scripted steal fraction across each rep.
    */
  private def scripted(reps: Seq[(Int, Double, Double)], warmReps: Int,
      maxExtra: Int): Bench.QResult = {
    val it = Iterator(reps: _*) ++ Iterator.continually(reps.last)
    var cur: (Int, Double, Double) = null
    var before = true
    var stealAcc = 0L
    var totAcc = 0L
    val jiffy = () =>
      if (before) { before = false; (stealAcc, totAcc) }
      else {
        before = true
        stealAcc += (cur._3 * 10000).toLong
        totAcc += 10000
        (stealAcc, totAcc)
      }
    Bench.measureQuery("t", warmReps, maxExtra,
      loadSampler = () => { cur = it.next(); cur._2 },
      jiffySampler = jiffy) { () =>
      val until = System.nanoTime() + cur._1.toLong * 1000000L
      while (System.nanoTime() < until) {}
    }()
  }

  test("clean run reports the true median and zero extra reps") {
    // equal scripted durations: the spread trigger needs a 2x gap, so
    // only extreme (>2x) preemption of one spin could flip this — the
    // assertions tolerate ordinary shared-host jitter
    val r = scripted(Seq((120, 1.0, 0.0), (50, 1.0, 0.0), (50, 1.0, 0.0), (50, 1.0, 0.0)),
      warmReps = 3, maxExtra = 3)
    assert(r.stat == "median")
    assert(r.extraReps == 0)
    assert(r.warm >= 0.050 && r.warm < 0.100, s"median should be ~50ms, got ${r.warm}")
    assert(r.cold.sec >= 0.110, s"cold should be ~120ms, got ${r.cold.sec}")
    assert(r.loadMax == 1.0)
  }

  test("a loaded warm rep triggers extra reps and the min-load rep wins") {
    // warm reps at loads 5, 5, 5 then extras at load 1 -> minload stat,
    // the load-1 rep's duration reported, extras counted
    val r = scripted(Seq((10, 1.0, 0.0), (50, 5.0, 0.0), (55, 5.0, 0.0), (52, 5.0, 0.0),
      (15, 1.0, 0.0)), warmReps = 3, maxExtra = 3)
    assert(r.stat == "minload")
    assert(r.extraReps >= 1)
    assert(r.warm < 0.030, s"the load-1 extra rep (~15ms) should win, got ${r.warm}")
    assert(r.loadMax == 5.0)
  }

  test("a >2x warm spread triggers the guard even at low load") {
    val r = scripted(Seq((10, 1.0, 0.0), (10, 1.0, 0.0), (45, 1.0, 0.0), (12, 1.0, 0.0),
      (11, 1.0, 0.0)), warmReps = 3, maxExtra = 2)
    assert(r.stat == "minload")
    assert(r.extraReps >= 1)
  }

  test("extra reps are capped at maxExtra") {
    // permanently loaded: guard fires but gives up after maxExtra
    val r = scripted(Seq((5, 9.0, 0.0), (5, 9.0, 0.0), (5, 9.0, 0.0), (5, 9.0, 0.0),
      (5, 9.0, 0.0), (5, 9.0, 0.0), (5, 9.0, 0.0)), warmReps = 3, maxExtra = 2)
    assert(r.extraReps == 2)
    assert(r.stat == "minload")
  }

  test("a stolen-CPU rep triggers the guard even at load 1 (loadavg is " +
      "blind to hypervisor steal)") {
    // warm reps: 20% of CPU stolen at load 1 -> guard fires; the extra
    // rep is steal-free and wins
    val r = scripted(Seq((10, 1.0, 0.0), (50, 1.0, 0.2), (52, 1.0, 0.2),
      (51, 1.0, 0.2), (15, 1.0, 0.0)), warmReps = 3, maxExtra = 3)
    assert(r.stat == "minload")
    assert(r.extraReps >= 1)
    assert(r.warm < 0.030, s"the steal-free extra rep (~15ms) should win, got ${r.warm}")
    assert(r.stealMax >= 0.19 && r.stealMax <= 0.21)
  }

  test("zero warm reps falls back to the cold number") {
    val r = scripted(Seq((10, 1.0, 0.0)), warmReps = 0, maxExtra = 3)
    assert(r.stat == "cold")
    assert(r.warm == r.cold.sec)
  }

  test("a throwing query is recorded with an error, never as a fast clean rep") {
    var calls = 0
    val r = Bench.measureQuery("boom", warmReps = 2, maxExtra = 3,
      loadSampler = () => 1.0, jiffySampler = () => (0L, 0L)) { () =>
      calls += 1
      sys.error("query exploded")
    }()
    assert(calls >= 3) // cold + 2 warm at minimum
    assert(r.err.nonEmpty, "error must surface in QResult")
    assert(r.err.get.contains("query exploded"))
  }

  test("chosenClean is false when every rep ran contaminated") {
    val r = scripted(Seq((5, 9.0, 0.0), (5, 9.0, 0.0), (5, 9.0, 0.0),
      (5, 9.0, 0.0), (5, 9.0, 0.0), (5, 9.0, 0.0), (5, 9.0, 0.0)),
      warmReps = 3, maxExtra = 2)
    assert(r.stat == "minload" && !r.chosenClean)
  }

  test("chosenClean is true once an extra rep lands under both limits") {
    val r = scripted(Seq((10, 1.0, 0.0), (50, 5.0, 0.0), (55, 5.0, 0.0),
      (52, 5.0, 0.0), (15, 1.0, 0.0)), warmReps = 3, maxExtra = 3)
    assert(r.stat == "minload" && r.chosenClean)
  }

  test("blind samplers (-1 everywhere) stop the extras loop after one rep " +
      "instead of burning the full budget on unknowable conditions") {
    var runs = 0
    val r = Bench.measureQuery("blind", warmReps = 3, maxExtra = 5,
      loadSampler = () => -1.0, jiffySampler = () => (-1L, -1L)) { () =>
      runs += 1
      // >2x spread forces the guard to trigger even with unknown load
      val until = System.nanoTime() + (if (runs == 2) 45 else 10) * 1000000L
      while (System.nanoTime() < until) {}
    }()
    assert(r.extraReps <= 1,
      s"blind conditions must short-circuit extras, ran ${r.extraReps}")
    assert(!r.chosenClean) // unknown is never clean
  }
}
