package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels._
import Fixtures._

/** Ports of tests/test_stomp.py and tests/test_scrimp.py. */
class StompScrimpSpec extends AnyFunSuite {

  test("stomp small self-join incl left/right (test_stomp.py:38-58)") {
    val ts = Array[Double](0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0)
    val r = Stomp.stomp(ts, 4)
    val inf = Double.PositiveInfinity
    assertAlmostEqual(r.mp, Array.fill(9)(0.0))
    assert(r.pi.toSeq == Seq(4, 5, 6, 7, 0, 1, 2, 3, 0).map(_.toLong))
    assertAlmostEqual(r.lmp, Array(inf, inf, inf, 2.82842712, 0, 0, 0, 0, 0))
    assert(r.lpi.toSeq == Seq(0, 0, 0, 0, 0, 1, 2, 3, 0).map(_.toLong))
    assertAlmostEqual(r.rmp, Array(0, 0, 0, 0, 0, 2.82842712, inf, inf, inf))
    assert(r.rpi.toSeq == Seq(4, 5, 6, 7, 8, 8, 0, 0, 0).map(_.toLong))
  }

  test("stomp batch-count invariance (test_stomp.py:61-81 analog)") {
    val ts = Array[Double](0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0)
    val single = Stomp.stomp(ts, 4, nJobs = 1)
    for (jobs <- Seq(2, 3, 4)) {
      val multi = Stomp.stomp(ts, 4, nJobs = jobs)
      assertAlmostEqual(multi.mp, single.mp)
      assert(multi.pi.toSeq == single.pi.toSeq)
      assertAlmostEqual(multi.lmp, single.lmp)
      assertAlmostEqual(multi.rmp, single.rmp)
    }
  }

  test("stomp on sampledata consistent with mpx (cross-algorithm)") {
    // stomp excludes lags < ceil(w/2)+1, mpx only lags <= ceil(w/4): mpx may
    // find closer neighbors, so mpx.mp <= stomp.mp; equal where the mpx
    // nearest neighbor is outside stomp's exclusion zone.
    val w = 32
    val ez = math.ceil(w / 2.0).toInt
    val r = Stomp.stomp(sampledata, w, nJobs = 4)
    val (mpxMp, mpxPi) = Mpx.mpxSelf(sampledata, w)
    for (i <- r.mp.indices) {
      assert(mpxMp(i) <= r.mp(i) + 1e-4, s"index $i: mpx ${mpxMp(i)} > stomp ${r.mp(i)}")
      if (math.abs(mpxPi(i) - i) > ez)
        assert(math.abs(r.mp(i) - mpxMp(i)) < 1e-4,
          s"index $i: stomp ${r.mp(i)} != mpx ${mpxMp(i)} at lag ${math.abs(mpxPi(i) - i)}")
    }
  }

  test("stomp batch invariance on sampledata (many batches)") {
    val w = 32
    val single = Stomp.stomp(sampledata, w, nJobs = 1)
    val multi = Stomp.stomp(sampledata, w, nJobs = 8)
    assertAlmostEqual(multi.mp, single.mp, decimal = 10)
    assert(multi.pi.toSeq == single.pi.toSeq)
    assertAlmostEqual(multi.lmp, single.lmp, decimal = 10)
    assertAlmostEqual(multi.rmp, single.rmp, decimal = 10)
  }

  test("scrimp++ small series (test_scrimp.py:65-87)") {
    val p = Scrimp.scrimpPlusPlus(Array[Double](0, 0, 1, 0, 0, 0, 1, 0), 4)
    assertAlmostEqual(p.mp, Array(0, 3.2660, 3.2660, 3.2660, 0), decimal = 4)
  }

  test("scrimp++ vs MATLAB golden (test_scrimp.py:88-97)") {
    val p = Scrimp.scrimpPlusPlus(sampledata, 32)
    assertAlmostEqual(p.mp, load("scrimp.mp.txt"), decimal = 7)
    val expectedPi = load("scrimp.mpi.txt").map(v => v.toLong - 1)
    assert(p.pi.toSeq == expectedPi.toSeq)
  }

  test("is_pearson_array metric inference (ref core.py:625-643)") {
    import graft.kernels.Core
    val inf = Double.PositiveInfinity
    assert(Core.isPearsonArray(Array(0.0, 0.3, 1.0, Double.NaN, inf)))
    assert(!Core.isPearsonArray(Array(0.0, 1.2))) // > 1 => euclidean
    assert(!Core.isPearsonArray(Array(-0.1, 0.5))) // negative => euclidean
    assert(!Core.isPearsonArray(Array(Double.NaN, inf))) // nothing to infer
    // round-trip consistency: pearson values stay inferable, their
    // euclidean transform (w > 0) does not (sqrt(2w(1-rho)) can exceed 1)
    val rho = Array(0.0, 0.5, 0.99)
    assert(Core.isPearsonArray(rho))
    assert(!Core.isPearsonArray(Core.pearsonToEuclidean(rho, 8)))
  }
}
