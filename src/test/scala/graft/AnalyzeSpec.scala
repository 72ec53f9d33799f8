package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels._
import Fixtures._

/** Facade dispatch (ref analyze.py/compute.py) + IO round-trip gates. */
class AnalyzeSpec extends AnyFunSuite {

  test("compute dispatch: single window exact -> mpx") {
    Analyze.compute(sampledata, Seq(32)) match {
      case Analyze.MpResult(p) =>
        assert(p.algorithm == "mpx")
        assertAlmostEqual(p.mp, load("mpx_mp.txt"), decimal = 4)
      case _ => fail("expected MP result")
    }
  }

  test("compute dispatch: multi-window -> PMP; sampled -> scrimp++; join -> ab") {
    Analyze.compute(sampledata, Seq(16, 32)) match {
      case Analyze.PmpResult(pmp) =>
        assert(pmp.windows.toSeq == Seq(16, 32))
        assert(pmp.rows.forall(_.mp.length == sampledata.length))
      case _ => fail("expected PMP result")
    }
    Analyze.compute(sampledata, Seq(32), samplePct = 0.5) match {
      case Analyze.MpResult(p) => assert(p.algorithm == "scrimp++")
      case _ => fail()
    }
    Analyze.compute(sampledata, Seq(32), query = Some(sampledata.slice(199, 300))) match {
      case Analyze.MpResult(p) =>
        assert(p.join)
        assertAlmostEqual(p.mp, load("mpx_ab_mpa.txt"), decimal = 4)
      case _ => fail()
    }
  }

  test("analyze attaches motifs and discords (ref analyze.py:76-82)") {
    Analyze.analyze(sampledata, Seq(32)) match {
      case Analyze.MpResult(p) =>
        assert(p.motifs.nonEmpty && p.discords.nonEmpty)
        assert(p.discords.length == 3)
      case _ => fail()
    }
  }

  test("stomp facade exposes left/right profiles") {
    val p = Analyze.stomp(Array[Double](0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0), 4)
    assert(p.lmp.nonEmpty && p.rmp.nonEmpty && p.algorithm == "stomp")
  }
}
