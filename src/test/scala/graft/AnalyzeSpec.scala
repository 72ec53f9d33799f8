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

  test("preprocess kwargs validation (ref test_preprocess.py:21-89)") {
    val k = Analyze.validatePreprocessKwargs(Some(Analyze.PreprocessKwargs(
      window = 5, imputeMethod = "median", imputeDirection = "backward",
      addNoise = false))).get
    assert(k.window == 5 && k.imputeMethod == "median")
    // defaults mirror the reference's
    val d = Analyze.PreprocessKwargs()
    assert(d.window == 4 && d.imputeMethod == "mean" &&
      d.imputeDirection == "forward" && d.addNoise)
    assert(Analyze.validatePreprocessKwargs(None).isEmpty)
    val e1 = intercept[IllegalArgumentException] {
      Analyze.validatePreprocessKwargs(Some(Analyze.PreprocessKwargs(imputeMethod = "mode")))
    }
    assert(e1.getMessage.contains("invalid imputation method! valid include options: mean, median, min, max"))
    val e2 = intercept[IllegalArgumentException] {
      Analyze.validatePreprocessKwargs(Some(Analyze.PreprocessKwargs(imputeDirection = "a")))
    }
    assert(e2.getMessage.contains("invalid imputation direction! valid include options: forward, fwd, f, backward, bwd, b"))
  }

  test("compute with preprocessing kwargs imputes NaN/Inf before dispatch " +
      "(ref compute.py:107-113, test_preprocess.py:153-166)") {
    val nan = Double.NaN
    val inf = Double.PositiveInfinity
    // the reference's test_preprocess series (test_preprocess.py:160-162)
    val ts = Array(nan, inf, inf, nan, inf, 2, 3, 2, 3, 1, 2, 3, 4, 2,
      nan, inf, 4, 2, 3, 4, 5, 6, 7, 8, 3, 4, 2, 3, 4, 5, 6, 7, 6,
      5, 4, 3, nan, nan, inf, nan, inf, nan).map(_.toDouble)
    val cleaned = Preprocess.preprocess(ts, 4)
    assert(cleaned.forall(v => !v.isNaN && !v.isInfinite))
    // without kwargs the NaN-poisoned series yields no finite matches;
    // with kwargs the profile is fully finite, like the reference API
    Analyze.compute(ts, Seq(4),
        preprocessingKwargs = Some(Analyze.PreprocessKwargs())) match {
      case Analyze.MpResult(p) =>
        assert(p.mp.forall(v => !v.isNaN && !v.isInfinite))
      case _ => fail("expected MP result")
    }
    // backward imputation path (test_impute_missing, direction='b')
    val ts2 = Array(nan, nan, inf, nan, inf, inf, 4, 5, nan,
      inf, nan, inf, inf, inf, inf, nan, 2).map(_.toDouble)
    val imp = Preprocess.imputeMissing(ts2, 4, forward = false)
    assert(imp.forall(v => !v.isNaN && !v.isInfinite))
  }
}
