package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{Mpx, Stomp}
import Fixtures._

/** Property gate from SURVEY §5: an O(n²·w) brute-force z-normalized
  * matrix-profile oracle checked against the mpx and stomp kernels on
  * seeded random series, including constant segments and spikes.
  */
class BruteForceOracleSpec extends AnyFunSuite {

  /** Brute force MP with configurable exclusion zone (ez in lag units). */
  def bruteForce(ts: Array[Double], w: Int, ez: Int): (Array[Double], Array[Int]) = {
    val plen = ts.length - w + 1
    def znorm(i: Int): Array[Double] = {
      var mu = 0.0
      var j = 0
      while (j < w) { mu += ts(i + j); j += 1 }
      mu /= w
      var s2 = 0.0
      j = 0
      while (j < w) { val d = ts(i + j) - mu; s2 += d * d; j += 1 }
      val sig = math.sqrt(s2 / w)
      Array.tabulate(w)(k => if (sig == 0) 0.0 else (ts(i + k) - mu) / sig)
    }
    val subs = Array.tabulate(plen)(znorm)
    val mp = Array.fill(plen)(Double.PositiveInfinity)
    val pi = Array.fill(plen)(-1)
    for (i <- 0 until plen; j <- 0 until plen if math.abs(i - j) > ez) {
      var d2 = 0.0
      var k = 0
      while (k < w) { val d = subs(i)(k) - subs(j)(k); d2 += d * d; k += 1 }
      val d = math.sqrt(d2)
      if (d < mp(i)) { mp(i) = d; pi(i) = j }
    }
    (mp, pi)
  }

  test("mpx matches brute-force oracle on random series") {
    val rng = new java.util.Random(1234)
    for (trial <- 1 to 5) {
      val n = 80 + rng.nextInt(120)
      val w = 4 + rng.nextInt(8)
      val ts = Array.fill(n)(rng.nextDouble() * 10 - 5)
      val minlag = math.ceil(w / 4.0).toInt
      val (oracle, _) = bruteForce(ts, w, minlag)
      val (mp, _) = Mpx.mpxSelf(ts, w)
      assertAlmostEqual(mp, oracle, decimal = 8)
    }
  }

  test("stomp matches brute-force oracle on random series") {
    val rng = new java.util.Random(5678)
    for (trial <- 1 to 5) {
      val n = 80 + rng.nextInt(120)
      val w = 4 + rng.nextInt(8)
      val ts = Array.fill(n)(rng.nextDouble() * 10 - 5)
      val ez = math.ceil(w / 2.0).toInt
      val (oracle, _) = bruteForce(ts, w, ez)
      val r = Stomp.stomp(ts, w)
      assertAlmostEqual(r.mp, oracle, decimal = 6)
    }
  }

  test("oracle agreement holds with spikes and near-constant segments") {
    val rng = new java.util.Random(42)
    val ts = Array.tabulate(150) { i =>
      if (i >= 60 && i < 75) 3.0 + i * 1e-9 // near-constant run
      else if (i == 100) 500.0 // spike
      else math.sin(i * 0.3) + rng.nextDouble() * 0.1
    }
    val w = 8
    val (oracle, _) = bruteForce(ts, w, math.ceil(w / 4.0).toInt)
    val (mp, _) = Mpx.mpxSelf(ts, w)
    // tolerate kernel-vs-oracle divergence only where sigma ~ 0 makes
    // z-normalization ill-defined (oracle zeroes, kernels guard)
    var diffs = 0
    for (i <- mp.indices)
      if (math.abs(mp(i) - oracle(i)) > 1e-6) diffs += 1
    assert(diffs <= 20, s"$diffs positions diverge beyond sigma-zero zones")
  }
}
