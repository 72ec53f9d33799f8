package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernels.{Hierarchical, MpDist}
import Fixtures._

/** Port of tests/test_hierarchical_clustering.py:22-63 (distances,
  * assignments, cophenet) using driver-side kernels; the Spark fan-out is
  * covered in SparkPipelineSpec.
  */
class HierarchicalSpec extends AnyFunSuite {

  lazy val ts1: Array[Double] = load("skimp_seed9999.txt")
  lazy val ts2: Array[Double] = load("skimp_seed9999_b.txt")
  lazy val ts3: Array[Double] = load("skimp_seed9999_c.txt")
  lazy val x: Array[Array[Double]] = Array(ts1, ts1, ts2, ts2, ts3)

  lazy val condensed: Array[Double] = {
    val m = x.length
    val y = new Array[Double](m * (m - 1) / 2)
    var k = 0
    for (i <- 0 until m - 1; j <- i + 1 until m) {
      y(k) = MpDist.mpdist(x(i), x(j), 64)
      k += 1
    }
    y
  }

  test("pairwise MPDist matrix matches reference goldens") {
    assertAlmostEqual(condensed, Array(0, 8.2299501, 8.2299501, 8.29915377,
      8.2299501, 8.2299501, 8.29915377, 0, 8.2558308, 8.2558308), decimal = 6)
  }

  test("hierarchical clustering: assignments + cophenet (t=2, single)") {
    val c = Hierarchical.hierarchicalClusters(condensed, 5, t = 2.0)
    assert(c.assignments.toSeq == Seq(1, 1, 2, 2, 3))
    assert(math.abs(c.cophenetCorrelation - 0.9999870997174531) < 1e-6,
      s"cophenet ${c.cophenetCorrelation}")
    assert(c.linkage.length == 4)
    // first two merges join the identical-series pairs at distance 0
    assert(c.linkage(0).dist == 0.0 && c.linkage(1).dist == 0.0)
  }

  test("linkage methods agree on well-separated clusters") {
    for (m <- Seq(Hierarchical.Single, Hierarchical.Complete,
        Hierarchical.Average, Hierarchical.Weighted)) {
      val c = Hierarchical.hierarchicalClusters(condensed, 5, t = 2.0, method = m)
      assert(c.assignments.toSeq == Seq(1, 1, 2, 2, 3), s"method $m")
    }
    val byCount = Hierarchical.hierarchicalClusters(condensed, 5, t = 3,
      maxClust = true)
    assert(byCount.assignments.distinct.length == 3)
  }
}
