package graft

/** Golden fixture loaders (files copied verbatim from the reference's
  * tests/ directory, see FIXTURES.md §2).
  */
object Fixtures {
  def load(name: String): Array[Double] = {
    val in = getClass.getResourceAsStream(s"/ref/$name")
    require(in != null, s"missing fixture $name")
    val src = scala.io.Source.fromInputStream(in)
    try src.getLines().map(_.trim).filter(_.nonEmpty).map(_.toDouble).toArray
    finally src.close()
  }

  lazy val sampledata: Array[Double] = load("sampledata.txt")

  def assertAlmostEqual(actual: Array[Double], desired: Array[Double],
      decimal: Int = 7): Unit = {
    assert(actual.length == desired.length,
      s"length mismatch: ${actual.length} vs ${desired.length}")
    val tol = 1.5 * math.pow(10, -decimal)
    for (i <- actual.indices) {
      val a = actual(i); val d = desired(i)
      val ok = (a.isNaN && d.isNaN) ||
        (a.isPosInfinity && d.isPosInfinity) ||
        (a.isNegInfinity && d.isNegInfinity) ||
        math.abs(a - d) < tol
      assert(ok, s"index $i: $a != $d (tol $tol)")
    }
  }
}
