package graft.run

import graft.kernels._

/** CLI analog of the reference's catch-all `analyze()` entry point
  * (ref analyze.py:173-270): read a 1-column series file, compute the
  * exact matrix profile plus motifs/discords/regimes/snippets/statistics,
  * print a summary. Usage: runMain graft.run.AnalyzeMain <file> [window].
  */
object AnalyzeMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnalyzeMain <series.txt> [window]")
    val src = scala.io.Source.fromFile(args(0))
    val ts = try src.getLines().map(_.trim).filter(_.nonEmpty).map(_.toDouble).toArray
    finally src.close()
    val w = if (args.length > 1) args(1).toInt else 32

    val (mp, pi) = Mpx.mpxSelf(ts, w)
    val ez = math.ceil(w / 4.0).toInt
    println(f"series n=${ts.length} w=$w profileLen=${mp.length} minMp=${mp.min}%.6f")

    val discords = TopK.mpTopKDiscords(mp, ez, k = 3)
    println("top3 discords: " + discords.mkString(", "))

    val motifs = TopK.mpTopKMotifs(ts, mp, pi, w, ez, k = 2)
    println("top2 motifs: " + motifs.map(m =>
      s"(${m.motifs._1},${m.motifs._2}) neighbors=${m.neighbors.length}").mkString(" | "))

    val cac = Fluss.cac(pi, w)
    println("regimes: " + Fluss.extractRegimes(cac, w, 3).mkString(", "))

    if (ts.length >= 4 * w) {
      val snips = Snippets.snippets(ts, 2 * w, 2, w)
      println("snippets: " + snips.map(s => f"idx=${s.index} frac=${s.fraction}%.3f").mkString(" | "))
    }

    val st = Statistics.statistics(ts, w)
    println(f"stats: mean=${st.mean}%.6f std=${st.std}%.6f median=${st.median}%.6f")
  }
}
