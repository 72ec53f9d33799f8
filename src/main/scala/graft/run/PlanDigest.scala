package graft.run

import org.apache.spark.sql.DataFrame

/** Per-query physical-plan digest: the round-over-round diffable summary
  * (exchange/broadcast/scan/codegen counts + filter pushdown) that makes a
  * plan regression — a lost broadcast, a new shuffle — visible without
  * re-reading code. Counts come from the formatted explain's numbered
  * node-detail headers (`(5) Exchange`), so each physical node counts
  * exactly once.
  */
object PlanDigest {

  final case class Digest(exchanges: Int, broadcasts: Int, scans: Int,
      codegenSpans: Int, pushedFilters: Boolean) {
    def json: String =
      s"""{"exchanges":$exchanges,"broadcasts":$broadcasts,"scans":$scans,""" +
        s""""codegen_spans":$codegenSpans,"pushed_filters":$pushedFilters}"""
  }

  private val nodeHeader = """(?m)^\((\d+)\) (\S+)""".r
  private val codegenId = """codegen id : (\d+)""".r

  def of(df: DataFrame): Digest = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    var exchanges = 0
    var broadcasts = 0
    var scans = 0
    nodeHeader.findAllMatchIn(plan).foreach { m =>
      m.group(2) match {
        case "Exchange" => exchanges += 1
        case "BroadcastExchange" => broadcasts += 1
        case "Scan" => scans += 1
        case _ => ()
      }
    }
    val spans = codegenId.findAllMatchIn(plan).map(_.group(1)).toSet.size
    val pushed = plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []")
    Digest(exchanges, broadcasts, scans, spans, pushed)
  }

  /** Digest every SparkEntry query (plan-build only — no execution beyond
    * the tiny plan-time jobs some builders run) and write one JSON object
    * name → digest to `path`.
    */
  def writeAll(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      path: String): Unit = {
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val d =
        try of(fn(spark, sfDir)).json
        catch { case e: Throwable =>
          s"""{"error":"${e.getClass.getSimpleName}"}"""
        }
      graft.util.StageCache.release(spark)
      "\"" + name + "\":" + d
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      rows.mkString("{\n", ",\n", "\n}\n"))
  }
}
