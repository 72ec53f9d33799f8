package graft.run

import org.apache.spark.sql.SparkSession

/** Physical-plan audit for the oracle-gated queries: prints formatted
  * plans and flags missing pushdown / non-codegen stages. Run after plan
  * changes: `runMain graft.run.ExplainAudit [sfDir] [queryPrefix]`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val prefix = if (args.length > 1) args(1) else "q"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val exchanges = "Exchange".r.findAllIn(plan).length
          val scans = "Scan parquet".r.findAllIn(plan).length
          val wscg = "codegen id".r.findAllIn(plan).length
          val pushed = plan.contains("PushedFilters: [") &&
            !plan.contains("PushedFilters: []")
          println(s"=== $name: exchanges=$exchanges scans=$scans " +
            s"codegenSpans=$wscg pushedFilters=$pushed")
          if (sys.env.contains("GRAFT_EXPLAIN_FULL")) println(plan)
        } catch { case e: Throwable => println(s"=== $name: ERROR ${e.getMessage}") }
      }
    spark.stop()
  }
}
