package graft.run

import org.apache.spark.sql.SparkSession

/** Physical-plan audit for the oracle-gated queries: prints each query's
  * [[PlanDigest]] (and the full formatted plan under GRAFT_EXPLAIN_FULL),
  * optionally writing the machine-diffable digest JSON. Run after plan
  * changes: `runMain graft.run.ExplainAudit [sfDir] [queryPrefix] [outJson]`.
  * The bench harness emits the same digest per round under
  * SPARK_GRAFT_EXPLAIN=1 (see Bench).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val prefix = if (args.length > 1) args(1) else "q"
    val out = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // one plan build per query: the same digests print AND (if asked)
    // write — rebuilding for the file would re-run every builder's
    // plan-time jobs and ignore the prefix
    val digests = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .map { case (name, fn) =>
        val json =
          try {
            val df = fn(spark, sfDir)
            val d = PlanDigest.of(df)
            println(s"=== $name: exchanges=${d.exchanges} " +
              s"broadcasts=${d.broadcasts} scans=${d.scans} " +
              s"codegenSpans=${d.codegenSpans} pushedFilters=${d.pushedFilters}")
            if (sys.env.contains("GRAFT_EXPLAIN_FULL"))
              println(df.queryExecution.explainString(
                org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            d.json
          } catch { case e: Throwable =>
            println(s"=== $name: ERROR ${e.getMessage}")
            s"""{"error":"${e.getClass.getSimpleName}"}"""
          }
        graft.util.StageCache.release(spark)
        "\"" + name + "\":" + json
      }
    out.foreach(p => java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      digests.mkString("{\n", ",\n", "\n}\n")))
    spark.stop()
  }
}
