package graft.util

import org.apache.spark.sql.SparkSession

/** Scale-adaptive execution settings applied once per session by the
  * query builders (guide §2.2: "let AQE coalesce small partitions").
  *
  * With the default `parallelismFirst=true`, AQE coalesces post-shuffle
  * partitions toward `defaultParallelism` with a 1 MB floor instead of
  * the advisory size — so a query battery over a small scale factor runs
  * every tiny shuffle at up to 32 near-empty partitions. Thread-stack
  * sampling of such stages shows the time going to per-task constants
  * (task-binary deserialization, 33 shuffle files per bypass-merge map
  * task), not compute: ~40 ms/task × 32 tasks × ~30 stages ≈ tens of
  * seconds of task time for kilobytes of data. `parallelismFirst=false`
  * is the documented switch to honor `advisoryPartitionSizeInBytes`
  * instead: partition count then DERIVES FROM DATA SIZE — one partition
  * for a 100 KB shuffle here, hundreds for a 100 GB shuffle at scale —
  * which is exactly the scale-adaptive behavior the optimization guide
  * prescribes (a constant tuned to local cores is what it warns against).
  * CPU-heavy narrow stages (media decode, signature hashing) are spread
  * by explicit hash repartitions, which AQE never coalesces, so they keep
  * full parallelism.
  *
  * Opt-out: SPARK_GRAFT_NO_TUNING=1 leaves the session untouched.
  */
object SessionTuning {

  private val off = sys.env.get("SPARK_GRAFT_NO_TUNING").contains("1")
  private val applied = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def ensure(spark: SparkSession): Unit = {
    if (off) return
    applied.removeIf(s => s.sparkContext.isStopped)
    if (applied.add(spark)) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    }
  }
}
