package graft.util

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Explicit lifecycle for operator-internal persisted stages.
  *
  * Dedup/Similarity/q-query builders persist shared intermediates
  * (signatures, bucket keys, quantized projections) so forked plans
  * compute them once. Those persists used to rely on the caller running
  * `spark.catalog.clearCache()` — a global wipe a library caller may not
  * want (it also evicts THEIR caches). Every such stage now registers
  * here instead: after the consuming action, call [[release]] to drop
  * exactly the operator-internal stages and nothing else.
  *
  * The harness contract: Verify releases after every query (and asserts
  * nothing is left at the end); Bench releases between reps so no rep
  * reads another's cache. Library callers: one `StageCache.release(spark)`
  * after the terminal action of a dedup/ANN/MP query.
  */
object StageCache {

  private val registry = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** Persist `ds` and register the handle for a later [[release]].
    * Spark's CacheManager dedupes by logical plan, so re-persisting an
    * already-cached plan (e.g. quantSeriesCached called by two queries)
    * reuses the existing entry rather than duplicating it.
    */
  def persist[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    registry.keySet.removeIf(s => s.sparkContext.isStopped)
    val out = ds.persist(level)
    registry.computeIfAbsent(ds.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()).add(out)
    out
  }

  /** Number of stage handles currently registered for `spark`. */
  def registeredCount(spark: SparkSession): Int = {
    val q = registry.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Unpersist every registered stage of `spark`; returns how many handles
    * were released. Non-blocking (the executors free asynchronously).
    */
  def release(spark: SparkSession): Int = {
    val q = registry.remove(spark)
    if (q == null) 0
    else {
      var n = 0
      var d = q.poll()
      while (d != null) {
        try d.unpersist(blocking = false)
        catch { case _: Throwable => () } // a stopped context has nothing to free
        n += 1
        d = q.poll()
      }
      n
    }
  }
}
