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

  /** Persist `ds`, register the handle for a later [[release]], and
    * MATERIALIZE the cache eagerly (one count() job) before returning.
    * Spark's CacheManager dedupes by logical plan, so re-persisting an
    * already-cached plan (e.g. quantSeriesCached called by two queries)
    * reuses the existing entry rather than duplicating it.
    *
    * Eager materialization is the fix for the multi-consumer race every
    * caller of this API has: a lazily persisted stage that fans out into
    * N plan subtrees is materialized by whichever consumer stages run
    * first — and AQE submits independent shuffle stages CONCURRENTLY, so
    * all N consumers race to compute the same cache partitions, each
    * paying the full upstream compute (the `BlockManager: Block rdd_X
    * already exists on this machine; not re-adding it` warnings in the r7
    * bench logs are exactly this: a task finished computing a partition
    * another task had already cached). The md5-signature and quantized-
    * series stages these persists protect are the expensive part of their
    * queries, so the race both doubles CPU and injects run-to-run
    * variance (whichever consumer wins changes per run). One eager pass
    * up front costs the same scan the first consumer would pay anyway and
    * makes every consumer a pure cache read.
    */
  /** Eager materialization (one count() at registration) was tried for
    * the r8 round to close the multi-consumer race AQE's concurrent stage
    * submission creates on lazily persisted stages (consumers recompute
    * the same partitions; the `BlockManager: Block already exists`
    * warnings). With the per-stage costs fixed at their source (codec
    * contention, spread width), the race's duplicated work is now small
    * and the eager counts' extra sequential jobs measured NET SLOWER on
    * every multi-persist query (q39: 3.3 s lazy vs 4.8 s eager) — so lazy
    * stays the default and eagerness is an opt-in experiment flag.
    */
  private val eagerDefault = sys.env.get("SPARK_GRAFT_EAGER_PERSIST").contains("1")

  def persist[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    registry.keySet.removeIf(s => s.sparkContext.isStopped)
    val out = ds.persist(level)
    registry.computeIfAbsent(ds.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()).add(out)
    if (eagerDefault) out.count(): Unit
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

  /** Guard for an input a caller's operator will CONSUME TWICE (e.g. the
    * short-series and tile branches of the distributed MP builders): if
    * re-scanning the plan is ~free — it is already cached, or it is just
    * a relation scan with projections/filters on top — return it as-is;
    * otherwise persist-and-register it so the fork doesn't recompute an
    * expensive upstream (a join, an aggregate, a kernel mapPartitions)
    * once per branch. This closes the "caller forgot to persist a derived
    * input" footgun without paying cache materialization on the common
    * table-scan case, where a persist is measurably SLOWER than the
    * second scan.
    */
  def forked[T](ds: Dataset[T]): Dataset[T] =
    if (ds.storageLevel != StorageLevel.NONE || cheapToRescan(ds)) ds
    else persist(ds)

  /** A plan is cheap to rescan when every node on it is a leaf relation,
    * a projection/filter, or object (de)serialization glue — the shapes
    * whole-stage codegen re-runs at scan speed. Anything else (joins,
    * aggregates, exchanges, user map functions) may carry arbitrary
    * compute, so a second scan pays it twice.
    */
  private def cheapToRescan(ds: Dataset[_]): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    ds.queryExecution.optimizedPlan.collect {
      case p if !(p.isInstanceOf[LeafNode] || p.isInstanceOf[Project] ||
        p.isInstanceOf[Filter] || p.isInstanceOf[TypedFilter] ||
        p.isInstanceOf[SerializeFromObject] ||
        p.isInstanceOf[DeserializeToObject]) => p
    }.isEmpty
  }
}
