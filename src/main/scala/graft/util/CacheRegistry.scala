package graft.util

import org.apache.spark.sql.DataFrame

/** Session-scoped registry for persisted frames whose lifetime extends
  * past the operator call that created them (an op that persists a slim
  * intermediate between a gate-count pass and the returned lazy plan has
  * no synchronous point to unpersist — the plan is consumed later, by
  * the caller). Ops register such frames here; a long-lived session
  * calls [[releaseAll]] between pipelines to drop the accumulated
  * executor storage. Mirrors the documented cache-lifecycle ownership of
  * `Lm.bigramScore` (model caches live for the session unless released).
  *
  * Registration is idempotent per frame and thread-safe; releasing is
  * best-effort (`unpersist(blocking = false)`).
  */
object CacheRegistry {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Track a frame persisted by an op whose returned plan still reads
    * it. Returns the frame for call-chaining. */
  private[graft] def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Track a persisted internal-row RDD (a [[LoopFrames.cut]] cache)
    * whose returned lazy plan still reads it — same lifetime contract
    * as [[track]], for ops that keep the cheap RDD-level cache instead
    * of a columnar DataFrame persist. */
  private[graft] def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    trackedRdds.add(rdd)

  /** Number of currently tracked persisted frames (test hook). */
  def trackedCount: Int = tracked.size()

  /** Unpersist every tracked frame and clear the registry. Safe to call
    * while plans over the frames are still alive — Spark recomputes from
    * lineage; only the storage is dropped. */
  def releaseAll(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      // NonFatal only: swallowing InterruptedException or a VM error
      // here would clear a thread interrupt / mask a dying JVM
      try df.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      df = tracked.poll()
    }
    var rdd = trackedRdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      rdd = trackedRdds.poll()
    }
  }
}
