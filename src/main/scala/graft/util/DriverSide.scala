package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The limit-probe small-side recipe, extracted: several ops need a
  * DERIVED frame (a histogram, a stats table, a pair set) both for a
  * gate decision and inside the returned plan. The naive spellings
  * either execute the derivation subtree twice (count-then-join) or
  * collect it unboundedly (driver OOM on pathological cardinality).
  *
  * [[smallSideOrTracked]] probes with `limit(cap+1).collect()` — the
  * cap bounds the boxed-Row allocation of the probe itself — and:
  *  - within the cap: builds a LocalRelation from the single probe
  *    execution (the subtree never runs again) and broadcast-hints it
  *    when it fits the join threshold;
  *  - past the cap: persists the frame (registered with
  *    [[CacheRegistry]] — the caller's returned plan still reads it;
  *    sessions release between pipelines), count-gates, and
  *    broadcast-hints if small enough.
  *
  * Used by Anomaly.zscoreFlags, Text.percentileGate/pmiBigrams,
  * Lm.ccnetBuckets, Similarity.centroidOutliers,
  * DedupDocs.sourceOverlapMatrix — one definition of the cap and the
  * fallback policy instead of per-file copies.
  */
object DriverSide {

  /** Default probe cap: small enough that the probe's boxed Rows are a
    * few tens of MB at worst, large enough for every legitimate
    * histogram/stats/pair table (keys × ≤10⁴ rounded values). */
  val DefaultCap = 100000

  private[graft] def smallSideOrTracked(df: DataFrame, cap: Int = DefaultCap): DataFrame = {
    val probe = df.limit(cap + 1).collect()
    if (probe.length <= cap) {
      val local = df.sparkSession.createDataFrame(
        java.util.Arrays.asList(probe: _*), df.schema)
      graft.spikes.Spikes.broadcastIfSmall(local, probe.length.toLong)
    } else {
      val tracked = CacheRegistry.track(df.persist(StorageLevel.MEMORY_AND_DISK))
      graft.spikes.Spikes.broadcastIfSmall(tracked, tracked.count())
    }
  }
}
