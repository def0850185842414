package graft.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.storage.StorageLevel

/** Lineage-cut frames for iterative loops (connected components,
  * PageRank, Lloyd rounds): persist the INTERNAL-row RDD and rebuild a
  * DataFrame whose logical plan is just a scan of it. A plain
  * `persist()` keeps the full Catalyst plan — every round would then
  * re-analyze a plan embedding the entire upstream pipeline AND growing
  * by one join per round, so driver planning time (not the data)
  * dominates the loop. The RDD keeps its own lineage, so fault
  * tolerance is unchanged (unlike localCheckpoint). */
private[graft] object LoopFrames {

  def cut(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val rdd = Bridge
      .toInternalRdd(df)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    (Bridge.internalCreateDataFrame(df.sparkSession, rdd, df.schema), rdd)
  }

  /** [[cut]] that also DECLARES hash layout + per-partition order to
    * Catalyst ([[Bridge.internalCreateDataFramePartitioned]]): the
    * caller must have ended `df` with `repartition(n, keys…)` +
    * `sortWithinPartitions(keys…)`. A loop's STATIC side is exchanged
    * and sorted ONCE here; every subsequent round's equi-join on `keys`
    * then plans neither an exchange nor a sort for it. */
  def cutPartitioned(
      df: DataFrame,
      keys: Seq[String],
      n: Int): (DataFrame, RDD[InternalRow]) = {
    val rdd = Bridge
      .toInternalRdd(df)
      .mapPartitions(_.map(_.copy()), preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    (Bridge.internalCreateDataFramePartitioned(df.sparkSession, rdd, df.schema, keys, n, keys),
      rdd)
  }
}
