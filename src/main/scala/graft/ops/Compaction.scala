package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Small-file compaction planning — the OPTIMIZE-style table
  * maintenance pass a 100 TB lakehouse runs continuously: given the
  * file listing (name, bytes), assign files to rewrite groups of
  * roughly `targetBytes` so each group becomes one output file.
  *
  * Policy is SEQUENTIAL FILL over a deterministic total order
  * (bytes DESC, then name — biggest first packs tightest): group id =
  * `floor(running_bytes_before_this_file / targetBytes)`. A file may
  * straddle a boundary (its group then overshoots by < one file) —
  * the standard tradeoff for a policy an independent engine can
  * replay exactly; first-fit-decreasing packs ~equally well but is
  * inherently sequential-stateful and NOT expressible as a windowed
  * scan. Files larger than `targetBytes` land alone in their own
  * group by construction.
  *
  * Execution shape: one window pass over the FILE LISTING — a frame
  * that is tiny relative to the data it describes (one row per file),
  * which is why the single-partition total-order window is the right
  * plan here, not a scale bug. Output: (file, bytes, group,
  * group_bytes, group_files).
  */
object Compaction {

  private def intDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  def planGroups(files: DataFrame, fileCol: String, bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val ord = Window.orderBy(col(bytesCol).desc, col(fileCol).asc)
    val cumBefore = Window.orderBy(col(bytesCol).desc, col(fileCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val guarded = files.where(
      when(col(fileCol).isNull || col(bytesCol).isNull || col(bytesCol) < 0,
        raise_error(lit(s"Compaction: NULL/negative in $fileCol/$bytesCol")))
        .otherwise(lit(true)))
    val grouped = guarded
      .withColumn("__before", coalesce(sum(col(bytesCol)).over(cumBefore), lit(0L)))
      .withColumn("group", intDiv(col("__before"), lit(targetBytes)).cast("long"))
    val byGroup = Window.partitionBy("group")
    grouped
      .select(
        col(fileCol).as("file"),
        col(bytesCol).cast("long").as("bytes"),
        col("group"),
        sum(col(bytesCol)).over(byGroup).cast("long").as("group_bytes"),
        count(lit(1)).over(byGroup).as("group_files"))
  }
}
