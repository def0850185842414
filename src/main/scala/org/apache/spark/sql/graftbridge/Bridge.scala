package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Minimal access bridge into `private[sql]` helpers so graft can lift a
  * Catalyst Expression into a public Column and build DataFrames from
  * InternalRow RDDs without the per-row external→Catalyst converter (the
  * supported patterns for extension libraries adding native sources and
  * expressions). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `SparkSession.internalCreateDataFrame` — rows must already be in
    * Catalyst form (UTF8String, ArrayData, micros timestamps...). */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The executed plan's RDD[InternalRow] — the zero-conversion dual of
    * [[internalCreateDataFrame]]. Rows are REUSED per partition iterator
    * (UnsafeRow): callers that buffer or cache MUST `.copy()`. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.toRdd

  /** [[internalCreateDataFrame]] that DECLARES the RDD's physical
    * layout to Catalyst — the mechanism `Dataset.checkpoint` uses to
    * keep its partitioning. A plain `LogicalRDD` defaults to
    * `UnknownPartitioning`, so an iterative loop that caches its static
    * side (transition matrix, edge list) re-exchanges it every round
    * even though the rows never moved. Declaring
    * `HashPartitioning(hashCols)` (and optionally per-partition
    * `sortCols` order) lets ensureRequirements skip the exchange (and
    * the sort) on the cached side.
    *
    * SAFETY CONTRACT: the claim must be physically true. Produce the
    * source frame with an EXPLICIT-count `df.repartition(n, cols…)`
    * (shuffle origin REPARTITION_BY_NUM — AQE never coalesces it, so
    * the modulo mapping is exactly `HashPartitioning(cols, n)`), plus
    * `sortWithinPartitions(sortCols…)` when declaring order. An
    * AQE-coalesced exchange (plain groupBy output) must NOT be declared:
    * its runtime partitioning is a contiguous-range merge of hash
    * buckets, and a false claim silently mis-co-locates joins. The
    * partition-count assert below catches the coalesced case. */
  def internalCreateDataFramePartitioned(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType,
      hashCols: Seq[String],
      numPartitions: Int,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(
      rdd.getNumPartitions == numPartitions,
      s"declared HashPartitioning($hashCols, $numPartitions) but the RDD has " +
        s"${rdd.getNumPartitions} partitions — was the source exchange AQE-coalesced? " +
        "Use df.repartition(n, cols…) with an explicit count.")
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    def attr(n: String) = attrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${schema.fieldNames.mkString(",")}"))
    val part = org.apache.spark.sql.catalyst.plans.physical
      .HashPartitioning(hashCols.map(attr), numPartitions)
    val order = sortCols.map(n =>
      org.apache.spark.sql.catalyst.expressions.SortOrder(
        attr(n), org.apache.spark.sql.catalyst.expressions.Ascending))
    org.apache.spark.sql.classic.Dataset.ofRows(
      cs,
      org.apache.spark.sql.execution.LogicalRDD(
        attrs, rdd, part, order, false, None)(cs, None, None))
  }

  /** A DataFrame over a LocalRelation of already-Catalyst rows — the
    * zero-job dual of `parallelize + internalCreateDataFrame` for
    * DRIVER-COMPUTED results: LocalRelation carries accurate size
    * statistics (so downstream joins broadcast it without hints) and
    * collect-style consumers read it without scheduling a job. Rows
    * must be in Catalyst form and immutable (GenericInternalRow with
    * copied values). */
  def localRelationDataFrame(
      spark: SparkSession,
      rows: Seq[InternalRow],
      schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema)
    org.apache.spark.sql.classic.Dataset.ofRows(
      cs, org.apache.spark.sql.catalyst.plans.logical.LocalRelation(attrs, rows))
  }

  /** A plain-message AnalysisException (the string constructor is
    * `protected[sql]`) for function-builder arity/argument errors. */
  def analysisError(message: String): org.apache.spark.sql.AnalysisException =
    new org.apache.spark.sql.AnalysisException(
      message = message,
      line = None,
      startPosition = None,
      cause = None,
      errorClass = None,
      messageParameters = Map.empty,
      context = Array.empty)
}
