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
