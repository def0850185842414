package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-timestamp handling (U2/A5): the reference KEEPS THE FIRST
  * occurrence of a duplicated timestamp and drops the rest
  * (jagular/utils.py:330-338). Spark's `dropDuplicates` keeps an arbitrary
  * row, so "first" needs an explicit deterministic tiebreak (file rank,
  * packet position, event id...) — `row_number` over (key, tiebreak).
  *
  * Scale: one shuffle on the dup key; no global ordering required.
  */
object Dedup {

  /** Keep the first row per `key`, "first" = min by `tiebreak` columns. */
  def keepFirst(df: DataFrame, key: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(tiebreak.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate report (A5, jagular/utils.py:80-113): keys occurring more
    * than once with their multiplicity. */
  def duplicates(df: DataFrame, key: Seq[String]): DataFrame =
    df.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)
}
