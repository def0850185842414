package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic keyed backward AS-OF join — for every left row, the payload
  * of the LATEST right row with `right.time <= left.time` on the same
  * key (the point-in-time lookup behind feature attribution, price
  * snapshots, "state at event time"). Spark has no native as-of join;
  * the naive spellings are a range join (Catalyst executes it as a
  * broadcast-nested-loop — the banned plan) or a per-row subquery.
  *
  * The scalable spelling here is UNION-TAG + ONE WINDOW: tag right rows
  * 0 and left rows 1, union on (key, time, tag) order, and carry the
  * last non-null right payload forward with `last(_, ignoreNulls)` —
  * a single shuffle on the key columns, sorted once within partitions,
  * linear scan, no join at all. Right rows at exactly left.time sort
  * BEFORE the left row (tag order), so the `<=` bound is inclusive —
  * DuckDB `ASOF JOIN` semantics, which is exactly what the oracle runs.
  *
  * Ties: callers must make the right side unique per (key, time) (a
  * `groupBy(key, time).agg(...)` pre-step) — with duplicates the
  * carried row is the last in an unspecified intra-tie order, the same
  * ambiguity DuckDB has. Skew note: the window partitions on the key
  * columns, so cardinality = keys; a single dominant key degrades to
  * one task — for that shape, pre-bucket time into (key, epoch) spans
  * the way [[Mixture]]'s two-pass budget recipe does. */
object AsOf {

  /** Backward as-of join. `valueCols` are the right-side payload
    * columns to carry (emitted under the same names); left columns pass
    * through unchanged. Left rows with no earlier right row get NULL
    * payloads (LEFT semantics). */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "need key and value columns")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns $valueCols collide with left columns")
    // fail fast instead of silently corrupting the union/window when an
    // input already carries one of the internal tagging columns
    val reserved = (c: String) => c == "__side" || c == "__p" || c.startsWith("__v_")
    val clash = (leftCols ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty,
      s"input columns $clash collide with reserved internal names (__side, __p, __v_*)")
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col(timeCol) :+ col("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // unionByName fills the left-only columns with NULL on the right side
    val tagged = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct, not per-column lasts: independent per-column
    // carries could stitch values from DIFFERENT right rows when a
    // payload column is legitimately NULL. The struct is NULLed on left
    // rows (a struct of nulls is itself non-null) so ignoreNulls skips
    // them.
    val payload = when(
      col("__side") === 0,
      struct(valueCols.map(c => col(s"__v_$c").as(c)): _*))
    val carried = tagged
      .withColumn("__p", last(payload, ignoreNulls = true).over(w))
    carried
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
