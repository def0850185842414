package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance — the two table-maintenance
  * primitives a 100 TB lakehouse ingest needs between the raw
  * changelog and the query-able table:
  *
  *  - [[compact]]: changelog → latest snapshot. Per key, the row with
  *    the highest (ordering columns) wins; a winning delete marker
  *    removes the key entirely. This is the merge-on-read compaction
  *    every upsert table (Hudi/Iceberg/Delta-class) runs, expressed as
  *    ONE map-side-combinable `max(struct(...))` aggregate — the
  *    classic `row_number() = 1` respelling materializes and sorts
  *    every version of every key after the exchange, while the argmax
  *    aggregate reduces each key to one buffered row BEFORE the
  *    shuffle (partial aggregation), so the exchange carries O(keys),
  *    not O(versions).
  *  - [[scd2]]: changelog → type-2 slowly-changing-dimension history.
  *    Every version row gets its validity interval
  *    `[valid_from, valid_to)` — `valid_to` is the key's next change
  *    (NULL while current). ONE key exchange + a codegen'd `lead`
  *    window.
  *
  * Ordering contract: `ordCols` must totally order each key's versions
  * (e.g. a change timestamp plus a unique change id as tie-break).
  * With a total order both operators are deterministic under any
  * partitioning — `compact`'s struct-max is commutative and `scd2`'s
  * window frame is unambiguous. NULLs in `ordCols` are rejected up
  * front: struct-max orders NULL low while SQL window `ORDER BY ... DESC`
  * puts NULL high, so a null version stamp would silently diverge
  * between engines instead of failing loud.
  *
  * Scale: both are bounded by the natural key/version cardinality —
  * no self-join, no driver state. A hot key (one entity receiving a
  * disproportionate share of updates) degrades `compact` not at all
  * (partial aggregation absorbs it map-side) and `scd2` into one big
  * sorted partition (inherent to emitting per-version intervals; the
  * [[AsOf]] bucketed recipe applies if a key's history alone outgrows
  * a task).
  */
object Changelog {

  private def noNullOrd(df: DataFrame, ordCols: Seq[String]): DataFrame = {
    val anyNull = ordCols.map(c => col(c).isNull).reduce(_ || _)
    // assert-shaped: evaluated inside the plan (no extra action) — a
    // changelog with a null version stamp is a producer bug, and letting
    // it through would make version order engine-dependent (struct-max
    // sorts NULL low, SQL DESC windows sort it high).
    df.where(when(anyNull, raise_error(lit(
      s"Changelog: NULL in ordering column(s) ${ordCols.mkString(",")}")))
      .otherwise(lit(true)))
  }

  /** Latest-snapshot compaction of a changelog. Per distinct value of
    * `keyCols`, selects the row with the lexicographically greatest
    * `ordCols` tuple; if that row's `opCol` is in `deleteOps` the key
    * is dropped (tombstone wins). Output columns: `keyCols ++ ordCols
    * ++ payload` (every other input column, `opCol` included), one row
    * per surviving key.
    *
    * Plan shape: one partial-aggregating exchange on the key; the
    * argmax rides a single `max(struct(ord..., payload...))`, so
    * per-key state is ONE row at every stage.
    */
  def compact(
      changes: DataFrame,
      keyCols: Seq[String],
      ordCols: Seq[String],
      opCol: String,
      deleteOps: Set[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "compact needs at least one key column")
    require(ordCols.nonEmpty, "compact needs at least one ordering column")
    require(deleteOps.nonEmpty, "compact needs at least one delete op marker")
    val payload = changes.columns.filterNot((keyCols ++ ordCols).contains).toSeq
    val winner = struct((ordCols ++ payload).map(col): _*)
    noNullOrd(changes, ordCols)
      .groupBy(keyCols.map(col): _*)
      .agg(max(winner).as("__w"))
      .select(keyCols.map(col) ++ (ordCols ++ payload).map(c => col(s"__w.$c").as(c)): _*)
      .where(!col(opCol).isin(deleteOps.toSeq: _*))
  }

  /** Row-level diff between two table snapshots — the audit/regression
    * primitive between two builds of a curated dataset ("what changed
    * since yesterday's snapshot"). Per key present in either side:
    * `change ∈ {added, removed, changed, unchanged}` with both sides'
    * payloads (NULL on the absent side). Payload comparison is
    * null-safe (`<=>` per column), so a column going NULL is
    * `changed`, not silently equal.
    *
    * ONE full-outer equi-join on the key — both sides shuffle once,
    * bounded by their row counts; no window, no driver state. Callers
    * that only need counts aggregate `change` afterwards (map-side
    * combinable).
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keyCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"snapshot schemas differ: ${oldSnap.columns.mkString(",")} vs ${newSnap.columns.mkString(",")}")
    val payload = oldSnap.columns.filterNot(keyCols.contains).toSeq
    val o = oldSnap.select(
      keyCols.map(col) ++ payload.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__in_old"): _*)
    val n = newSnap.select(
      keyCols.map(col) ++ payload.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__in_new"): _*)
    val samePayload = payload
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceOption(_ && _)
      .getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .withColumn(
        "change",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(samePayload, lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__in_old", "__in_new")
  }

  /** Type-2 SCD history: every change row becomes a version with
    * `valid_from` (its own `tsCol`), `valid_to` (the key's next
    * `tsCol`, NULL for the current version) and `is_current`. Ties on
    * `tsCol` within a key are rejected via the `tieCols` total-order
    * contract: `tieCols` extend the window ordering so simultaneous
    * changes get a deterministic sequence (each version's `valid_to`
    * is the next version's `valid_from`, zero-width intervals
    * allowed).
    */
  def scd2(
      changes: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String] = Nil
  ): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    noNullOrd(changes, tsCol +: tieCols)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
