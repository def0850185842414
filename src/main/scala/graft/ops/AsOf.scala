package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

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
  * one task — [[asofBackwardBucketed]] is the escape hatch for that
  * shape (parity-pinned in AsOfSpec, skew row measured in
  * COVERAGE.md). */
object AsOf {

  private def requireNoReservedCols(left: DataFrame, right: DataFrame): Unit = {
    val names = Set("__side", "__p", "__pp", "__epoch", "__mt", "__pb", "__pf", "__bt", "__ft")
    val reserved = (c: String) => names.contains(c) || c.startsWith("__v_")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct.toSeq
    require(clash.isEmpty,
      s"input columns $clash collide with reserved internal names (${names.mkString(", ")}, __v_*)")
  }

  private def validateAndTag(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String]
  ): (Seq[String], DataFrame) = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "need key and value columns")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns $valueCols collide with left columns")
    // fail fast instead of silently corrupting the union/window when an
    // input already carries one of the internal tagging columns
    requireNoReservedCols(left, right)
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((keyCols.map(col) :+ col(timeCol) :+ col("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // unionByName fills the left-only columns with NULL on the right side
    (leftCols, l.unionByName(r, allowMissingColumns = true))
  }

  // carry ONE struct, not per-column lasts: independent per-column
  // carries could stitch values from DIFFERENT right rows when a
  // payload column is legitimately NULL. The struct is NULLed on left
  // rows (a struct of nulls is itself non-null) so ignoreNulls skips
  // them.
  private def rightPayload(valueCols: Seq[String]): Column =
    when(col("__side") === 0, struct(valueCols.map(c => col(s"__v_$c").as(c)): _*))

  private def asofDirectional(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      backward: Boolean,
      tolerance: Option[Long]
  ): DataFrame = {
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val (leftCols, tagged) = validateAndTag(left, right, keyCols, timeCol, valueCols)
    // tie order puts the exact-time right row INSIDE the frame for both
    // directions: right before left going backward, left before right
    // going forward — the `<=`/`>=` inclusive bound (DuckDB ASOF)
    val w0 = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, if (backward) col("__side").asc else col("__side").desc)
    val w =
      if (backward) w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def pick(c: Column): Column =
      if (backward) last(c, ignoreNulls = true).over(w)
      else first(c, ignoreNulls = true).over(w)
    val carried = tagged.withColumn("__p", pick(rightPayload(valueCols)))
    // the matched right TIME rides a second window expression over the
    // SAME frame — null on exactly the same rows as the payload, so both
    // picks land on the same right row
    val withT = tolerance.fold(carried)(_ =>
      carried.withColumn("__mt", pick(when(col("__side") === 0, col(timeCol)))))
    val proj = valueCols.map { c =>
      val v = col("__p").getField(c)
      tolerance.fold(v) { tol =>
        val dist =
          if (backward) col(timeCol) - col("__mt") else col("__mt") - col(timeCol)
        when(col("__mt").isNotNull && dist <= tol, v)
      }.as(c)
    }
    withT
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ proj: _*)
  }

  /** Backward as-of join. `valueCols` are the right-side payload
    * columns to carry (emitted under the same names); left columns pass
    * through unchanged. Left rows with no earlier right row get NULL
    * payloads (LEFT semantics). `tolerance` (same unit as `timeCol`)
    * additionally nulls matches STALER than that — the max-staleness
    * bound of pandas `merge_asof(tolerance=...)`. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame =
    asofDirectional(left, right, keyCols, timeCol, valueCols, backward = true, tolerance)

  /** FORWARD as-of join — for every left row, the payload of the
    * EARLIEST right row with `right.time >= left.time` on the same key
    * (inclusive — a right row at exactly left.time matches). The mirror
    * of [[asofBackward]]: same single-shuffle union-tag recipe with the
    * tie order reversed and `first(_, ignoreNulls)` over the forward
    * frame. pandas `merge_asof(direction="forward")` semantics. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame =
    asofDirectional(left, right, keyCols, timeCol, valueCols, backward = false, tolerance)

  /** NEAREST as-of join — the closer in time of the backward and
    * forward matches; exact ties (including an exact-time right row,
    * distance 0) resolve BACKWARD, deterministically. pandas
    * `merge_asof(direction="nearest")` semantics. `tolerance` bounds
    * the accepted distance on both sides.
    *
    * One shuffle, one sort: both directions are window expressions over
    * the same (key) partitioning and (time, side) order — the forward
    * pick uses the forward frame on the BACKWARD tie order, which
    * excludes an exact-time right row from the forward frame, but that
    * row is the backward match at distance 0 and distance 0 always wins
    * backward, so the result is unaffected. */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None
  ): DataFrame = {
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0, got $t"))
    val (leftCols, tagged) = validateAndTag(left, right, keyCols, timeCol, valueCols)
    val w0 = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
    val wB = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val payload = rightPayload(valueCols)
    val matchedT = when(col("__side") === 0, col(timeCol))
    // all four picks in ONE projection → a single Window node (chained
    // withColumn left four stacked WindowExecs, each buffering the
    // partition rows once)
    val carried = tagged.select(
      col("*"),
      last(payload, ignoreNulls = true).over(wB).as("__pb"),
      last(matchedT, ignoreNulls = true).over(wB).as("__bt"),
      first(payload, ignoreNulls = true).over(wF).as("__pf"),
      first(matchedT, ignoreNulls = true).over(wF).as("__ft"))
    val distB = col(timeCol) - col("__bt")
    val distF = col("__ft") - col(timeCol)
    val okB = col("__bt").isNotNull && tolerance.fold(lit(true))(t => distB <= t)
    val okF = col("__ft").isNotNull && tolerance.fold(lit(true))(t => distF <= t)
    val useB = okB && (!okF || distB <= distF)
    val proj = valueCols.map { c =>
      when(useB, col("__pb").getField(c))
        .when(okF, col("__pf").getField(c))
        .as(c)
    }
    carried
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ proj: _*)
  }

  /** Skew-proof backward as-of join — identical results to
    * [[asofBackward]] (AsOfSpec pins parity), built for a DOMINANT KEY:
    * the plain form's window partitions on the key columns, so one key
    * holding most rows serializes into one task. Here time is bucketed
    * into `bucketWidth`-sized epochs and the big window is replaced by
    * a (key, epoch)-partitioned one, so a hot key fans out across its
    * epochs.
    *
    * Two passes:
    *  1. per-(key, epoch) LAST right payload (one map-side-combinable
    *     aggregate), then a carry-in per epoch via a window over the
    *     (key, DISTINCT epoch) spine — at most (keys × epochs) rows,
    *     orders of magnitude below the raw row count;
    *  2. union carry-in boundary rows (sorted first via NULL time) +
    *     right + left inside each (key, epoch) partition, one
    *     `last(_, ignoreNulls)` scan — the asofBackward recipe with the
    *     hot key split epoch-wise.
    *
    * Same tie semantics (right at exactly left.time wins; right side
    * unique per (key, time) by contract). Costs two extra small
    * exchanges (spine + epoch aggregate), so the plain form stays the
    * default; pick `bucketWidth` so a hot key's rows spread over
    * hundreds of epochs (e.g. an hour of event time). */
  def asofBackwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      valueCols: Seq[String],
      bucketWidth: Long
  ): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "need key and value columns")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      s"value columns $valueCols collide with left columns")
    requireNoReservedCols(left, right)
    // floor-division epoch, exact on longs incl. negatives (pmod >= 0).
    // TRUE integral division: `/` on longs is DOUBLE division, inexact
    // past 2^53 — a nanosecond timestamp (~1.7e18) at a small
    // bucketWidth could land a boundary row in the wrong epoch and
    // silently break parity with asofBackward.
    def epochOf(t: Column): Column =
      Bridge.column(IntegralDivide(
        Bridge.expression(t - pmod(t, lit(bucketWidth))),
        Bridge.expression(lit(bucketWidth))))

    val payloadT = struct(valueCols.map(c => col(s"__v_$c").as(c)): _*)
    val keyE = keyCols :+ "__epoch"

    val r = right
      .select((keyCols.map(col) :+ col(timeCol)) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
      .withColumn("__epoch", epochOf(col(timeCol)))
    // pass 1a: last right payload per (key, epoch) — right is unique
    // per (key, time) by contract, so max_by on time is deterministic
    val rLast = r
      .groupBy(keyE.map(col): _*)
      .agg(max_by(payloadT, col(timeCol)).as("__p_in_epoch"))
    // pass 1b: carry-in per epoch over the DISTINCT-epoch spine (both
    // sides contribute epochs: a left row in an all-quiet epoch still
    // needs the carry from earlier epochs)
    val spine = left
      .select(keyCols.map(col) :+ epochOf(col(timeCol)).as("__epoch"): _*)
      .union(r.select(keyE.map(col): _*))
      .distinct()
    val wCarry = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__epoch").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = spine
      .join(rLast, keyE, "left")
      .withColumn("__p", last(col("__p_in_epoch"), ignoreNulls = true).over(wCarry))
      .drop("__p_in_epoch")

    // pass 2: the asofBackward union-tag scan, per (key, epoch). The
    // payload STRUCT is built per side BEFORE the union — a carry-in
    // whose struct is non-null but all-null-fielded (a legitimate
    // all-null right payload) stays a real carry, exactly like the
    // plain form; a NULL struct (no earlier right row) is skipped by
    // ignoreNulls. Carry rows get NULL time + side -1 → sorted first.
    val timeType = left.schema(timeCol).dataType
    val carryRows = carryIn.select(
      keyE.map(col) :+ lit(null).cast(timeType).as(timeCol) :+
        lit(-1).as("__side") :+ col("__p").as("__pp"): _*)
    val rTagged = r.select(
      keyE.map(col) :+ col(timeCol) :+ lit(0).as("__side") :+ payloadT.as("__pp"): _*)
    val lTagged = left
      .withColumn("__epoch", epochOf(col(timeCol)))
      .withColumn("__side", lit(1))
      .withColumn("__pp", lit(null).cast(rTagged.schema("__pp").dataType))
    val tagged = lTagged
      .unionByName(rTagged, allowMissingColumns = true)
      .unionByName(carryRows, allowMissingColumns = true)
    val w = Window
      .partitionBy(keyE.map(col): _*)
      .orderBy(col(timeCol).asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("__p", last(col("__pp"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col("__p").getField(c).as(c)): _*)
  }
}
