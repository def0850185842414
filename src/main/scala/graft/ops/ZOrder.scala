package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Z-order (Morton) data-layout clustering — the lakehouse OPTIMIZE
  * ZORDER primitive: multi-column locality for parquet min/max
  * pruning. A table range-partitioned and sorted by a single column
  * prunes scans on THAT column only; interleaving the bits of several
  * quantized columns gives every one of them bounded value ranges per
  * file/row-group, so a multi-dimensional box predicate skips most of
  * the data at scan time (measured in ZOrderBench: rows actually
  * materialized by the parquet reader under a 2-D box drop ~20× vs a
  * time-sorted layout).
  *
  * Everything here is pure integer Column arithmetic (codegen'd, no
  * UDF, overflow-free by construction):
  *  - [[quantize]] maps a value range onto [0, 2^bits) with a DIVISION
  *    ONLY spelling — `(v - mn) div step` where
  *    `step = (range div 2^bits) + 1` — so no multiplication can
  *    overflow under ANSI mode no matter the input magnitudes
  *    (timestamps in micros included).
  *  - [[interleave]] assembles the Morton code with shift/and/or
  *    chains; `n·bits ≤ 63` keeps the result in a non-negative LONG.
  *
  * At 100 TB the layout step is one range-exchange on the z-value
  * (Spark's repartitionByRange samples boundaries distributively);
  * after that every downstream box scan prunes. The same z-value also
  * serves as a space-filling sort key for block-range indexes.
  */
object ZOrder {

  /** True integral division at the Column level (`a div b` — `/` on
    * longs yields DOUBLE, lossy past 2^53, a real hazard for µs
    * timestamps). */
  private def intDiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  /** `(v - mn) div step` with `step = ((mx - mn) div 2^bits) + 1`:
    * monotone map of [mn, mx] onto [0, 2^bits) using only subtraction
    * and division — immune to ANSI overflow for any long range. The
    * subtractions run in DECIMAL(21,0): a long-long difference can
    * exceed Long range itself (span up to 2^64 − 1 for hash-valued or
    * sentinel-laden columns — ANSI would throw, non-ANSI wraps to a
    * garbage layout); decimal keeps the difference exact and
    * IntegralDivide accepts decimal operands, returning LONG. NULLs
    * propagate (NULL quantizes to NULL; callers decide placement). */
  def quantize(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
    val dec = "decimal(21,0)"
    val step = intDiv(mx.cast(dec) - mn.cast(dec), lit(1L << bits)) + lit(1L)
    intDiv(v.cast(dec) - mn.cast(dec), step)
  }

  /** Morton-interleave already-quantized non-negative columns (each
    * < 2^bits): result bit `i*n + j` is bit `i` of `qs(j)`, so the
    * low bits of every dimension land in the low bits of the code —
    * nearby codes are nearby in EVERY dimension. */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    val n = qs.size
    require(n >= 1, "interleave needs at least one column")
    require(n * bits <= 63, s"n*bits must fit a signed long: $n*$bits > 63")
    val terms = for {
      i <- 0 until bits
      (q, j) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** ceil(log2(range+1)) — the bit-width the quantized offset of a
    * [0, range] column actually occupies (range 0 ⇒ 1). */
  def effectiveBits(range: Long): Int = {
    require(range >= 0, s"range must be >= 0, got $range")
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(range))
  }

  /** Morton-interleave with PER-DIMENSION widths, aligned at the MSB:
    * level 0 takes every dimension's top bit, level 1 the next, and a
    * dimension whose width is exhausted simply stops contributing.
    * This is what makes z-ordering work on mixed-cardinality keys — a
    * uniform-width interleave of a 10-bit user id against a 16-bit
    * timestamp leaves the code's six top bits timestamp-only (the
    * user lane is zero up there), so coarse file splits degenerate to
    * a plain time sort and the layout prunes nothing on users
    * (measured: the first ZOrderBench run read MORE rows than the
    * linear layout). MSB alignment restores the alternation at every
    * granularity. */
  def interleaveWidths(qs: Seq[Column], widths: Seq[Int]): Column = {
    require(qs.nonEmpty && qs.size == widths.size, "one width per column")
    val total = widths.sum
    require(total <= 63, s"sum of widths must fit a signed long: $total > 63")
    val maxW = widths.max
    var outPos = total
    // within a level, higher dim index takes the higher bit — the same
    // convention as the uniform [[interleave]] (bit i*n + j)
    val terms = for {
      l <- 0 until maxW
      j <- qs.indices.reverse
      if l < widths(j)
    } yield {
      outPos -= 1
      shiftleft(shiftright(qs(j), widths(j) - 1 - l).bitwiseAND(lit(1L)), outPos)
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The DuckDB spelling of [[quantize]]+[[interleave]] over column
    * expressions `vs` with bounds CTE fields `mn_j`/`mx_j` — kept next
    * to the implementation so the oracle and the engine can never
    * drift structurally. */
  def interleaveSql(vs: Seq[String], mns: Seq[String], mxs: Seq[String], bits: Int): String = {
    val qs = vs.indices.map { j =>
      s"((${vs(j)} - ${mns(j)}) // ((((${mxs(j)} - ${mns(j)}) // ${1L << bits}) + 1)))"
    }
    val n = vs.size
    val terms = for {
      i <- 0 until bits
      j <- 0 until n
    } yield s"(((${qs(j)} >> $i) & 1) << ${i * n + j})"
    terms.mkString(" | ")
  }

  /** Compute the z-value for `cols` of `df` using collected min/max
    * bounds (one O(1) aggregate job — the J5 broadcast-scalar pattern;
    * bounds are two longs per column, never a join). Adds `zCol`.
    * `balanced = true` (the layout default) interleaves each column at
    * its [[effectiveBits]] width, MSB-aligned; `false` is the uniform
    * `bits`-per-dimension kernel the SQL oracle mirrors. */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      zCol: String = "z",
      balanced: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one z-order column")
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, j) =>
      require(!bounds.isNullAt(2 * j) && !bounds.isNullAt(2 * j + 1),
        s"z-order column '$c' has no non-NULL values (empty input?) — cannot quantize")
    }
    val ranges = cols.indices.map(j => bounds.getLong(2 * j + 1) - bounds.getLong(2 * j))
    val widths =
      // a wrapped (negative) difference means the true span exceeds
      // Long range (≥ 2^63) — every bit is live, so the effective
      // width is 64 (capped to `bits` below, which is ≤ 62)
      if (balanced) ranges.map(r => math.min(bits, if (r < 0) 64 else effectiveBits(r)))
      else Seq.fill(cols.size)(bits)
    val qs = cols.zipWithIndex.map { case (c, j) =>
      quantize(col(c).cast("long"), lit(bounds.getLong(2 * j)), lit(bounds.getLong(2 * j + 1)), widths(j))
    }
    df.withColumn(zCol,
      if (balanced) interleaveWidths(qs, widths) else interleave(qs, bits))
  }

  /** Rewrite `df` into a z-clustered layout: range-partition on the
    * z-value (distributed boundary sampling — no single-task sort) and
    * sort within each partition, so every output file covers a compact
    * z-range ⇒ a compact range in EVERY interleaved dimension ⇒
    * parquet min/max stats prune multi-dimensional box predicates.
    * The z column itself is dropped from the output (layout-only). */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int, numPartitions: Int): DataFrame = {
    val z = withZValue(df, cols, bits, balanced = true)
    z.repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
  }

  /** Z-clustered parquet SINK — [[clusterByZ]] wired into a write: the
    * shard-writer layout option for tables whose hot queries are
    * multi-dimensional boxes (channel × time, user × time,
    * domain × fetch-time). Compared to `partitionBy(keyCol)` it trades
    * exact key-directory pruning for row-group stats pruning on EVERY
    * interleaved dimension while writing exactly `numFiles` files — at
    * scale the difference between |keys| × |sessions| small files (the
    * classic tiny-file explosion a 1024-channel store hits) and a flat
    * bounded layout with the same pruning class (measured:
    * ChannelZOrderBench / COVERAGE.md). */
  def writeClustered(
      df: DataFrame,
      outDir: String,
      cols: Seq[String],
      bits: Int,
      numFiles: Int): Unit =
    clusterByZ(df, cols, bits, numFiles)
      .write
      .mode("overwrite")
      .parquet(outDir)
}
