package graft.io.rec

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{UnsafeArrayWriter, UnsafeRowWriter}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max => AggMax, Min => AggMin}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.io.RecFormat

/** DataSource V2 for SpikeGadgets `.rec` recordings:
  * `spark.read.format("rec").load(paths...)`.
  *
  * Schema: `(file_rank int, pos long, ts long, values array<short>)` —
  * the same stitched-scan surface as [[graft.io.RecScan.read]], as a
  * first-class Catalyst source with the optimizations a 100 TB scan
  * needs:
  *
  *  - **Packet-aligned splits**: packets are fixed-size after the XML
  *    prefix, so one file fans out across executors
  *    (`targetSplitBytes`, default 128 MiB).
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): a query
  *    touching only `ts` never materializes the 100+-channel samples
  *    array (prune-at-decode, reference: jagular/readers.py:341).
  *  - **Timestamp-range pushdown** (`SupportsPushDownFilters`): `ts`
  *    bounds prune whole files via the 2-packet bounds catalog
  *    (reference: readers.py:180-213), then BINARY-SEARCH the packet
  *    index inside each surviving file (O(log n) seeks on the driver) so
  *    only the matching packet range is split and scanned. Valid because
  *    the reference enforces non-decreasing timestamps within a file
  *    (jagular/utils.py:323-328); filters are still re-evaluated by
  *    Spark above the scan (pruning is an optimization, not the
  *    correctness gate).
  *  - **Statistics** (`SupportsReportStatistics`): post-pruning
  *    byte/row counts, so AQE and join planning see the real scan size.
  *
  *  - **Columnar reads**: the batch scan emits `ColumnarBatch`es of
  *    OnHeapColumnVectors (4096 packets/batch), so Spark's vectorized
  *    ColumnarToRow codegen replaces the per-row reader loop — the
  *    row-iterator virtual-call overhead was the residual between the
  *    1.3–2.1 GB/s decode kernel and the ~1 GB/s DataFrame scan
  *    (ScanProbe). `columnar=false` restores the row reader (A/B
  *    surface; also exercised by RecV2Spec for parity).
  *
  * Options: `channels` = comma-separated spike-channel indices to keep
  * (projection into the workspace document order, reference:
  * jagular/utils.py:430-431); `targetSplitBytes`; `columnar`.
  */
class RecDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "rec"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.io.RecScan.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table =
    new RecTable(RecDataSourceV2.paths(new CaseInsensitiveStringMap(properties)))
}

object RecDataSourceV2 {
  /** `.load(p1, p2, ...)` arrives as a JSON-array `paths` option;
    * `.load(p)` as `path`. */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val many = Option(options.get("paths")).map { js =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readValue(js, classOf[Array[String]]).toSeq
    }
    val one = Option(options.get("path")).map(Seq(_))
    many.orElse(one).getOrElse(Seq.empty)
  }

  /** Inverse of [[paths]] for callers that must pass several paths where
    * the reader API takes none (e.g. `DataStreamReader.load()`): the
    * JSON-array `paths` option value. Keeping encode and decode side by
    * side keeps the wire format in one place. */
  def pathsOption(ps: Seq[String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(ps.toArray)
  }

  /** Expand → parse → count, ONCE. One ScanBuilder computes this a single
    * time and shares it between the aggregate-pushdown probe and the scan
    * it builds — re-listing per consumer would double driver-side IO on a
    * large remote path set and open a TOCTOU window between probe and
    * catalog. */
  def listCounts(
      raw: Seq[String],
      hconf: org.apache.hadoop.conf.Configuration
  ): Seq[(RecFormat.RecConfig, Long)] =
    expandPaths(raw, hconf)
      .map(p => RecFormat.parseConfig(p, hconf))
      .map(c => (c, RecFormat.packetCount(c, hconf)))

  /** The shared planning pipeline over a pre-computed [[listCounts]]
    * listing: bounds-probe → stitched (first-ts) sort, skipping
    * zero-packet files (config written, no complete packet yet — they
    * contribute no rows, and the bounds probe needs a whole packet).
    * Returns `(cfg, packetCount, (firstTs, lastTs))` in rank order.
    *
    * `verifyBounds` asserts `first <= last` per file — the O(1) necessary
    * condition of the non-decreasing-timestamp invariant. Pass it
    * whenever the CONSUMER trusts the bounds beyond mere ordering
    * (ts-range pruning, catalog MIN/MAX aggregates); leave it false for
    * an unfiltered row scan, which reads every packet and is complete
    * regardless of ordering — that unfiltered scan is the documented
    * repair path for a broken file and must stay readable. */
  def rankedBounds(
      counts: Seq[(RecFormat.RecConfig, Long)],
      hconf: org.apache.hadoop.conf.Configuration,
      verifyBounds: Boolean,
      consumer: String
  ): Seq[(RecFormat.RecConfig, Long, (Long, Long))] =
    counts
      .filter(_._2 > 0)
      .map { case (c, total) =>
        val bounds @ (first, last) = RecFormat.timestampBounds(c, hconf)
        if (verifyBounds)
          require(
            first <= last,
            s"${c.path}: first ts $first > last ts $last — file violates the " +
              s"non-decreasing-timestamp invariant (jagular/utils.py:323-328) that $consumer " +
              "relies on; re-read the file unfiltered and repair ordering first " +
              "(graft.ts.Validation / Dedup)"
          )
        (c, total, bounds)
      }
      .sortBy(_._3._1)

  /** Directory load paths expand to their current `*.rec` members
    * (lexicographic). Batch expands ONCE at scan planning; the streaming
    * source re-lists per `latestOffset` to pick up session rollover.
    * Member paths keep their full scheme/authority (`getPath.toString`,
    * not the scheme-stripping `toUri.getPath`) so non-default
    * filesystems — s3a://, hdfs:// — resolve correctly downstream. */
  def expandPaths(
      raw: Seq[String],
      hconf: org.apache.hadoop.conf.Configuration
  ): Seq[String] = raw.flatMap { p =>
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(hconf)
    if (fs.getFileStatus(path).isDirectory)
      fs.listStatus(path)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".rec"))
        .map(_.getPath.toString)
        .sorted
        .toSeq
    else Seq(p)
  }
}

class RecTable(paths: Seq[String]) extends Table with SupportsRead {
  require(paths.nonEmpty, "rec source needs at least one path")
  override def name(): String = s"rec(${paths.mkString(",")})"
  override def schema(): StructType = graft.io.RecScan.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RecScanBuilder(paths, options)
}

class RecScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = graft.io.RecScan.schema
  private var tsMin: Option[Long] = None
  private var tsMax: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var aggSpec: Option[RecAggSpec] = None

  private lazy val hconf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
  // ONE directory expansion + config parse + packet count per ScanBuilder,
  // shared by the pushAggregation probe and whichever scan build() makes
  // (no doubled listing IO, no TOCTOU between probe and catalog)
  private lazy val counts: Seq[(RecFormat.RecConfig, Long)] =
    RecDataSourceV2.listCounts(paths, hconf)

  /** COUNT(*) / MIN(ts) / MAX(ts), optionally grouped by file_rank,
    * answered from the 2-packet bounds catalog (reference: A1/A2 session
    * summary, jagular/io.py:160-193) — ZERO packet decode. At 100 TB this
    * turns a full-corpus session summary into O(files) driver-side seeks.
    * Partial-pushdown semantics: one pre-aggregated row per file; Spark
    * plans the final merge (sum of counts, min of mins, ...), so
    * correctness never depends on this scan seeing every file in one
    * task. Only fires on an unfiltered scan: Spark skips aggregate
    * pushdown itself when post-scan filters remain, and the tsMin/tsMax
    * guard keeps the contract explicit.
    *
    * CONTRACT: MIN/MAX(ts) from the first/last-packet probes is exact
    * only under the reference-enforced non-decreasing-timestamp invariant
    * (jagular/utils.py:323-328) — the same invariant ts-range pruning
    * binary-searches on. COUNT(*) is invariant-free (pure file size). A
    * file with an interior ts dip would make the probe answer wrong
    * without touching a packet that could detect it, so for suspect data
    * set option `aggPushdown=false` to force the full-scan aggregate (an
    * unfiltered scan is always complete), or run `graft.ts.Validation`
    * first. (A ts-FILTERED read fails loudly on a violation in any
    * region it actually scans — boundary-seeded reader guard — but a
    * whole-file prune can skip the offending region without detecting
    * it: pruning under a violated write-side invariant is inherently
    * best-effort.)
    *
    * Ungrouped COUNT over a catalog with NO packet-bearing files is
    * declined: zero partial rows would final-aggregate to NULL where the
    * full scan correctly returns 0 (empty MIN/MAX are NULL either way,
    * and a grouped aggregate over zero files is correctly empty). */
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (tsMin.nonEmpty || tsMax.nonEmpty) return false
    if (Option(options.get("aggpushdown")).exists(_.equalsIgnoreCase("false"))) return false
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case n: NamedReference if n.fieldNames.length == 1 => Some(n.fieldNames()(0))
        case _ => None
      }
    val groupOk = agg.groupByExpressions.forall(e => fieldOf(e).contains("file_rank"))
    val ops = agg.aggregateExpressions.map {
      case _: CountStar => "count"
      case m: AggMin if fieldOf(m.column).contains("ts") => "min_ts"
      case m: AggMax if fieldOf(m.column).contains("ts") => "max_ts"
      case _ => return false
    }
    if (!groupOk || ops.isEmpty) return false
    if (agg.groupByExpressions.isEmpty && ops.contains("count")) {
      if (!counts.exists(_._2 > 0)) return false
    }
    aggSpec = Some(RecAggSpec(agg.groupByExpressions.nonEmpty, ops.toSeq))
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = filters.filter {
      case GreaterThan("ts", v: Long) => tsMin = Some(max(tsMin, v + 1)); true
      case GreaterThanOrEqual("ts", v: Long) => tsMin = Some(max(tsMin, v)); true
      case LessThan("ts", v: Long) => tsMax = Some(min(tsMax, v - 1)); true
      case LessThanOrEqual("ts", v: Long) => tsMax = Some(min(tsMax, v)); true
      case EqualTo("ts", v: Long) =>
        tsMin = Some(max(tsMin, v)); tsMax = Some(min(tsMax, v)); true
      case _ => false
    }
    pushed = usable
    // every filter stays a residual: pruning narrows the scan, Spark
    // still applies the predicate row-by-row above it
    filters
  }
  private def max(cur: Option[Long], v: Long) = cur.fold(v)(math.max(_, v))
  private def min(cur: Option[Long], v: Long) = cur.fold(v)(math.min(_, v))

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    aggSpec match {
      case Some(spec) => new RecCatalogAggScan(paths, counts, spec)
      case None =>
        val subset = Option(options.get("channels"))
          .map(_.split(",").map(_.trim.toInt))
        val split = Option(options.get("targetsplitbytes")).map(_.toLong).getOrElse(128L << 20)
        val columnar = !Option(options.get("columnar")).exists(_.equalsIgnoreCase("false"))
        val maxPerTrigger = Option(options.get("maxpacketspertrigger")).map(_.toLong)
        new RecScanV2(paths, () => counts, required, tsMin, tsMax, subset, split, columnar, maxPerTrigger)
    }
  }
}

/** Pushed-down aggregate shape: optional file_rank grouping + the agg ops
  * in Spark's requested order. */
case class RecAggSpec(groupByFileRank: Boolean, ops: Seq[String])

/** Scan answering a pushed-down COUNT(*)/MIN(ts)/MAX(ts) straight from the
  * per-file bounds catalog: one row per file, no packet IO beyond the
  * 2-packet probes [[RecFormat.timestampBounds]] already does at planning
  * time. Emitted rows are PARTIAL aggregates (Spark plans the final
  * merge). */
class RecCatalogAggScan(
    paths: Seq[String],
    counts: Seq[(RecFormat.RecConfig, Long)],
    spec: RecAggSpec
) extends Scan
    with Batch {

  private lazy val hconf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  /** Pre-aggregated rows over the ScanBuilder's shared listing. An
    * ungrouped COUNT-only aggregate is answered from file sizes alone —
    * COUNT is invariant-free, needs no ordering, and must not pay bounds
    * probes or fail their sanity check. Anything involving MIN/MAX(ts) or
    * a file_rank grouping trusts the bounds probes (ranks ARE the
    * first-ts sort), so those run with the first<=last verification on
    * (an unfiltered row scan with aggPushdown=false is the escape for a
    * file that fails it). */
  private lazy val catalog: Array[Array[Long]] =
    if (!spec.groupByFileRank && spec.ops.forall(_ == "count"))
      counts
        .map(_._2)
        .filter(_ > 0)
        .map(total => spec.ops.map(_ => total).toArray)
        .toArray
    else
      RecDataSourceV2
        .rankedBounds(counts, hconf, verifyBounds = true, consumer = "the catalog aggregates (set aggPushdown=false to full-scan)")
        .zipWithIndex
        .map { case ((_, total, (first, last)), rank) =>
          val row = Array.newBuilder[Long]
          if (spec.groupByFileRank) row += rank.toLong
          spec.ops.foreach {
            case "count" => row += total
            case "min_ts" => row += first
            case "max_ts" => row += last
          }
          row.result()
        }
        .toArray

  override def readSchema(): StructType = {
    val fields = Array.newBuilder[org.apache.spark.sql.types.StructField]
    if (spec.groupByFileRank)
      fields += org.apache.spark.sql.types.StructField("file_rank", org.apache.spark.sql.types.IntegerType, nullable = false)
    spec.ops.zipWithIndex.foreach { case (op, i) =>
      fields += org.apache.spark.sql.types.StructField(s"agg_${op}_$i", org.apache.spark.sql.types.LongType, nullable = false)
    }
    StructType(fields.result())
  }

  override def toBatch: Batch = this
  override def description(): String =
    s"rec catalog agg [${paths.size} files, group=${spec.groupByFileRank}, ops=${spec.ops.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RecCatalogAggPartition(catalog, spec.groupByFileRank))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[RecCatalogAggPartition]
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < p.rows.length }
          override def get(): InternalRow = {
            val src = p.rows(i)
            val vals = new Array[Any](src.length)
            var j = 0
            if (p.groupByFileRank) { vals(0) = src(0).toInt; j = 1 }
            while (j < src.length) { vals(j) = src(j); j += 1 }
            new GenericInternalRow(vals)
          }
          override def close(): Unit = ()
        }
      }
    }
}

/** The whole (tiny) catalog rides in the partition — no executor IO. */
case class RecCatalogAggPartition(rows: Array[Array[Long]], groupByFileRank: Boolean)
    extends InputPartition

/** One packet range of one file. */
case class RecInputPartition(
    cfg: RecFormat.RecConfig,
    fileRank: Int,
    startPacket: Long,
    count: Long
) extends InputPartition

class RecScanV2(
    paths: Seq[String],
    // thunk over the ScanBuilder's shared listing: batch planning reuses
    // it; the streaming path below never forces it (the stream re-lists
    // per micro-batch by design)
    counts: () => Seq[(RecFormat.RecConfig, Long)],
    required: StructType,
    tsMin: Option[Long],
    tsMax: Option[Long],
    channelSubset: Option[Array[Int]],
    targetSplitBytes: Long,
    columnar: Boolean = true,
    maxPacketsPerTrigger: Option[Long] = None
) extends Scan
    with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String
  ): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RecMicroBatchStream(paths, required, channelSubset, targetSplitBytes, maxPacketsPerTrigger)
  override def description(): String =
    s"rec scan [${paths.size} files, ts in [${tsMin.getOrElse("-inf")}, ${tsMax.getOrElse("+inf")}], " +
      s"cols ${required.fieldNames.mkString(",")}]"

  // ---- driver-side planning: bounds catalog + binary-search pruning ----

  private lazy val hconf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  /** Files in stitched (start-ts) order with their pruned packet range.
    * Bounds verification is gated on a ts filter being pushed — an
    * UNFILTERED scan reads every packet and is complete regardless of
    * ordering (it is the repair path for a broken file; see
    * [[RecDataSourceV2.rankedBounds]]). */
  private lazy val plannedRanges: Seq[(RecFormat.RecConfig, Int, Long, Long)] = {
    val ranked = RecDataSourceV2
      .rankedBounds(
        counts(),
        hconf,
        verifyBounds = tsMin.nonEmpty || tsMax.nonEmpty,
        consumer = "ts-range pruning"
      )
      .zipWithIndex
    ranked.flatMap { case ((cfg, total, (first, last)), rank) =>
      if (tsMin.exists(_ > last) || tsMax.exists(_ < first)) Nil // whole-file prune
      else {
        val lo = tsMin match {
          case Some(t) if t > first => RecFormat.firstPacketAtOrAbove(cfg, t, total, hconf)
          case _ => 0L
        }
        val hi = tsMax match {
          case Some(t) if t < last => RecFormat.lastPacketAtOrBelow(cfg, t, total, hconf)
          case _ => total - 1
        }
        if (lo > hi) Nil else Seq((cfg, rank, lo, hi - lo + 1))
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    plannedRanges.flatMap { case (cfg, rank, start, count) =>
      val perSplit = math.max(1L, targetSplitBytes / cfg.packetSize)
      (start until (start + count) by perSplit).map { s =>
        RecInputPartition(cfg, rank, s, math.min(perSplit, start + count - s))
      }
    }.toArray

  override def estimateStatistics(): Statistics = new Statistics {
    private val packets = plannedRanges.map(_._4).sum
    private val bytes = plannedRanges.map { case (cfg, _, _, n) => n * cfg.packetSize }.sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.of(packets)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val serConf = new SerializableConfiguration(hconf)
    // the monotonicity guard exists to protect the BINARY-SEARCH pruning;
    // an unpruned scan of a non-monotonic file is complete and correct
    // (and is the repair path the guard's error message points to)
    new RecReaderFactory(required, channelSubset, serConf,
      guardMonotonic = tsMin.nonEmpty || tsMax.nonEmpty, columnar = columnar)
  }
}

class RecReaderFactory(
    required: StructType,
    channelSubset: Option[Array[Int]],
    serConf: SerializableConfiguration,
    guardMonotonic: Boolean = false,
    columnar: Boolean = true
) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RecInputPartition]
    new RecPartitionReader(p, required, channelSubset, serConf.value, guardMonotonic)
  }

  override def supportColumnarReads(partition: InputPartition): Boolean = columnar

  override def createColumnarReader(
      partition: InputPartition
  ): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[RecInputPartition]
    new RecColumnarPartitionReader(p, required, channelSubset, serConf.value, guardMonotonic)
  }
}

/** Decodes one packet range, emitting only the required columns —
  * when `values` is pruned away the channel block is never extracted.
  *
  * The hot loop is string-free: `requiredSchema` is resolved ONCE in the
  * constructor to an array of field ordinals, and rows are serialized by
  * an [[UnsafeRowWriter]] (same floor as the V1 [[graft.io.RecScan]]
  * path — one contiguous buffer write per packet, no boxed
  * GenericInternalRow, no downstream UnsafeProjection re-serializing).
  * The writer's row is REUSED across next() calls, which the
  * PartitionReader contract permits (consumers copy if they retain).
  *
  * When `guardMonotonic` (set iff a ts filter was pushed down), it also
  * verifies, per split, the non-decreasing-timestamp invariant the
  * driver-side binary-search pruning relies on (reference:
  * jagular/utils.py:323-328): a file violating it would otherwise yield
  * silently MISSING rows (packets outside the binary-searched range are
  * never scanned), so a violation fails loudly instead. One long compare
  * per packet — free next to the decode itself. Unpruned scans (no ts
  * filter; the streaming path) skip the guard: they read every packet,
  * so they are complete regardless of ordering — and they are the repair
  * path for a broken file.
  */
class RecPartitionReader(
    part: RecInputPartition,
    required: StructType,
    channelSubset: Option[Array[Int]],
    hconf: Configuration,
    guardMonotonic: Boolean = false
) extends PartitionReader[InternalRow] {
  import RecPartitionReader._

  // requiredSchema resolved once: ordinal codes in output-field order
  private val emit: Array[Int] = required.fields.map(_.name match {
    case "file_rank" => EmitFileRank
    case "pos" => EmitPos
    case "ts" => EmitTs
    case "values" => EmitValues
    case other => throw new IllegalArgumentException(s"unknown column $other")
  })
  private val needValues = emit.contains(EmitValues)
  private val subset: Array[Int] = channelSubset.orNull

  private val it = RecFormat.decodeRange(
    part.cfg,
    part.startPacket,
    part.count,
    hconf,
    decodeValues = needValues
  )
  private val writer = new UnsafeRowWriter(emit.length)
  private val arrWriter =
    if (needValues) new UnsafeArrayWriter(writer, 2) else null
  private var pos = part.startPacket - 1
  // guard seeded with the packet BEFORE the split (one extra probe, only
  // on guarded = ts-filtered reads): without it a dip exactly at a split
  // or pruning boundary would be invisible to the per-split check
  private var prevTs =
    if (guardMonotonic && part.startPacket > 0)
      RecFormat.tsAt(part.cfg, part.startPacket - 1, hconf)
    else Long.MinValue

  override def next(): Boolean = {
    if (!it.hasNext) return false
    val pkt = it.next()
    pos += 1
    if (guardMonotonic) {
      if (pkt.ts < prevTs)
        throw new IllegalStateException(
          s"rec file ${part.cfg.path}: timestamp ${pkt.ts} at packet $pos decreases below " +
            s"$prevTs — the file violates the non-decreasing-timestamp invariant " +
            "(jagular/utils.py:323-328) that ts-range pushdown's binary search depends on; " +
            "refusing to return a silently incomplete scan. Re-read without a ts filter " +
            "and repair ordering first (graft.ts.Validation / Dedup)."
        )
      prevTs = pkt.ts
    }
    writer.reset()
    var i = 0
    while (i < emit.length) {
      emit(i) match {
        case EmitFileRank => writer.write(i, part.fileRank)
        case EmitPos => writer.write(i, pos)
        case EmitTs => writer.write(i, pkt.ts)
        case EmitValues =>
          val vals =
            if (subset == null) pkt.values
            else {
              val out = new Array[Short](subset.length)
              var j = 0
              while (j < subset.length) { out(j) = pkt.values(subset(j)); j += 1 }
              out
            }
          val cursorBefore = writer.cursor()
          arrWriter.initialize(vals.length)
          var j = 0
          while (j < vals.length) { arrWriter.write(j, vals(j)); j += 1 }
          writer.setOffsetAndSizeFromPreviousCursor(i, cursorBefore)
      }
      i += 1
    }
    true
  }

  override def get(): InternalRow = writer.getRow
  // Spark calls close() on early termination (LIMIT, task kill): release
  // the underlying stream instead of leaking it until exhaustion
  override def close(): Unit = it.close()
}

object RecPartitionReader {
  private[rec] final val EmitFileRank = 0
  private[rec] final val EmitPos = 1
  private[rec] final val EmitTs = 2
  private[rec] final val EmitValues = 3
}

/** Columnar dual of [[RecPartitionReader]]: decodes the packet range into
  * `ColumnarBatch`es of OnHeapColumnVectors (BatchSize packets each), so
  * the plan's ColumnarToRow boundary — Spark's vectorized codegen — does
  * the row assembly instead of a per-row UnsafeRowWriter + virtual
  * next()/get() pair. The `values` column appends each packet's channel
  * block into the array vector's child short vector in one call.
  *
  * Same semantics as the row reader (RecV2Spec asserts parity on every
  * projection / pruning / subset combination): required-column pruning,
  * channel subset, and the boundary-seeded monotonicity guard on
  * ts-filtered scans. Vectors are reset and reused per batch; consumers
  * retaining rows copy, per the PartitionReader contract.
  */
class RecColumnarPartitionReader(
    part: RecInputPartition,
    required: StructType,
    channelSubset: Option[Array[Int]],
    hconf: Configuration,
    guardMonotonic: Boolean = false
) extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import RecPartitionReader._

  private val BatchSize = 4096

  private val emit: Array[Int] = required.fields.map(_.name match {
    case "file_rank" => EmitFileRank
    case "pos" => EmitPos
    case "ts" => EmitTs
    case "values" => EmitValues
    case other => throw new IllegalArgumentException(s"unknown column $other")
  })
  private val needValues = emit.contains(EmitValues)
  private val subset: Array[Int] = channelSubset.orNull

  private val it = RecFormat.decodeRange(
    part.cfg,
    part.startPacket,
    part.count,
    hconf,
    decodeValues = needValues
  )
  private val vectors =
    org.apache.spark.sql.execution.vectorized.OnHeapColumnVector.allocateColumns(BatchSize, required)
  private val batch = new org.apache.spark.sql.vectorized.ColumnarBatch(
    vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]])
  private var pos = part.startPacket - 1
  private var prevTs =
    if (guardMonotonic && part.startPacket > 0)
      RecFormat.tsAt(part.cfg, part.startPacket - 1, hconf)
    else Long.MinValue
  private var subsetBuf: Array[Short] =
    if (subset != null) new Array[Short](subset.length) else null

  override def next(): Boolean = {
    if (!it.hasNext) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    while (n < BatchSize && it.hasNext) {
      val pkt = it.next()
      pos += 1
      if (guardMonotonic) {
        if (pkt.ts < prevTs)
          throw new IllegalStateException(
            s"rec file ${part.cfg.path}: timestamp ${pkt.ts} at packet $pos decreases below " +
              s"$prevTs — the file violates the non-decreasing-timestamp invariant " +
              "(jagular/utils.py:323-328) that ts-range pushdown's binary search depends on; " +
              "refusing to return a silently incomplete scan. Re-read without a ts filter " +
              "and repair ordering first (graft.ts.Validation / Dedup)."
          )
        prevTs = pkt.ts
      }
      i = 0
      while (i < emit.length) {
        emit(i) match {
          case EmitFileRank => vectors(i).putInt(n, part.fileRank)
          case EmitPos => vectors(i).putLong(n, pos)
          case EmitTs => vectors(i).putLong(n, pkt.ts)
          case EmitValues =>
            val vals =
              if (subset == null) pkt.values
              else {
                var j = 0
                while (j < subset.length) { subsetBuf(j) = pkt.values(subset(j)); j += 1 }
                subsetBuf
              }
            val child = vectors(i).arrayData()
            val start = child.getElementsAppended
            child.appendShorts(vals.length, vals, 0)
            vectors(i).putArray(n, start, vals.length)
        }
        i += 1
      }
      n += 1
    }
    batch.setNumRows(n)
    n > 0
  }

  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
  override def close(): Unit = {
    it.close()
    batch.close()
  }
}
