package graft.io.warc

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.functions.WarcRecords

/** Record-granular DataSource V2 for `.warc.gz` crawl segments:
  * `spark.read.format("warcgz").load(paths...)` — one output row per
  * WARC record, decompressed one gzip MEMBER at a time.
  *
  * This is the scale path the format was designed for (and the r17
  * verdict's top ask): CommonCrawl-layout crawlers gzip each WARC
  * record as its OWN gzip member and concatenate the members, so a
  * reader can resynchronize at member boundaries. The scalar lane
  * (`binaryFile` → [[graft.functions.GunzipAll]] →
  * [[graft.functions.WarcRecords]]) materializes a whole segment as
  * ONE value — a real ~1 GiB gz segment inflates to ~4 GiB, past both
  * the scalar's 256 MiB quarantine cap and the JVM's 2 GiB
  * single-array ceiling. Here per-task memory is bounded by one
  * RECORD (`maxRecordBytes`, default 64 MiB), independent of segment
  * size, and one segment fans out across executors:
  *
  *  - **Byte-range splits** (`targetSplitBytes`, default 128 MiB): a
  *    split owns the members whose COMPRESSED start offset falls in
  *    `[start, end)`; a non-initial split resynchronizes by scanning
  *    for the next VERIFIED member boundary (gzip magic `1f 8b 08`,
  *    reserved FLG bits clear, and the member's first inflated bytes
  *    are the `WARC/` magic — the same self-synchronization contract
  *    as Hadoop sync markers). A member straddling `end` belongs to
  *    the split that owns its start.
  *  - **Streaming decompression**: one [[java.util.zip.Inflater]] per
  *    member over a small reused buffer; compressed consumption is
  *    tracked exactly (`Inflater.getRemaining`) so member boundaries
  *    need no re-scan on the happy path, and the CRC32 + ISIZE
  *    trailer is verified per member.
  *  - **Quarantine, not crash** (the [[WarcRecords]] sentinel policy,
  *    extended to the container layer): a member that fails gzip
  *    decode or its trailer check emits ONE `__corrupt_gz` row and the
  *    reader RESYNCHRONIZES at the next verified boundary — one bad
  *    member costs one row, not a segment (the scalar lane NULLs the
  *    whole segment). A member inflating past `maxRecordBytes` emits
  *    `__oversize` (content_length = its full inflated size — the
  *    member is still drained to find its end, discarding bytes, so
  *    memory stays bounded).
  *
  * Schema: `(path, member_offset, rec_idx, offset, warc_type,
  * target_uri, warc_date, record_id, content_length, payload)` —
  * the [[graft.ops.Warc.parseWarc]] surface plus the container
  * coordinates (`member_offset` = the member's compressed byte offset
  * in its file; `offset` = the record's byte offset within the
  * decompressed member). Column pruning is supported; payload bytes
  * are still decompressed (boundaries are length-driven) but a pruned
  * scan never carries them.
  *
  * Verification contract: boundary-scan splitting is heuristic in the
  * same sense as every self-synchronizing splitter — compressed bytes
  * that embed a COMPLETE valid gzip member whose content starts with
  * `WARC/` (inside a stored-block payload, say) could fool the
  * resynchronization scan of a split landing inside them. Sequential
  * reads (splitting disabled via `targetSplitBytes` ≥ file size) have
  * no such ambiguity; deployments with adversarial inputs set that or
  * use the CDX index offsets. The spec pins a stored-block fake-magic
  * case that plain scanning survives.
  */
class WarcGzDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warcgz"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcGzDataSourceV2.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table =
    new WarcGzTable(
      graft.io.rec.RecDataSourceV2.paths(new CaseInsensitiveStringMap(properties)))
}

object WarcGzDataSourceV2 {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("member_offset", LongType, nullable = false),
    StructField("rec_idx", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Directory paths expand to their `*.gz` members (lexicographic),
    * the [[graft.io.rec.RecDataSourceV2.expandPaths]] discipline. */
  def expandPaths(raw: Seq[String], hconf: Configuration): Seq[String] =
    raw.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(hconf)
      if (fs.getFileStatus(path).isDirectory)
        fs.listStatus(path)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".gz"))
          .map(_.getPath.toString)
          .sorted
          .toSeq
      else Seq(p)
    }
}

class WarcGzTable(paths: Seq[String]) extends Table with SupportsRead {
  require(paths.nonEmpty, "warcgz source needs at least one path")
  override def name(): String = s"warcgz(${paths.mkString(",")})"
  override def schema(): StructType = WarcGzDataSourceV2.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcGzScanBuilder(paths, options)
}

class WarcGzScanBuilder(paths: Seq[String], options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {

  private var required: StructType = WarcGzDataSourceV2.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val split = Option(options.get("targetsplitbytes")).map(_.toLong).getOrElse(128L << 20)
    val maxRec = Option(options.get("maxrecordbytes")).map(_.toLong).getOrElse(64L << 20)
    require(split > 0, s"targetSplitBytes must be positive, got $split")
    // a record must fit one JVM array (and one row): the 2 GiB ceiling
    // is structural, the option only tightens it
    require(maxRec > 0 && maxRec <= Int.MaxValue - 8L,
      s"maxRecordBytes must be in (0, ${Int.MaxValue - 8}], got $maxRec")
    new WarcGzScan(paths, required, split, maxRec)
  }
}

/** One compressed byte range of one file; `fileLen` rides along so the
  * reader can distinguish EOF from a short read without a stat call. */
case class WarcGzInputPartition(path: String, start: Long, end: Long, fileLen: Long)
    extends InputPartition

class WarcGzScan(
    paths: Seq[String],
    required: StructType,
    targetSplitBytes: Long,
    maxRecordBytes: Long
) extends Scan
    with Batch
    with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warcgz scan [${paths.size} paths, split=$targetSplitBytes, " +
      s"cols ${required.fieldNames.mkString(",")}]"

  private lazy val hconf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  private lazy val files: Seq[(String, Long)] =
    WarcGzDataSourceV2.expandPaths(paths, hconf).map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      (p, path.getFileSystem(hconf).getFileStatus(path).getLen)
    }

  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap { case (p, len) =>
      if (len == 0) Nil
      else (0L until len by targetSplitBytes).map { s =>
        WarcGzInputPartition(p, s, math.min(s + targetSplitBytes, len), len)
      }
    }.toArray

  override def estimateStatistics(): Statistics = new Statistics {
    // compressed bytes × the ~4 crawl-text expansion the scalar lane's
    // scaladoc cites — an estimate for join planning, not a contract
    private val bytes = files.map(_._2).sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes * 4)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val serConf = new SerializableConfiguration(hconf)
    val req = required
    val maxRec = maxRecordBytes
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new WarcGzPartitionReader(
          partition.asInstanceOf[WarcGzInputPartition], req, maxRec, serConf.value)
    }
  }
}

/** Reads the members whose compressed start offset lies in
  * `[part.start, part.end)`, one streamed Inflater pass per member.
  * Per-member outcome → rows:
  *  - clean member: [[WarcRecords.parse]] of the inflated bytes (the
  *    record-level sentinels still apply WITHIN a member);
  *  - gzip-corrupt member (header/stream/trailer): one `__corrupt_gz`
  *    row, then resynchronize at the next verified boundary;
  *  - member inflating past `maxRecordBytes`: one `__oversize` row
  *    (drained to its true end, so the next member still parses).
  */
class WarcGzPartitionReader(
    part: WarcGzInputPartition,
    required: StructType,
    maxRecordBytes: Long,
    hconf: Configuration
) extends PartitionReader[InternalRow] {
  import WarcGzPartitionReader._

  private val emit: Array[Int] = required.fields.map(f => FieldOrdinals(f.name))
  private val pathUtf = UTF8String.fromString(part.path)

  private val fs = new org.apache.hadoop.fs.Path(part.path).getFileSystem(hconf)
  private val in = fs.open(new org.apache.hadoop.fs.Path(part.path))
  private var feed: ByteFeed = null
  private var memberStart: Long = -1L
  private var closed = false

  // rows pending emission for the current member
  private var pending: Array[InternalRow] = Array.empty
  private var pendingIdx = 0
  private var current: InternalRow = null

  // position the reader: split 0 starts at 0 (a valid segment starts
  // with a member there — anything else is a corrupt member, which the
  // quarantine path handles); later splits resynchronize by scan
  {
    val first =
      if (part.start == 0L) 0L
      else findBoundary(in, part.start, part.end, part.fileLen)
    if (first >= 0L && first < part.end) {
      in.seek(first)
      feed = new ByteFeed(in, first)
      memberStart = first
    }
  }

  override def next(): Boolean = {
    while (pendingIdx >= pending.length) {
      if (memberStart < 0L || memberStart >= part.end) return false
      advanceMember()
    }
    current = pending(pendingIdx)
    pendingIdx += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (!closed) { closed = true; in.close() }

  /** Parse ONE member at `memberStart`, fill `pending`, advance
    * `memberStart` (or set it to −1 when the reader is done). */
  private def advanceMember(): Unit = {
    val startedAt = memberStart
    try {
      val (bytes, inflatedLen, memberEnd) = readMember(feed, maxRecordBytes)
      if (bytes == null) {
        // over cap: quarantined but fully drained — true end known
        pending = Array(projectSentinel(startedAt, "__oversize", inflatedLen))
        pendingIdx = 0
        memberStart = memberEnd
      } else {
        val parsed = WarcRecords.parse(UTF8String.fromBytes(bytes, 0, inflatedLen.toInt))
        val n = parsed.numElements()
        val rows = new Array[InternalRow](n)
        var i = 0
        while (i < n) {
          rows(i) = projectRecord(startedAt, i.toLong, parsed.getStruct(i, 7))
          i += 1
        }
        pending = rows
        pendingIdx = 0
        memberStart = memberEnd
      }
    } catch {
      case scala.util.control.NonFatal(_) =>
        // gzip-level damage: one sentinel, then resynchronize
        pending = Array(projectSentinel(startedAt, "__corrupt_gz", -1L))
        pendingIdx = 0
        val next = findBoundary(in, startedAt + 3, part.end, part.fileLen)
        if (next >= 0L && next < part.end) {
          in.seek(next)
          feed = new ByteFeed(in, next)
          memberStart = next
        } else memberStart = -1L
    }
  }

  private def projectRecord(memberOff: Long, recIdx: Long, rec: InternalRow): InternalRow = {
    val out = new GenericInternalRow(emit.length)
    var i = 0
    while (i < emit.length) {
      emit(i) match {
        case EmitPath => out.update(i, pathUtf)
        case EmitMemberOffset => out.setLong(i, memberOff)
        case EmitRecIdx => out.setLong(i, recIdx)
        // WarcRecords struct: offset, warc_type, target_uri, warc_date,
        // record_id, content_length, payload
        case EmitOffset => out.setLong(i, rec.getLong(0))
        case EmitWarcType => out.update(i, if (rec.isNullAt(1)) null else rec.getUTF8String(1))
        case EmitTargetUri => out.update(i, if (rec.isNullAt(2)) null else rec.getUTF8String(2))
        case EmitWarcDate => out.update(i, if (rec.isNullAt(3)) null else rec.getUTF8String(3))
        case EmitRecordId => out.update(i, if (rec.isNullAt(4)) null else rec.getUTF8String(4))
        case EmitContentLength => out.setLong(i, rec.getLong(5))
        case EmitPayload => out.update(i, rec.getUTF8String(6))
      }
      i += 1
    }
    out
  }

  private def projectSentinel(memberOff: Long, kind: String, clen: Long): InternalRow = {
    val out = new GenericInternalRow(emit.length)
    var i = 0
    while (i < emit.length) {
      emit(i) match {
        case EmitPath => out.update(i, pathUtf)
        case EmitMemberOffset => out.setLong(i, memberOff)
        case EmitRecIdx => out.setLong(i, 0L)
        case EmitOffset => out.setLong(i, 0L)
        case EmitWarcType => out.update(i, UTF8String.fromString(kind))
        case EmitTargetUri | EmitWarcDate | EmitRecordId => out.update(i, null)
        case EmitContentLength => out.setLong(i, clen)
        case EmitPayload => out.update(i, UTF8String.fromString(""))
      }
      i += 1
    }
    out
  }
}

object WarcGzPartitionReader {
  private[warc] final val EmitPath = 0
  private[warc] final val EmitMemberOffset = 1
  private[warc] final val EmitRecIdx = 2
  private[warc] final val EmitOffset = 3
  private[warc] final val EmitWarcType = 4
  private[warc] final val EmitTargetUri = 5
  private[warc] final val EmitWarcDate = 6
  private[warc] final val EmitRecordId = 7
  private[warc] final val EmitContentLength = 8
  private[warc] final val EmitPayload = 9

  private[warc] val FieldOrdinals: Map[String, Int] = Map(
    "path" -> EmitPath, "member_offset" -> EmitMemberOffset,
    "rec_idx" -> EmitRecIdx, "offset" -> EmitOffset,
    "warc_type" -> EmitWarcType, "target_uri" -> EmitTargetUri,
    "warc_date" -> EmitWarcDate, "record_id" -> EmitRecordId,
    "content_length" -> EmitContentLength, "payload" -> EmitPayload)

  /** Buffered sequential reads with an exact absolute position and the
    * one rewind the Inflater protocol needs (`getRemaining` refers to
    * the LAST `setInput`, which always came from this buffer). */
  private[warc] final class ByteFeed(in: java.io.InputStream, startPos: Long) {
    private val buf = new Array[Byte](128 * 1024)
    private var lo = 0
    private var hi = 0
    private var base: Long = startPos // file offset of buf(0)

    /** Absolute file offset of the next unconsumed byte. */
    def pos: Long = base + lo

    private def fill(): Boolean = {
      if (lo < hi) return true
      base += hi
      lo = 0
      hi = 0
      val n = in.read(buf)
      if (n <= 0) false else { hi = n; true }
    }

    /** Next byte (0–255) or −1 at EOF. */
    def read1(): Int = if (!fill()) -1 else { val b = buf(lo) & 0xff; lo += 1; b }

    /** Hand the inflater everything currently buffered (refilling if
      * empty); false at EOF. The bytes are tentatively consumed —
      * [[rewind]] returns the unused tail. */
    def feedInflater(inf: java.util.zip.Inflater): Boolean = {
      if (!fill()) return false
      inf.setInput(buf, lo, hi - lo)
      lo = hi
      true
    }

    /** Give back the last feed's unconsumed bytes. Must run before any
      * further read (the buffer base moves on refill). */
    def rewind(inf: java.util.zip.Inflater): Unit = { lo -= inf.getRemaining }
  }

  /** Parse one gzip member starting at `feed.pos`.
    * Returns `(bytes, inflatedLen, memberEnd)`; `bytes == null` marks
    * an over-cap member (drained — `memberEnd` is still exact).
    * Throws on any structural violation (header magic, deflate error,
    * CRC/ISIZE mismatch, EOF mid-member) — the caller quarantines. */
  private[warc] def readMember(
      feed: ByteFeed, maxRecordBytes: Long): (Array[Byte], Long, Long) = {
    readGzipHeader(feed)
    val inf = new java.util.zip.Inflater(true)
    try {
      val crc = new java.util.zip.CRC32
      var out = new Array[Byte](64 * 1024)
      var outLen = 0L
      val chunk = new Array[Byte](64 * 1024)
      var over = false
      while (!inf.finished()) {
        if (inf.needsInput() && !feed.feedInflater(inf))
          throw new java.io.EOFException("gzip member truncated")
        var n = inf.inflate(chunk)
        while (n > 0) {
          crc.update(chunk, 0, n)
          if (!over) {
            if (outLen + n > maxRecordBytes) over = true
            else {
              if (outLen + n > out.length) {
                val grown = new Array[Byte](
                  math.min(math.max(out.length.toLong * 2, outLen + n), maxRecordBytes).toInt)
                System.arraycopy(out, 0, grown, 0, outLen.toInt)
                out = grown
              }
              System.arraycopy(chunk, 0, out, outLen.toInt, n)
            }
          }
          outLen += n
          n = inf.inflate(chunk)
        }
      }
      feed.rewind(inf)
      // trailer: CRC32 + ISIZE, little-endian
      var tc = 0L
      var i = 0
      while (i < 4) {
        val b = feed.read1()
        if (b < 0) throw new java.io.EOFException("gzip trailer truncated")
        tc |= b.toLong << (8 * i)
        i += 1
      }
      var ts = 0L
      i = 0
      while (i < 4) {
        val b = feed.read1()
        if (b < 0) throw new java.io.EOFException("gzip trailer truncated")
        ts |= b.toLong << (8 * i)
        i += 1
      }
      if (tc != crc.getValue || ts != (outLen & 0xffffffffL))
        throw new java.util.zip.ZipException("gzip trailer mismatch")
      if (over) (null, outLen, feed.pos) else (out, outLen, feed.pos)
    } finally inf.end()
  }

  /** RFC 1952 member header; throws on violation. */
  private def readGzipHeader(feed: ByteFeed): Unit = {
    def req(): Int = {
      val b = feed.read1()
      if (b < 0) throw new java.io.EOFException("gzip header truncated")
      b
    }
    if (req() != 0x1f || req() != 0x8b) throw new java.util.zip.ZipException("not gzip magic")
    if (req() != 8) throw new java.util.zip.ZipException("unsupported compression method")
    val flg = req()
    if ((flg & 0xe0) != 0) throw new java.util.zip.ZipException("reserved FLG bits set")
    var i = 0
    while (i < 6) { req(); i += 1 } // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = req() | (req() << 8)
      var j = 0
      while (j < xlen) { req(); j += 1 }
    }
    if ((flg & 0x08) != 0) while (req() != 0) () // FNAME
    if ((flg & 0x10) != 0) while (req() != 0) () // FCOMMENT
    if ((flg & 0x02) != 0) { req(); req() } // FHCRC
  }

  private val WarcMagic = "WARC/".getBytes("US-ASCII")

  /** Scan `[from, limit)` for the first VERIFIED member boundary:
    * gzip magic `1f 8b 08`, reserved FLG bits clear, and the member's
    * first five inflated bytes are `WARC/`. Verification repositions
    * the stream, so the caller re-seeks afterwards. −1 when none. */
  private[warc] def findBoundary(
      in: org.apache.hadoop.fs.FSDataInputStream,
      from: Long, limit: Long, fileLen: Long): Long = {
    if (from >= limit) return -1L
    val window = new Array[Byte](256 * 1024)
    var winStart = from
    // a candidate needs 4 visible bytes (magic + FLG): overlap 3
    while (winStart < limit) {
      in.seek(winStart)
      val want = math.min(window.length.toLong, fileLen - winStart).toInt
      if (want < 4) return -1L
      var got = 0
      while (got < want) {
        val n = in.read(window, got, want - got)
        if (n < 0) return -1L
        got += n
      }
      // LONG min before the narrowing: limit − winStart can exceed Int
      // range on a multi-GiB unsplit file
      val scanEnd = math.min((got - 3).toLong, limit - winStart).toInt
      var i = 0
      while (i < scanEnd) {
        if (window(i) == 0x1f.toByte && window(i + 1) == 0x8b.toByte &&
          window(i + 2) == 8.toByte && (window(i + 3) & 0xe0) == 0) {
          val cand = winStart + i
          if (verifyBoundary(in, cand)) return cand
        }
        i += 1
      }
      if (winStart + got >= fileLen) return -1L
      winStart += scanEnd
    }
    -1L
  }

  /** True iff a syntactically valid gzip member at `cand` inflates to
    * bytes beginning with `WARC/` — the warcgz layout contract (every
    * member holds a WARC record). */
  private def verifyBoundary(
      in: org.apache.hadoop.fs.FSDataInputStream, cand: Long): Boolean =
    try {
      in.seek(cand)
      val feed = new ByteFeed(in, cand)
      readGzipHeader(feed)
      val inf = new java.util.zip.Inflater(true)
      try {
        val probe = new Array[Byte](WarcMagic.length)
        var got = 0
        while (got < probe.length) {
          if (inf.needsInput() && !feed.feedInflater(inf)) return false
          val n = inf.inflate(probe, got, probe.length - got)
          if (n == 0 && inf.finished()) return false
          got += n
        }
        java.util.Arrays.equals(probe, WarcMagic)
      } finally inf.end()
    } catch { case scala.util.control.NonFatal(_) => false }
}
