package graft.io.rec

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.io.RecFormat

/** Structured Streaming micro-batch source over GROWING `.rec`
  * recordings — the acquisition-time shape of the reference's workload:
  * SpikeGadgets appends fixed-size packets to the current recording (and
  * rolls over to a new file per session) while analysis follows behind.
  *
  * Offsets carry an APPEND-ONLY file list with per-file packet counts
  * (`{"files":[["path",count],...]}`):
  *
  *  - **Growth within a file**: packets are fixed-size after the XML
  *    prefix, so "how much exists" comes straight from the file length —
  *    the directory listing already carries lengths, so admission is ONE
  *    listStatus per directory (plus one getFileStatus per explicit
  *    file), no per-file re-status. A batch [start, end) maps to
  *    packet-aligned splits reusing the batch reader
  *    ([[RecPartitionReader]], column pruning included). Trailing
  *    partial packets are excluded (`floor(bytes / packetSize)`) and
  *    re-enter once complete.
  *  - **New files**: a `load()` path that is a DIRECTORY is re-listed at
  *    every `latestOffset` for `*.rec` files; unseen ones are APPENDED
  *    to the offset's file list (lexicographic order within a listing
  *    round). `file_rank` is the position in that list — first-seen
  *    order — which is stable across batches AND restarts because the
  *    list itself rides in the checkpointed offset AND the end offset is
  *    always derived from the committed start
  *    ([[SupportsAdmissionControl]]), never from a fresh listing order.
  *    (The batch scan ranks by first-timestamp instead; for timestamped
  *    acquisition filenames the two agree.)
  *  - A file may be ALL CONFIG, NO PACKETS — the state on disk between
  *    workspace-XML write and the first packet — and simply sits at
  *    offset 0 until packets land. A file whose XML prefix is still
  *    BEING WRITTEN (rollover race: parseConfig fails) is deferred to a
  *    later listing round with a warning instead of killing the query.
  *  - [[SupportsTriggerAvailableNow]]: `Trigger.AvailableNow` snapshots
  *    the listing once at query start and drains up to it — without this
  *    Spark's generic wrapper would call `latestOffset` with the EMPTY
  *    initial offset and break rank stability.
  *
  * Configs are parsed once per file and cached; `planInputPartitions`
  * resolves every file from the OFFSET's list (not instance state), so a
  * checkpoint replay on a fresh stream object plans the same batch.
  *
  * `maxPacketsPerTrigger` (option) bounds each micro-batch's admission
  * in packets, allocated in file order: the backpressure knob for a
  * drain that would otherwise arrive as a few giant batches (stateful
  * consumers pay per-batch group sorts), and a genuine rate limit when
  * the query shares the cluster. Unset = drain all available
  * (ReadLimit.allAvailable), the previous behavior.
  */
class RecMicroBatchStream(
    paths: Seq[String],
    required: StructType,
    channelSubset: Option[Array[Int]],
    targetSplitBytes: Long,
    maxPacketsPerTrigger: Option[Long] = None
) extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow
    with Logging {

  private val hconf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  private val cfgCache = mutable.HashMap.empty[String, RecFormat.RecConfig]
  private def cfgOf(p: String): RecFormat.RecConfig =
    cfgCache.getOrElseUpdate(p, RecFormat.parseConfig(p, hconf))

  /** Current (canonical path, file length) membership: directories are
    * listed (lengths ride along for free), explicit files status'd. */
  private def listNow(): Seq[(String, Long)] = paths.flatMap { p =>
    val path = new Path(p)
    val fs = path.getFileSystem(hconf)
    val st = fs.getFileStatus(path)
    if (st.isDirectory)
      fs.listStatus(path)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".rec"))
        .map(s => (s.getPath.toString, s.getLen))
        .sortBy(_._1)
        .toSeq
    else Seq((st.getPath.toString, st.getLen))
  }

  /** Packet count from a listed length; None defers a file whose config
    * cannot be parsed yet (XML prefix mid-write at rollover). */
  private def countOf(p: String, len: Long): Option[Long] =
    try {
      val cfg = cfgOf(p)
      Some(math.max(0L, (len - cfg.configSectionSize) / cfg.packetSize))
    } catch {
      case NonFatal(e) =>
        logWarning(s"rec stream: deferring $p — config not yet parseable (${e.getMessage})")
        None
    }

  /** End offset = committed start's file order + parseable new files,
    * optionally admission-capped at `budget` NEW packets (file order). */
  private def advance(
      start: RecStreamOffset,
      listing: Seq[(String, Long)],
      budget: Long = Long.MaxValue
  ): RecStreamOffset = {
    val lens = listing.toMap
    val startCounts = start.files.toMap
    val known = start.files.map(_._1)
    val fresh = listing.map(_._1).filterNot(known.toSet)
    val kept = known.map { p =>
      // a known file missing from the listing (deleted?) makes no
      // progress; a SHRUNKEN length (truncation repair, or a stale
      // eventually-consistent listing) must not move the committed
      // offset backwards — regrowth past an un-clamped smaller count
      // would re-emit already-delivered packets
      p -> math.max(startCounts(p), lens.get(p).flatMap(countOf(p, _)).getOrElse(startCounts(p)))
    }
    val added = fresh.flatMap(p => countOf(p, lens(p)).map(p -> _))
    val uncapped = kept ++ added
    if (budget == Long.MaxValue) RecStreamOffset(uncapped)
    else {
      // cap NEW packets at `budget`, allocated in offset-file order —
      // later files wait their turn, preserving the stitched order
      var remaining = budget
      RecStreamOffset(uncapped.map { case (p, target) =>
        val from = startCounts.getOrElse(p, 0L)
        val take = math.max(0L, math.min(target - from, remaining))
        remaining -= take
        p -> (from + take)
      })
    }
  }

  override def initialOffset(): Offset = RecStreamOffset(Seq.empty)

  // Trigger.AvailableNow: freeze the listing at query start; every batch
  // advances toward the frozen membership/lengths, still ordered by the
  // committed start offset
  private var frozenListing: Option[Seq[(String, Long)]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    frozenListing = Some(listNow())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val budget = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => m.maxRows()
      case _ => Long.MaxValue
    }
    advance(start.asInstanceOf[RecStreamOffset], frozenListing.getOrElse(listNow()), budget)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPacketsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)"
    )

  override def deserializeOffset(json: String): Offset = RecStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RecStreamOffset].files.toMap
    val e = end.asInstanceOf[RecStreamOffset].files
    e.zipWithIndex.flatMap { case ((p, hi), rank) =>
      val lo = s.getOrElse(p, 0L)
      // parse the config ONLY for files contributing packets this batch:
      // a deleted file rides in the offset forever at its last count
      // (advance() tolerates it), and resolving its config here would
      // throw and wedge every restarted batch
      if (lo >= hi) Nil
      else {
        val cfg = cfgOf(p)
        val perSplit = math.max(1L, targetSplitBytes / cfg.packetSize)
        (lo until hi by perSplit).map { pk =>
          RecInputPartition(cfg, rank, pk, math.min(perSplit, hi - pk))
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecReaderFactory(required, channelSubset, new SerializableConfiguration(hconf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Append-only (path, packet-count) list; position = file_rank. */
case class RecStreamOffset(files: Seq[(String, Long)]) extends Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    files.foreach { case (p, n) =>
      val e = mapper.createArrayNode()
      e.add(p); e.add(n)
      arr.add(e)
    }
    val root = mapper.createObjectNode()
    root.set[com.fasterxml.jackson.databind.JsonNode]("files", arr)
    mapper.writeValueAsString(root)
  }
}

object RecStreamOffset {
  def fromJson(json: String): RecStreamOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json).get("files")
    require(node != null && node.isArray, s"bad rec stream offset: $json")
    val files = (0 until node.size()).map { i =>
      val e = node.get(i)
      (e.get(0).asText(), e.get(1).asLong())
    }
    RecStreamOffset(files)
  }
}
