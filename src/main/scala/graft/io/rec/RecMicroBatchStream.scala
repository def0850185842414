package graft.io.rec

import scala.collection.mutable

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
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
  *    prefix, so "how much exists" is one file-status call; a batch
  *    [start, end) maps to packet-aligned splits reusing the batch
  *    reader ([[RecPartitionReader]], column pruning included). Trailing
  *    partial packets are excluded (`floor(bytes / packetSize)`) and
  *    re-enter once complete.
  *  - **New files**: a `load()` path that is a DIRECTORY is re-listed at
  *    every `latestOffset` for `*.rec` files; unseen ones are APPENDED
  *    to the offset's file list (lexicographic order within a listing
  *    round). `file_rank` is the position in that list — first-seen
  *    order — which is stable across batches AND restarts because the
  *    list itself rides in the checkpointed offset; ranks never shift
  *    when a new file's name happens to sort before an old one. (The
  *    batch scan ranks by first-timestamp instead; for timestamped
  *    acquisition filenames the two agree.)
  *  - A file may be ALL CONFIG, NO PACKETS — the state on disk between
  *    workspace-XML write and the first packet — and simply sits at
  *    offset 0 until packets land (the batch path's bounds probe would
  *    refuse it).
  *
  * Configs are parsed once per file and cached; `planInputPartitions`
  * resolves every file from the OFFSET's list (not instance state), so a
  * checkpoint replay on a fresh stream object plans the same batch.
  */
class RecMicroBatchStream(
    paths: Seq[String],
    required: StructType,
    channelSubset: Option[Array[Int]],
    targetSplitBytes: Long
) extends MicroBatchStream
    with SupportsAdmissionControl {

  private val hconf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  private val cfgCache = mutable.HashMap.empty[String, RecFormat.RecConfig]
  private def cfgOf(p: String): RecFormat.RecConfig =
    cfgCache.getOrElseUpdate(p, RecFormat.parseConfig(p, hconf))

  /** Expand directory load paths to their current `*.rec` members. */
  private def listNow(): Seq[String] = RecDataSourceV2.expandPaths(paths, hconf)

  override def initialOffset(): Offset = RecStreamOffset(Seq.empty)

  /** Rank stability comes from the ADMISSION-CONTROL variant: the END
    * offset's file order is the committed START's order plus new files
    * appended — never a fresh listing order. (The no-arg latestOffset is
    * unreachable once SupportsAdmissionControl is implemented; relying
    * on instance state seeded by deserializeOffset would be fragile,
    * since Spark may ask for the latest offset before deserializing any
    * checkpoint.) */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val known = start.asInstanceOf[RecStreamOffset].files.map(_._1)
    val ordered = known ++ listNow().filterNot(known.toSet)
    RecStreamOffset(ordered.map(p => p -> RecFormat.packetCount(cfgOf(p), hconf)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)"
    )

  override def deserializeOffset(json: String): Offset = RecStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RecStreamOffset].files.toMap
    val e = end.asInstanceOf[RecStreamOffset].files
    e.zipWithIndex.flatMap { case ((p, hi), rank) =>
      val cfg = cfgOf(p)
      val lo = s.getOrElse(p, 0L)
      val perSplit = math.max(1L, targetSplitBytes / cfg.packetSize)
      (lo until hi by perSplit).map { pk =>
        RecInputPartition(cfg, rank, pk, math.min(perSplit, hi - pk))
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
