package graft.io.rec

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.io.RecFormat

/** Structured Streaming micro-batch source over GROWING `.rec` files —
  * the acquisition-time shape of the reference's workload: SpikeGadgets
  * appends fixed-size packets to the recording while analysis follows
  * behind (the reference handles this offline after the fact; here the
  * same stitched-scan surface is a live stream).
  *
  * Offsets are per-file packet counts (`{"counts":[...]}`) — packets are
  * fixed-size after the XML prefix, so "how much of each file exists" is
  * one file-status call per file, and a batch [start, end) maps directly
  * to packet-aligned splits reusing the batch reader
  * ([[RecPartitionReader]], including column pruning). Growth is within
  * files — new packets appended at the tail. Trailing partial packets
  * are naturally excluded because counts come from
  * `floor(bytes / packetSize)` and re-enter the next batch once complete.
  *
  * File RANKS are assigned by LEXICOGRAPHIC PATH order, not the batch
  * catalog's first-timestamp sort: offset vectors must mean the same
  * thing across checkpoint restarts, and a content sort is only stable
  * if every file already has its first packet at every (re)start. Path
  * order depends on nothing but the path list (acquisition software
  * timestamps filenames, so it is the recording order in practice). For
  * the same reason a file may be ALL CONFIG, NO PACKETS yet — the state
  * SpikeGadgets leaves on disk between writing the workspace XML and the
  * first packet — and the stream simply reports offset 0 for it until
  * packets land (the batch path's bounds probe would refuse such a
  * file).
  */
class RecMicroBatchStream(
    paths: Seq[String],
    required: StructType,
    channelSubset: Option[Array[Int]],
    targetSplitBytes: Long
) extends MicroBatchStream {

  private val hconf =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  /** Path-sorted (restart-stable); configs parsed once at stream start. */
  private val cfgs: Seq[RecFormat.RecConfig] =
    paths.sorted.map(p => RecFormat.parseConfig(p, hconf))

  override def initialOffset(): Offset = RecStreamOffset(Seq.fill(cfgs.size)(0L))

  override def latestOffset(): Offset =
    RecStreamOffset(cfgs.map(c => RecFormat.packetCount(c, hconf)))

  override def deserializeOffset(json: String): Offset =
    RecStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RecStreamOffset].counts
    val e = end.asInstanceOf[RecStreamOffset].counts
    require(s.size == cfgs.size && e.size == cfgs.size, "offset arity mismatch")
    cfgs.zipWithIndex.flatMap { case (cfg, rank) =>
      val lo = s(rank)
      val hi = e(rank)
      val perSplit = math.max(1L, targetSplitBytes / cfg.packetSize)
      (lo until hi by perSplit).map { p =>
        RecInputPartition(cfg, rank, p, math.min(perSplit, hi - p))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RecReaderFactory(required, channelSubset, new SerializableConfiguration(hconf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Per-file packet counts, in stream (stitched) rank order. */
case class RecStreamOffset(counts: Seq[Long]) extends Offset {
  override def json(): String = s"""{"counts":[${counts.mkString(",")}]}"""
}

object RecStreamOffset {
  def fromJson(json: String): RecStreamOffset = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json).get("counts")
    require(node != null && node.isArray, s"bad rec stream offset: $json")
    val counts = (0 until node.size()).map(i => node.get(i).asLong())
    RecStreamOffset(counts)
  }
}
