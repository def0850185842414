package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Distributed `.rec` scan (S3/S5) + bounds catalog (S2/A1/A2).
  *
  * Packets are fixed-size after the XML prefix, so a file is splittable on
  * packet boundaries: the driver parses each config (a bounded prefix
  * read), computes packet-aligned byte ranges of ~`targetSplitBytes`, and
  * executors decode their range independently — the multi-file "stitched"
  * generator of the reference (jagular/io.py:234-280) becomes a plain
  * parallel scan whose global order is `(file_rank, pos)`; block refill
  * across file boundaries is an artifact that disappears.
  */
object RecScan {

  val schema: StructType = StructType(Seq(
    StructField("file_rank", IntegerType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("values", ArrayType(ShortType, containsNull = false), nullable = false)
  ))

  /** Catalog of per-file bounds, SORTED by start timestamp — files given
    * out of order are auto-resorted, as the reference does
    * (jagular/io.py:88-96). `file_rank` is the post-sort rank. */
  def catalog(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val rows = paths.map { p =>
      val cfg = RecFormat.parseConfig(p, hconf)
      val (first, last) = RecFormat.timestampBounds(cfg, hconf)
      require(first <= last, s"$p: first_ts $first > last_ts $last")
      (p, first, last, RecFormat.packetCount(cfg, hconf), cfg.samplingRate, cfg.nSpikeChannels)
    }.sortBy(_._2)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((p, f, l, n, sr, nc), i) =>
        Row(i, p, f, l, n, sr, nc)
      }.asJava,
      StructType(Seq(
        StructField("file_rank", IntegerType, nullable = false),
        StructField("file", StringType, nullable = false),
        StructField("start_ts", LongType, nullable = false),
        StructField("stop_ts", LongType, nullable = false),
        StructField("n_packets", LongType, nullable = false),
        StructField("sampling_rate", IntegerType, nullable = false),
        StructField("n_spike_channels", IntegerType, nullable = false)
      ))
    )
  }

  /** Session summary over the catalog (A2, jagular/io.py:128-193):
    * duration with/without inter-file gaps, in samples and seconds. */
  def sessionSummary(catalogDf: DataFrame): DataFrame =
    catalogDf.agg(
      min("start_ts").as("start_ts"),
      max("stop_ts").as("stop_ts"),
      (max("stop_ts") - min("start_ts")).as("duration_w_gaps"),
      sum(col("stop_ts") - col("start_ts")).as("duration_wo_gaps"),
      sum("n_packets").as("n_packets"),
      first("sampling_rate").as("fs")
    )

  /** Per-file parsed config + 2-packet ts bounds, rank-sorted by start
    * ts. Parse ONCE and share: callers that need both the bounds (e.g.
    * ExtractChannels' disjointness check) and the scan hand the result to
    * [[readMeta]] instead of paying a second header+bounds read per file. */
  def rankedMeta(
      spark: SparkSession,
      paths: Seq[String]
  ): Seq[(RecFormat.RecConfig, Long, Long)] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    paths.map { p =>
      val cfg = RecFormat.parseConfig(p, hconf)
      val (first, last) = RecFormat.timestampBounds(cfg, hconf)
      (cfg, first, last)
    }.sortBy(_._2)
  }

  /** Distributed decode of the files (catalog order), optionally taking a
    * channel subset (indices into the spike-channel projection —
    * `subset='all'` ⇒ None, reference: jagular/utils.py:430-431). */
  def read(
      spark: SparkSession,
      paths: Seq[String],
      targetSplitBytes: Long = 128L << 20,
      channelSubset: Option[Seq[Int]] = None
  ): DataFrame =
    readMeta(spark, rankedMeta(spark, paths), targetSplitBytes, channelSubset)

  /** [[read]] over pre-parsed [[rankedMeta]] output. */
  def readMeta(
      spark: SparkSession,
      meta: Seq[(RecFormat.RecConfig, Long, Long)],
      targetSplitBytes: Long = 128L << 20,
      channelSubset: Option[Seq[Int]] = None
  ): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val serConf = new SerializableConfiguration(hconf)
    val cfgs = meta.map(_._1)
    // a stitched session must be channel-homogeneous: mixed workspaces
    // would emit values arrays of different lengths into one column (and
    // break downstream per-channel logic like the packet gap fill)
    require(
      cfgs.map(_.nSpikeChannels).distinct.size <= 1,
      s"mixed spike-channel counts across files: ${cfgs.map(c => s"${c.path}=${c.nSpikeChannels}").mkString(", ")}"
    )
    val ranked = cfgs.zipWithIndex

    // packet-aligned splits
    final case class Split(cfg: RecFormat.RecConfig, rank: Int, startPacket: Long, count: Long)
    val splits = ranked.flatMap { case (cfg, rank) =>
      val total = RecFormat.packetCount(cfg, hconf)
      val perSplit = math.max(1L, targetSplitBytes / cfg.packetSize)
      (0L until total by perSplit).map { s =>
        Split(cfg, rank, s, math.min(perSplit, total - s))
      }
    }

    val subset = channelSubset.map(_.toArray)
    // Emit UnsafeRows serialized directly by an UnsafeRowWriter: one
    // contiguous buffer write per packet, instead of GenericInternalRow +
    // boxed array + a downstream UnsafeProjection re-doing the same
    // serialization. The row is REUSED across packets — the plan-side
    // consumer (RDDScanExec) re-projects every ExistingRDD row into its
    // own buffer, and graft's direct toInternalRdd consumers copy
    // whatever they buffer. This is the row-based reader's floor; the
    // decode kernel itself runs at memcpy-ish speed
    // (graft.tools.DecodeBench).
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .flatMap { sp =>
        import org.apache.spark.sql.catalyst.InternalRow
        import org.apache.spark.sql.catalyst.expressions.codegen.{UnsafeArrayWriter, UnsafeRowWriter}
        val it = RecFormat.decodeRange(sp.cfg, sp.startPacket, sp.count, serConf.value)
        // close the stream even if the task stops pulling early (limit/kill)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
        val writer = new UnsafeRowWriter(4)
        val arrWriter = new UnsafeArrayWriter(writer, 2)
        var pos = sp.startPacket - 1
        it.map { pkt =>
          pos += 1
          val vals = subset match {
            case Some(idx) => idx.map(pkt.values(_))
            case None => pkt.values
          }
          writer.reset()
          writer.write(0, sp.rank)
          writer.write(1, pos)
          writer.write(2, pkt.ts)
          val cursorBefore = writer.cursor()
          arrWriter.initialize(vals.length)
          var i = 0
          while (i < vals.length) { arrWriter.write(i, vals(i)); i += 1 }
          writer.setOffsetAndSizeFromPreviousCursor(3, cursorBefore)
          writer.getRow: InternalRow
        }
      }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(spark, rdd, schema)
  }
}
