package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

/** Raw extracted-channel files (S4, jagular/readers.py:59-127): flat
  * little-endian sample files (`int16` by default) positionally aligned
  * with a sidecar timestamps file (`uint64` by default for this reader;
  * the extract pipeline writes `uint32`, readers.py:78-79 vs
  * utils.py:434-437).
  *
  * The positional zip (J1) the reference does block-by-block becomes an
  * index-aligned parallel scan: both files are split on the SAME record
  * ranges, so each task zips its slice locally — no join, no shuffle.
  */
object RawChannelScan {

  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("value", ShortType, nullable = false)
  ))

  /** @param tsBytes 8 for uint64 sidecars (reader default), 4 for uint32
    *                (what extract_channels writes). */
  def read(
      spark: SparkSession,
      channelFile: String,
      timestampsFile: String,
      tsBytes: Int = 8,
      targetSplitRecords: Long = 16L << 20
  ): DataFrame = {
    require(tsBytes == 4 || tsBytes == 8, "tsBytes must be 4 or 8")
    val hconf = spark.sparkContext.hadoopConfiguration
    val serConf = new SerializableConfiguration(hconf)
    val chPath = new Path(channelFile)
    val tsPath = new Path(timestampsFile)
    val fsys = chPath.getFileSystem(hconf)
    val nSamples = fsys.getFileStatus(chPath).getLen / 2
    val nTs = tsPath.getFileSystem(hconf).getFileStatus(tsPath).getLen / tsBytes
    val n = math.min(nSamples, nTs)

    val splits = (0L until n by targetSplitRecords)
      .map(s => (s, math.min(targetSplitRecords, n - s)))

    val rdd = spark.sparkContext
      .parallelize(splits, math.max(1, splits.size))
      .flatMap { case (start, total) =>
        val conf = serConf.value
        val cp = new Path(channelFile)
        val tp = new Path(timestampsFile)
        val cin = cp.getFileSystem(conf).open(cp)
        val tin = tp.getFileSystem(conf).open(tp)
        cin.seek(start * 2)
        tin.seek(start * tsBytes)
        val cbuf = new java.io.DataInputStream(new java.io.BufferedInputStream(cin, 1 << 20))
        val tbuf = new java.io.DataInputStream(new java.io.BufferedInputStream(tin, 1 << 20))
        // stream lazily: a split is up to targetSplitRecords rows —
        // materializing it as Array[Row] would be ~GBs of transient heap
        // per task at the default split size. UnsafeRow emission, row
        // REUSED per iterator (RDDScanExec re-projects — see RecScan).
        val writer = new org.apache.spark.sql.catalyst.expressions.codegen.UnsafeRowWriter(2)
        new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
          private var i = 0L
          private var closed = false
          override def hasNext: Boolean = {
            val more = i < total
            if (!more && !closed) { cbuf.close(); tbuf.close(); closed = true }
            more
          }
          override def next(): org.apache.spark.sql.catalyst.InternalRow = {
            val v = (cbuf.read() | (cbuf.read() << 8)).toShort
            val ts =
              if (tsBytes == 4)
                (tbuf.read() & 0xffL) | ((tbuf.read() & 0xffL) << 8) |
                  ((tbuf.read() & 0xffL) << 16) | ((tbuf.read() & 0xffL) << 24)
              else {
                var acc = 0L
                var b = 0
                while (b < 8) { acc |= (tbuf.read() & 0xffL) << (8 * b); b += 1 }
                acc
              }
            i += 1
            if (i == total && !closed) { cbuf.close(); tbuf.close(); closed = true }
            writer.reset()
            writer.write(0, ts)
            writer.write(1, v)
            writer.getRow
          }
        }
      }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(spark, rdd, schema)
  }

  /** S8 interop sink: write a long-layout channel DataFrame
    * (`ts`, `value`) back to the reference's raw layout — one int16 LE
    * file per channel plus a shared uint32 LE timestamps file
    * (jagular/utils.py:439-442, 530-542). Driver-side sequential write
    * (the format itself is inherently single-stream); for engine-native
    * storage use parquet `partitionBy(channel)` instead. */
  def writeRawLayout(
      df: DataFrame,
      outDir: String,
      prefix: String = ""
  ): Unit = {
    import org.apache.spark.sql.functions._
    val channels = df.select("channel").distinct().collect().map(_.get(0).toString).sorted
    new java.io.File(outDir).mkdirs()
    var tsWritten = false
    channels.foreach { ch =>
      val rows = df
        .where(col("channel") === ch)
        .orderBy("ts")
        .select("ts", "value")
        .collect()
      val chOut = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(s"$outDir/${prefix}ch.$ch.raw")))
      val tsOut =
        if (!tsWritten)
          Some(new java.io.DataOutputStream(new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(s"$outDir/timestamps.raw"))))
        else None
      rows.foreach { r =>
        val v = r.getShort(1).toInt
        chOut.write(v & 0xff); chOut.write((v >> 8) & 0xff)
        tsOut.foreach { o =>
          val t = r.getLong(0)
          o.write((t & 0xff).toInt); o.write(((t >> 8) & 0xff).toInt)
          o.write(((t >> 16) & 0xff).toInt); o.write(((t >> 24) & 0xff).toInt)
        }
      }
      chOut.close()
      tsOut.foreach(_.close())
      tsWritten = true
    }
  }
}
