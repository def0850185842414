package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Dev probe: where does the distributed `.rec` scan's time go?
  * Times (a) the bare decode kernel inside Spark tasks, (b) the kernel +
  * UnsafeRow materialization, (c) the full RecScan DataFrame count.
  * `runMain graft.tools.ScanProbe <file.rec> [splitMB]` */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val splitBytes = (if (args.length > 1) args(1).toLong else 8L) << 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hconf = spark.sparkContext.hadoopConfiguration
    val serConf = new SerializableConfiguration(hconf)
    val cfg = graft.io.RecFormat.parseConfig(path, hconf)
    val total = graft.io.RecFormat.packetCount(cfg, hconf)
    val perSplit = math.max(1L, splitBytes / cfg.packetSize)
    val splits = (0L until total by perSplit).map(s => (s, math.min(perSplit, total - s)))
    val mb = total * cfg.packetSize / 1e6
    println(f"file: $total%,d packets, $mb%.0f MB, ${splits.size} splits")

    def time(name: String)(body: => Long): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$name round $r: $n%,d in $dt%.2f s = ${mb / dt}%.1f MB/s")
    }

    time("bare-kernel") {
      spark.sparkContext.parallelize(splits, splits.size).map { case (s, c) =>
        val it = graft.io.RecFormat.decodeRange(cfg, s, c, serConf.value)
        var n = 0L; var acc = 0L
        while (it.hasNext) { val p = it.next(); acc += p.ts + p.values(0); n += 1 }
        n + (acc & 0)
      }.sum().toLong
    }

    time("rdd-rows") {
      org.apache.spark.sql.graftbridge.Bridge
        .toInternalRdd(graft.io.RecScan.read(spark, Seq(path), splitBytes))
        .mapPartitions { it => var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n) }
        .sum().toLong
    }

    time("df-count") {
      graft.io.RecScan.read(spark, Seq(path), splitBytes).count()
    }

    // DSv2 scan, full row materialization (values incl.), row reader vs
    // ColumnarBatch reader — toRdd forces the ColumnarToRow boundary, so
    // both paths end at the same UnsafeRow stream
    def v2(columnar: Boolean) = org.apache.spark.sql.graftbridge.Bridge
      .toInternalRdd(
        spark.read.format("rec")
          .option("targetSplitBytes", splitBytes.toString)
          .option("columnar", columnar.toString)
          .load(path))
      .mapPartitions { it => var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n) }
      .sum().toLong
    time("v2-row-reader") { v2(columnar = false) }
    time("v2-columnar") { v2(columnar = true) }
    spark.stop()
  }
}
