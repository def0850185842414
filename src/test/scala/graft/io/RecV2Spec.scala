package graft.io

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DataSource V2 (`spark.read.format("rec")`) — equivalence with the
  * programmatic RecScan, column pruning, and ts-range pushdown pruning. */
class RecV2Spec extends SparkSpec {

  private lazy val dir = Files.createTempDirectory("recv2").toFile.getAbsolutePath
  private lazy val fileA = { // ts 1000..1999
    val p = s"$dir/a.rec"
    RecSynth.write(p, (0 until 1000).map(i => (1000L + i, (c: Int) => (i + c).toShort)))
    p
  }
  private lazy val fileB = { // ts 5000..5499
    val p = s"$dir/b.rec"
    RecSynth.write(p, (0 until 500).map(i => (5000L + i, (c: Int) => (2 * i + c).toShort)))
    p
  }

  test("format(rec) matches RecScan.read on a multi-file session") {
    val v2 = spark.read.format("rec").load(fileB, fileA) // out of order on purpose
    val v1 = RecScan.read(spark, Seq(fileA, fileB))
    assert(v2.schema == v1.schema)
    val a = v2.orderBy("file_rank", "pos").collect().map(_.toSeq)
    val b = v1.orderBy("file_rank", "pos").collect().map(_.toSeq)
    assert(a.length == 1500)
    assert(a.sameElements(b))
  }

  test("columnar batches are the default read path and match the row reader exactly") {
    val cols = spark.read.format("rec").load(fileA, fileB)
    // the default plan crosses a ColumnarToRow boundary (vectorized scan)
    assert(cols.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    val rows = spark.read.format("rec").option("columnar", "false").load(fileA, fileB)
    assert(!rows.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("file_rank", "pos").collect().map(_.toSeq.map {
        case s: scala.collection.Seq[_] => s.toList
        case x => x
      })
    assert(canon(cols).sameElements(canon(rows)))
    // pruning + subset + ts filter parity (incl. a batch-boundary-ish range)
    for (opts <- Seq(Map.empty[String, String], Map("channels" -> "2,0"))) {
      def rd(columnar: Boolean) = opts
        .foldLeft(spark.read.format("rec").option("columnar", columnar.toString))(
          (r, kv) => r.option(kv._1, kv._2))
        .load(fileA, fileB)
        .where(col("ts").between(1200, 5100))
        .select("ts", "values")
      assert(canon(rd(true)).sameElements(canon(rd(false))), s"opts=$opts")
    }
  }

  test("ts-range pushdown prunes files and packet ranges") {
    val df = spark.read.format("rec").load(fileA, fileB)
    // range entirely inside fileA: fileB contributes no partitions
    val q = df.where(col("ts") >= 1200 && col("ts") < 1300)
    assert(q.count() == 100)
    assert(q.agg(min("ts"), max("ts")).collect().head.toSeq == Seq(1200L, 1299L))
    // the scan description carries the pushed bounds
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("rec scan"))
    // equality predicate
    assert(df.where(col("ts") === 5250).count() == 1)
    // empty intersection prunes everything
    assert(df.where(col("ts") > 100000).count() == 0)
  }

  test("column pruning: ts-only projection never materializes values") {
    val df = spark.read.format("rec").load(fileA)
    val tsOnly = df.select("ts")
    val scan = tsOnly.queryExecution.executedPlan.toString
    assert(scan.contains("cols ts") || !scan.contains("values"))
    assert(tsOnly.count() == 1000)
    assert(tsOnly.agg(sum("ts")).collect().head.getLong(0) == (1000L until 2000L).sum)
  }

  test("channels option projects the spike-channel subset") {
    val df = spark.read.format("rec").option("channels", "1,3").load(fileA)
    val r = df.orderBy("pos").select("values").first().getSeq[Short](0)
    assert(r == Seq(1.toShort, 3.toShort)) // packet 0: value = i + c = c
  }

  test("fuzz: random ts ranges through the v2 source == filtered full scan") {
    val full = RecScan.read(spark, Seq(fileA, fileB))
      .select("ts").collect().map(_.getLong(0)).sorted
    val v2 = spark.read.format("rec").load(fileA, fileB)
    val rnd = new scala.util.Random(42)
    (1 to 10).foreach { _ =>
      val lo = 500L + rnd.nextLong(5500)
      val hi = lo + rnd.nextLong(2000)
      val got = v2.where(col("ts") >= lo && col("ts") <= hi)
        .select("ts").collect().map(_.getLong(0)).sorted
      val want = full.filter(t => t >= lo && t <= hi)
      assert(got.toSeq == want.toSeq, s"range [$lo, $hi]")
    }
  }

  test("truncated recording: partial trailing packet never decoded as data") {
    val p = s"$dir/trunc.rec"
    RecSynth.write(p, (0 until 100).map(i => (9000L + i, (c: Int) => c.toShort)))
    // chop mid-packet: 40 bytes of a 73-byte packet remain
    val raf = new java.io.RandomAccessFile(p, "rw")
    raf.setLength(raf.length() - 33)
    raf.close()
    val cfg = RecFormat.parseConfig(p)
    val hconf = spark.sparkContext.hadoopConfiguration
    assert(RecFormat.packetCount(cfg, hconf) == 99)
    // bounds read the last WHOLE packet, not garbage channel bytes
    val (first, last) = RecFormat.timestampBounds(cfg, hconf)
    assert(first == 9000L && last == 9098L)
    val df = spark.read.format("rec").load(p)
    assert(df.count() == 99)
    assert(df.agg(max("ts")).collect().head.getLong(0) == 9098L)
    // pruning on the true bounds still finds the tail data
    assert(df.where(col("ts") >= 9098).count() == 1)
  }

  test("aggregate pushdown: count/min/max answered from the bounds catalog") {
    val df = spark.read.format("rec").load(fileA, fileB)
    val q = df.agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("rec catalog agg"), plan) // no packet scan in the plan
    assert(q.collect().head.toSeq == Seq(1500L, 1000L, 5499L))
  }

  test("aggregate pushdown: per-file session summary groups by file_rank") {
    val df = spark.read.format("rec").load(fileA, fileB)
    val q = df
      .groupBy("file_rank")
      .agg(count(lit(1)).as("n"), min("ts").as("lo"), max("ts").as("hi"))
      .orderBy("file_rank")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("rec catalog agg"), plan)
    assert(
      q.collect().map(_.toSeq).toSeq ==
        Seq(Seq(0, 1000L, 1000L, 1999L), Seq(1, 500L, 5000L, 5499L))
    )
  }

  test("aggregate pushdown does NOT fire under a ts filter (falls back to scan)") {
    val df = spark.read.format("rec").load(fileA, fileB)
    val q = df.where(col("ts") >= 1200).agg(count(lit(1)).as("n"), max("ts").as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("rec catalog agg"), plan)
    assert(q.collect().head.toSeq == Seq(1300L, 5499L))
  }

  test("non-monotonic timestamps fail loudly instead of silently under-scanning") {
    val p = s"$dir/nonmono.rec"
    // ts dips at packet 50: binary-search pruning would silently skip rows
    RecSynth.write(
      p,
      (0 until 100).map(i => (if (i == 50) 7000L else 8000L + i, (c: Int) => c.toShort))
    )
    val df = spark.read.format("rec").load(p)
    val e = intercept[org.apache.spark.SparkException] {
      df.where(col("ts") >= 8000 && col("ts") < 8100).count()
    }
    assert(e.getMessage.contains("non-decreasing-timestamp"), e.getMessage)
    // the guard protects PRUNED reads only: an unfiltered scan reads every
    // packet (complete regardless of ordering) and is the repair path the
    // error message points to
    assert(df.select("ts").collect().map(_.getLong(0)).min == 7000L)
    assert(df.where(col("pos") === 50).select("ts").head().getLong(0) == 7000L)
  }

  test("monotonicity guard catches a ts dip exactly AT a split boundary (both readers)") {
    val p = s"$dir/nonmono_split.rec"
    // dip at packet 50 = the FIRST packet of the second split (50 packets
    // per split): a per-split guard starting fresh would miss it; the
    // boundary-seeded guard probes packet 49 and catches the drop —
    // in the columnar batch reader AND the row reader
    RecSynth.write(
      p,
      (0 until 100).map(i => (if (i == 50) 7000L else 8000L + i, (c: Int) => c.toShort))
    )
    for (columnar <- Seq(true, false)) {
      val df = spark.read.format("rec")
        .option("targetSplitBytes", (73 * 50).toString)
        .option("columnar", columnar.toString)
        .load(p)
      val e = intercept[org.apache.spark.SparkException] {
        df.where(col("ts") >= 8000).count()
      }
      assert(e.getMessage.contains("non-decreasing-timestamp"), s"columnar=$columnar: ${e.getMessage}")
      // unfiltered scan (collect, not count — count would answer from
      // the catalog) still reads the file completely
      assert(df.select("ts").collect().length == 100, s"columnar=$columnar")
    }
  }

  test("aggPushdown=false forces the full-scan aggregate") {
    val df = spark.read.format("rec").option("aggPushdown", "false").load(fileA)
    val q = df.agg(count(lit(1)).as("n"), max("ts").as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("rec catalog agg"), plan)
    assert(q.collect().head.toSeq == Seq(1000L, 1999L))
  }

  test("streaming starts on a config-only recording (no packets yet)") {
    import org.apache.spark.sql.streaming.Trigger
    val p = s"$dir/fresh.rec"
    // acquisition state between workspace write and first packet
    RecSynth.write(p, Seq.empty)
    val outDir = s"$dir/fresh_out"
    val ckpt = s"$dir/fresh_ckpt"
    def run(): Long = {
      val q = spark.readStream.format("rec").load(p)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val d = new java.io.File(outDir)
      val hasData = d.exists && d.listFiles().exists(f => f.getName.endsWith(".parquet"))
      if (hasData) spark.read.parquet(outDir).count() else 0L
    }
    assert(run() == 0) // waits at offset 0 instead of refusing to start
    RecSynth.append(p, (0 until 10).map(i => (i.toLong, (c: Int) => c.toShort)))
    assert(run() == 10)
  }

  test("maxPacketsPerTrigger bounds per-micro-batch admission, exactly-once across files") {
    import org.apache.spark.sql.streaming.Trigger
    val pA = s"$dir/cap_a.rec"
    val pB = s"$dir/cap_b.rec"
    RecSynth.write(pA, (0 until 250).map(i => (i.toLong, (c: Int) => c.toShort)))
    RecSynth.write(pB, (0 until 150).map(i => (1000L + i, (c: Int) => c.toShort)))
    val outDir = s"$dir/cap_out"
    val ckpt = s"$dir/cap_ckpt"
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) batchSizes.synchronized { batchSizes += e.progress.numInputRows }
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.format("rec")
        .option("maxPacketsPerTrigger", "100")
        .option("paths", graft.io.rec.RecDataSourceV2.pathsOption(Seq(pA, pB)))
        .load()
        .select("file_rank", "pos", "ts")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally spark.streams.removeListener(listener)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 400) // exactly once, both files complete
    assert(out.select("file_rank", "pos").distinct().count() == 400)
    val sizes = batchSizes.synchronized(batchSizes.toList)
    assert(sizes.forall(_ <= 100), s"a batch exceeded the cap: $sizes")
    assert(sizes.length >= 4, s"expected >= 4 capped batches, got $sizes")
  }

  test("micro-batch streaming follows a growing rec file across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val p = s"$dir/stream.rec"
    RecSynth.write(p, (0 until 100).map(i => (i.toLong, (c: Int) => c.toShort)))
    val ckpt = s"$dir/stream_ckpt"

    val outDir = s"$dir/stream_out"

    def runBatch(): Long = {
      val q = spark.readStream
        .format("rec")
        .load(p)
        .select("file_rank", "pos", "ts")
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).count()
    }

    assert(runBatch() == 100)
    // half a trailing packet: must NOT surface until completed
    val half = new java.io.FileOutputStream(p, true)
    half.write(Array.fill[Byte](30)(1))
    half.close()
    assert(runBatch() == 100)
    // complete the partial packet by rewriting the tail as 50 whole packets
    val raf = new java.io.RandomAccessFile(p, "rw")
    raf.setLength(raf.length() - 30)
    raf.close()
    RecSynth.append(p, (100 until 150).map(i => (i.toLong, (c: Int) => c.toShort)))
    // restart from the checkpoint: exactly the 50 appended packets arrive
    assert(runBatch() == 150)
    val r = spark.read.parquet(outDir).orderBy("pos").collect()
    assert(r.map(_.getLong(2)).toSeq == (0L until 150L))
    assert(r.last.getLong(1) == 149L)
  }

  test("directory streaming: session rollover files join the stream with stable ranks") {
    import org.apache.spark.sql.streaming.Trigger
    val sessDir = Files.createTempDirectory("recsess").toFile.getAbsolutePath
    RecSynth.write(s"$sessDir/b_session1.rec", (0 until 40).map(i => (i.toLong, (c: Int) => 1.toShort)))
    val outDir = s"$sessDir/out"
    val ckpt = s"$sessDir/ckpt"
    def run(): Seq[(Int, Long)] = {
      val q = spark.readStream.format("rec").load(sessDir)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir)
        .groupBy("file_rank").count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(run() == Seq((0, 40L)))
    // rollover: a NEW session file whose name sorts BEFORE the first —
    // first-seen rank order must hold (new file appends at rank 1)
    RecSynth.write(s"$sessDir/a_session2.rec", (0 until 25).map(i => (i.toLong, (c: Int) => 2.toShort)))
    RecSynth.append(s"$sessDir/b_session1.rec", (40 until 50).map(i => (i.toLong, (c: Int) => 1.toShort)))
    assert(run() == Seq((0, 50L), (1, 25L)))
    // ranks survive a restart (the file list rides in the offset)
    RecSynth.append(s"$sessDir/a_session2.rec", (25 until 30).map(i => (i.toLong, (c: Int) => 2.toShort)))
    assert(run() == Seq((0, 50L), (1, 30L)))
  }

  test("Graft.openStream streams multiple explicit files via the paths option") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("recmulti").toFile.getAbsolutePath
    RecSynth.write(s"$d/m1.rec", (0 until 15).map(i => (i.toLong, (c: Int) => 1.toShort)))
    RecSynth.write(s"$d/m2.rec", (0 until 25).map(i => (i.toLong, (c: Int) => 2.toShort)))
    val q = graft.Graft.openStream(spark, Seq(s"$d/m1.rec", s"$d/m2.rec"))
      .writeStream.format("parquet")
      .option("path", s"$d/out").option("checkpointLocation", s"$d/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$d/out")
    assert(out.count() == 40)
    assert(out.groupBy("file_rank").count().count() == 2)
  }

  test("batch scan accepts a directory of recordings") {
    val batchDir = Files.createTempDirectory("recbatch").toFile.getAbsolutePath
    RecSynth.write(s"$batchDir/x.rec", (0 until 30).map(i => (1000L + i, (c: Int) => c.toShort)))
    RecSynth.write(s"$batchDir/y.rec", (0 until 20).map(i => (2000L + i, (c: Int) => c.toShort)))
    // config-only rollover file (no complete packet yet): contributes no
    // rows and must not abort the scan
    RecSynth.write(s"$batchDir/z.rec", Seq.empty)
    val df = spark.read.format("rec").load(batchDir)
    assert(df.count() == 50)
    assert(df.groupBy("file_rank").count().count() == 2)
    // catalog agg pushdown expands the directory too (and skips z.rec)
    val q = df.agg(min("ts").as("lo"), max("ts").as("hi"))
    assert(q.queryExecution.executedPlan.toString.contains("rec catalog agg"))
    assert(q.collect().head.toSeq == Seq(1000L, 2019L))
  }

  test("count over only config-only files is 0, not NULL (pushdown declined)") {
    val d = Files.createTempDirectory("reczero").toFile.getAbsolutePath
    RecSynth.write(s"$d/only_config.rec", Seq.empty)
    val df = spark.read.format("rec").load(d)
    val r = df.agg(count(lit(1)).as("n")).collect().head
    assert(!r.isNullAt(0) && r.getLong(0) == 0L)
  }

  test("streaming defers a mid-write rollover file instead of dying") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("recrace").toFile.getAbsolutePath
    RecSynth.write(s"$d/a_good.rec", (0 until 20).map(i => (i.toLong, (c: Int) => 1.toShort)))
    // rollover race: the new file's XML prefix is only half-written
    val partial = new java.io.FileOutputStream(s"$d/b_midwrite.rec")
    partial.write(RecSynth.xml.getBytes("US-ASCII"), 0, 60)
    partial.close()
    def run(): Long = {
      val q = spark.readStream.format("rec").load(d)
        .writeStream.format("parquet")
        .option("path", s"$d/out").option("checkpointLocation", s"$d/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$d/out").count()
    }
    assert(run() == 20) // survives; the unparseable file is deferred
    // acquisition finishes the config and the first packets land
    RecSynth.write(s"$d/b_midwrite.rec", (0 until 5).map(i => (i.toLong, (c: Int) => 2.toShort)))
    assert(run() == 25)
  }

  test("live extract_channels: rec stream into per-channel partitioned parquet") {
    import org.apache.spark.sql.streaming.Trigger
    val p = s"$dir/live.rec"
    RecSynth.write(p, (0 until 200).map(i => (i.toLong, (c: Int) => (10 * c + i % 7).toShort)))
    val outDir = s"$dir/live_channels"
    val q = spark.readStream
      .format("rec")
      .load(p)
      .select(col("ts"), posexplode(col("values")).as(Seq("channel", "value")))
      .writeStream
      .format("parquet")
      .partitionBy("channel")
      .option("path", outDir)
      .option("checkpointLocation", s"$dir/live_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the reference's file-per-channel layout, produced by a live stream
    val out = spark.read.parquet(outDir)
    assert(out.select("channel").distinct().count() == 4)
    val ch2 = out.where(col("channel") === 2).orderBy("ts").collect()
    assert(ch2.length == 200)
    assert(ch2.map(_.getShort(1)).toSeq == (0 until 200).map(i => (20 + i % 7).toShort))
    assert(new java.io.File(s"$outDir/channel=3").isDirectory)
  }

  test("binary search packet bounds on a synthetic file") {
    val cfg = RecFormat.parseConfig(fileA)
    val hconf = spark.sparkContext.hadoopConfiguration
    val total = RecFormat.packetCount(cfg, hconf)
    assert(total == 1000)
    assert(RecFormat.firstPacketAtOrAbove(cfg, 1000, total, hconf) == 0)
    assert(RecFormat.firstPacketAtOrAbove(cfg, 1500, total, hconf) == 500)
    assert(RecFormat.lastPacketAtOrBelow(cfg, 1999, total, hconf) == 999)
    assert(RecFormat.lastPacketAtOrBelow(cfg, 1499, total, hconf) == 499)
    assert(RecFormat.firstPacketAtOrAbove(cfg, 99999, total, hconf) == 1000)
    assert(RecFormat.lastPacketAtOrBelow(cfg, 1, total, hconf) == -1)
  }
}
