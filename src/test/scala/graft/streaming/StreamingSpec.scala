package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("burstStream: prefix emissions equal batch Burst.detect after flush ticks") {
    implicit val sqlCtx = spark.sqlContext
    // unit-spaced fixture incl. the flush ticks (ticks are ordinary
    // below-threshold samples, so batch stats include them too):
    // key a: islands at 2-3, 6, 10 (merge 2-3 with 6; 10 drops at
    // minSamples 2); key b: one long island 4-8
    val aVals = Seq(0.0, 10.0, 10.0, 0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 10.0)
    val bVals = Seq(0.0, 0.0, 0.0, 9.0, 10.0, 9.0, 9.0, 10.0, 0.0)
    val rows =
      aVals.zipWithIndex.map { case (v, i) => Streaming.Sample("a", (i + 1).toLong, v) } ++
        bVals.zipWithIndex.map { case (v, i) => Streaming.Sample("b", (i + 1).toLong, v) } ++
        Seq(Streaming.Sample("a", 30L, 0.0), Streaming.Sample("b", 30L, 0.0)) // flush ticks
    // thresholds: the batch op's per-key mu + k*sigma, replicated with
    // the same decimal-exact spelling (both keys get their own)
    def thresholds(vals: Seq[Double], extra: Seq[Double], kHi: Double, kLo: Double) = {
      val all = vals ++ extra
      val s1 = all.map(v => BigDecimal(v).setScale(2)).sum.toDouble
      val s2 = all.map(v => BigDecimal(v).setScale(2).pow(2)).sum.toDouble
      val n = all.size.toDouble
      val mu = s1 / n
      val sigma = math.sqrt(math.max((s2 - s1 * s1 / n) / n, 0.0))
      (mu + kHi * sigma, mu + kLo * sigma)
    }
    val (hiA, loA) = thresholds(aVals, Seq(0.0), 1.0, 0.5)
    val (hiB, loB) = thresholds(bVals, Seq(0.0), 1.0, 0.5)
    // per-key thresholds differ -> run one stream per key (the twin's
    // contract: thresholds are a per-deployment constant)
    def runStream(key: String, hi: Double, lo: Double): Seq[(Long, Long, Long, Double)] = {
      val input = MemoryStream[Streaming.Sample]
      val q = Streaming.burstStream(input.toDS().filter(_.key == key), hi, lo, 3L, 2L)
        .writeStream.format("memory").queryName(s"burst_$key").outputMode("append").start()
      val (first, rest) = rows.partition(_.ts <= 5) // exercise state carry
      input.addData(first)
      q.processAllAvailable()
      input.addData(rest)
      q.processAllAvailable()
      val got = spark.sql(s"SELECT start_ts, stop_ts, n_samples, peak FROM burst_$key")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      q.stop()
      got
    }
    val streamA = runStream("a", hiA, loA)
    val streamB = runStream("b", hiB, loB)
    val batch = graft.ts.Burst.detect(
      rows.toDF("key", "ts_us", "value").withColumn("event_id", col("ts_us")),
      Seq("key"), "ts_us", "event_id", "value",
      kHi = 1.0, kLo = 0.5, mergeGapSamples = 3L, minSamples = 2L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    assert(streamA.toSet == batch.filter(_._1 == "a").map(_._2).toSet)
    assert(streamB.toSet == batch.filter(_._1 == "b").map(_._2).toSet)
    assert(streamA.nonEmpty && streamB.nonEmpty)
  }

  test("streaming censor keeps refractory semantics across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.Detection]
    val q = Streaming
      .censorStream(input.toDS(), width = 30L)
      .writeStream
      .format("memory")
      .queryName("censored")
      .outputMode("append")
      .start()
    // batch 1: the docstring fixture prefix
    input.addData(
      Streaming.Detection("a", 110), Streaming.Detection("a", 111),
      Streaming.Detection("a", 112), Streaming.Detection("a", 120))
    q.processAllAvailable()
    // batch 2: continuation — state must carry lastKept=110
    input.addData(
      Streaming.Detection("a", 130), // censored: 130-110 < 30... wait 20 < 30 → dropped
      Streaming.Detection("a", 270), Streaming.Detection("a", 271),
      Streaming.Detection("a", 280))
    q.processAllAvailable()
    val kept = spark.sql("SELECT idx FROM censored ORDER BY idx").collect().map(_.getLong(0))
    q.stop()
    assert(kept.toSeq == Seq(110L, 270L))
  }

  test("streaming gap fill interpolates across micro-batch boundaries (W6)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.Sample]
    val q = Streaming
      .gapFillStream(input.toDS(), step = 1L, maxGapSize = 5L)
      .writeStream
      .format("memory")
      .queryName("filled")
      .outputMode("append")
      .start()
    // batch 1 ends at ts=10; batch 2 starts at ts=13 — the gap straddles
    // the micro-batch boundary, exactly the reference's W6 case
    input.addData(Streaming.Sample("a", 9, 9.0), Streaming.Sample("a", 10, 10.0))
    q.processAllAvailable()
    input.addData(Streaming.Sample("a", 13, 16.0), Streaming.Sample("a", 30, 0.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT ts, value, interpolated FROM filled ORDER BY ts")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    q.stop()
    assert(rows.toSeq == Seq(
      (9L, 9.0, false), (10L, 10.0, false),
      (11L, 12.0, true), (12L, 14.0, true), // linear 10→16 over 10..13
      (13L, 16.0, false),
      (30L, 0.0, false) // gap 17 > maxGapSize → epoch boundary, no fill
    ))
  }

  test("session_window epochs a bounded stream like batch sessionize") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val df = input.toDF().toDF("k", "ts")
    val q = Streaming
      .sessionCounts(df, "ts", "k", "10 seconds")
      .writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("complete")
      .start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    input.addData(("u", t(0)), ("u", t(2)), ("u", t(4)), ("u", t(30)), ("u", t(32)))
    q.processAllAvailable()
    val rows = spark.sql("SELECT n_events FROM sessions ORDER BY session_start")
      .collect().map(_.getLong(0))
    q.stop()
    assert(rows.toSeq == Seq(3L, 2L))
  }

  test("streaming crossings carry prev-sample state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.Sample]
    val q = Streaming
      .crossingsStream(input.toDS(), threshold = 10.0)
      .writeStream
      .format("memory")
      .queryName("crossings")
      .outputMode("append")
      .start()
    // batch 1 ends with an above-threshold sample at ts=5
    input.addData(
      Streaming.Sample("a", 3, 2.0), Streaming.Sample("a", 4, 11.0),
      Streaming.Sample("a", 5, 12.0))
    q.processAllAvailable()
    // batch 2: ts=6 also above → crossing at 5 spans the batch boundary;
    // ts=8 above but 7 is not consecutive-above
    input.addData(Streaming.Sample("a", 6, 13.0), Streaming.Sample("a", 8, 20.0))
    q.processAllAvailable()
    val got = spark.sql("SELECT idx FROM crossings ORDER BY idx").collect().map(_.getLong(0))
    q.stop()
    // 4 (4,5 above), 5 (5,6 above across batches); 6→8 not consecutive
    assert(got.toSeq == Seq(4L, 5L))
  }

  test("streaming curation screens a doc stream like the batch chain") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((0L, "secret eval question about math", "bench"))
      .toDF("doc_id", "text", "source")
    val cfg = graft.ops.Curation.Config(
      maxMeanWordLen = 6.0,
      maxDup2gramFrac = 0.5,
      decontaminateMinOverlap = 3,
      weights = Map("web" -> 1.0)
    )
    val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val stream = input.toDF().toDF("doc_id", "text", "source", "ts")
    val q = Streaming
      .curateStream(stream, bench, cfg, "ts", "10 seconds")
      .writeStream.format("memory").queryName("curated").outputMode("append").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // batch 1: survivor, quality-gated, repetition-gated, contaminated
    input.addData(
      (10L, "the quick brown fox jumps over dog", "web", t(1)),
      (11L, "zzzzzzzzzz yyyyyyyyyy xxxxxxxxxx wwwwwwwwww", "web", t(2)),
      (12L, "the spam the spam the spam the spam", "web", t(3)),
      (13L, "intro secret eval question about math end", "web", t(4))
    )
    q.processAllAvailable()
    // batch 2: exact dup of the survivor (within watermark — dropped),
    // a weight-0 source, a fresh survivor
    input.addData(
      (14L, "the quick brown fox jumps over dog", "web", t(5)),
      (15L, "some other text from excluded source", "lowsrc", t(6)),
      (16L, "a second clean doc the end", "web", t(7))
    )
    q.processAllAvailable()
    val streamed = spark.sql("SELECT doc_id FROM curated").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(streamed.toSeq == Seq(10L, 16L))
    // batch parity on the same rows (arrival order == id order here, so
    // keep-first-arrival and keep-min-id agree)
    val batchDocs = Seq(
      (0L, "secret eval question about math", "bench"),
      (10L, "the quick brown fox jumps over dog", "web"),
      (11L, "zzzzzzzzzz yyyyyyyyyy xxxxxxxxxx wwwwwwwwww", "web"),
      (12L, "the spam the spam the spam the spam", "web"),
      (13L, "intro secret eval question about math end", "web"),
      (14L, "the quick brown fox jumps over dog", "web"),
      (15L, "some other text from excluded source", "lowsrc"),
      (16L, "a second clean doc the end", "web")
    ).toDF("doc_id", "text", "source")
    val batch = graft.ops.Curation
      .screen(batchDocs, col("source") === "bench", cfg)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(batch.toSeq == streamed.toSeq)
  }

  test("streaming curation under a forced-oversized bench takes the bloom screen, parity holds") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((0L, "secret eval question about math", "bench"))
      .toDF("doc_id", "text", "source")
    val cfg = graft.ops.Curation.Config(
      maxMeanWordLen = 6.0,
      maxDup2gramFrac = 0.5,
      decontaminateMinOverlap = 3,
      weights = Map("web" -> 1.0)
    )
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // too small for ANY broadcast/exact-set: both the stream screen and
      // the batch chain must fall to their bloom plans and still agree
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
      val input = MemoryStream[(Long, String, String, java.sql.Timestamp)]
      val stream = input.toDF().toDF("doc_id", "text", "source", "ts")
      val q = Streaming
        .curateStream(stream, bench, cfg, "ts", "10 seconds")
        .writeStream.format("memory").queryName("curated_bloom").outputMode("append").start()
      def t(s: Long) = new java.sql.Timestamp(s * 1000L)
      input.addData(
        (10L, "the quick brown fox jumps over dog", "web", t(1)),
        (13L, "intro secret eval question about math end", "web", t(4)),
        (16L, "a second clean doc the end", "web", t(7))
      )
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id FROM curated_bloom")
        .collect().map(_.getLong(0)).sorted
      q.stop()
      assert(streamed.toSeq == Seq(10L, 16L))
      val batchDocs = Seq(
        (0L, "secret eval question about math", "bench"),
        (10L, "the quick brown fox jumps over dog", "web"),
        (13L, "intro secret eval question about math end", "web"),
        (16L, "a second clean doc the end", "web")
      ).toDF("doc_id", "text", "source")
      val batch = graft.ops.Curation
        .screen(batchDocs, col("source") === "bench", cfg)
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(batch.toSeq == streamed.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("streaming dedup keep-first drops duplicate (key, ts) within watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("k", "ts", "v")
    val q = Streaming
      .dedupKeepFirstStream(df, "ts", Seq("k"), "10 seconds")
      .writeStream
      .format("memory")
      .queryName("deduped")
      .outputMode("append")
      .start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000L)
    // batch 1: duplicate ts=2 inside one batch — first kept
    input.addData(("u", t(1), 1.0), ("u", t(2), 2.0), ("u", t(2), 99.0))
    q.processAllAvailable()
    // batch 2: ts=2 again across batches (still within watermark) — dropped;
    // a fresh ts=3 — kept
    input.addData(("u", t(2), 100.0), ("u", t(3), 3.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT v FROM deduped ORDER BY ts").collect().map(_.getDouble(0))
    q.stop()
    assert(rows.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("streaming near-dup screen matches batch screenVerified per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val (kk, nh, rpb) = (3, 16, 4)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val rnd = new scala.util.Random(90210)
    def doc() = (0 until 20).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    def nearOf(text: String) = { // keep 18 of 20 tokens: J ≈ 0.8, verifies
      val toks = text.split(" ")
      (toks.take(18) ++ Seq(vocab(rnd.nextInt(vocab.length)), vocab(rnd.nextInt(vocab.length)))).mkString(" ")
    }
    val corpusRows = (0L until 20L).map(i => (i, doc()))
    val fresh103 = doc()
    val batch1 = Seq(
      (100L, corpusRows(3)._2),         // exact corpus dup
      (101L, doc()),                    // fresh
      (102L, nearOf(corpusRows(5)._2))  // near-dup of corpus
    )
    val batch2 = Seq(
      (103L, fresh103),                 // fresh
      (104L, fresh103)                  // exact within-batch dup of 103
    )
    val corpus = corpusRows.toDF("doc_id", "text")
    val idx = graft.ops.IncrementalDedup.buildIndexWithSignatures(corpus, kk, nh, rpb)

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.ArrayBuffer[Map[Long, (Int, Int)]]()
    val q = Streaming
      .nearDupScreenStream(stream, idx, kk, nh, rpb, minJaccard = Some(0.5)) { screened =>
        val m = screened.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
        if (m.nonEmpty) got.synchronized { got += m }
      }
      .start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // parity: each micro-batch verdict == the batch operator on those rows
    def batchScreen(rows: Seq[(Long, String)]) = graft.ops.IncrementalDedup
      .screenVerified(rows.toDF("doc_id", "text"), idx, kk, nh, rpb, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got.toSeq == Seq(batchScreen(batch1), batchScreen(batch2)))
    // and the verdicts themselves are the planted ones
    assert(got(0)(100L)._1 == 1 && got(0)(101L) == ((0, 0)) && got(0)(102L)._1 == 1)
    assert(got(1)(103L) == ((0, 0)) && got(1)(104L) == ((0, 1)))
  }

  test("index append between triggers is picked up (the full incremental cycle)") {
    implicit val sqlCtx = spark.sqlContext
    val (kk, nh, rpb) = (3, 16, 4)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val rnd = new scala.util.Random(424242)
    def doc() = (0 until 20).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val corpus = (0L until 10L).map(i => (i, doc())).toDF("doc_id", "text")
    val idxDir = java.nio.file.Files.createTempDirectory("idx-cycle-").toString
    graft.ops.IncrementalDedup.buildIndexWithSignatures(corpus, kk, nh, rpb)
      .write.mode("overwrite").parquet(idxDir)

    val fresh = doc()
    val batch1 = Seq((100L, fresh))          // novel → admitted
    val batch2 = Seq((200L, fresh))          // exact copy of the ADMITTED doc

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val got = scala.collection.mutable.ArrayBuffer[Map[Long, (Int, Int)]]()
    val q = Streaming
      // BY-NAME index read: evaluated fresh inside every trigger
      .nearDupScreenStream(stream, spark.read.parquet(idxDir), kk, nh, rpb, None) { screened =>
        val m = screened.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
        if (m.nonEmpty) got.synchronized { got += m }
      }
      .start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    assert(got(0)(100L) == ((0, 0))) // admitted
    // the append cycle: the admitted doc's band rows join the index
    graft.ops.IncrementalDedup
      .buildIndexWithSignatures(batch1.toDF("doc_id", "text"), kk, nh, rpb)
      .write.mode("append").parquet(idxDir)
    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    assert(got(1)(200L)._1 == 1, "appended index rows must be seen by the next trigger")

    // the pitfall the by-name parameter exists for: a PRE-BUILT frame
    // pinned its file listing at creation and misses the same append
    val stale = spark.read.parquet(idxDir)
    // (re-list via a fresh read: the stale frame was created AFTER the
    // append here, so to reproduce the pitfall we append once more)
    val fresh2 = doc()
    graft.ops.IncrementalDedup
      .buildIndexWithSignatures(Seq((300L, fresh2)).toDF("doc_id", "text"), kk, nh, rpb)
      .write.mode("append").parquet(idxDir)
    val verdictStale = graft.ops.IncrementalDedup
      .screen(Seq((400L, fresh2)).toDF("doc_id", "text"), stale, kk, nh, rpb)
      .collect().head.getInt(1)
    val verdictFresh = graft.ops.IncrementalDedup
      .screen(Seq((400L, fresh2)).toDF("doc_id", "text"), spark.read.parquet(idxDir), kk, nh, rpb)
      .collect().head.getInt(1)
    assert(verdictFresh == 1)
    assert(verdictStale == 0, "a pre-built frame misses appends — the by-name contract is load-bearing")
  }

  test("tokenRateStream: windows emit once after the watermark, late rows drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = Streaming
      .tokenRateStream(
        input.toDF().toDF("event_time", "source", "text"),
        "event_time", windowDuration = "10 seconds", watermarkDelay = "5 seconds")
      .writeStream
      .format("memory")
      .queryName("rates")
      .outputMode("append")
      .start()
    // window [0,10): two docs, 5 tokens total
    input.addData((ts(1), "web", "a b c"), (ts(4), "web", "d e"))
    q.processAllAvailable()
    // nothing emitted yet: watermark (max 4s − 5s) has not passed 10s
    assert(spark.sql("SELECT * FROM rates").count() == 0)
    // advance event time far enough to close [0,10)
    input.addData((ts(20), "web", "x y"))
    q.processAllAvailable()
    val first = spark.sql("SELECT source, n_docs, n_tokens FROM rates").collect()
    assert(first.length == 1)
    assert(first.head.getString(0) == "web" && first.head.getLong(1) == 2L && first.head.getLong(2) == 5L)
    // a LATE row for the emitted window (event time 3s, watermark now 15s) is dropped
    input.addData((ts(3), "web", "late late late"))
    q.processAllAvailable()
    input.addData((ts(40), "web", "z")) // close [20,30) too
    q.processAllAvailable()
    val all = spark.sql("SELECT window_start, n_docs, n_tokens FROM rates ORDER BY window_start").collect()
    q.stop()
    // still exactly one row for [0,10) with the original totals, one for [20,30)
    assert(all.length == 2, all.mkString(";"))
    assert(all.head.getLong(1) == 2L && all.head.getLong(2) == 5L, "late row must not mutate an emitted window")
    assert(all(1).getLong(1) == 1L && all(1).getLong(2) == 2L)
  }

  test("streaming band power equals the batch operator per trigger") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val bands = Seq(("low", 0, 1), ("high", 2, 4))
    val t1 = (0 until 16).map(i => ("a", i.toLong, ((i * 3) % 7).toDouble))
    val t2 = (0 until 8).map(i => ("b", i.toLong, (i % 2).toDouble))
    val results = scala.collection.mutable.ArrayBuffer.empty[Set[(String, Long, String, Double)]]
    val input = MemoryStream[(String, Long, Double)]
    val q = Streaming
      .bandPowerStream(
        input.toDF().toDF("k", "ts", "value"),
        Seq("k"), Seq("ts"), "value", windowSize = 8, bands = bands) { out =>
        results += out.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
      }
      .start()
    input.addData(t1: _*); q.processAllAvailable()
    input.addData(t2: _*); q.processAllAvailable()
    q.stop()
    def batchOn(rows: Seq[(String, Long, Double)]) =
      graft.dsp.Spectral.windowBandPower(
        rows.toDF("k", "ts", "value"), Seq("k"), Seq(col("ts").asc), "value", 8, bands)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(results.length == 2)
    assert(results(0) == batchOn(t1) && results(0).size == 4) // 2 windows x 2 bands
    assert(results(1) == batchOn(t2) && results(1).size == 2)
  }

  test("streaming z-score flags match the batch operator on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 9L).map(i => (i, "a", 10.0)) ++ Seq((10L, "a", 100.0)) ++
      (11L to 15L).map(i => (i, "b", 5.0))
    val ref = rows.toDF("event_id", "event_type", "value")
    val stats = Streaming.fitZscoreStats(ref, "value", "event_type")
    // fitted stats reproduce the batch operator's spelling exactly
    assert(stats("a") == (19.0, 27.0) && stats("b")._2 == 0.0)

    val input = MemoryStream[(Long, String, Double)]
    val q = Streaming
      .zscoreFlagStream(
        input.toDF().toDF("event_id", "event_type", "value"),
        stats, "value", "event_type", k = 2.0)
      .writeStream.format("memory").queryName("zflags").outputMode("append")
      .start()
    input.addData(rows.take(8): _*)
    q.processAllAvailable()
    input.addData(rows.drop(8): _*) // outlier arrives in batch 2
    q.processAllAvailable()
    val got = spark.sql("SELECT event_id, z FROM zflags").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    val want = graft.ops.Anomaly
      .zscoreFlags(ref, "value", Seq("event_type"), k = 2.0)
      .select("event_id", "z").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == want && want == Set((10L, 3.0)))
    // a group missing from the stats map is passed through unflagged, not an error
    assert(Streaming
      .zscoreFlagStream(Seq((1L, "unknown", 9e9)).toDF("event_id", "event_type", "value"),
        stats, "value", "event_type", k = 2.0)
      .count() == 0L)
  }

  test("trendingTokensStream: closed windows emit exact top-k when capacity covers the vocab") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = Streaming
      .trendingTokensStream(
        input.toDF().toDF("ts", "text"),
        "ts", windowDur = "10 seconds", watermark = "0 seconds", k = 2, capacity = 64)
      .writeStream.format("memory").queryName("trending").outputMode("append")
      .start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    // window [0,10): spam x3, alpha x2, beta x1 -> top2 = spam, alpha
    input.addData((t(1), "spam alpha spam"), (t(5), "spam alpha beta"))
    q.processAllAvailable()
    // event at t=25 pushes the watermark past the first window
    input.addData((t(25), "later tokens here"))
    q.processAllAvailable()
    val got = spark.sql("SELECT token, n_est FROM trending").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set(("spam", 3L), ("alpha", 2L)))
  }

  test("streaming as-of enrich matches the batch as-of across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.AsOfInput]
    val q = Streaming
      .asofEnrichStream(input.toDS())
      .writeStream.format("memory").queryName("asof_enriched").outputMode("append")
      .start()
    // batch 1: update@5=1.5, probe@4 (before any state), probe@5
    // (same-ts update visible — inclusive bound), probe@7
    input.addData(
      Streaming.AsOfInput("k", 5, 0, 1.5),
      Streaming.AsOfInput("k", 4, 1, 0),
      Streaming.AsOfInput("k", 5, 1, 0),
      Streaming.AsOfInput("k", 7, 1, 0))
    q.processAllAvailable()
    // batch 2: the state must carry update@5 across the boundary;
    // then update@10=2.5 takes over
    input.addData(
      Streaming.AsOfInput("k", 9, 1, 0),
      Streaming.AsOfInput("k", 10, 0, 2.5),
      Streaming.AsOfInput("k", 11, 1, 0),
      Streaming.AsOfInput("other", 3, 1, 0)) // key isolation
    q.processAllAvailable()
    val got = spark.sql("SELECT key, ts, value FROM asof_enriched").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    q.stop()
    assert(got == Set(
      ("k", 4L, None), ("k", 5L, Some(1.5)), ("k", 7L, Some(1.5)),
      ("k", 9L, Some(1.5)), ("k", 11L, Some(2.5)), ("other", 3L, None)))
    // parity with the batch operator on the equivalent frames
    val left = Seq(("k", 4L), ("k", 5L), ("k", 7L), ("k", 9L), ("k", 11L), ("other", 3L)).toDF("key", "t")
    val right = Seq(("k", 5L, 1.5), ("k", 10L, 2.5)).toDF("key", "t", "v")
    val batch = graft.ops.AsOf.asofBackward(left, right, Seq("key"), "t", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(batch == got)
  }

  test("funnelStream: step advances across micro-batches match batch conversion exactly") {
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("fetch", "parse", "keep")
    val input = MemoryStream[Streaming.FunnelEvent]
    val q = Streaming
      .funnelStream(input.toDS(), steps, maxSpanUs = 100L)
      .writeStream.format("memory").queryName("funnel_steps").outputMode("append")
      .start()
    import Streaming.FunnelEvent
    // batch 1. u1 advances two steps; u2 sees keep BEFORE parse (no
    // skip); u3 anchors; u4's parse arrives before its fetch in the
    // same batch (ts sort must fix it); u5's parse ties the anchor ts
    // (strictly-after ⇒ no advance), then advances at 12
    input.addData(
      FunnelEvent("u1", 10, "fetch"), FunnelEvent("u1", 20, "parse"),
      FunnelEvent("u2", 10, "fetch"), FunnelEvent("u2", 15, "keep"),
      FunnelEvent("u3", 10, "fetch"),
      FunnelEvent("u4", 5, "parse"), FunnelEvent("u4", 7, "fetch"), FunnelEvent("u4", 9, "parse"),
      FunnelEvent("u5", 10, "fetch"), FunnelEvent("u5", 10, "parse"), FunnelEvent("u5", 12, "parse"))
    q.processAllAvailable()
    // batch 2: u1 completes (state carried); u2 now parses then keeps;
    // u3's parse lands past the span (10+100 < 150 ⇒ no advance);
    // duplicate u1 parse re-emits nothing
    input.addData(
      FunnelEvent("u1", 30, "keep"), FunnelEvent("u1", 25, "parse"),
      FunnelEvent("u2", 50, "parse"), FunnelEvent("u2", 60, "keep"),
      FunnelEvent("u3", 150, "parse"))
    q.processAllAvailable()
    val reached = spark.sql("SELECT user, step_idx, step_name, ts FROM funnel_steps").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    q.stop()
    assert(reached == Set(
      ("u1", 1, "fetch", 10L), ("u1", 2, "parse", 20L), ("u1", 3, "keep", 30L),
      ("u2", 1, "fetch", 10L), ("u2", 2, "parse", 50L), ("u2", 3, "keep", 60L),
      ("u3", 1, "fetch", 10L),
      ("u4", 1, "fetch", 7L), ("u4", 2, "parse", 9L),
      ("u5", 1, "fetch", 10L), ("u5", 2, "parse", 12L)))
    // each (user, step) emitted at most once ⇒ count-by-step IS n_users;
    // pin full parity against the batch operator on the same events
    val allEvents = Seq(
      ("u1", 10L, "fetch"), ("u1", 20L, "parse"), ("u2", 10L, "fetch"), ("u2", 15L, "keep"),
      ("u3", 10L, "fetch"), ("u4", 5L, "parse"), ("u4", 7L, "fetch"), ("u4", 9L, "parse"),
      ("u5", 10L, "fetch"), ("u5", 10L, "parse"), ("u5", 12L, "parse"),
      ("u1", 30L, "keep"), ("u1", 25L, "parse"), ("u2", 50L, "parse"), ("u2", 60L, "keep"),
      ("u3", 150L, "parse")).toDF("user", "ts", "etype")
    val batch = graft.ops.Funnel.conversion(allEvents, "ts", "user", "etype", steps, 100L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val streamCounts = steps.indices.map(i =>
      (i + 1) -> reached.count(_._2 == i + 1).toLong).toMap
    assert(batch == streamCounts)
  }

  test("cusumStream: alarm rows match batch cusumFlags across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import Streaming.CusumSample
    def bd(s: String) = new java.math.BigDecimal(s)
    val input = MemoryStream[CusumSample]
    val q = Streaming
      .cusumStream(input.toDS(), target = bd("10.00"), slack = bd("0.50"), h = bd("2.00"))
      .writeStream.format("memory").queryName("cusum_alarms").outputMode("append")
      .start()
    // batch 1: upward drift accumulates (S+ = 0.5, 1.5, 1.5 — no alarm)
    input.addData(
      CusumSample("k", 1, 11.0), CusumSample("k", 2, 11.5), CusumSample("k", 3, 10.5),
      CusumSample("other", 1, 10.0))
    q.processAllAvailable()
    // batch 2: state must carry S+ = 1.5 across the boundary; 11.2
    // pushes to 2.2 > h → alarm; then a plunge drives S− over h too
    input.addData(
      CusumSample("k", 4, 11.2), CusumSample("k", 5, 6.0), CusumSample("k", 6, 6.0))
    q.processAllAvailable()
    val got = spark.sql("SELECT key, ts, value, cusum_up, cusum_down FROM cusum_alarms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    q.stop()
    // batch parity on the same rows
    val events = Seq(
      ("k", 1L, 11.0), ("k", 2L, 11.5), ("k", 3L, 10.5), ("other", 1L, 10.0),
      ("k", 4L, 11.2), ("k", 5L, 6.0), ("k", 6L, 6.0)).toDF("key", "ts", "value")
    val batch = graft.ops.Anomaly
      .cusumFlags(events, "value", Seq("key"), Seq("ts"), bd("10.00"), bd("0.50"), bd("2.00"))
      .select("key", "ts", "value", "cusum_up", "cusum_down").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(got == batch && got.nonEmpty)
    // and the alarm set is what the recurrence says it is
    assert(got.map(t => (t._2, t._4, t._5)) == Set(
      (4L, 2.2, 0.0),     // S+ = 1.5 + 11.2 - 10.5 = 2.2 > 2
      (5L, 0.0, 3.5),     // S- = 0 + 10 - 6 - 0.5 = 3.5 > 2
      (6L, 0.0, 7.0)))    // S- = 3.5 + 3.5
  }

  test("ewmaStream: per-row smoothed points match batch controlChart across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import Streaming.Sample
    val input = MemoryStream[Sample]
    val q = Streaming
      .ewmaStream(input.toDS(), taps = 3, alphaNum = 1, alphaDen = 2,
        thresholdMicro = 1500000L)
      .writeStream.format("memory").queryName("ewma_points").outputMode("append")
      .start()
    input.addData(
      Sample("k", 1, 1.00), Sample("k", 2, 2.00), Sample("other", 1, 9.00))
    q.processAllAvailable()
    // the 3-tap window must carry across the batch boundary
    input.addData(Sample("k", 3, 4.00), Sample("k", 4, 4.00))
    q.processAllAvailable()
    val got = spark
      .sql("SELECT key, ts, n_taps, ewma, dev, alarm FROM ewma_points").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getInt(5))).toSet
    q.stop()
    val events = Seq(
      ("k", 1L, 1.00), ("k", 2L, 2.00), ("other", 1L, 9.00),
      ("k", 3L, 4.00), ("k", 4L, 4.00)).toDF("key", "ts", "value")
    val batch = graft.ts.Ewma
      .controlChart(events, Seq("key"), "ts", "ts", "value",
        taps = 3, alphaNum = 1, alphaDen = 2, thresholdMicro = 1500000L)
      .select("key", "ts", "n_taps", "ewma", "dev", "alarm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getInt(5))).toSet
    assert(got == batch && got.size == 5, s"got=$got\nbatch=$batch")
    // spot-check the chain: ts=3 smooths (4·4 + 2·2 + 1·1)/7 = 3.0,
    // dev = 4 − ewma(ts=2) = 4 − 5/3 → 2.333333 > 1.5 → alarm
    val t3 = got.find(t => t._1 == "k" && t._2 == 3L).get
    assert(t3._4 == 3.0 && t3._5 == Some(2.333333) && t3._6 == 1)
  }

  test("cohortStream: once-per-(user,offset) emission matches batch retention across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.UserActivity]
    val q = Streaming
      .cohortStream(input.toDS(), periodUs = 100L)
      .writeStream.format("memory").queryName("cohort_active").outputMode("append")
      .start()
    import Streaming.UserActivity
    // batch 1: u1 cohort 0 (events in periods 0,0,1 — the duplicate
    // period-0 event must not re-emit); u2 cohort 1, arriving out of
    // ts order within the batch (sort must anchor the cohort at 150)
    input.addData(
      UserActivity("u1", 10), UserActivity("u1", 50), UserActivity("u1", 120),
      UserActivity("u2", 199), UserActivity("u2", 150))
    q.processAllAvailable()
    // batch 2: u1 active again in period 1 (seen — no emit) and in
    // period 3; u2 in period 2 (offset 1 from cohort 1)
    input.addData(
      UserActivity("u1", 180), UserActivity("u1", 399),
      UserActivity("u2", 250))
    q.processAllAvailable()
    val got = spark.sql("SELECT user, cohort_period, period_offset FROM cohort_active").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(got == Set(
      ("u1", 0L, 0L), ("u1", 0L, 1L), ("u1", 0L, 3L),
      ("u2", 1L, 0L), ("u2", 1L, 1L)))
    // parity: count per (cohort, offset) == batch retention n_active
    val allEvents = Seq(
      ("u1", 10L), ("u1", 50L), ("u1", 120L), ("u2", 199L), ("u2", 150L),
      ("u1", 180L), ("u1", 399L), ("u2", 250L)).toDF("user", "ts")
    val batch = graft.ops.Funnel.retention(allEvents, "ts", "user", periodUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamCounts = got.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    assert(batch == streamCounts)
  }

  test("profileStream: per-window per-column report matches the batch profile row for row") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, java.lang.Long, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = Streaming
      .profileStream(
        input.toDF().toDF("event_time", "v", "t"),
        "event_time", windowDur = "10 seconds", watermark = "5 seconds",
        numericCols = Seq("v"), stringCols = Seq("t"), k = 8)
      .writeStream.format("memory").queryName("profile_stream").outputMode("append")
      .start()
    // window [0,10): values split across two micro-batches (partial
    // merge), with a null in each column
    val b1 = Seq((ts(1), 5L: java.lang.Long, "aa"), (ts(2), 7L: java.lang.Long, null))
    val b2 = Seq((ts(3), null: java.lang.Long, "bbb"), (ts(4), 7L: java.lang.Long, "aa"))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData((ts(20), 1L: java.lang.Long, "x")); q.processAllAvailable()
    val got = spark
      .sql("SELECT * FROM profile_stream WHERE win_start = timestamp '1970-01-01 00:00:00'")
      .drop("win_start")
    // batch parity on the same four rows
    import spark.implicits._
    val batchDf = (b1 ++ b2).map { case (_, v, t) => (v, t) }.toDF("v", "t")
    val batch = graft.ops.Profile.profile(batchDf, Seq("v"), Seq("t"), k = 8)
    assert(got.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
    assert(got.count() == 2)
    q.stop()
  }

  test("reliabilityStream + eceStream: per-window rows match batch reliabilityBins / ece") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Double, Int)]
    val input2 = MemoryStream[(java.sql.Timestamp, Double, Int)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = Streaming
      .reliabilityStream(
        input.toDF().toDF("event_time", "score", "label"),
        "event_time", "score", "label",
        windowDur = "10 seconds", watermark = "5 seconds", nBins = 4)
      .writeStream.format("memory").queryName("rel_stream").outputMode("append")
      .start()
    val q2 = Streaming
      .eceStream(
        input2.toDF().toDF("event_time", "score", "label"),
        "event_time", "score", "label",
        windowDur = "10 seconds", watermark = "5 seconds", nBins = 4)
      .writeStream.format("memory").queryName("ece_stream").outputMode("append")
      .start()
    // window [0,10): scores straddling bin edges (0.25 exactly, 1.0
    // clamped into the last bin), split across two micro-batches so
    // partial-merge runs
    val b1 = Seq((ts(1), 0.05, 1), (ts(2), 0.25, 0), (ts(3), 1.0, 1))
    val b2 = Seq((ts(4), 0.9999, 0), (ts(5), 0.25, 1), (ts(6), 0.4, 0))
    Seq(input, input2).foreach { in =>
      in.addData(b1: _*)
    }
    q.processAllAvailable(); q2.processAllAvailable()
    Seq(input, input2).foreach(_.addData(b2: _*))
    q.processAllAvailable(); q2.processAllAvailable()
    Seq(input, input2).foreach(_.addData((ts(20), 0.5, 0)))
    q.processAllAvailable(); q2.processAllAvailable()
    val batchDf = (b1 ++ b2).map { case (_, s, l) => (s, l) }.toDF("score", "label")
    val gotBins = spark
      .sql("SELECT bin, n, n_pos, score_sum FROM rel_stream WHERE win_start = timestamp '1970-01-01 00:00:00'")
    val batchBins = graft.ops.Calibration.reliabilityBins(batchDf, "score", "label", nBins = 4)
    assert(gotBins.collect().map(_.toString).sorted.toSeq ==
      batchBins.collect().map(_.toString).sorted.toSeq)
    val gotEce = spark
      .sql("SELECT n, ece FROM ece_stream WHERE win_start = timestamp '1970-01-01 00:00:00'")
      .head()
    val batchEce = graft.ops.Calibration.ece(batchDf, "score", "label", nBins = 4).head()
    assert(gotEce.getLong(0) == batchEce.getLong(0))
    assert(gotEce.getDouble(1) == batchEce.getDouble(1))
    q.stop(); q2.stop()
  }

  test("distinctRateStream sliding: hops overlap, each trailing window estimates its own rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = Streaming
      .distinctRateStream(
        input.toDF().toDF("event_time", "item"),
        "event_time", "item", windowDur = "10 seconds", watermark = "5 seconds",
        k = 8, slideDur = Some("5 seconds"))
      .writeStream.format("memory").queryName("dr_slide").outputMode("append")
      .start()
    // 3 distinct items at t=6..8s: they fall in windows [0,10) AND [5,15)
    input.addData(Seq(("i1", 6L), ("i2", 7L), ("i3", 8L), ("i1", 8L))
      .map { case (i, t) => (ts(t), i) }: _*)
    q.processAllAvailable()
    input.addData((ts(40), "closer")); q.processAllAvailable()
    val got = spark.sql("SELECT win_start, est_distinct FROM dr_slide ORDER BY win_start")
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getDouble(1)))
    // both overlapping windows closed with the same 3 distinct items
    assert(got.take(2).toSeq == Seq((0L, 3.0), (5L, 3.0)), got.mkString(";"))
    q.stop()
  }

  test("twapStream: closed-segment rollup equals batch twap after a flush tick") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Streaming.Sample]
    val q = Streaming.twapStream(input.toDS(), bucketUs = 100L, maxHoldUs = 150L)
      .writeStream.format("memory").queryName("twap_stream").outputMode("append")
      .start()
    // key a: within-bucket step, boundary crossing, staleness gap;
    // key b: single obs — emits nothing until the tick closes it.
    // Split across two micro-batches so the carried state runs.
    val rows = Seq(
      Streaming.Sample("a", 10L, 10.0), Streaming.Sample("a", 40L, 20.0),
      Streaming.Sample("b", 50L, 5.0))
    val rows2 = Seq(
      Streaming.Sample("a", 250L, 30.0)) // closes a@40 at 40+150=190 (stale)
    input.addData(rows: _*); q.processAllAvailable()
    input.addData(rows2: _*); q.processAllAvailable()
    // flush ticks close every key far away (bucket 10000)
    val ticks = Seq(
      Streaming.Sample("a", 1000000L, 0.0), Streaming.Sample("b", 1000000L, 0.0))
    input.addData(ticks: _*); q.processAllAvailable()
    val streamed = spark.sql(
      """SELECT key, bucket_start, SUM(dur_us) AS dur_us,
        |  ROUND((CAST(SUM(vsum_cents) AS DOUBLE) / CAST(100 AS DOUBLE))
        |        / CAST(SUM(dur_us) AS DOUBLE), 6) AS twap
        |FROM twap_stream GROUP BY 1, 2""".stripMargin)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = graft.ts.Twap.twap(
        (rows ++ rows2 ++ ticks).map(s => (s.key, s.ts, s.value)).toDF("key", "ts", "v"),
        Seq("key"), "ts", "v", bucketUs = 100L, maxHoldUs = 150L)
      .where(col("bucket_start") < 1000000L) // the ticks' own open tails
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(streamed == batch, s"streamed $streamed\nbatch $batch")
    q.stop()
  }

  test("abTestStream: per-window arm rows match batch abTest across micro-batch slicing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Int)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val q = Streaming
      .abTestStream(
        input.toDF().toDF("event_time", "variant", "converted"),
        "event_time", "variant", "converted",
        variants = Seq("control", "treat"), controlVariant = "control",
        windowDur = "10 seconds", watermark = "5 seconds")
      .writeStream.format("memory").queryName("ab_stream").outputMode("append")
      .start()
    val b1 = (0 until 30).map(i => (ts(1 + i % 5), if (i % 2 == 0) "control" else "treat",
      if (i % 3 == 0) 1 else 0))
    val b2 = (0 until 30).map(i => (ts(2 + i % 5), if (i % 2 == 0) "control" else "treat",
      if (i % 5 == 0) 1 else 0))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData((ts(20), "control", 0)); q.processAllAvailable()
    val got = spark.sql(
      "SELECT variant, n, conv, rate, z, significant FROM ab_stream " +
        "WHERE win_start = timestamp '1970-01-01 00:00:00'")
    val batch = graft.ops.Experiment.abTest(
      (b1 ++ b2).map { case (_, v, c) => (v, c) }.toDF("variant", "converted"),
      "variant", "converted", "control")
    assert(got.collect().map(_.toString).sorted.toSeq ==
      batch.collect().map(_.toString).sorted.toSeq)
    q.stop()
  }

  test("distinctRateStream: windowed KMV estimate, batch parity, bounded state, late-row drop") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val k = 8
    val q = Streaming
      .distinctRateStream(
        input.toDF().toDF("event_time", "item"),
        "event_time", "item", windowDur = "10 seconds", watermark = "5 seconds", k = k)
      .writeStream
      .format("memory")
      .queryName("distinct_rate")
      .outputMode("append")
      .start()
    // window [0,10): 30 distinct items (> k: estimator regime), repeats
    // split across two micro-batches so partial-merge runs
    val items = (0 until 30).map(i => s"item_$i")
    input.addData(items.take(20).zipWithIndex.map { case (it, i) => (ts(1 + i % 5), it) }: _*)
    q.processAllAvailable()
    input.addData((items.drop(20) ++ items.take(10)).zipWithIndex.map { case (it, i) =>
      (ts(2 + i % 5), it)
    }: _*)
    q.processAllAvailable()
    input.addData((ts(20), "closer"))
    q.processAllAvailable()
    val got = spark.sql("SELECT win_start, n_kmv, est_distinct FROM distinct_rate").collect()
    assert(got.length == 1)
    assert(got.head.getInt(1) == k)
    // batch parity: the identical rows through the batch rollup
    val batchDf = items.zipWithIndex
      .map { case (it, _) => ("w0", it) } ++ items.take(10).map(("w0", _))
    val batch = graft.ops.Cardinality
      .kmvDistinct(batchDf.toDF("g", "item"), "g", "item", k)
      .head()
    assert(got.head.getDouble(2) == batch.getDouble(2))
    // a late row (event time 3 < watermark 15) must not resurrect the window
    input.addData((ts(3), "very_late_item"))
    q.processAllAvailable()
    input.addData((ts(40), "closer2"))
    q.processAllAvailable()
    val all = spark.sql("SELECT win_start, n_kmv FROM distinct_rate ORDER BY win_start").collect()
    q.stop()
    assert(all.length == 2, all.mkString(";")) // [0,10) once, [20,30) once
  }

  test("streaming OHLC: window closes once with batch-identical stats across batch slicing") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = Streaming
      .ohlcStream(
        input.toDS().toDF("et", "k", "value"),
        "et", "k", windowDuration = "10 seconds", watermarkDelay = "5 seconds")
      .writeStream.format("memory").queryName("ohlc").outputMode("append")
      .start()
    // window [0,10) split across two micro-batches, out of ts order
    input.addData((ts(3), "a", 5.0), (ts(1), "a", 2.0))
    q.processAllAvailable()
    input.addData((ts(9), "a", 7.0), (ts(2), "a", 9.0))
    q.processAllAvailable()
    input.addData((ts(30), "a", 1.0)) // watermark past 10 → window closes
    q.processAllAvailable()
    val rows = spark.sql("SELECT k, n, open, close, high, low, vsum FROM ohlc").collect()
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows.head
    assert((r.getString(0), r.getLong(1)) == (("a", 4L)))
    assert(r.getDecimal(2).doubleValue == 2.0)   // open at ts 1
    assert(r.getDecimal(3).doubleValue == 7.0)   // close at ts 9
    assert(r.getDecimal(4).doubleValue == 9.0)
    assert(r.getDecimal(5).doubleValue == 2.0)
    assert(r.getDecimal(6).doubleValue == 23.0)
    // batch parity on the same rows
    val batch = graft.ops.Resample.ohlc(
      Seq(("a", 3000000L, 5.0), ("a", 1000000L, 2.0), ("a", 9000000L, 7.0), ("a", 2000000L, 9.0))
        .toDF("k", "ts", "v"),
      Seq("k"), "ts", "v", bucketUs = 10000000L).head()
    assert(batch.getLong(2) == 4L && batch.getDecimal(3).doubleValue == 2.0 &&
      batch.getDecimal(4).doubleValue == 7.0)
    q.stop()
  }

  test("streaming quantiles: closed window matches batch histQuantiles given matching bounds") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val probs = Seq(0.5, 0.9, 0.99)
    val q = Streaming
      .quantilesStream(
        input.toDS().toDF("et", "v"), "et", "v",
        windowDur = "100 seconds", watermark = "5 seconds",
        probs, lo = 0.0, hi = 99.0, buckets = 32)
      .writeStream.format("memory").queryName("squant").outputMode("append")
      .start()
    // full-residue values 0..99 (37 coprime to 100 ⇒ min 0, max 99 —
    // matching the declared bounds exactly), two micro-batches
    val vals = (0 until 100).map(i => (i * 37) % 100)
    input.addData(vals.take(60).zipWithIndex.map { case (v, i) => (ts(i % 90), v.toDouble) }: _*)
    q.processAllAvailable()
    input.addData(vals.drop(60).zipWithIndex.map { case (v, i) => (ts(i % 90), v.toDouble) }: _*)
    q.processAllAvailable()
    input.addData((ts(300), -1.0)) // watermark past window end → close
    q.processAllAvailable()
    val got = spark.sql("SELECT prob, n, q_est FROM squant WHERE win_start < timestamp '1970-01-01 00:01:40'")
      .collect().map(r => r.getDouble(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    q.stop()
    assert(got.keySet == probs.toSet)
    got.values.foreach { case (n, _) => assert(n == 100L) }
    // batch parity: bounds == the data's min/max, so the estimators align
    import spark.implicits._
    val batch = graft.ops.Profile
      .histQuantiles(vals.map(_.toDouble).toDF("v"), Seq("v"), probs, buckets = 32)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    probs.foreach { p => assert(got(p)._2 == batch(p), s"p=$p ${got(p)._2} vs ${batch(p)}") }
  }

  test("ksDriftStream: exact bucketed D per closed window, alarm on a real shift") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    // baseline: uniform over 2 buckets on [0, 2), nRef = 60
    val q = Streaming
      .ksDriftStream(input.toDS().toDF("et", "v"), "et", "v",
        windowDur = "100 seconds", watermark = "5 seconds",
        lo = 0.0, hi = 2.0, baseline = Seq(30L, 30L))
      .writeStream.format("memory").queryName("ksdrift").outputMode("append").start()
    // window 1 (0-100s): matches the baseline -> D small, no alarm;
    // split across two micro-batches to exercise partial merge
    val w1 = (0 until 30).map(i => (ts(i), 0.5)) ++ (0 until 30).map(i => (ts(30 + i % 60), 1.5))
    input.addData(w1.take(25): _*)
    q.processAllAvailable()
    input.addData(w1.drop(25): _*)
    q.processAllAvailable()
    // window 2 (100-200s): everything in bucket 0 -> D = 1/2, alarm
    input.addData((0 until 60).map(i => (ts(100 + i % 90), 0.25)): _*)
    q.processAllAvailable()
    input.addData((ts(400), -1.0)) // advance watermark past both windows
    q.processAllAvailable()
    val got = spark.sql("SELECT win_start, n, d, reject FROM ksdrift ORDER BY win_start")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    q.stop()
    assert(got.length >= 2, got.mkString(","))
    // window 1: obs [30, 30] vs ref cums [30, 60]: D = 0
    assert(got(0) == ((60L, 0.0, 0)))
    // window 2: obs [60, 0]: |60*60 - 30*60| = 1800 -> D = 1800/3600 = 0.5;
    // reject: 0.5 > sqrt(-ln(.025)/2)*sqrt(120/3600) ~ 0.2479 -> alarm
    assert(got(1) == ((60L, 0.5, 1)))
  }

  test("sprtStream: running llr crosses a boundary mid-stream; final state equals batch sprt") {
    implicit val sqlCtx = spark.sqlContext
    import Streaming.ArmConv
    val input = MemoryStream[ArmConv]
    val q = Streaming
      .sprtStream(input.toDS(), p0 = 0.1, p1 = 0.3)
      .writeStream.format("memory").queryName("sprt_updates").outputMode("append")
      .start()
    // batch 1: 2 conversions of 4 — llr above 0 but below upper → continue
    input.addData(ArmConv("hot", 1), ArmConv("hot", 0), ArmConv("hot", 1), ArmConv("hot", 0))
    q.processAllAvailable()
    // batch 2: 3 more conversions push past ln(16) → accept_h1
    input.addData(ArmConv("hot", 1), ArmConv("hot", 1), ArmConv("hot", 1), ArmConv("hot", 0))
    q.processAllAvailable()
    val got = spark.sql("SELECT n, conv, llr, decision FROM sprt_updates ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    q.stop()
    assert(got.length == 2)
    assert(got(0)._4 == "continue", got.mkString(","))
    assert(got(1)._4 == "accept_h1")
    // final trajectory point equals the batch operator on the same rows
    val all = (Seq(1, 0, 1, 0) ++ Seq(1, 1, 1, 0)).map(("hot", _))
    val batch = graft.ops.Experiment
      .sprt(all.toDF("variant", "conv"), "variant", "conv", p0 = 0.1, p1 = 0.3)
      .head()
    assert(got(1) == ((batch.getLong(1), batch.getLong(2), batch.getDouble(3), batch.getString(4))))
  }

  test("seasonalScoreStream: stream-static profile join matches batch score bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // batch-train the profile on historical rows
    val hist = Seq(
      ("k", 5L, 1.00), ("k", 15L, 3.00), ("k", 25L, 2.00), ("k", 35L, 5.00)
    ).toDF("k", "ts", "v")
    val prof = graft.ts.Seasonal.profile(hist, Seq("k"), "ts", "v", binUs = 10L, phases = 2)
    val input = MemoryStream[(String, Long, Double)]
    val q = Streaming
      .seasonalScoreStream(input.toDS().toDF("k", "ts", "v"), prof,
        Seq("k"), "ts", "v", binUs = 10L, phases = 2, thresholdMicro = 600000L)
      .select("k", "ts", "phase", "n_phase", "expected", "residual", "alarm")
      .writeStream.format("memory").queryName("seasonal_scores").outputMode("append")
      .start()
    input.addData(("k", 45L, 2.00), ("k", 55L, 9.00)) // phases 0, 1
    q.processAllAvailable()
    input.addData(("k", 65L, 1.50), ("zzz", 5L, 1.0)) // unknown key drops
    q.processAllAvailable()
    val got = spark.sql("SELECT * FROM seasonal_scores").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6))).toSet
    q.stop()
    val live = Seq(("k", 45L, 2.00), ("k", 55L, 9.00), ("k", 65L, 1.50), ("zzz", 5L, 1.0))
      .toDF("k", "ts", "v")
    val batch = graft.ts.Seasonal
      .score(live, prof, Seq("k"), "ts", "v", binUs = 10L, phases = 2,
        thresholdMicro = 600000L)
      .select("k", "ts", "phase", "n_phase", "expected", "residual", "alarm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getInt(6))).toSet
    assert(got == batch && got.size == 3, s"got=$got")
    // phase-0 profile mean 1.5: ts=45 scores residual 0.5, no alarm;
    // phase-1 mean 4.0: ts=55 residual 5.0 → alarm
    assert(got.contains(("k", 45L, 0L, 2L, 1.5, 0.5, 0)))
    assert(got.contains(("k", 55L, 1L, 2L, 4.0, 5.0, 1)))
  }

  test("isotonicScoreStream: stream-static serve join matches batch isotonicScore bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // batch-fit on a violating fixture so PAV actually pools:
    // rates by score 0.1→1/2, 0.5→0/2 (violation → pools), 0.9→2/2
    val hist = Seq(
      (0.1, 1), (0.1, 0), (0.5, 0), (0.5, 0), (0.9, 1), (0.9, 1)
    ).toDF("score", "label")
    val fit = graft.ops.Calibration.isotonicFit(hist, "score", "label")
    val input = MemoryStream[(Long, Double)]
    val q = Streaming
      .isotonicScoreStream(input.toDS().toDF("id", "score"), "score", fit)
      .writeStream.format("memory").queryName("iso_scores").outputMode("append")
      .start()
    input.addData((1L, 0.1), (2L, 0.5))
    q.processAllAvailable()
    input.addData((3L, 0.9), (4L, 0.7)) // 0.7 unseen at fit time → drops
    q.processAllAvailable()
    val got = spark.sql("SELECT id, score, calibrated FROM iso_scores").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    q.stop()
    val live = Seq((1L, 0.1), (2L, 0.5), (3L, 0.9), (4L, 0.7)).toDF("id", "score")
    val batch = graft.ops.Calibration.isotonicScore(live, "score", fit)
      .select("id", "score", "calibrated").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == batch && got.size == 3, s"got=$got")
    // pooled 0.1/0.5 step serves 0.25 to both; 0.9 serves 1.0
    assert(got.contains((1L, 0.1, 0.25)) && got.contains((2L, 0.5, 0.25)))
    assert(got.contains((3L, 0.9, 1.0)))
  }

  test("psiDriftStream: zero on a baseline-matching window, decimal-exact alert on a shift") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    // baseline: uniform over 2 buckets on [0, 2)
    val q = Streaming
      .psiDriftStream(input.toDS().toDF("et", "v"), "et", "v",
        windowDur = "100 seconds", watermark = "5 seconds",
        lo = 0.0, hi = 2.0, baseline = Seq(30L, 30L))
      .writeStream.format("memory").queryName("psidrift").outputMode("append").start()
    // window 1: matches the baseline exactly; split across micro-batches
    val w1 = (0 until 30).map(i => (ts(i), 0.5)) ++ (0 until 30).map(i => (ts(30 + i % 60), 1.5))
    input.addData(w1.take(25): _*)
    q.processAllAvailable()
    input.addData(w1.drop(25): _*)
    q.processAllAvailable()
    // window 2: everything lands in bucket 0 — a hard shift
    input.addData((0 until 60).map(i => (ts(100 + i % 90), 0.25)): _*)
    q.processAllAvailable()
    input.addData((ts(400), -1.0)) // advance watermark past both windows
    q.processAllAvailable()
    val got = spark.sql("SELECT win_start, n, psi, alert FROM psidrift ORDER BY win_start")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    q.stop()
    assert(got.length >= 2, got.mkString(","))
    assert(got(0) == ((60L, 0.0, 0)))
    // window 2: pa = [1, 1e-6 clamped], pb = [.5, .5] — same term chain
    def t12(pa: Double, pb: Double) =
      BigDecimal((pa - pb) * math.log(pa / pb)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val want = (t12(1.0, 0.5) + t12(1e-6, 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1) == ((60L, want, 1)), s"got=${got(1)} want=$want")
  }

  test("stream-stream touch attribution: lookback window, cross-batch buffering, key isolation") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val touches = MemoryStream[(String, Long, java.sql.Timestamp)]
    val convs = MemoryStream[(String, Long, java.sql.Timestamp)]
    val q = Streaming
      .touchAttributionStream(
        touches.toDS().toDF("key", "touch_id", "touch_time"),
        convs.toDS().toDF("key", "conv_id", "conv_time"),
        lookback = "60 seconds", delay = "10 seconds")
      .writeStream.format("memory").queryName("attrib").outputMode("append")
      .start()
    // batch 1: touches only — buffered, nothing emits
    touches.addData(("u1", 1L, ts(10)), ("u1", 2L, ts(40)), ("u2", 3L, ts(40)))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM attrib").count() == 0)
    // batch 2: conversions arrive in a LATER batch — the buffered
    // touches must still match; u1's conv at t=70 sees touches 10 and
    // 40 (both within 60s); u2's conv at t=200 sees nothing (touch
    // too old); touch on u2 never pairs with u1's conv
    convs.addData(("u1", 100L, ts(70)), ("u2", 200L, ts(200)))
    q.processAllAvailable()
    val got = spark.sql("SELECT key, conv_id, touch_id FROM attrib").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    q.stop()
    assert(got == Seq(("u1", 100L, 1L), ("u1", 100L, 2L)))
  }

  test("streaming CDC compact: last emission per key equals batch compact, tombstones flagged") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.ChangeRow]
    val q = Streaming
      .compactStream(input.toDS(), deleteOps = Set("D"))
      .writeStream.format("memory").queryName("snapshot").outputMode("append")
      .start()
    // batch 1
    input.addData(
      Streaming.ChangeRow(1L, 10L, "I", 1.0), Streaming.ChangeRow(1L, 20L, "U", 2.0),
      Streaming.ChangeRow(2L, 10L, "I", 5.0),
      Streaming.ChangeRow(3L, 10L, "I", 7.0))
    q.processAllAvailable()
    // batch 2: key 1 advances; key 2 tombstoned; key 3 gets an OUT-OF-ORDER
    // older version (must be absorbed) then a replay of its current version
    input.addData(
      Streaming.ChangeRow(1L, 30L, "U", 3.0),
      Streaming.ChangeRow(2L, 40L, "D", 0.0),
      Streaming.ChangeRow(3L, 5L, "U", 99.0),
      Streaming.ChangeRow(3L, 10L, "I", 7.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT key, ord, op, value, deleted FROM snapshot").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
    q.stop()
    // key 3 emitted exactly once: the stale + replayed rows were both no-ops
    assert(rows.count(_._1 == 3L) == 1, rows.mkString(";"))
    // last emission per key
    val last = rows.groupBy(_._1).map { case (k, v) => k -> v.maxBy(_._2) }
    assert(last(1L) == ((1L, 30L, "U", 3.0, false)))
    assert(last(2L) == ((2L, 40L, "D", 0.0, true)))
    assert(last(3L) == ((3L, 10L, "I", 7.0, false)))
    // batch parity: non-deleted last emissions == Changelog.compact of the full log
    val fullLog = Seq(
      (1L, 10L, "I", 1.0), (1L, 20L, "U", 2.0), (2L, 10L, "I", 5.0), (3L, 10L, "I", 7.0),
      (1L, 30L, "U", 3.0), (2L, 40L, "D", 0.0), (3L, 5L, "U", 99.0), (3L, 10L, "I", 7.0)
    ).toDF("key", "ord", "op", "value")
    val batch = graft.ops.Changelog
      .compact(fullLog, Seq("key"), Seq("ord"), "op", Set("D"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    val streamed = last.values.filterNot(_._5).map(t => (t._1, t._2, t._3, t._4)).toSet
    assert(streamed == batch)
  }
}
