package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Sustained-rate measurement of STREAMING CURATION
  * ([[graft.streaming.Streaming.curateStream]]): documents arrive as
  * parquet files dropped into a live directory (the ingest-landing-zone
  * shape the streaming form exists for) while the curation screen —
  * quality/repetition gates, per-row decontamination, watermarked exact
  * dedup, mixture sample — drains them to the noop sink. Reports docs/s
  * and text-MB/s over the drain, comparable to the raw file-source rate
  * measured the same way with the screen replaced by `select(*)`.
  *
  * `runMain graft.tools.CurateBench [sfDir] [chunks] [mode]` —
  * mode `curate` (default), `raw` (source ceiling, same files),
  * `nodedup` (stateless prefix only), or `neardup` (full curate chain
  * PLUS the signature-verified corpus band-index probe per trigger —
  * [[graft.streaming.Streaming.nearDupScreenStream]]).
  * Use a `ScaleGen` dir (e.g. /tmp/scale10) for a longer steady state.
  */
object CurateBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = if (args.length > 1) args(1).toInt else 20
    val mode = if (args.length > 2) args(2) else "curate"
    // nodedup: the stateless prefix only (gates + per-row decontamination
    // + mixture), no watermark state — isolates the state-store cost.
    // neardup: the full curate chain PLUS the per-trigger corpus
    // band-index probe (signature-verified) — complete admission control
    require(Seq("curate", "raw", "nodedup", "neardup").contains(mode),
      s"mode must be curate|raw|nodedup|neardup, got $mode")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // stage: split the corpus into `chunks` single-file parquet chunks
    // with a synthetic arrival timestamp (doc order = arrival order)
    val root = Files.createTempDirectory("curatebench").toFile.getPath
    val staging = s"$root/staging"
    val live = s"$root/live"
    Files.createDirectories(Paths.get(live))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000L))
    val stats = docs.agg(count("*"), sum(length(col("text")))).first()
    val total = stats.getLong(0)
    val textMb = stats.getLong(1) / 1e6
    docs.withColumn("__chunk", pmod(col("doc_id"), lit(chunks)))
      .repartition(chunks, col("__chunk"))
      .drop("__chunk")
      .write.parquet(staging)
    val chunkFiles = Files.list(Paths.get(staging)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    // seed one chunk so the source has data at start
    Files.move(
      Paths.get(chunkFiles.head),
      Paths.get(s"$live/${Paths.get(chunkFiles.head).getFileName}"),
      StandardCopyOption.ATOMIC_MOVE)

    val totalIn = new java.util.concurrent.atomic.AtomicLong
    val busyMs = new java.util.concurrent.atomic.AtomicLong
    val nBatches = new java.util.concurrent.atomic.AtomicLong
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        if (e.progress.numInputRows > 0) {
          totalIn.addAndGet(e.progress.numInputRows)
          busyMs.addAndGet(e.progress.durationMs.getOrDefault("triggerExecution", 0L).toLong)
          nBatches.incrementAndGet()
        }
    })

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(live)
    val bench = docs.where(col("source") === "src0").drop("ts")
    val cfg = graft.ops.Curation.Config(
      minStopwordRatio = 0.02,
      maxMeanWordLen = 5.0,
      maxDup2gramFrac = 0.15,
      weights = graft.SparkEntry.mixtureWeights,
      salt = "curate1"
    )
    val transformed = mode match {
      case "raw" => stream
      case "curate" | "neardup" =>
        graft.streaming.Streaming.curateStream(stream, bench, cfg, "ts", "10 seconds")
      case _ => // nodedup: curateStream's stateless stages, no watermark state
        val benchShingles = graft.ops.DedupDocs
          .shingles(bench, cfg.decontaminateK)
          .select("shingle").distinct().collect().map(_.getString(0)).toSeq
        stream
          .where(graft.ops.Curation.gatePredicate(cfg))
          .where(
            graft.functions.ShingleSetOverlap
              .shingleSetOverlap(col("text"), cfg.decontaminateK, benchShingles)
              < cfg.decontaminateMinOverlap)
          .transform(graft.ops.Mixture.sample(_, cfg.weights, cfg.salt))
    }
    val q = mode match {
      case "neardup" =>
        // persisted corpus index (3/4 of the corpus), probed per trigger
        // by the micro-batch's broadcast band keys; persist = the bench
        // analog of the index living as a parquet table
        val corpus = docs.where(col("doc_id") % 4 =!= 0).drop("ts")
        val idx = graft.ops.IncrementalDedup
          .buildIndexWithSignatures(corpus, k = 3, numHashes = 16, rowsPerBand = 4)
          .persist()
        println(s"corpus index rows: ${idx.count()}")
        graft.streaming.Streaming
          .nearDupScreenStream(transformed, idx, 3, 16, 4, Some(0.5)) { screened =>
            screened.write.format("noop").mode("overwrite").save()
          }
          .trigger(Trigger.ProcessingTime("200 milliseconds"))
          .option("checkpointLocation", s"$root/ckpt")
          .start()
      case _ =>
        transformed.writeStream
          .format("noop")
          .trigger(Trigger.ProcessingTime("200 milliseconds"))
          .option("checkpointLocation", s"$root/ckpt")
          .start()
    }

    // drop the remaining chunks in as fast as the fs moves them — the
    // question is how fast the SCREEN drains, so the writer must never
    // be the bottleneck
    val t0 = System.nanoTime()
    chunkFiles.tail.foreach { f =>
      Files.move(
        Paths.get(f),
        Paths.get(s"$live/${Paths.get(f).getFileName}"),
        StandardCopyOption.ATOMIC_MOVE)
      Thread.sleep(20)
    }
    var spins = 0
    while (totalIn.get() < total && spins < 6000) {
      Thread.sleep(100)
      spins += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop()

    val wallRate = total / wall
    val busyRate =
      if (busyMs.get() > 0) totalIn.get() * 1000.0 / busyMs.get() else Double.NaN
    println(
      s"""{"stream":"curate","mode":"$mode","docs":$total,"batches":${nBatches.get()},""" +
        s""""wall_sec":$wall,"delivered":${totalIn.get()},""" +
        f""""wall_docs_per_sec":$wallRate%.0f,"busy_docs_per_sec":$busyRate%.0f,""" +
        f""""wall_text_mb_per_sec":${textMb / wall}%.1f}"""
    )
    spark.stop()
  }
}
