package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact vs sketch vocab mining at scale
  * ([[graft.ops.Text.topNgrams]] vs [[graft.ops.Text.topNgramsSketch]]):
  * `runMain graft.tools.TopNgramsBench [sfDir] [capacity]`
  *
  * Reports, for per-source 3-gram top-10 over the given dir: wall
  * seconds, total shuffle-write bytes, the sketch's err certificate,
  * and top-10 agreement vs exact. The sketch's value proposition is the
  * exchange: capacity-bounded summaries per (partition, source) instead
  * of every distinct gram — the number to watch is shuffle bytes as the
  * gram universe grows past capacity. */
object TopNgramsBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/scale2000"
    val capacity = if (args.length > 1) args(1).toInt else 1 << 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // Two corpora, two regimes:
    //  - the sfDir corpus: ScaleGen'd copies are token-decorrelated, so
    //    its top gram counts sit BELOW any reachable err — the honest
    //    "sketch cannot rank here" case (the bound still holds);
    //  - `zipf`: heavy template phrases over a huge unique tail — the
    //    web-corpus shape the sketch exists for (top counts ≫ err).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source")
    docs.count() // warm

    def zipfCorpus(nDocs: Int): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val per = nDocs / 32
      spark.sparkContext.parallelize(0 until 32, 32).flatMap { pid =>
        val r = new scala.util.Random(4200L + pid)
        val phrases = {
          val pr = new scala.util.Random(7L) // SHARED heavy phrases
          Array.fill(50)(Seq.fill(3)("p" + pr.nextInt(40)).mkString(" "))
        }
        (0 until per).iterator.map { i =>
          val sb = new StringBuilder
          var j = 0
          while (j < 10) { // 10 blocks of (9 unique + 1 heavy phrase)
            var u = 0
            while (u < 9) { sb.append(r.nextInt(Int.MaxValue)).append(' '); u += 1 }
            sb.append(phrases(r.nextInt(phrases.length))).append(' ')
            j += 1
          }
          (pid.toLong * per + i, sb.toString.trim, s"src${i % 4}")
        }
      }.toDF("doc_id", "text", "source")
    }

    def run(name: String, mk: () => org.apache.spark.sql.DataFrame)
        : Seq[(String, String, Long)] = {
      mk().write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(1000)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = mk().collect()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      println(f"TOPNGRAMS plan=$name%-7s sec=$sec%6.2f shuffle=${shuffleBytes.get() / 1e6}%9.1f MB rows=${rows.length}")
      rows.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    }

    Seq(
      ("sfdir", docs),
      ("zipf", zipfCorpus(500000).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    ).foreach { case (corpus, d) =>
      d.count()
      val exact = run(s"$corpus/exact", () =>
        graft.ops.Text.topNgrams(d, n = 3, k = 10)
          .select("source", "ngram", "n_occurrences"))
      val sketch = run(s"$corpus/sketch", () =>
        graft.ops.Text.topNgramsSketch(d, n = 3, k = 10, capacity = capacity)
          .select("source", "ngram", "n_occurrences"))
      val errRow = graft.ops.Text
        .topNgramsSketch(d, n = 3, k = 10, capacity = capacity)
        .agg(max("err")).collect()(0).getLong(0)
      val topCount = exact.map(_._3).max
      val agree = exact.map(r => (r._1, r._2)).toSet
        .intersect(sketch.map(r => (r._1, r._2)).toSet).size
      println(s"TOPNGRAMS corpus=$corpus capacity=$capacity err=$errRow " +
        s"top_count=$topCount resolvable=${topCount > errRow} " +
        s"top10_overlap=$agree/${exact.size}")
      d.unpersist()
    }
    spark.stop()
  }
}
