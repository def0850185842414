package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Identity-kernel A/B for the exact-substring dup-span plan
  * ([[graft.ops.DedupDocs.dupSpans]] two-seed-xx64-pair identity vs the
  * retained [[graft.ops.DedupDocs.dupSpansMd5]] MD5 identity):
  * `runMain graft.tools.DupSpansBench [nDocs] [tokensPerDoc]`
  *
  * Two synthetic corpora at the same gram count, generated distributedly:
  *  - `unique`      — random tokens over a 10^9 space: ~every gram is a
  *    singleton (the regime a doc-deduplicated web corpus lives in);
  *  - `boilerplate` — each doc draws half its tokens from a 100-token
  *    shared template stream: ~a third of gram POSITIONS are duplicated
  *    (the driver-testdata regime).
  *
  * Emits one line per (corpus, plan): wall seconds + shuffle-write bytes
  * + the corpus's dup fraction, so the kernel-choice claim in the
  * scaladoc stays an honest, re-measurable one. (This bench also
  * measured — and killed — the r10-verdict singleton-shedding two-phase
  * plan: slower at EVERY dup fraction including 0 %, and more total
  * shuffle bytes once its candidate subtree was double-consumed; see
  * COVERAGE r11.)
  */
object DupSpansBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 200000
    val perDoc = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(name: String): DataFrame = {
      val per = nDocs / 32
      spark.sparkContext.parallelize(0 until 32, 32).flatMap { pid =>
        val r = new scala.util.Random(7000L + pid)
        val template = {
          val tr = new scala.util.Random(99L) // SHARED stream across docs
          Array.fill(100)("t" + tr.nextInt(1000))
        }
        (0 until per).iterator.map { i =>
          val toks = name match {
            case "unique" =>
              Array.fill(perDoc)(r.nextInt(Int.MaxValue).toString)
            case "boilerplate" =>
              // alternate 10-token unique runs with 10-token template runs
              (0 until perDoc).map { j =>
                if ((j / 10) % 2 == 0) r.nextInt(Int.MaxValue).toString
                else template((j + i) % template.length)
              }.toArray
          }
          (pid.toLong * per + i, toks.mkString(" "))
        }
      }.toDF("doc_id", "text").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // total shuffle-write bytes per run — the claim the two-phase plan
    // actually makes (narrower exchange rows) is about bytes on the
    // wire, so measure them, not just wall time
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    Seq("unique", "boilerplate").foreach { name =>
      val docs = corpus(name)
      docs.count()
      // dup-position fraction at k=5 (the run's gram size)
      val spans = graft.ops.DedupDocs.dupSpans(docs, k = 5)
      val frac = spans
        .agg((sum("n_dup_starts") / sum(col("n_tokens") - lit(4))).cast("double"))
        .as[Double].head()
      // interleaved min-of-N (the repo's bench protocol: this box has
      // heavy intra-session variance, so single runs lie)
      val plans = Seq(
        ("md5-identity", () => graft.ops.DedupDocs.dupSpansMd5(docs, k = 5)),
        ("xx-pair     ", () => graft.ops.DedupDocs.dupSpans(docs, k = 5))
      )
      plans.foreach { case (_, mk) => time(mk().agg(sum("n_covered")).collect()) } // warm
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
      val bytes = scala.collection.mutable.Map.empty[String, Long]
      (1 to 3).foreach { _ =>
        plans.foreach { case (plan, mk) =>
          Thread.sleep(1000) // let the listener bus drain
          shuffleBytes.set(0L)
          val sec = time(mk().agg(sum("n_covered")).collect())
          Thread.sleep(1000)
          times(plan) = sec :: times.getOrElse(plan, Nil)
          bytes(plan) = shuffleBytes.get()
        }
      }
      plans.foreach { case (plan, _) =>
        val ts = times(plan)
        println(f"DUPSPANS corpus=$name%-11s plan=$plan dup_start_frac=$frac%.3f " +
          f"min=${ts.min}%6.2f s  med=${ts.sorted.apply(ts.size / 2)}%6.2f s  " +
          f"shuffle=${bytes(plan) / 1e6}%8.1f MB")
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
