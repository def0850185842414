package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times on the
  * sf dir given by SPARK_GRAFT_SF_DIR. A warm-up pass first touches every
  * table (parquet footers, codegen, broadcast machinery), then EVERY
  * query's plan is executed once against tiny data (sf0.001 by default —
  * SPARK_GRAFT_BENCH_WARM_DIR, empty to skip) so plan analysis and
  * whole-stage-codegen compilation happen BEFORE the measured loop:
  * round 16's artifact fit only ONE pass because pass 1 paid the full
  * cold tax (313 s cold vs ~220 s warm at 231 queries), so the shipped
  * stats were cold single-pass numbers. Codegen compiles are cached by
  * generated source, which is data-independent, so a tiny-data run of
  * the SAME plan shape warms the sf0.1 run. Queries then run in sorted
  * name order for round-over-round comparability.
  *
  * Each query is timed over up to REPEATS interleaved passes over the
  * whole suite (not back-to-back), and BOTH the MEDIAN and the MIN
  * reported (`queries` / `queries_min`): single-run numbers on this box
  * wobble ±15% (JIT/GC), enough to fake a 2× regression on any 1–4 s
  * query — rounds 4/5 spent a full cycle proving one such phantom, round
  * 6's back-to-back repeats let a transient disturbance fake a 4.6× on
  * q_decimate_fir (all three repeats shared it), and round 9's whole
  * SESSION ran ~1.7× hot (judge-confirmed cross-session variance, not
  * plan change). The min is the variance-robust statistic for a fixed
  * workload on a noisy box — a query's floor can't be inflated by
  * co-tenant noise, only honestly achieved — so round-over-round
  * comparisons should read `queries_min` first and treat median−min
  * spread as the session's noise band.
  *
  * TIME-BUDGETED passes (round 16, after BENCH_r15 died at the driver's
  * wall cap with rc 124 and NO parsed artifact): pass 1 always runs
  * fully; each further pass starts only if the projected wall after it
  * stays within SPARK_GRAFT_BENCH_BUDGET_S (default 680 s of measured
  * loop — startup, table warm-up, plan warm-up and sbt overhead live
  * outside the budget). Round 18 changed the next-pass projection to
  * 0.95× the LAST pass (r17 used the max): whenever the warm phase
  * hits its deadline, pass 1 absorbs the residual cold tax and stays
  * the slowest pass forever, so the max-projection under-counts the
  * remaining budget — two consecutive rounds shipped single-pass
  * artifacts, the r17 judge run missing pass 2 by 0.86 s. See
  * [[shouldContinue]] for the worst-case wall arithmetic.
  * The emitted JSON reports `passes_completed` plus `pass_times`;
  * medians/mins are taken over however many passes fit. A JVM shutdown
  * hook emits the partial-results JSON on SIGTERM, so even a
  * harness-level timeout (SIGTERM from `timeout`) yields a parsed
  * artifact; `"partial":true` marks any emission that didn't complete
  * the measured loop (ADVICE r16: a truncated total must not be
  * readable as a speedup), and `expected_queries` lets a consumer
  * verify coverage.
  *
  * The JSON line is ALSO written to BENCH_local.json in the working
  * directory (SPARK_GRAFT_BENCH_OUT to override): the driver's BENCH
  * artifact keeps only the last 2 KB of stdout, which truncated 163 of
  * 231 per-query times out of BENCH_r16.json — the repo-side file is
  * the durable copy round-over-round regression checks read.
  *
  * Override passes with SPARK_GRAFT_BENCH_REPEATS (dev loops can set 1).
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** The pass-budget gate, pure for unit testing (BenchGateSpec): start
    * pass `passesDone + 1` iff the repeat cap allows it AND one more
    * pass projected at 0.95× the MOST RECENT pass time fits the
    * measured-loop budget. Round 18 changed the projection from the
    * maximum observed pass to 0.95× the last pass: whenever the warm
    * phase hits its deadline (both r17 artifacts: warm_s = 180.0 on
    * the judge box), pass 1 absorbs the residual cold tax and is the
    * SLOWEST pass, so a max-projection permanently over-projects and
    * the suite lands single-pass — the r17 judge run missed pass 2 by
    * 0.86 s (310.43 × 2 = 620.86 vs 620). The last pass is the honest
    * steady-state estimate once warming holds, and the 0.95 recovers
    * exactly the truncated-warm case (a fully-warmed next pass runs
    * slightly under pass 1). Worst-case measured-loop wall is
    * `budget + (next − 0.95·last)` — bounded by one pass's own
    * variance plus 5%, with the SIGTERM emit hook (partial:true) as
    * the backstop past the driver's cap. */
  private[graft] def shouldContinue(
      passesDone: Int,
      repeats: Int,
      elapsedS: Double,
      lastPassS: Double,
      budgetS: Double): Boolean =
    passesDone < repeats && elapsedS + 0.95 * lastPassS <= budgetS

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: touch every table once + exercise codegen/window machinery
    try graft.model.Tables.events(spark, sfDir).limit(1).count() // sets nanos conf
    catch { case _: Throwable => }
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => }
    }
    // exercise the heavy executor machinery once on tiny data so the
    // FIRST measured query doesn't absorb one-time init (whole-stage
    // codegen compiler, WindowExec, HashAggregate, SortMergeJoin,
    // broadcast, noop sink)
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val t = spark.range(1000).toDF("id").withColumn("k", col("id") % 7)
      val w = Window.partitionBy("k").orderBy("id")
      t.withColumn("r", row_number().over(w))
        .withColumn("s", sum("id").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .join(broadcast(t.groupBy("k").agg(count(lit(1)).as("n"))), "k")
        .join(t.select(col("id").as("id2")), col("id") === col("id2"))
        .groupBy("k").agg(collect_list("r"), avg("s"))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => }

    // optional args: query names to bench (default all) — dev profiling aid
    val wanted = args.toSet
    val unknown = wanted -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val selected =
      if (wanted.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => wanted(k) }

    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "5").toInt
    // 680 s (was 620): the r17 max-gate arithmetic (COVERAGE) shows a
    // uniformly 1.4×-hot box lands ≈ 720–750 s wall at 680, ≥ 110 s
    // under the ≥ 863 s observed-safe driver cap — and 620 cost the
    // judge's run its second pass by 0.86 s
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "680").toDouble
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_local.json")
    val names = selected.toSeq.sortBy(_._1)

    // PLAN WARM-UP: run every query once on tiny data. Each query
    // instance re-runs analysis regardless (fn builds a fresh frame per
    // call), but whole-stage-codegen compilation — the dominant cold
    // cost — is keyed on generated source and the generated source is
    // data-independent, so this absorbs the compile tax for every plan
    // shape in the suite before the measured loop. At sf0.001 the cost
    // is per-JOB overhead, not data (a sequential warm measured 201 s —
    // 32 cores idle while 231 queries each pay scheduling latency), so
    // warm jobs are submitted from a small thread pool: concurrent
    // actions on one SparkSession are supported, and the queries are
    // independent frames. Cache cleanup happens ONCE after the pool
    // drains (a concurrent clearCache could yank a sibling's cache
    // mid-job — correct but wasteful). Failures are silently skipped:
    // the measured loop is the authority on which queries run.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM_DIR", "/root/testdata/sf0.001")
    val warmStart = System.nanoTime()
    if (warmDir.nonEmpty) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      names.foreach { case (_, fn) =>
        pool.submit(new Runnable {
          def run(): Unit =
            // job group per ADVICE r17: shutdownNow() only interrupts
            // the SUBMITTING threads — already-launched Spark jobs keep
            // running, overlap the measured loop, and can re-register
            // caches after the post-warm clearCache. Tagging every warm
            // job with one group (job groups are thread-local, so set
            // inside the pool thread) lets the deadline path cancel the
            // jobs themselves.
            try {
              spark.sparkContext.setJobGroup("bench-warm", "plan warm-up", interruptOnCancel = true)
              fn(spark, warmDir).write.format("noop").mode("overwrite").save()
            } catch { case _: Throwable => }
        })
      }
      pool.shutdown()
      // warm is best-effort: on a hot box (the 155 s r17 cert run vs
      // 34-56 s quiet) an unbounded warm phase would eat wall the
      // measured loop's budget doesn't govern, so cap it — un-warmed
      // queries just pay their own cold cost inside the measured pass
      val warmDeadlineS =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM_DEADLINE_S", "180").toLong
      if (!pool.awaitTermination(warmDeadlineS, java.util.concurrent.TimeUnit.SECONDS)) {
        System.err.println(s"[bench] warm deadline ${warmDeadlineS}s hit — cancelling remaining warms")
        // cancel the RUNNING warm jobs first (ADVICE r17): the group
        // cancel reaches the Spark scheduler; shutdownNow only reaches
        // the pool threads
        try spark.sparkContext.cancelJobGroup("bench-warm") catch { case _: Throwable => }
        pool.shutdownNow()
        pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
    }
    val warmS = (System.nanoTime() - warmStart) / 1e9

    // Shared mutable state, guarded by `lock`: the shutdown hook reads a
    // snapshot concurrently with the measurement loop when the harness
    // SIGTERMs us mid-pass.
    val lock = new Object
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val passTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    @volatile var passesCompleted = 0
    @volatile var loopDone = false
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)

    // Emit exactly once (normal end OR shutdown hook, whichever first).
    // System.out autoflushes on println, so the line survives SIGTERM;
    // the repo-side file write is best-effort (the artifact of record
    // on a clean exit, never a reason to lose the stdout line).
    def emit(): Unit = if (printed.compareAndSet(false, true)) {
      val (snapTimes, snapFailed, passes, snapPassTimes, done) = lock.synchronized {
        (times.toMap.map { case (k, v) => (k, v) }, failed.toVector,
          passesCompleted, passTimes.toVector, loopDone)
      }
      val results = names.collect {
        case (name, _) if !snapFailed.contains(name) && snapTimes.contains(name) =>
          (name, median(snapTimes(name)), snapTimes(name).min)
      }
      val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val qsMin = results.map { case (k, _, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
      val totalMin = if (results.nonEmpty) results.map(_._3).sum else 0.0
      val errs = snapFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val passArr = snapPassTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
      // partial=true ⇔ the measured loop did not run to completion
      // (SIGTERM mid-pass): a consumer must not compare a truncated
      // `value`/`total_min` round-over-round (ADVICE r16)
      val line =
        s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin,"queries":$qs,"queries_min":$qsMin,"errors":$errs,"repeats":$repeats,"passes_completed":$passes,"pass_times":$passArr,"expected_queries":${names.length},"partial":${!done},"warm_s":${f"$warmS%.1f"},"budget_s":$budgetS,"sf":"$sfDir"}"""
      println(line)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => }
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(), "bench-emit"))

    // INTERLEAVED passes: run the whole suite up to `repeats` times rather
    // than each query back-to-back. Back-to-back repeats share any
    // transient box-level disturbance (GC storm, ContextCleaner backlog,
    // external load), so the median doesn't protect against it — round 6
    // recorded a phantom 4.6× on q_decimate_fir this way (0.33 s when
    // re-measured). Interleaving spaces a query's repeats a full suite
    // apart, so a localized disturbance lands on at most one of them.
    val loopStart = System.nanoTime()
    var pass = 0
    var continue = true
    var prevElapsed = 0.0
    var lastPassS = 0.0
    while (continue) {
      for ((name, fn) <- names if !failed.contains(name)) {
        val t0 = System.nanoTime()
        // noop sink: materializes EVERY column (count() would let
        // Catalyst prune unreferenced aggregates and under-measure)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              // a crashed query is excluded from times entirely — a crash
              // duration must not masquerade as a (possibly fast) run
              lock.synchronized { failed += name }
              System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) lock.synchronized {
          times(name) = times.getOrElse(name, Vector.empty) :+ dt
        }
        // BETWEEN runs (outside the timed window): drop persisted RDDs
        // the global-order primitives and iterative loops anchor on
        // (they otherwise accumulate until the ContextCleaner gets
        // around to them, inflating later runs' GC pressure)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        // and drop the ops' registered caches (curriculumOrder /
        // ccnetBuckets / large-pair fallbacks) so the tracked list stays
        // bounded across the interleaved passes
        graft.util.CacheRegistry.releaseAll()
      }
      pass += 1
      val elapsed = (System.nanoTime() - loopStart) / 1e9
      lock.synchronized {
        passesCompleted = pass
        passTimes += (elapsed - prevElapsed)
      }
      lastPassS = elapsed - prevElapsed
      prevElapsed = elapsed
      // pass 1 always runs fully; see shouldContinue for the gate
      continue = shouldContinue(pass, repeats, elapsed, lastPassS, budgetS)
      if (pass < repeats && !continue)
        System.err.println(
          f"[bench] stopping after pass $pass/$repeats: elapsed $elapsed%.1f s, " +
            f"projected ${elapsed + 0.95 * lastPassS}%.1f s > budget $budgetS%.1f s")
    }
    loopDone = true
    emit()
    spark.stop()
  }
}
