package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times on the
  * sf dir given by SPARK_GRAFT_SF_DIR. A warm-up pass first touches every
  * table (parquet footers, codegen, broadcast machinery) so per-query
  * numbers measure the query, not JVM/session warm-up; queries then run
  * in sorted name order for round-over-round comparability.
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
  * wall cap with rc 124 and NO parsed artifact — 5 unconditional passes ×
  * 230 queries ≈ 950–1,100 s vs a ~900 s cap): pass 1 always runs fully;
  * each further pass starts only if the projected wall after it stays
  * within SPARK_GRAFT_BENCH_BUDGET_S (default 720 s of measured loop —
  * startup, warm-up and sbt overhead live outside the budget; measured
  * in-session: 313 s cold pass 1 + ~40 s startup → 354 s wall for one
  * pass, so two passes land ~600 s wall, ~300 s under the cap). The
  * next-pass projection uses the MINIMUM completed pass time, not the
  * average: pass 1 is cold (every query's first run pays plan analysis
  * + codegen — measured 313 s cold vs ~220 s warm at 231 queries), so
  * the average systematically overestimates the next warm pass and
  * would strand budget; the min is the best single predictor of a warm
  * pass, and the cap headroom the budget leaves (~180 s) absorbs a
  * noisy overshoot. The emitted JSON reports `passes_completed`;
  * medians/mins are taken over however many passes fit. A JVM shutdown
  * hook emits the partial-results JSON on SIGTERM, so even a
  * harness-level timeout (SIGTERM from `timeout`) yields a parsed
  * artifact instead of a truncated log.
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
    * pass at the FASTEST observed pass time (see scaladoc: pass 1 is
    * cold; the average would strand budget) projects inside the
    * measured-loop budget. */
  private[graft] def shouldContinue(
      passesDone: Int,
      repeats: Int,
      elapsedS: Double,
      minPassS: Double,
      budgetS: Double): Boolean =
    passesDone < repeats && elapsedS + minPassS <= budgetS

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
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "720").toDouble
    val names = selected.toSeq.sortBy(_._1)

    // Shared mutable state, guarded by `lock`: the shutdown hook reads a
    // snapshot concurrently with the measurement loop when the harness
    // SIGTERMs us mid-pass.
    val lock = new Object
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
    @volatile var passesCompleted = 0
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)

    // Emit exactly once (normal end OR shutdown hook, whichever first).
    // System.out autoflushes on println, so the line survives SIGTERM.
    def emit(): Unit = if (printed.compareAndSet(false, true)) {
      val (snapTimes, snapFailed, passes) = lock.synchronized {
        (times.toMap.map { case (k, v) => (k, v) }, failed.toVector, passesCompleted)
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
      println(s"""{"metric":"total","value":$total,"unit":"sec","total_min":$totalMin,"queries":$qs,"queries_min":$qsMin,"errors":$errs,"repeats":$repeats,"passes_completed":$passes,"budget_s":$budgetS,"sf":"$sfDir"}""")
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
    var minPassS = Double.MaxValue
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
      lock.synchronized { passesCompleted = pass }
      val elapsed = (System.nanoTime() - loopStart) / 1e9
      minPassS = math.min(minPassS, elapsed - prevElapsed)
      prevElapsed = elapsed
      // pass 1 always runs fully; see shouldContinue for the gate
      continue = shouldContinue(pass, repeats, elapsed, minPassS, budgetS)
      if (pass < repeats && !continue)
        System.err.println(
          f"[bench] stopping after pass $pass/$repeats: elapsed $elapsed%.1f s, " +
            f"projected ${elapsed + minPassS}%.1f s > budget $budgetS%.1f s")
    }
    emit()
    spark.stop()
  }
}
