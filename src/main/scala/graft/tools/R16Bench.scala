package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 measurement probes (COVERAGE.md rows):
  *
  *   runMain graft.tools.ModularityCostSplit [sfDir]
  *     — q_modularity (the suite's slowest query, 7.9 s judge / 6.8 s
  *       builder floor) split into its three stages: the link-graph
  *       extraction subtree, the 3-round LPA replay, and the Newman-Q
  *       rollup — plus the full query after the r16 lineage cuts
  *       (edges persisted across LPA/modularity, modularity's
  *       symmetrized rollup persisted across its three consumers).
  *
  *   runMain graft.tools.RulesEntropyScale [sfDir] [scaleDir]
  *     — 1× vs 100× scale-shape rows for q_rules and q_entropy (the
  *       two rows the r15 verdict flagged as missing). q_entropy's
  *       fixture reads documents(source, lang), which ScaleGen scales
  *       directly; q_rules' fixture reads lineitem, which ScaleGen
  *       does not scale, so (the DiffBinBench precedent) the SAME
  *       operator shape is re-keyed onto the scaled events table:
  *       basket = event_id div 5 (≈5 items/basket, within-copy by
  *       construction — event ids are copy-shifted), item = one of
  *       200 hash-derived families (the q_rules fixture's universe).
  *
  *   runMain graft.tools.EwmaScale [sfDir] [scaleDir]
  *     — cost-split of q_ewma's 16× at 100× (the one superlinear r15
  *       row): scan, exchange+per-key sort only, full chart, and full
  *       chart at 128 shuffle partitions — at 1× and 100×. The window
  *       is partitionBy(user_id).orderBy(ts, id); the hypothesis under
  *       test is sort-dominance (10M rows / ~150k keys at 100×) and
  *       whether more, smaller sort partitions flatten it.
  *
  * All probes: warmed min/median-of-5, noop sink (materializes every
  * column), caches dropped between runs — the graft.Bench discipline.
  */
object R16Common {
  def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def bench(spark: SparkSession, label: String, mk: () => DataFrame,
      repeats: Int = 5): Unit = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      graft.util.CacheRegistry.releaseAll()
      dt
    }
    once() // warm
    val runs = (1 to repeats).map(_ => once()).sorted
    val med = runs(runs.length / 2)
    println(f"[r16] $label%-28s min=${runs.head}%6.2f s  median=$med%6.2f s")
  }
}

object ModularityCostSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = R16Common.session()

    // the same edge derivation as qModularity (via the public registry
    // for the full query; re-derived here for the stages)
    def edges: DataFrame =
      graft.SparkEntry.queries("q_link_graph")(spark, sfDir).select(
        col("src_domain").as("src"),
        col("dst_domain").as("dst"),
        col("n_links").cast("double").as("w"))

    R16Common.bench(spark, "extract(link_graph)", () => edges)
    R16Common.bench(spark, "lpa(3 rounds)",
      () => graft.ops.Graph.labelPropagation(edges, iterations = 3, weightCol = Some("w")))
    R16Common.bench(spark, "full(q_modularity)",
      () => graft.SparkEntry.queries("q_modularity")(spark, sfDir))
    spark.stop()
  }
}

object RulesEntropyScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scaleDir = if (args.length > 1) args(1) else "/tmp/scale100"
    val spark = R16Common.session()

    def baskets(dir: String): DataFrame =
      graft.model.Tables.events(spark, dir).select(
        (col("event_id") - pmod(col("event_id"), lit(5L))).as("basket"),
        concat(lit("p"),
          pmod(xxhash64(col("event_type"), col("value")), lit(200L))
            .cast("string")).as("item"))

    def rulesOf(dir: String): DataFrame =
      graft.ops.Itemsets.rules(baskets(dir), "basket", "item",
        minSupport = 5L, maxBasketSize = 20)

    def entropyOf(dir: String): DataFrame =
      graft.ops.Stats.entropy(
        graft.model.Tables.documents(spark, dir).select("source", "lang"),
        Seq("source"), "lang")

    R16Common.bench(spark, "rules 1x", () => rulesOf(sfDir))
    R16Common.bench(spark, "rules 100x", () => rulesOf(scaleDir), repeats = 3)
    R16Common.bench(spark, "entropy 1x", () => entropyOf(sfDir))
    R16Common.bench(spark, "entropy 100x", () => entropyOf(scaleDir), repeats = 3)
    spark.stop()
  }
}

object EwmaScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scaleDir = if (args.length > 1) args(1) else "/tmp/scale100"
    val spark = R16Common.session()

    def ev(dir: String): DataFrame =
      graft.model.Tables.events(spark, dir)
        .select("event_id", "user_id", "ts_us", "value")

    def chart(dir: String): DataFrame =
      graft.ts.Ewma.controlChart(ev(dir), Seq("user_id"), "ts_us", "event_id",
        "value", taps = 8, alphaNum = 1, alphaDen = 4,
        thresholdMicro = 200000000L)
        .select("event_id", "user_id", "ts_us", "n_taps", "ewma", "dev", "alarm")

    def sortOnly(dir: String): DataFrame =
      ev(dir).repartition(
        spark.conf.get("spark.sql.shuffle.partitions").toInt, col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))

    for ((tag, dir) <- Seq("1x" -> sfDir, "100x" -> scaleDir)) {
      val reps = if (tag == "1x") 5 else 3
      R16Common.bench(spark, s"scan $tag", () => ev(dir), reps)
      R16Common.bench(spark, s"exchange+sort $tag", () => sortOnly(dir), reps)
      R16Common.bench(spark, s"full chart $tag", () => chart(dir), reps)
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      R16Common.bench(spark, s"full chart $tag @128", () => chart(dir), reps)
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    spark.stop()
  }
}

/** Fine-grained q_ewma window cost attribution at 100×:
  * where do the ~16 s beyond exchange+sort go — WindowExec's per-frame
  * offset machinery (scales with lag count), or the SECOND WindowExec
  * pass that `lag(__ewma_micro)` plans (the prior-EWMA lookback over a
  * derived column re-buffers every row)? Variants, all on the sorted
  * frame: 1 lag, 8 lags + the num/den/micro projection, and a
  * SINGLE-WINDOW fold where the prior EWMA is recomputed from lags
  * 1..9 in the same window (one extra frame, no second WindowExec).
  * `runMain graft.tools.EwmaProbe [scaleDir]` */
object EwmaProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/scale100"
    val spark = R16Common.session()
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.Column

    def intDiv(a: Column, b: Column): Column = {
      import org.apache.spark.sql.graftbridge.Bridge
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
    }
    def microHalfUp(num: Column, den: Column): Column =
      when(num >= 0, intDiv(num * 2 + den, den * 2))
        .otherwise(-intDiv((-num) * 2 + den, den * 2))

    val taps = 8
    val ws = {
      val r = 3L // (4-1)
      (0 until taps).map(k =>
        BigInt(r).pow(k).toLong * BigInt(4L).pow(taps - 1 - k).toLong)
    }
    val w = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    def base: org.apache.spark.sql.DataFrame =
      graft.model.Tables.events(spark, dir)
        .select("event_id", "user_id", "ts_us", "value")
        .where(col("value").isNotNull)
        .withColumn("__cents", (col("value").cast("decimal(18,2)") * 100).cast("long"))

    def chain(offset: Int): (Column, Column) = {
      val lags = (0 until taps).map { k =>
        if (k + offset == 0) col("__cents") else lag(col("__cents"), k + offset).over(w)
      }
      val num = lags.zip(ws).map { case (x, wk) =>
        when(x.isNotNull, x * wk).otherwise(lit(0L)) }.reduce(_ + _)
      val den = lags.zip(ws).map { case (x, wk) =>
        when(x.isNotNull, lit(wk)).otherwise(lit(0L)) }.reduce(_ + _)
      (num, den)
    }

    R16Common.bench(spark, "w1: 1 lag", () =>
      base.withColumn("__l1", lag(col("__cents"), 1).over(w)), repeats = 3)
    R16Common.bench(spark, "w8: 8 lags + micro", () => {
      val (num, den) = chain(0)
      base.withColumn("__m", microHalfUp(num * 10000L, den))
    }, repeats = 3)
    R16Common.bench(spark, "w9 fold: prior in-window", () => {
      val (num, den) = chain(0)
      val (pnum, pden) = chain(1)
      val prior = when(lag(col("__cents"), 1).over(w).isNotNull,
        microHalfUp(pnum * 10000L, pden))
      val devMicro = col("__cents") * 10000L - prior
      base
        .withColumn("ewma", microHalfUp(num * 10000L, den).cast("double") / lit(1000000.0))
        .withColumn("dev", devMicro.cast("double") / lit(1000000.0))
        .withColumn("alarm", coalesce((abs(devMicro) > 200000000L).cast("int"), lit(0)))
        .drop("__cents")
    }, repeats = 3)
    R16Common.bench(spark, "full: two windows", () =>
      graft.ts.Ewma.controlChart(
        graft.model.Tables.events(spark, dir)
          .select("event_id", "user_id", "ts_us", "value"),
        Seq("user_id"), "ts_us", "event_id", "value",
        taps = 8, alphaNum = 1, alphaDen = 4, thresholdMicro = 200000000L)
        .select("event_id", "user_id", "ts_us", "n_taps", "ewma", "dev", "alarm"),
      repeats = 3)
    spark.stop()
  }
}

/** 1× vs 100× rows for the three cont. 14–16 queries whose boundedness
  * was argued from shape rather than measured (r15 verdict gap #3):
  * benford (digit-9 rollup), fkOrphans (distinct-parent left join +
  * singleton rollup), classWeights (label-vocabulary rollup). The
  * oracle fixtures read lineitem/orders, which ScaleGen doesn't scale,
  * so (the DiffBinBench precedent) the SAME operator shapes re-key
  * onto the scaled events table: benford over the value column,
  * fkOrphans child = events user_id vs parent = distinct user_id with
  * the %7 drop-out (the q_fk_orphans synth), classWeights over
  * event_type. `runMain graft.tools.BoundedRollupScale [sfDir] [scaleDir]` */
object BoundedRollupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val scaleDir = if (args.length > 1) args(1) else "/tmp/scale100"
    val spark = R16Common.session()

    def ev(dir: String): DataFrame = graft.model.Tables.events(spark, dir)

    def benfordOf(dir: String): DataFrame =
      graft.ops.Stats.benford(ev(dir).select("value"), "value")
    def fkOf(dir: String): DataFrame =
      graft.ops.Profile.fkOrphans(
        ev(dir).select(col("user_id").as("fk")), "fk",
        ev(dir).select(col("user_id")).where(col("user_id") % 7 =!= 0)
          .distinct().select(col("user_id").as("pk")), "pk")
    def weightsOf(dir: String): DataFrame =
      graft.ops.Labels.classWeights(ev(dir).select("event_type"), "event_type")

    for ((tag, dir, reps) <- Seq(("1x", sfDir, 5), ("100x", scaleDir, 3))) {
      R16Common.bench(spark, s"benford $tag", () => benfordOf(dir), reps)
      R16Common.bench(spark, s"fk_orphans $tag", () => fkOf(dir), reps)
      R16Common.bench(spark, s"class_weights $tag", () => weightsOf(dir), reps)
    }
    spark.stop()
  }
}
