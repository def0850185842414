package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, sources: Seq[String]) =
    (0 until n).map(i => (i.toLong, s"tok$i text", sources(i % sources.length)))
      .toDF("doc_id", "text", "source")

  test("sample is deterministic and respects weight 1.0 / 0.0 exactly") {
    val df = docs(200, Seq("keep", "drop", "half"))
    val weights = Map("keep" -> 1.0, "half" -> 0.5) // "drop" absent → 0
    val out1 = Mixture.sample(df, weights, "s1").select("doc_id").collect().map(_.getLong(0)).sorted
    val out2 = Mixture.sample(df, weights, "s1").select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out1.sameElements(out2), "same salt must give identical samples")
    val bySrc = Mixture.sample(df, weights, "s1").groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("keep", 0L) == 67L, "weight 1.0 keeps every row")
    assert(!bySrc.contains("drop"), "absent source drops every row")
    val halfRate = bySrc.getOrElse("half", 0L).toDouble / 66.0
    assert(halfRate > 0.3 && halfRate < 0.7, s"weight 0.5 rate was $halfRate")
  }

  test("different salts re-roll the mixture") {
    val df = docs(300, Seq("a"))
    val s1 = Mixture.sample(df, Map("a" -> 0.5), "salt-one").collect().map(_.getLong(0)).toSet
    val s2 = Mixture.sample(df, Map("a" -> 0.5), "salt-two").collect().map(_.getLong(0)).toSet
    assert(s1 != s2)
  }

  test("sample rejects out-of-range weights") {
    val df = docs(4, Seq("a"))
    intercept[IllegalArgumentException](Mixture.sample(df, Map("a" -> 1.5), "s"))
  }

  test("packSequences: directed packing with a doc straddling the budget") {
    // per-group token stream: 3 + 4 + 2 tokens, budget 5:
    // doc 0 starts seq 0 off 0; doc 1 starts seq 0 off 3 (straddles into
    // seq 1); doc 2 starts at global offset 7 → seq 1 off 2
    val df = Seq(
      (0L, "a b c", "g1"),
      (1L, "d e f g", "g1"),
      (2L, "h i", "g1"),
      (10L, "x y z w v u", "g2") // independent group restarts at 0
    ).toDF("doc_id", "text", "source")
    val out = Mixture.packSequences(df, budget = 5, groupCols = Seq("source"))
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_off"), r.getAs[Long]("seq_id"), r.getAs[Long]("seq_off")))
    assert(out.toSeq == Seq(
      (0L, 3L, 0L, 0L, 0L),
      (1L, 4L, 3L, 0L, 3L),
      (2L, 2L, 7L, 1L, 2L),
      (10L, 6L, 0L, 0L, 0L)
    ))
  }

  test("packSequences seq_off is always under the budget") {
    val df = docs(100, Seq("a", "b"))
    val bad = Mixture.packSequences(df, budget = 7, groupCols = Seq("source"))
      .where(col("seq_off") >= 7 || col("seq_off") < 0 || col("seq_id") < 0)
    assert(bad.count() == 0)
  }

  test("splitAssign is total, repartition-stable, and ~respects fractions") {
    val df = docs(2000, Seq("a", "b"))
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Mixture.splitAssign(df, fr, "s1").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Mixture.splitAssign(df.repartition(17), fr, "s1").select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    assert(a.size == 2000 && a.values.toSet.subsetOf(Set("train", "val", "test")))
    val trainFrac = a.values.count(_ == "train") / 2000.0
    assert(math.abs(trainFrac - 0.8) < 0.05, s"train frac $trainFrac")
    // growth stability: the first 1000 docs keep their assignment
    val small = Mixture.splitAssign(docs(1000, Seq("a", "b")), fr, "s1")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(a(id) == s, s"doc $id moved splits on growth") }
  }

  test("deterministicShuffle equals the global-window permutation and is partitioning-invariant") {
    val df = docs(500, Seq("a", "b"))
    def winForm(d: org.apache.spark.sql.DataFrame) = d
      .withColumn("__h", Mixture.uniformHash("s2", col("doc_id")))
      .withColumn("shuffle_rank",
        org.apache.spark.sql.functions.row_number()
          .over(org.apache.spark.sql.expressions.Window.orderBy(col("__h"), col("doc_id")))
          .cast("long") - 1L)
      .select("doc_id", "shuffle_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = winForm(df)
    val got = Mixture.deterministicShuffle(df, "s2").select("doc_id", "shuffle_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    val got2 = Mixture.deterministicShuffle(df.repartition(11), "s2")
      .select("doc_id", "shuffle_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == expected)
    // dense permutation: ranks are exactly 0..n-1
    assert(got.values.toSeq.sorted == (0L until 500L))
  }

  test("token budget keeps the hash-order prefix per source and is order-invariant") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    val budget = 600L
    val kept = Mixture.tokenBudgetPerSource(docs, budget, "tb1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keptIds = kept.map(_._1).toSet
    // driver-side recompute of the contract
    val all = docs
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(col("text"), " ")).cast("long").as("n"),
        Mixture.uniformHash("tb1", col("doc_id")).as("u"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    all.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).foreach { case (id, _, n, _) =>
        assert(keptIds.contains(id) == (cum < budget), s"doc $id")
        cum += n
      }
    }
    // every source survives, none un-truncated (600 < every source total)
    val bySrc = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySrc.keySet == all.map(_._2).toSet)
    bySrc.values.foreach(t => assert(t >= budget, s"kept prefix must reach the budget, got $t"))
    // repartition/order invariance
    val again = Mixture
      .tokenBudgetPerSource(docs.orderBy(col("doc_id").desc).repartition(7), budget, "tb1")
      .collect().map(r => r.getLong(0)).toSet
    assert(again == keptIds)
  }

  test("two-pass giant-source token budget is identical to the windowed plan") {
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    for (budget <- Seq(1L, 600L, 5000L)) {
      val windowed = Mixture.tokenBudgetWindowed(docs, budget, "tb1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      val twoPass = Mixture.tokenBudgetTwoPass(docs, budget, "tb1")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(twoPass.sameElements(windowed), s"budget $budget")
      // the public auto-gate picks the two-pass form when forced and
      // still agrees (threshold 0 ⇒ every source is 'giant')
      val forced = Mixture.tokenBudgetPerSource(docs, budget, "tb1",
          giantSourceRows = 0L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(forced.sameElements(windowed), s"budget $budget (forced)")
    }
    // order/partitioning invariance of the two-pass form itself
    val a = Mixture.tokenBudgetTwoPass(docs, 600L, "tb1")
      .collect().map(_.getLong(0)).toSet
    val b = Mixture
      .tokenBudgetTwoPass(docs.orderBy(col("doc_id").desc).repartition(7), 600L, "tb1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("two-pass token budget keeps NULL-source rows exactly like the windowed plan") {
    val df = (0 until 60).map { i =>
      val src = if (i % 3 == 0) null else s"s${i % 2}"
      (i.toLong, ("tok " * (i % 7 + 1)).trim, src)
    }.toDF("doc_id", "text", "source")
    val windowed = Mixture.tokenBudgetWindowed(df, 20L, "nz")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).sortBy(_._1)
    val twoPass = Mixture.tokenBudgetTwoPass(df, 20L, "nz")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).sortBy(_._1)
    assert(twoPass.sameElements(windowed))
    assert(windowed.exists(_._2.isEmpty), "fixture must include kept NULL-source rows")
  }

  test("hybrid gate routes only giant sources through the two-pass plan, same answer") {
    // one dominant "web" source (120 docs), two small ones (20 each) —
    // threshold 50 puts exactly one source on the two-pass path
    val df = (0 until 160).map { i =>
      val src = if (i < 120) "web" else if (i < 140) "books" else "code"
      (i.toLong, ("tok " * (i % 9 + 1)).trim, src)
    }.toDF("doc_id", "text", "source")
    val windowed = Mixture.tokenBudgetWindowed(df, 90L, "tb1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val hybrid = Mixture.tokenBudgetPerSource(df, 90L, "tb1", giantSourceRows = 50L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(hybrid.sameElements(windowed))
    // every source must survive in the hybrid output (both branches ran)
    assert(hybrid.map(_._2).toSet == Set("web", "books", "code"))
  }

  test("two-pass token budget accepts non-string source columns") {
    val df = (0 until 40)
      .map(i => (i.toLong, ("tok " * (i % 5 + 1)).trim, (i % 3).toLong))
      .toDF("doc_id", "text", "source")
    val windowed = Mixture.tokenBudgetWindowed(df, 15L, "it")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val twoPass = Mixture.tokenBudgetTwoPass(df, 15L, "it")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(twoPass.sameElements(windowed))
  }

  test("stratifiedSample: exactly k per source, deterministic, growth-stable prefix") {
    val df = docs(300, Seq("a", "b", "c"))
    val out = Mixture.stratifiedSample(df, k = 10, salt = "s")
    val bySrc = out.groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 10L, "b" -> 10L, "c" -> 10L))
    // short source: keeps all rows when the source has fewer than k
    val small = docs(4, Seq("x"))
    assert(Mixture.stratifiedSample(small, k = 10, salt = "s").count() == 4L)
    // deterministic across runs and partitionings
    val a = out.select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Mixture.stratifiedSample(df.repartition(7), k = 10, salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    // a smaller k selects a PREFIX of the larger k's choice per source
    val k5 = Mixture.stratifiedSample(df, k = 5, salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k5.subsetOf(a.toSet))
  }

  private def aesReference(
      rows: Seq[(Long, Double)], salt: String, k: Int): Seq[(Long, Double)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    rows
      .filter(_._2 > 0.0)
      .map { case (id, w) =>
        val hex = md.digest(s"$salt$id".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
        (id, math.pow(u, 1.0 / w))
      }
      .sortBy { case (id, key) => (-key, id) }
      .take(k)
  }

  test("prioritySample: exact driver-reference parity (global and stratified)") {
    val rows = (0L until 200L).map(i => (i, (i % 7 + 1).toDouble, if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("doc_id", "w", "source")
    val got = Mixture.prioritySample(df, k = 20, weightCol = "w", salt = "ps")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).sortBy(_._3)
    val ref = aesReference(rows.map(t => (t._1, t._2)), "ps", 20)
    assert(got.map(_._1).sameElements(ref.map(_._1)))
    got.zip(ref).foreach { case ((_, keyRounded, rank), (_, keyRef)) =>
      val expected = BigDecimal(keyRef).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(keyRounded == expected, s"rank $rank")
    }
    // stratified: the per-stratum selection is the reference run per source
    val strat = Mixture
      .prioritySample(df, k = 10, weightCol = "w", salt = "ps", strataCol = Some("source"))
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    Seq("a", "b").foreach { src =>
      val srcRows = rows.filter(_._3 == src).map(t => (t._1, t._2))
      assert(strat(src) == aesReference(srcRows, "ps", 10).map(_._1).toSet, src)
    }
  }

  test("prioritySample: repartition-stable, weight-monotone, edge cases") {
    val rows = (0L until 100L).map(i => (i, if (i < 3) 1e9 else 1.0))
    val df = rows.toDF("doc_id", "w")
    val a = Mixture.prioritySample(df, k = 5, weightCol = "w", salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Mixture.prioritySample(df.repartition(7), k = 5, weightCol = "w", salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // the three heavy rows (key = u^(1e-9) ≈ 1) must all be drawn
    assert(Set(0L, 1L, 2L).subsetOf(a))
    // weight <= 0 / NULL rows cannot be drawn; k > N returns all positive-weight rows
    val mixed = Seq((1L, Some(2.0)), (2L, Some(0.0)), (3L, Some(-1.0)), (4L, None))
      .toDF("doc_id", "w")
    val kept = Mixture.prioritySample(mixed, k = 10, weightCol = "w", salt = "s")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("shardAssign: serpentine LPT — driver-reference parity, balance, partition invariance") {
    val rnd = new scala.util.Random(7)
    val df = (0L until 500L)
      .map(i => (i, (0 to rnd.nextInt(60)).map(_ => "w").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = Mixture.shardAssign(df, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // driver reference: sort desc by (tokens, -id? no: id asc), serpentine deal
    val ref = out.map(t => (t._1, t._2)).sortBy { case (id, tok) => (-tok, id) }
      .zipWithIndex.map { case ((id, tok), rk) =>
        val pos = rk % 8
        id -> (if ((rk / 8) % 2 == 0) pos else 7 - pos)
      }.toMap
    out.foreach { case (id, _, shard) => assert(shard == ref(id), s"doc $id") }
    // balance: every shard's token total within one max-doc of each other
    val totals = out.groupBy(_._3).map { case (_, xs) => xs.map(_._2).sum }
    val maxDoc = out.map(_._2).max
    assert(totals.max - totals.min <= maxDoc, s"imbalance ${totals.max - totals.min} > $maxDoc")
    // partition invariance
    val again = Mixture.shardAssign(df.repartition(11), nShards = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    out.foreach { case (id, _, shard) => assert(again(id) == shard) }
  }

  test("temperatureSample: rates follow (n_min/n_s)^(1-alpha); alpha=1 keeps all") {
    // big: 300 docs × 2 tokens; small: 100 docs × 2 tokens
    val df = (0 until 400)
      .map(i => (i.toLong, "a b", if (i < 300) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val out = Mixture.temperatureSample(df, alpha = 0.5, salt = "t1")
    val rates = out.select("source", "rate").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("small") == 1.0, "smallest source is kept whole")
    val want = math.pow(200.0 / 600.0, 0.5)
    assert(math.abs(rates("big") - want) < 1e-6, s"big rate ${rates("big")} vs $want")
    // realized keep-rate concentrates near the target
    val kept = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100L)
    val bigRate = kept("big").toDouble / 300.0
    assert(math.abs(bigRate - want) < 0.15, s"realized big rate $bigRate")
    // alpha = 1: every source at rate 1
    assert(Mixture.temperatureSample(df, alpha = 1.0, salt = "t1").count() == 400L)
    // determinism
    val again = Mixture.temperatureSample(df, alpha = 0.5, salt = "t1")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val first = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(first.sameElements(again))
  }

  test("curriculumOrder: phase-major contiguous 0-based ranks, per-phase independent reshuffle") {
    val all = docs(100, Seq("a", "b")).select("doc_id")
    val anneal = all.where(col("doc_id") % 3 === 0)
    val got = Mixture.curriculumOrder(Seq("main" -> all, "anneal" -> anneal), "cur-test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // contiguous 0..n-1, no gaps or dupes
    assert(got.map(_._3).sorted.toSeq == (0L until got.length.toLong))
    // phase-major: every main rank < every anneal rank
    val mainRanks = got.filter(_._1 == "main").map(_._3)
    val annealRanks = got.filter(_._1 == "anneal").map(_._3)
    assert(mainRanks.length == 100 && annealRanks.length == 34)
    assert(mainRanks.max < annealRanks.min)
    // a doc in both phases draws independently: the relative order of
    // anneal docs differs from their relative order inside main
    val annealDocsInMain = got.filter(t => t._1 == "main" && t._2 % 3 == 0)
      .sortBy(_._3).map(_._2).toSeq
    val annealOrder = got.filter(_._1 == "anneal").sortBy(_._3).map(_._2).toSeq
    assert(annealDocsInMain != annealOrder)
  }

  test("curriculumOrder matches the single-window phase-major row_number spelling") {
    import org.apache.spark.sql.expressions.Window
    val all = docs(80, Seq("a")).select("doc_id")
    val anneal = all.where(col("doc_id") % 2 === 0)
    val got = Mixture.curriculumOrder(Seq("main" -> all, "anneal" -> anneal), "s1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val un = all.select(lit("main").as("phase"), lit(0).as("p"), col("doc_id"))
      .unionByName(anneal.select(lit("anneal").as("phase"), lit(1).as("p"), col("doc_id")))
    val u = Mixture.uniformHash("s1", concat(col("phase"), lit(":"), col("doc_id").cast("string")))
    val want = un
      .withColumn("curriculum_rank",
        row_number().over(Window.orderBy(col("p"), u, col("doc_id"))).cast("long") - 1)
      .select("phase", "doc_id", "curriculum_rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("epochReplicate: factors replicate, absent defaults to 1, zero drops, no shuffle") {
    val df = docs(30, Seq("w", "b", "x")) // 10 docs each
    val out = Mixture.epochReplicate(df, Map("w" -> 3, "x" -> 0))
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("w" -> 30L, "b" -> 10L))
    // epochs are 0-based and complete per doc
    val epochs = out.where(col("source") === "w").groupBy("doc_id")
      .agg(sort_array(collect_list(col("epoch"))).as("e"))
      .collect().map(_.getSeq[Int](1).toList).distinct.toList
    assert(epochs == List(List(0, 1, 2)))
    // plan: a generate, no Exchange
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("writeShards: one file per shard dir, read-back complete, shard filter partition-prunes") {
    val df = docs(200, Seq("a", "b", "c"))
    val out = java.nio.file.Files.createTempDirectory("graft-shards-").toString
    try {
      Mixture.writeShards(df, out, nShards = 4)
      // layout: shard=0..3 dirs, exactly one parquet data file each
      (0 until 4).foreach { sh =>
        val dir = new java.io.File(s"$out/shard=$sh")
        assert(dir.isDirectory, s"missing $dir")
        val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"shard $sh has ${files.length} files")
      }
      // read-back completeness
      val back = spark.read.parquet(out)
      assert(back.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 200L))
      // a shard predicate reaches the scan as a partition filter
      val one = back.where(col("shard") === 2)
      one.collect()
      val scans = one.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.exists(_.partitionFilters.exists(_.toString.contains("shard"))),
        scans.map(_.partitionFilters).mkString(";"))
      // balance: shard token totals within one max-doc of each other
      val sums = back
        .select(col("shard"), size(split(col("text"), " ")).cast("long").as("t"))
        .groupBy("shard").agg(sum("t").as("s"))
        .collect().map(_.getLong(1))
      val maxDoc = back.select(max(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
      assert(sums.max - sums.min <= maxDoc, s"imbalance ${sums.mkString(",")} vs maxDoc $maxDoc")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(out)).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("splitLeakCheck: row-wise split leaks every multi-doc group; group-keyed split is clean") {
    val df = docs(300, Seq("s0", "s1", "s2"))
    val fr = Seq("train" -> 0.8, "test" -> 0.2)
    // WRONG: split keyed on the row id — groups straddle splits
    val rowWise = Mixture.splitAssign(df, fr, salt = "lk")
    val leaks = Mixture.splitLeakCheck(rowWise, "source", "split")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(leaks.keySet == Set("s0", "s1", "s2"))
    leaks.values.foreach { case (nSplits, nRows, nMaj) =>
      assert(nSplits == 2L && nRows == 100L && nMaj < 100L && nMaj > 50L)
    }
    // RIGHT: split keyed on the group — leak check comes back empty
    val bySource = Mixture
      .splitAssign(df.select("source").distinct(), fr, salt = "lk", idCol = "source")
    val grouped = df.join(bySource, "source")
    assert(Mixture.splitLeakCheck(grouped, "source", "split").isEmpty)
  }

  test("waterFill: exact integer level, small demands whole, invariants hold") {
    def run(sizes: Seq[Long], budget: Long): Map[Long, Long] = {
      val df = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("k", "demand")
      Mixture.waterFill(df, "k", "demand", budget)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    // hand-solved: sizes (3,3,10), B=7 → τ=2; B=9 → τ=3; B=100 → full
    assert(run(Seq(3L, 3L, 10L), 7L).values.toSeq.sorted == Seq(2L, 2L, 2L))
    assert(run(Seq(3L, 3L, 10L), 9L) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
    assert(run(Seq(3L, 3L, 10L), 100L) == Map(0L -> 3L, 1L -> 3L, 2L -> 10L))
    assert(run(Seq(3L, 3L, 10L), 0L).values.forall(_ == 0L))
    // property sweep: Σ alloc ≤ B, alloc ≤ demand, and τ maximal
    // (f(τ+1) > B whenever anything was capped)
    val sizes = (1 to 200).map(i => ((i * 37) % 97 + 1).toLong)
    for (b <- Seq(50L, 500L, 5000L, 100000L)) {
      val alloc = run(sizes, b)
      val total = alloc.values.sum
      assert(total <= b)
      sizes.zipWithIndex.foreach { case (s, i) => assert(alloc(i.toLong) <= s) }
      val tau = alloc.values.max
      val capped = sizes.zipWithIndex.exists { case (s, i) => alloc(i.toLong) < s }
      if (capped) {
        val fNext = sizes.map(s => math.min(s, tau + 1)).sum
        assert(fNext > b, s"b=$b tau=$tau not maximal")
      }
    }
  }

  test("curriculumOrder: salt re-rolls, same salt is stable, partition-count invariant") {
    val all = docs(60, Seq("a")).select("doc_id")
    def run(salt: String, parts: Int) =
      Mixture.curriculumOrder(Seq("only" -> all.repartition(parts)), salt)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(run("x", 2) == run("x", 7))
    assert(run("x", 2) != run("y", 2))
  }
}
