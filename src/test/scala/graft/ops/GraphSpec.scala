package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Graph.pagerank]] vs an independent in-test dense power iteration
  * (plain Scala arrays — no Spark), on graphs that exercise dangling
  * nodes, weights, parallel-edge collapse, and self-loops. */
class GraphSpec extends SparkSpec {

  /** Dense reference: same recurrence, driver-side. */
  private def densePr(
      edges: Seq[(String, String, Double)],
      iterations: Int,
      d: Double
  ): Map[String, Double] = {
    val collapsed = edges
      .groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }
      .toSeq
    val nodes = collapsed.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val outW = collapsed.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rank = Array.fill(n)(1.0 / n)
    val dangling = nodes.filterNot(outW.contains).map(idx)
    (1 to iterations).foreach { _ =>
      val next = Array.fill(n)((1.0 - d) * (1.0 / n))
      val dm = dangling.map(rank).sum
      collapsed.foreach { case (s, t, w) =>
        next(idx(t)) += d * rank(idx(s)) * (w / outW(s))
      }
      (0 until n).foreach(i => next(i) += d * dm * (1.0 / n))
      rank = next
    }
    nodes.map(v => v -> rank(idx(v))).toMap
  }

  private def run(
      edges: Seq[(String, String, Double)],
      iterations: Int = 8,
      d: Double = 0.85,
      parts: Int = 1,
      driverEdgeLimit: Long = 1000000L
  ): Map[String, Double] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst", "w").repartition(parts)
    Graph
      .pagerank(df, iterations, d, weightCol = Some("w"), driverEdgeLimit = driverEdgeLimit)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
  }

  private def assertClose(a: Map[String, Double], b: Map[String, Double]): Unit = {
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-12, s"$k: $v vs ${b(k)}") }
  }

  private val chainWithDangling = Seq(
    ("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 2.0),
    ("a", "d", 3.0) // d has no out-edges: dangling
  )

  test("matches the dense reference on a weighted graph with a dangling node") {
    val got = run(chainWithDangling)
    assertClose(got, densePr(chainWithDangling, 8, 0.85))
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "ranks must sum to 1")
  }

  test("distributed loop (forced) agrees with the driver fast path") {
    val viaDriver = run(chainWithDangling)
    val viaLoop = run(chainWithDangling, driverEdgeLimit = 0L)
    assertClose(viaDriver, viaLoop)
  }

  test("parallel edges collapse by weight sum; self-loops are legal") {
    val multi = Seq(
      ("x", "y", 1.0), ("x", "y", 2.0), // parallel: same as one 3.0 edge
      ("y", "x", 1.0), ("y", "y", 0.5)  // self-loop keeps rank in place
    )
    assertClose(run(multi), densePr(multi, 8, 0.85))
  }

  test("partition count does not change the result") {
    val p1 = run(chainWithDangling, parts = 1)
    val p7 = run(chainWithDangling, parts = 7)
    assertClose(p1, p7)
  }

  test("unweighted form: absent weightCol means weight 1 per edge") {
    import spark.implicits._
    val df = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")).toDF("src", "dst")
    val got = Graph
      .pagerank(df, iterations = 6)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val want = densePr(Seq(("a", "b", 1.0), ("b", "a", 1.0), ("a", "c", 1.0), ("c", "a", 1.0)), 6, 0.85)
    assertClose(got, want)
  }

  /** Dense personalized reference: restart/dangling mass on seeds. */
  private def densePpr(
      edges: Seq[(String, String, Double)],
      iterations: Int,
      d: Double,
      seeds: Set[String]
  ): Map[String, Double] = {
    val collapsed = edges
      .groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }
      .toSeq
    val nodes = collapsed.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val outW = collapsed.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val present = nodes.filter(seeds)
    val share = 1.0 / present.size
    val sv = nodes.map(v => if (seeds(v)) share else 0.0).toArray
    var rank = sv.clone()
    val dangling = nodes.filterNot(outW.contains).map(idx)
    (1 to iterations).foreach { _ =>
      val next = Array.tabulate(n)(i => (1.0 - d) * sv(i))
      val dm = dangling.map(rank).sum
      collapsed.foreach { case (s, t, w) =>
        next(idx(t)) += d * rank(idx(s)) * (w / outW(s))
      }
      (0 until n).foreach(i => next(i) += d * dm * sv(i))
      rank = next
    }
    nodes.map(v => v -> rank(idx(v))).toMap
  }

  test("personalized: restart + dangling mass land on the seeds; both paths agree") {
    import spark.implicits._
    val seeds = Seq("a", "c").toDF("node")
    def runPpr(limit: Long): Map[String, Double] = Graph
      .pagerank(chainWithDangling.toDF("src", "dst", "w"), iterations = 8,
        weightCol = Some("w"), restartNodes = Some(seeds), driverEdgeLimit = limit)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaDriver = runPpr(1000000L)
    assertClose(viaDriver, densePpr(chainWithDangling, 8, 0.85, Set("a", "c")))
    assertClose(viaDriver, runPpr(0L))
    assert(math.abs(viaDriver.values.sum - 1.0) < 1e-9, "mass conserves")
    // non-seed source-only mass decays: 'd' (dangling, not a seed)
    // holds less than any seed
    assert(viaDriver("d") < viaDriver("a") && viaDriver("d") < viaDriver("c"))
  }

  test("personalized: absent seeds are ignored; all-absent throws") {
    import spark.implicits._
    val got = Graph.pagerank(chainWithDangling.toDF("src", "dst", "w"), iterations = 4,
        weightCol = Some("w"),
        restartNodes = Some(Seq("a", "zzz-not-in-graph").toDF("node")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assertClose(got, densePpr(chainWithDangling, 4, 0.85, Set("a")))
    intercept[IllegalArgumentException] {
      Graph.pagerank(chainWithDangling.toDF("src", "dst", "w"), iterations = 2,
        weightCol = Some("w"), restartNodes = Some(Seq("zzz").toDF("node")))
    }
  }

  test("declared hash layout skips the exchange AND the sort on the cached side") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.Bridge
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val src = (1 to 1000).map(i => (s"n$i", i.toDouble)).toDF("k", "v")
      .repartition(n, col("k"))
      .sortWithinPartitions("k")
    val rdd = Bridge.toInternalRdd(src).mapPartitions(_.map(_.copy()), true)
    val declared = Bridge.internalCreateDataFramePartitioned(
      spark, rdd, src.schema, Seq("k"), n, Seq("k"))
    val other = (1 to 1000).map(i => (s"n$i", i.toLong)).toDF("k", "c")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = declared.join(other, Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly ONE exchange and ONE sort (the undeclared side); a second
      // of either means the declaration was ignored
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      val sorts = "Sort \\[".r.findAllIn(plan).length
      assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
      assert(sorts == 1, s"expected 1 sort, got $sorts:\n$plan")
      assert(joined.count() == 1000)
      // cross-NAME equi-join (the connectedComponents neighbor-min shape:
      // edges.dst === labels.doc_id) must also skip the declared side
      val renamed = other.withColumnRenamed("k", "k2")
      val crossName = declared.join(renamed, declared("k") === renamed("k2"))
      val cnPlan = crossName.queryExecution.executedPlan.toString
      val cnExchanges = "Exchange hashpartitioning".r.findAllIn(cnPlan).length
      val cnSorts = "Sort \\[".r.findAllIn(cnPlan).length
      assert(cnExchanges == 1, s"cross-name: expected 1 exchange, got $cnExchanges:\n$cnPlan")
      assert(cnSorts == 1, s"cross-name: expected 1 sort, got $cnSorts:\n$cnPlan")
      assert(crossName.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  /** Dense HITS reference: same L1-normalized recurrence, driver-side
    * plain arrays — independent of [[Graph.hits]]'s own driver path. */
  private def denseHits(
      edges: Seq[(String, String, Double)],
      iterations: Int
  ): Map[String, (Double, Double)] = {
    val collapsed = edges
      .groupBy(e => (e._1, e._2))
      .map { case ((s, t), es) => (s, t, es.map(_._3).sum) }
      .toSeq
    val nodes = collapsed.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    var hub = Array.fill(n)(1.0 / n)
    var auth = new Array[Double](n)
    (1 to iterations).foreach { _ =>
      val a = new Array[Double](n)
      collapsed.foreach { case (s, t, w) => a(idx(t)) += hub(idx(s)) * w }
      val at = a.sum
      auth = a.map(_ / at)
      val h = new Array[Double](n)
      collapsed.foreach { case (s, t, w) => h(idx(s)) += auth(idx(t)) * w }
      val ht = h.sum
      hub = h.map(_ / ht)
    }
    nodes.map(v => v -> (auth(idx(v)), hub(idx(v)))).toMap
  }

  private def runHits(
      edges: Seq[(String, String, Double)],
      iterations: Int = 6,
      parts: Int = 1,
      driverEdgeLimit: Long = 1000000L
  ): Map[String, (Double, Double)] = {
    import spark.implicits._
    val df = edges.toDF("src", "dst", "w").repartition(parts)
    Graph
      .hits(df, iterations, weightCol = Some("w"), driverEdgeLimit = driverEdgeLimit)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
  }

  private def assertCloseHits(
      a: Map[String, (Double, Double)],
      b: Map[String, (Double, Double)]): Unit = {
    assert(a.keySet == b.keySet, s"${a.keySet} vs ${b.keySet}")
    a.foreach { case (k, (av, hv)) =>
      assert(math.abs(av - b(k)._1) < 1e-12, s"$k auth: $av vs ${b(k)._1}")
      assert(math.abs(hv - b(k)._2) < 1e-12, s"$k hub: $hv vs ${b(k)._2}")
    }
  }

  test("hits matches the dense reference; pure-sink and pure-source nodes widen to 0") {
    // d is a pure sink (authority only), a a strong hub; weights matter
    val got = runHits(chainWithDangling)
    val want = denseHits(chainWithDangling, 6)
    assertCloseHits(got, want)
    assert(got("d")._2 == 0.0, "sink node must have hub exactly 0")
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9, "authority sums to 1")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9, "hub sums to 1")
  }

  test("hits distributed loop (forced) agrees with the driver fast path") {
    val viaDriver = runHits(chainWithDangling, parts = 3)
    val viaLoop = runHits(chainWithDangling, parts = 3, driverEdgeLimit = 0L)
    // the two paths sum floats in different orders; 1e-12 absolute is
    // the same tolerance the pagerank twin test uses
    assertCloseHits(viaDriver, viaLoop)
  }

  test("hits collapses parallel edges and handles self-loops like the reference") {
    val multi = Seq(
      ("x", "y", 1.0), ("x", "y", 2.0),
      ("y", "x", 1.0), ("y", "y", 0.5)
    )
    assertCloseHits(runHits(multi), denseHits(multi, 6))
  }

  test("labelPropagation: barbell graph splits into its two triangles; ties break bytewise") {
    import spark.implicits._
    // two triangles {a,b,c} and {d,e,f} joined by one bridge c—d
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"),
      ("c", "d")).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // round 1 (all ties → min neighbor label): a→b? N(a)={b,c} → "b";
    // b→{a,c}→"a"; c→{a,b,d}→"a"; d→{c,e,f}→"c"; e→{d,f}→"d"; f→{d,e}→"d".
    // round 2: a: N labels {b:a, c:a} → "a"; b: {a:b, c:a} → "a";
    // c: {a:b, b:a, d:c} → "a"? votes a=1(from b), b=1(from a), c=1(from d) → min "a";
    // d: {c:a, e:d, f:d} → "d"; e: {d:c, f:d} → "c"? votes c=1, d=1 → "c";
    // f: {d:c, e:d} → "c".
    // round 3: a: {b:a, c:a} → "a"; b: {a:a, c:a} → "a"; c: {a:a, b:a, d:d} → "a";
    // d: {c:a, e:c, f:c} → "c"; e: {d:d, f:c} → "c"; f: {d:d, e:c} → "c".
    assert(got == Map(
      "a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "c", "e" -> "c", "f" -> "c"))
    // the two triangles end in distinct communities
    assert(Set("a", "b", "c").map(got) != Set("d", "e", "f").map(got))
  }

  test("labelPropagation: edge weights outvote multiplicity-1 neighbors; self-loops ignored") {
    import spark.implicits._
    // x has neighbors y (weight 5) and z (weight 1): y's label wins
    // every round even though z sorts first bytewise
    val edges = Seq(
      ("x", "y", 5.0), ("x", "z", 1.0), ("x", "x", 99.0)).toDF("src", "dst", "w")
    val got = Graph.labelPropagation(edges, iterations = 1, weightCol = Some("w"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("x") == "y")
    assert(got("y") == "x" && got("z") == "x")
  }

  test("hits fails fast on zero/negative collapsed weights (the L1 normalizer would divide by 0)") {
    import spark.implicits._
    val zero = Seq(("a", "b", 0.0), ("b", "a", 1.0)).toDF("src", "dst", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.hits(zero, iterations = 2, weightCol = Some("w"))
    }
    assert(e.getMessage.contains("positive edge weights"))
    // a negative weight that cancels a parallel edge collapses to 0 — also rejected
    val cancel = Seq(("a", "b", 1.0), ("a", "b", -1.0), ("b", "a", 1.0)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      Graph.hits(cancel, iterations = 2, weightCol = Some("w"))
    }
  }

  test("triangleCounts: 4-clique + pendant, direction/parallels/self-loops ignored") {
    import spark.implicits._
    // 4-clique {1,2,3,4} (4 triangles, 3 per member) + pendant 5—1;
    // noise: a reversed duplicate, a parallel edge, and a self-loop
    // must all collapse into the same undirected simple graph
    val edges = Seq(
      ("n1", "n2"), ("n1", "n3"), ("n1", "n4"), ("n2", "n3"), ("n2", "n4"), ("n3", "n4"),
      ("n5", "n1"),
      ("n3", "n2"), // reversed duplicate of (n2, n3)
      ("n1", "n2"), // parallel
      ("n4", "n4")  // self-loop
    ).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("n1") == ((4L, 3L, 0.5)))      // deg 4: clique + pendant
    assert(got("n2") == ((3L, 3L, 1.0)))
    assert(got("n3") == ((3L, 3L, 1.0)))
    assert(got("n4") == ((3L, 3L, 1.0)))
    assert(got("n5") == ((1L, 0L, 0.0)))      // deg < 2 → lcc 0
    // total triangles = Σ per-node / 3
    assert(got.values.map(_._2).sum == 12L)
  }

  test("kCore: pendant chain cascades off over multiple rounds, triangle core survives") {
    import spark.implicits._
    // triangle {t1,t2,t3} + chain t3—p1—p2—p3: the 2-core is the
    // triangle, reached only after THREE cascading peels (p3 → p2 → p1)
    val edges = Seq(
      ("t1", "t2"), ("t2", "t3"), ("t1", "t3"),
      ("t3", "p1"), ("p1", "p2"), ("p2", "p3")).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, maxRounds = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("t1" -> 2L, "t2" -> 2L, "t3" -> 2L))
    // bounded rounds stop mid-cascade: after 2 peels p1 still hangs on
    val partial = Graph.kCore(edges, k = 2, maxRounds = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(partial == Map("t1" -> 2L, "t2" -> 2L, "t3" -> 3L, "p1" -> 1L))
    // k above the max degree empties the graph
    assert(Graph.kCore(edges, k = 4, maxRounds = 10).isEmpty)
  }

  test("triangleCounts: triangle-free star and path report zero everywhere") {
    import spark.implicits._
    val star = Seq(("h", "a"), ("h", "b"), ("h", "c"), ("a", "x")).toDF("src", "dst")
    val got = Graph.triangleCounts(star).collect()
    assert(got.forall(_.getLong(2) == 0L))
    assert(got.forall(_.getDouble(3) == 0.0))
  }

  test("tol stops early once converged and still returns a valid distribution") {
    // strongly connected 2-cycle converges fast; a loose tol must not
    // change the fixed point materially
    val cyc = Seq(("a", "b", 1.0), ("b", "a", 1.0))
    val got = run(cyc, iterations = 50) // reference: effectively converged
    import spark.implicits._
    val df = cyc.toDF("src", "dst", "w")
    val early = Graph
      .pagerank(df, iterations = 50, weightCol = Some("w"), tol = 1e-10)
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    assertClose(got, early)
  }

  test("coCitation: shared-source counts, in-degrees, minCommon floor, parallel-edge dedup") {
    import spark.implicits._
    val edges = Seq(
      // s1 and s2 both cite {x, y} → (x, y) co-cited twice
      ("s1", "x"), ("s1", "y"),
      ("s2", "x"), ("s2", "y"), ("s2", "y"), // parallel edge collapses
      // s3 cites {x, z} → (x, z) co-cited ONCE → below minCommon=2
      ("s3", "x"), ("s3", "z"),
      // null source dropped
      (null, "x")
    ).toDF("src", "dst")
    val got = Graph.coCitation(edges, "src", "dst", minCommon = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // deg: x cited by s1,s2,s3 = 3; y by s1,s2 = 2
    assert(got == Map(("x", "y") -> ((2L, 3L, 2L))))
  }

  test("coCitation: over-cap hub sources shed, diagnostic reports them") {
    import spark.implicits._
    val hub = (0 until 50).map(i => ("hub", s"t$i"))
    val pair = Seq(("a", "t1"), ("a", "t2"), ("b", "t1"), ("b", "t2"))
    val edges = (hub ++ pair).toDF("src", "dst")
    val got = Graph.coCitation(edges, "src", "dst", minCommon = 2, maxCite = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // only the (t1, t2) pair from a+b survives; the hub's 1225 pairs shed
    assert(got.toSeq == Seq(("t1", "t2", 2L)))
    val shed = Graph.coCitationShed(edges, "src", "dst", maxCite = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(shed.toSeq == Seq("hub" -> 50L))
  }

  test("coCitation equals the naive self-join respelling on a generated graph") {
    import spark.implicits._
    val edges = spark.range(0, 3000).select(
      concat(lit("p"), (col("id") % 200).cast("string")).as("src"),
      concat(lit("d"), (col("id") % 37).cast("string")).as("dst"))
    val got = Graph.coCitation(edges, "src", "dst", minCommon = 2)
    val e = edges.distinct()
    val naive = e.toDF("s", "dst_a")
      .join(e.toDF("s", "dst_b"), "s")
      .where(col("dst_a") < col("dst_b"))
      .groupBy("dst_a", "dst_b").agg(count(lit(1)).as("n_common"))
      .where(col("n_common") >= 2)
    val deg = e.groupBy(col("dst")).agg(count(lit(1)).as("dg"))
    val expect = naive
      .join(deg.toDF("dst_a", "deg_a"), "dst_a")
      .join(deg.toDF("dst_b", "deg_b"), "dst_b")
      .select("dst_a", "dst_b", "n_common", "deg_a", "deg_b")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got.select("dst_a", "dst_b", "n_common", "deg_a", "deg_b")).isEmpty)
  }

  test("bfsDistances: chain + cycle + isolated seed, min-hop over multi-source, maxHops cut") {
    import spark.implicits._
    // 1→2→3→4 chain, 5⇄6 cycle, 2→6 cross link, seed 99 not in edges
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 5L), (2L, 6L),
      (1L, 2L) // parallel duplicate must collapse
    ).toDF("src", "dst")
    val sources = Seq(1L, 5L, 99L).toDF("node")
    val got = Graph.bfsDistances(edges, sources, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // 6 is reachable at hop 1 from 5 (not 2 via 1→2→6); 4 is 3 hops — cut
    assert(got == Map(1L -> 0, 5L -> 0, 99L -> 0, 2L -> 1, 6L -> 1, 3L -> 2))
    // wider horizon reaches 4; revisits never shrink or reappear
    val full = Graph.bfsDistances(edges, sources, maxHops = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(full == got + (4L -> 3))
    // maxHops = 0: seeds only
    val seedsOnly = Graph.bfsDistances(edges, sources, maxHops = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(seedsOnly == Map(1L -> 0, 5L -> 0, 99L -> 0))
  }

  test("bfsDistances agrees with a driver-side BFS on a generated graph") {
    import spark.implicits._
    val n = 500L
    val e1 = spark.range(0, 3000).select((col("id") % n).as("src"), ((col("id") % n) * 2 + 1) % n)
    val e2 = spark.range(0, 3000).select((col("id") % n).as("src"), ((col("id") % n) + 7) % n)
    val edges = e1.toDF("src", "dst").unionAll(e2.toDF("src", "dst"))
    val sources = Seq(0L, 250L).toDF("node")
    val got = Graph.bfsDistances(edges, sources, maxHops = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // driver BFS over the same edge set
    val adj = (0L until n).map(a => a -> Seq((a * 2 + 1) % n, (a + 7) % n)).toMap
    var dist = Map(0L -> 0, 250L -> 0)
    var frontier = Set(0L, 250L)
    (1 to 6).foreach { h =>
      frontier = frontier.flatMap(adj).filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    assert(got == dist)
  }

  test("modularity: two triangles + bridge, hand-computed Q") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3-4; m = 7, S = 2m = 14
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)
    ).toDF("src", "dst")
    val labels = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")
    ).toDF("node", "label")
    val got = Graph.modularity(edges, labels)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    // per community: d = 7, e2 = 6 -> contrib = (6*14 - 49)/196
    val contrib = math.rint((6.0 * 14 - 49) / 196 * 1e8) / 1e8
    assert(got("A") == (3L, 7.0, 6.0, contrib, 0.357143))
    assert(got("B") == (3L, 7.0, 6.0, contrib, 0.357143))
  }

  test("modularity: one community covering everything scores 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val labels = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("node", "label")
    val rows = Graph.modularity(edges, labels).collect()
    assert(rows.length == 1)
    assert(rows.head.getDouble(5) == 0.0)
    assert(rows.head.getDouble(4) == 0.0) // e2 = S, d = S -> cleared form 0
  }

  test("modularity: community with no internal edges gets e_intra2 = 0") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("node", "label")
    val got = Graph.modularity(edges, labels)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got("b") == 0.0)
    assert(got("a") == 2.0) // edge 1-2, both directions
  }

  // ---- round 18: driver fast path ≡ distributed lane (A/B) --------------
  // The default driverEdgeLimit routes broadcast-sized graphs through the
  // driver loop; driverEdgeLimit = 0 pins the distributed lane. Results
  // must be row-set identical on the same input (integer arithmetic for
  // kCore/bfs; integral multiplicity weights for LPA).

  private def randomEdges(seed: Int, n: Int, m: Int): Seq[(String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).map(_ => (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
  }

  test("kCore: driver fast path equals the distributed lane on random graphs") {
    import spark.implicits._
    for (seed <- Seq(1, 2, 3)) {
      val edges = randomEdges(seed, n = 40, m = 120).toDF("src", "dst")
      for ((k, rounds) <- Seq((2, 10), (3, 2), (4, 30))) {
        val fast = Graph.kCore(edges, k = k, maxRounds = rounds)
          .collect().map(r => (r.getString(0), r.getLong(1))).sorted
        val dist = Graph.kCore(edges, k = k, maxRounds = rounds, driverEdgeLimit = 0L)
          .collect().map(r => (r.getString(0), r.getLong(1))).sorted
        assert(fast.toSeq == dist.toSeq, s"seed=$seed k=$k rounds=$rounds")
      }
    }
  }

  test("bfsDistances: driver fast path equals the distributed lane, seeds off-graph included") {
    import spark.implicits._
    for (seed <- Seq(7, 8)) {
      val edges = randomEdges(seed, n = 60, m = 150).toDF("src", "dst")
      val sources = Seq("n0", "n17", "offgraph").toDF("node")
      for (hops <- Seq(0, 2, 6)) {
        val fast = Graph.bfsDistances(edges, sources, maxHops = hops)
          .collect().map(r => (r.getString(0), r.getInt(1))).sorted
        val dist = Graph.bfsDistances(edges, sources, maxHops = hops, driverEdgeLimit = 0L)
          .collect().map(r => (r.getString(0), r.getInt(1))).sorted
        assert(fast.toSeq == dist.toSeq, s"seed=$seed hops=$hops")
      }
    }
  }

  test("labelPropagation: driver fast path equals the distributed lane, weighted and not") {
    import spark.implicits._
    for (seed <- Seq(11, 12)) {
      val raw = randomEdges(seed, n = 30, m = 90)
      val unweighted = raw.toDF("src", "dst")
      for (iters <- Seq(1, 3)) {
        val fast = Graph.labelPropagation(unweighted, iterations = iters)
          .collect().map(r => (r.getString(0), r.getString(1))).sorted
        val dist = Graph.labelPropagation(unweighted, iterations = iters, driverEdgeLimit = 0L)
          .collect().map(r => (r.getString(0), r.getString(1))).sorted
        assert(fast.toSeq == dist.toSeq, s"seed=$seed iters=$iters unweighted")
      }
      // integral multiplicity weights (the crawl-graph shape): vote sums
      // are exact in any fold order, so parity is bit-exact
      val rnd = new scala.util.Random(seed)
      val weighted = raw.map { case (a, b) => (a, b, (1 + rnd.nextInt(5)).toDouble) }
        .toDF("src", "dst", "w")
      val fastW = Graph.labelPropagation(weighted, iterations = 3, weightCol = Some("w"))
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      val distW = Graph.labelPropagation(weighted, iterations = 3, weightCol = Some("w"),
          driverEdgeLimit = 0L)
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(fastW.toSeq == distW.toSeq, s"seed=$seed weighted")
    }
  }

  test("pagerank symmetrize equals the explicit both-directions spelling, driver and distributed") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val half = (0 until 200).map(_ =>
      (s"c${rnd.nextInt(20)}", s"s${20 + rnd.nextInt(15)}", (1 + rnd.nextInt(4)).toDouble))
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) => (a, b, es.map(_._3).sum) }.toSeq
    val halfDf = half.toDF("src", "dst", "w")
    val both = halfDf.unionAll(halfDf.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    for (limit <- Seq(2000000L, 0L)) {
      val sym = Graph.pagerank(halfDf, iterations = 4, weightCol = Some("w"),
          assumeCollapsed = true, symmetrize = true, driverEdgeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val exp = Graph.pagerank(both, iterations = 4, weightCol = Some("w"),
          assumeCollapsed = true, driverEdgeLimit = limit)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(sym.keySet == exp.keySet, s"limit=$limit")
      sym.foreach { case (k, v) => assert(math.abs(v - exp(k)) < 1e-12, s"limit=$limit node=$k") }
    }
  }

  test("bfsDistances: long-keyed driver path round-trips types (the q_bfs_hops shape)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    val sources = Seq(1L, 4L).toDF("node")
    val fast = Graph.bfsDistances(edges, sources, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(fast == Map(1L -> 0, 4L -> 0, 2L -> 1, 5L -> 1, 3L -> 2))
  }
}
