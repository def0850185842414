package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise co-occurrence mining — the A-Priori first pass (Agrawal &
  * Srikant 1994) and the raw material for "docs that cite X also cite
  * Y" / co-purchase / co-click structure: every unordered item pair
  * occurring together in at least `minSupport` baskets.
  *
  * Scale contract: the quadratic step is bounded PER BASKET, not per
  * corpus — each basket emits `size·(size−1)/2` pairs, and baskets
  * larger than `maxBasketSize` are EXCLUDED WHOLE (reported via the
  * `n_oversize` companion count, never silently) because one
  * megabasket would emit a corpus-sized pair explosion (the same shed
  * discipline as the LSH/IVF bucket caps). The pair rollup is
  * map-side-combinable; output is bounded by the distinct qualifying
  * pair count.
  *
  * Pairs are canonical (`item_a` bytewise-less than `item_b`),
  * duplicates within a basket collapse first (set semantics).
  */
object Itemsets {

  /** @return (item_a, item_b, n_baskets) for pairs with
    *         n_baskets >= minSupport */
  def coOccurrence(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketSize: Int
  ): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2 && maxBasketSize <= 10000,
      s"maxBasketSize must be in [2, 10000], got $maxBasketSize")
    // ONE exchange to assemble each basket's distinct sorted item set
    // (collect_set is partial-mergeable), pairs generated IN-TASK over
    // the ≤ maxBasketSize array (sorted ⇒ canonical ia < ib), then one
    // pair rollup — two exchanges total, and the quadratic blowup
    // never enters a shuffle (the self-join spelling shuffled every
    // candidate pair; measured 2.32 → 1.46 s min on the 600k-row
    // oracle fixture at sf0.1)
    val baskets = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .groupBy("__b")
      .agg(sort_array(collect_set(col("__i"))).as("__arr"))
      .where(size(col("__arr")) <= maxBasketSize && size(col("__arr")) >= 2)
    val pairs = flatten(transform(col("__arr"), (x, i) =>
      transform(slice(col("__arr"), i + 2, lit(maxBasketSize)), y =>
        struct(x.as("a"), y.as("b")))))
    baskets
      .select(explode(pairs).as("__p"))
      .groupBy(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
  }

  private def intDiv(
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))
  }

  /** 6dp half-up of num/den over exact non-negative integers. */
  private def ratio6(
      num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) = {
    val u = num.cast("decimal(38,0)") * 1000000L
    intDiv(u * 2 + den, den * 2).cast("double") / lit(1000000.0)
  }

  /** Association rules over the [[coOccurrence]] pair frame: per
    * qualifying unordered pair, both directed confidences
    * conf(a→b) = n_ab/n_a and conf(b→a), and the symmetric
    * lift = n_ab·N / (n_a·n_b) — the A-Priori second stage that turns
    * co-occurrence counts into "users who do A also do B (x·σ above
    * chance)". All supports (n_a, n_b, N) are measured over the SAME
    * basket universe the pairs came from (distinct-item baskets with
    * 2 ≤ size ≤ maxBasketSize — a support measured over a different
    * universe silently biases every confidence), each ratio the 6dp
    * half-up of its exact rational.
    *
    * Plan: the basket frame materializes ONCE (lineage cut — it feeds
    * the pair rollup, the item supports, and the basket count); the
    * two support joins are on the bounded item vocabulary (broadcast
    * at any realistic item count); N arrives as a driver literal (the
    * Bm25 nDocs precedent — a one-row frame attaches join-free only
    * through a BNLJ, which is banned). */
  def rules(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long,
      maxBasketSize: Int
  ): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 2 && maxBasketSize <= 10000,
      s"maxBasketSize must be in [2, 10000], got $maxBasketSize")
    val raw = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .groupBy("__b")
      .agg(sort_array(collect_set(col("__i"))).as("__arr"))
      .where(size(col("__arr")) <= maxBasketSize && size(col("__arr")) >= 2)
    // lineage-cut the basket frame (the count below is forced anyway
    // for the N literal; supports and pairs both read the cache)
    val (baskets, basketsRdd) = graft.util.LoopFrames.cut(raw)
    graft.util.CacheRegistry.trackRdd(basketsRdd)
    val nBaskets = baskets.count()
    val supports = baskets
      .select(explode(col("__arr")).as("__i"))
      .groupBy("__i")
      .agg(count(lit(1)).as("__ni"))
    val pairsCol = flatten(transform(col("__arr"), (x, i) =>
      transform(slice(col("__arr"), i + 2, lit(maxBasketSize)), y =>
        struct(x.as("a"), y.as("b")))))
    val pairs = baskets
      .select(explode(pairsCol).as("__p"))
      .groupBy(col("__p.a").as("item_a"), col("__p.b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    // the support table is vocabulary-bounded but derives from the
    // stats-less basket cache, so its joins planned sort-merge (r18
    // plan audit: 2 SMJ); the shared limit-probe recipe collects it
    // into a broadcast LocalRelation when small, degrading to a
    // tracked persisted frame past the cap
    val supportsSide = graft.util.DriverSide.smallSideOrTracked(supports)
    val out = pairs
      .join(supportsSide.select(col("__i").as("item_a"), col("__ni").as("n_a")), "item_a")
      .join(supportsSide.select(col("__i").as("item_b"), col("__ni").as("n_b")), "item_b")
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        ratio6(col("n_ab"), col("n_a")).as("conf_ab"),
        ratio6(col("n_ab"), col("n_b")).as("conf_ba"),
        ratio6(col("n_ab").cast("decimal(38,0)") * nBaskets,
          col("n_a").cast("decimal(38,0)") * col("n_b")).as("lift"))
    // returned LAZY: the caller's one action executes supports + pairs +
    // joins straight off the basket cache — the r17 final
    // materialize-then-recount pass cost more than it saved
    out
  }

  /** The shed report companion: baskets excluded by `maxBasketSize`
    * (one row: n_oversize, max_size observed). */
  def oversizeReport(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      maxBasketSize: Int
  ): DataFrame =
    df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
      .groupBy("__b")
      .agg(count(lit(1)).as("__sz"))
      .agg(
        sum(when(col("__sz") > maxBasketSize, 1L).otherwise(0L)).as("n_oversize"),
        max(col("__sz")).as("max_size"))
}
