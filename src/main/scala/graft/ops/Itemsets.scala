package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

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
  *
  * Physical shape (r19): for exact-equality key types the basket
  * assembly is a SORTED-RUN STREAM — one exchange on the basket key, a
  * per-partition sort, and one streaming pass that dedupes adjacent
  * items and emits pairs directly. No per-basket array ever
  * materializes: the previous collect_set → sort_array →
  * nested-transform/flatten/explode pipeline paid an ObjectHashAggregate
  * (set allocation + serialization per basket, outside whole-stage
  * codegen) plus an O(m²)-allocation pair expression; the stream pass
  * measured 1.69 → 0.90 s on the 600 k-row oracle fixture with exact
  * parity (R19ItemProbe). Memory per task is bounded by the cap: a run
  * that exceeds `maxBasketSize` distinct items flips to shed mode and
  * buffers nothing further. Float/decimal item or basket types (where
  * sort-order adjacency and exact equality can disagree: -0.0/0.0,
  * NaN, scale-differing decimals) fall back to the collect_set
  * spelling, now with the posexplode+slice pair generation (the shared
  * DedupDocs shape).
  */
object Itemsets {

  /** Types whose sort order and exact equality agree (what the
    * sorted-run kernel relies on for adjacent-duplicate collapse). */
  private def exactKeyType(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** The sorted-run basket stream: `raw` must be (__b, __i) with nulls
    * already filtered. One hash exchange on __b, per-partition sort on
    * (__b, __i), then a single pass over each partition's runs.
    *
    * tagged = false → (item_a, item_b): the canonical pairs of every
    * qualifying basket (2 ≤ distinct items ≤ maxBasketSize).
    * tagged = true  → (__tag, __x, __y): per qualifying basket one
    * (0, null, null) marker row, (1, item, null) per distinct item,
    * and (2, a, b) per canonical pair — everything [[rules]] needs in
    * one pass, so supports/N/pairs share one downstream rollup. */
  private def basketRuns(
      raw: DataFrame,
      maxBasketSize: Int,
      tagged: Boolean): DataFrame = {
    val spark = raw.sparkSession
    val prepped = raw.repartition(col("__b")).sortWithinPartitions("__b", "__i")
    val bType = prepped.schema("__b").dataType
    val iType = prepped.schema("__i").dataType
    val rdd = Bridge.toInternalRdd(prepped).mapPartitions { it =>
      new Iterator[InternalRow] {
        private val items = new scala.collection.mutable.ArrayBuffer[Any](32)
        private var curB: Any = null
        private var haveRun = false
        private var oversize = false
        private var pending: Array[InternalRow] = Array.empty
        private var pi = 0

        private def flush(): Unit = {
          if (haveRun && !oversize && items.length >= 2) {
            val m = items.length
            val nPairs = m * (m - 1) / 2
            val out =
              if (tagged) new Array[InternalRow](1 + m + nPairs)
              else new Array[InternalRow](nPairs)
            var k = 0
            if (tagged) {
              out(k) = new GenericInternalRow(Array[Any](0, null, null))
              k += 1
              var i = 0
              while (i < m) {
                out(k) = new GenericInternalRow(Array[Any](1, items(i), null))
                k += 1
                i += 1
              }
            }
            var i = 0
            while (i < m) {
              var j = i + 1
              while (j < m) {
                out(k) =
                  if (tagged) new GenericInternalRow(Array[Any](2, items(i), items(j)))
                  else new GenericInternalRow(Array[Any](items(i), items(j)))
                k += 1
                j += 1
              }
              i += 1
            }
            pending = out
          } else pending = Array.empty
          pi = 0
          items.clear()
          oversize = false
        }

        private def advance(): Unit = {
          while (pi >= pending.length && it.hasNext) {
            val row = it.next()
            val b = row.get(0, bType)
            if (!haveRun || b != curB) {
              flush()
              curB = InternalRow.copyValue(b)
              haveRun = true
              items += InternalRow.copyValue(row.get(1, iType))
            } else if (!oversize) {
              val v = row.get(1, iType)
              // sorted run ⇒ duplicates are adjacent; past the cap the
              // whole basket sheds, so stop buffering entirely
              if (items.isEmpty || items.last != v) {
                if (items.length >= maxBasketSize) { oversize = true; items.clear() }
                else items += InternalRow.copyValue(v)
              }
            }
          }
          if (pi >= pending.length && !it.hasNext && haveRun) {
            flush()
            haveRun = false
          }
        }

        def hasNext: Boolean = { advance(); pi < pending.length }
        def next(): InternalRow = { val r = pending(pi); pi += 1; r }
      }
    }
    val schema =
      if (tagged) StructType(Seq(
        StructField("__tag", IntegerType, nullable = false),
        StructField("__x", iType, nullable = true),
        StructField("__y", iType, nullable = true)))
      else StructType(Seq(
        StructField("item_a", iType, nullable = false),
        StructField("item_b", iType, nullable = false)))
    Bridge.internalCreateDataFrame(spark, rdd, schema)
  }

  private def nonNullRaw(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)

  private def kernelEligible(raw: DataFrame): Boolean =
    exactKeyType(raw.schema("__b").dataType) && exactKeyType(raw.schema("__i").dataType)

  /** Fallback pair stream for non-exact key types: collect_set basket
    * assembly + the posexplode+slice pair generation (streams through
    * two codegen generators instead of materializing the m² struct
    * array — measured 1.69 → 1.13 s vs the r18 nested-transform
    * spelling on its own). */
  private def legacyPairs(raw: DataFrame, maxBasketSize: Int): DataFrame = {
    val baskets = raw
      .groupBy("__b")
      .agg(sort_array(collect_set(col("__i"))).as("__arr"))
      .where(size(col("__arr")) <= maxBasketSize && size(col("__arr")) >= 2)
    baskets
      .select(posexplode(col("__arr")).as(Seq("__i0", "item_a")), col("__arr"))
      .select(
        col("item_a"),
        explode(slice(col("__arr"), col("__i0") + 2, size(col("__arr")))).as("item_b"))
  }

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
    val raw = nonNullRaw(df, basketCol, itemCol)
    val pairs =
      if (kernelEligible(raw)) basketRuns(raw, maxBasketSize, tagged = false)
      else legacyPairs(raw, maxBasketSize)
    pairs
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
  }

  private def intDiv(
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
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
    * Plan (r19): the sorted-run stream emits pairs, per-basket items
    * AND a basket marker in ONE pass, tagged; a single
    * map-side-combinable rollup on (tag, x, y) then yields the pair
    * counts, the item supports and N together. The rollup (≤ distinct
    * pairs + vocabulary + 1 rows — far smaller than the r18 basket
    * cache, which held every basket's item array) is lineage-cut once;
    * N reads the marker row, supports go through the shared
    * limit-probe broadcast recipe, and the two support joins stay
    * broadcast at any realistic item count. Non-exact key types take
    * the r18 shape: basket cache + separate support/pair rollups. */
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
    val raw = nonNullRaw(df, basketCol, itemCol)
    val (pairs, supports, nBaskets) =
      if (kernelEligible(raw)) {
        val taggedRuns = basketRuns(raw, maxBasketSize, tagged = true)
        // ONE rollup serves all three readouts; cut so the stream pass
        // runs exactly once (the returned lazy plan still reads it —
        // CacheRegistry lifetime, the r18 convention)
        val (rollup, rollupRdd) = graft.util.LoopFrames.cut(
          taggedRuns.groupBy("__tag", "__x", "__y").agg(count(lit(1)).as("__c")))
        graft.util.CacheRegistry.trackRdd(rollupRdd)
        // the N readout is a FULL collect of the filtered cache scan —
        // it computes every partition, so it doubles as the cache
        // materialization pass (a separate count() job was redundant)
        val n = rollup.where(col("__tag") === 0).select("__c")
          .collect().headOption.map(_.getLong(0)).getOrElse(0L)
        val sup = rollup.where(col("__tag") === 1)
          .select(col("__x").as("__i"), col("__c").as("__ni"))
        val prs = rollup.where(col("__tag") === 2)
          .select(col("__x").as("item_a"), col("__y").as("item_b"), col("__c").as("n_ab"))
          .where(col("n_ab") >= minSupport)
        (prs, sup, n)
      } else {
        val basketsRaw = raw
          .groupBy("__b")
          .agg(sort_array(collect_set(col("__i"))).as("__arr"))
          .where(size(col("__arr")) <= maxBasketSize && size(col("__arr")) >= 2)
        // lineage-cut the basket frame (the count below is forced anyway
        // for the N literal; supports and pairs both read the cache)
        val (baskets, basketsRdd) = graft.util.LoopFrames.cut(basketsRaw)
        graft.util.CacheRegistry.trackRdd(basketsRdd)
        val n = baskets.count()
        val sup = baskets
          .select(explode(col("__arr")).as("__i"))
          .groupBy("__i")
          .agg(count(lit(1)).as("__ni"))
        val prs = baskets
          .select(posexplode(col("__arr")).as(Seq("__i0", "item_a")), col("__arr"))
          .select(
            col("item_a"),
            explode(slice(col("__arr"), col("__i0") + 2, size(col("__arr")))).as("item_b"))
          .groupBy("item_a", "item_b")
          .agg(count(lit(1)).as("n_ab"))
          .where(col("n_ab") >= minSupport)
        (prs, sup, n)
      }
    // the support table is vocabulary-bounded but stats-less; the
    // shared limit-probe recipe collects it into a broadcast
    // LocalRelation when small, degrading to a tracked persisted frame
    // past the cap
    val supportsSide = graft.util.DriverSide.smallSideOrTracked(supports)
    // returned LAZY: the caller's one action executes the joins straight
    // off the rollup cache — the r17 final materialize-then-recount pass
    // cost more than it saved
    pairs
      .join(supportsSide.select(col("__i").as("item_a"), col("__ni").as("n_a")), "item_a")
      .join(supportsSide.select(col("__i").as("item_b"), col("__ni").as("n_b")), "item_b")
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        ratio6(col("n_ab"), col("n_a")).as("conf_ab"),
        ratio6(col("n_ab"), col("n_b")).as("conf_ba"),
        ratio6(col("n_ab").cast("decimal(38,0)") * nBaskets,
          col("n_a").cast("decimal(38,0)") * col("n_b")).as("lift"))
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
