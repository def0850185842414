package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-cardinality estimation with the KMV sketch
  * ([[graft.functions.KMinValues]]) — the telemetry primitive a
  * pipeline runs per shard/source/day at 100 TB, where exact
  * `countDistinct` would shuffle the full distinct universe. The
  * sketch keeps O(k) state per group (map-side partials included), so
  * the exchange carries k longs per group instead of the universe.
  *
  * Unlike HLL (`approx_count_distinct`), KMV over a DETERMINISTIC
  * hash is reproducible by an independent engine — `ORDER BY hash
  * LIMIT k` is the same sketch in SQL — so the whole estimate is
  * hash-exact oracle-checkable. The hash is the repo's standard
  * md5-front-15-hex 60-bit spelling (the [[DedupDocs]] MinHash
  * family's), uniform enough on real keys for the ±1/√k error bound.
  *
  * Estimator (Beyer et al. 2007, unbiased form): with h_(k) the k-th
  * smallest of D = 2^60 hash points, E ≈ (k−1) · D / h_(k); a group
  * with fewer than k distinct values is EXACT (the sketch holds the
  * whole universe).
  */
object Cardinality {

  /** 60-bit deterministic item hash — md5 front 15 hex digits. */
  private[graft] def itemHash(item: Column): Column =
    // native kernel, bit-identical to the SQL respelling the oracles
    // replay — conv(substring(md5(x),1,15),16,10) — without the hex
    // string materialization + base-16 string parse (2.2× on the
    // q_profile battery, tools/ProfileCostSplit)
    graft.functions.Md5Top60.md5Top60(item)

  /** Sketch → (fill, estimate) projection over a kMinValues array —
    * shared by the batch rollup and the streaming window monitor so
    * both walk the identical float chain. */
  private[graft] def estimate(kmvCol: Column, k: Int): (Column, Column) = (
    size(kmvCol).as("n_kmv"),
    when(size(kmvCol) < k, size(kmvCol).cast("double"))
      .otherwise(
        round(
          lit((k - 1).toDouble) *
            // hash 0 is in the 60-bit domain: an unguarded k-th value
            // of 0 would divide to Infinity (and diverge from the
            // oracle's round()). greatest(·,1) pins that measure-zero
            // corner to the max finite estimate; the oracle SQL
            // carries the same GREATEST.
            (pow(lit(2.0), lit(60.0)) /
              greatest(element_at(kmvCol, k), lit(1L)).cast("double")),
          4))
      .as("est_distinct"))

  /** Per-group distinct estimate of `itemCol`:
    * `(groupCol, n_kmv, est_distinct)` — n_kmv = sketch fill (= k once
    * the group passes k distinct), est_distinct = exact count below k,
    * KMV estimate at or above. ONE map-side-combinable aggregate. */
  def kmvDistinct(df: DataFrame, groupCol: String, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 for the (k-1) estimator, got $k")
    val kmv = graft.functions.KMinValues
      .kMinValues(itemHash(col(itemCol)), k)
    val (fill, est) = estimate(col("__kmv"), k)
    df.select(col(groupCol), col(itemCol))
      .where(col(itemCol).isNotNull)
      .groupBy(groupCol)
      .agg(kmv.as("__kmv"))
      .select(col(groupCol), fill, est)
  }

  /** Equi-join OUTPUT-SIZE estimate from per-side CMS rows (Cormode &
    * Muthukrishnan 2005 §4.2): |A ⋈ B| ≈ min over hash rows i of
    * Σ_bucket cntA_i[b] · cntB_i[b] — the inner product of the two
    * sides' bucket histograms, an upper-bound estimator like the point
    * query. This is the join-planning primitive (pick broadcast vs
    * shuffle vs salt BEFORE running the join) at sketch cost: each
    * side is ONE map-side-combinable aggregate into ≤ d·w rows, the
    * final inner product is a d·w-row join — the corpora themselves
    * never co-shuffle. Deterministic salted hashes ⇒ the whole
    * estimate is oracle-replayable, collisions included. Returns one
    * row: (est_join_rows). */
  def joinSizeEstimate(
      dfA: DataFrame,
      keyA: String,
      dfB: DataFrame,
      keyB: String,
      d: Int,
      w: Int
  ): DataFrame = {
    checkCmsParams(d, w)
    def sketchOf(df: DataFrame, keyCol: String, out: String): DataFrame = {
      val items = df.select(col(keyCol).as("item")).where(col(keyCol).isNotNull)
      items
        .withColumn("__h", itemHash(col("item").cast("string")))
        .select(explode(rowSlices(d, w)).as("__r"), col("__h"))
        .groupBy(
          col("__r.i").as("i"),
          cmsBucket(col("__h"), col("__r.div"), w).as("bucket"))
        .agg(count(lit(1)).as(out))
    }
    sketchOf(dfA, keyA, "ca")
      .join(sketchOf(dfB, keyB, "cb"), Seq("i", "bucket"))
      .groupBy("i")
      .agg(sum(col("ca") * col("cb")).as("ip"))
      .agg(min(col("ip")).as("est_join_rows"))
  }

  /** CMS hash family: the d rows slice DISJOINT log2(w)-bit ranges of
    * ONE 60-bit md5 — row i's bucket is `(H / w^i) mod w`. One hash
    * per item instead of d (the md5 is the dominant per-row cost,
    * tools/ProfileCostSplit), sound because md5 bits are independent;
    * the SQL respelling is integer div/mod arithmetic on the same H.
    * Requires w a power of two and d·log2(w) ≤ 60 (disjointness). */
  private def checkCmsParams(d: Int, w: Int): Unit = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    require(w >= 2 && (w & (w - 1)) == 0, s"w must be a power of two >= 2, got $w")
    val bits = java.lang.Integer.numberOfTrailingZeros(w)
    require(d * bits <= 60,
      s"d * log2(w) = ${d * bits} exceeds the 60 hash bits (d=$d, w=$w)")
  }

  /** (i, divisor = w^i) pairs for the d bit-slices, as a literal
    * array — the explode is stateless, the divisor a per-row long. */
  private def rowSlices(d: Int, w: Int): Column = {
    val bits = java.lang.Integer.numberOfTrailingZeros(w)
    array((0 until d).map(i =>
      struct(lit(i).as("i"), lit(1L << (bits * i)).as("div"))): _*)
  }

  private def cmsBucket(h: Column, div: Column, w: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.graftbridge.Bridge
    pmod(
      Bridge.column(IntegralDivide(Bridge.expression(h), Bridge.expression(div))),
      lit(w.toLong))
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) point-frequency
    * estimates: `d` salted hash rows × `w` buckets, estimate = MIN over
    * rows of the probed bucket's total — always ≥ the true count,
    * within εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉. The
    * telemetry companion to [[kmvDistinct]] (distinct cardinality) and
    * the Space-Saving top-k: CMS answers "how often does THIS item
    * occur" from O(d·w) state instead of a full histogram — at 100 TB
    * the sketch build is ONE exchange of at most d·w pre-combined
    * bucket rows (the d-way explode is stateless), never the item
    * universe.
    *
    * Deterministic md5-salted buckets (the repo's standard 60-bit hash
    * spelling), so an independent engine replays the identical sketch
    * — estimates INCLUDING collision overestimates are hash-exact
    * oracle-checkable. Returns, for the `topN` items by true count
    * (ties bytewise): (item, n_true, n_est), n_est ≥ n_true always. */
  def cmsEstimates(df: DataFrame, itemCol: String, d: Int, w: Int, topN: Int): DataFrame = {
    checkCmsParams(d, w)
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val items = df.select(col(itemCol).as("item")).where(col(itemCol).isNotNull)
    val sketch = items
      .withColumn("__h", itemHash(col("item").cast("string")))
      .select(explode(rowSlices(d, w)).as("__r"), col("__h"))
      .groupBy(col("__r.i").as("i"), cmsBucket(col("__h"), col("__r.div"), w).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val probes = items
      .groupBy("item")
      .agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("item").asc)
      .limit(topN)
    probes
      .withColumn("__h", itemHash(col("item").cast("string")))
      .select(col("item"), col("n_true"), explode(rowSlices(d, w)).as("__r"), col("__h"))
      .select(
        col("item"), col("n_true"),
        col("__r.i").as("i"),
        cmsBucket(col("__h"), col("__r.div"), w).as("bucket"))
      .join(sketch, Seq("i", "bucket"))
      .groupBy("item", "n_true")
      .agg(min(col("c")).as("n_est"))
      .select("item", "n_true", "n_est")
  }
}
