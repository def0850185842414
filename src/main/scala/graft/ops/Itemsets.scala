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
    val items = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    val sized = items
      .withColumn("__sz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__b")))
      .where(col("__sz") <= maxBasketSize)
    sized.toDF("__b", "ia", "__sz")
      .join(sized.toDF("__b", "ib", "__sz2"), "__b")
      .where(col("ia") < col("ib"))
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
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
