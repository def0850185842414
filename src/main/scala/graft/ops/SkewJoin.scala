package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Skew-resilient equi-join by key salting: the big (skewed) side gets a
  * random-but-deterministic salt in [0, salts); the small side is
  * replicated once per salt value; the join key becomes (key, salt), so
  * one hot key fans out across `salts` tasks instead of melting a single
  * reducer. AQE's skew-join handles moderate skew automatically; salting
  * is the explicit fix for the pathological "one key is 30% of the data"
  * shape that training-data pipelines hit (empty-string text hashes,
  * null-ish ids...).
  */
object SkewJoin {

  /** `a div b` at the Column level (the [[ZOrder]] spelling):
    * IntegralDivide accepts decimal operands and returns LONG. */
  private def intDiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  /** Inner equi-join of `big` and `small` on `key`, salted. The salt is
    * `pmod(hash(key, saltFrom), salts)` — derived purely from row
    * CONTENT, never from partition layout or row order. A salt involving
    * `monotonically_increasing_id()` (or any ordinal) is the SPARK-23207
    * trap: if `big` sits above a shuffle, a map-task recomputation after a
    * fetch failure can replay rows in a different order, re-salting them
    * into different reduce partitions than the non-retried ones — silent
    * row loss/duplication that no failure-free local test can catch.
    *
    * `saltFrom` is the caller-chosen DISCRIMINATOR: a column whose values
    * vary within a hot key (a row id, a timestamp, a payload digest).
    * Rows identical in (key, saltFrom) share a salt bucket — the correct
    * price, since separating content-identical rows is order-dependent by
    * construction. Hashing only two named columns (not the whole row)
    * keeps the salt cheap on wide rows and avoids `hash()`'s MapType
    * restriction on unrelated payload columns. */
  def saltedInner(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFrom: String,
      salts: Int
  ): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn(
      "__salt",
      pmod(hash(col(key), col(saltFrom)), lit(salts))
    )
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Per-key skew report for a planned equi-join — the detection half
    * of the salting remedy (and the per-key companion to
    * [[Cardinality.joinSizeEstimate]]'s total): for every key hot on
    * EITHER side, the two sides' multiplicities, the exact output
    * fan-out `n_a · n_b`, and the salt factor that caps any one
    * reduce task at `targetPairsPerTask` output rows.
    *
    * Plan: one map-side-combinable count per side (the exchange
    * carries distinct keys, not rows); the hot filter shrinks each to
    * the keys that matter before the two count tables meet, so the
    * report join is hot-keys-sized. Fan-out products run in
    * DECIMAL(38,0) (two 10^9-multiplicity sides overflow a long) and
    * the salt ceiling uses integral division (a rounded decimal
    * divide can floor into the wrong integer when
    * targetPairsPerTask > 10^6).
    *
    * @return (key, n_a, n_b, est_pairs, salt_factor) for keys with
    *         `max(n_a, n_b) >= hotThreshold`; salt_factor >= 1
    */
  def skewAdvisor(
      dfA: DataFrame,
      keyA: String,
      dfB: DataFrame,
      keyB: String,
      hotThreshold: Long,
      targetPairsPerTask: Long
  ): DataFrame = {
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    require(targetPairsPerTask >= 1, s"targetPairsPerTask must be >= 1, got $targetPairsPerTask")
    def counts(df: DataFrame, keyCol: String, out: String): DataFrame =
      df.select(col(keyCol).as("key")).where(col("key").isNotNull)
        .groupBy("key").agg(count(lit(1)).as(out))
    val cA = counts(dfA, keyA, "n_a")
    val cB = counts(dfB, keyB, "n_b")
    val hotKeys = cA.where(col("n_a") >= hotThreshold).select("key")
      .unionAll(cB.where(col("n_b") >= hotThreshold).select("key"))
      .distinct()
    val est = (col("n_a").cast("decimal(19,0)") * col("n_b").cast("decimal(19,0)"))
      .cast("decimal(38,0)")
    hotKeys
      .join(cA, Seq("key"), "left")
      .join(cB, Seq("key"), "left")
      .select(
        col("key"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("est_pairs", est)
      .withColumn(
        "salt_factor",
        greatest(
          lit(1L),
          intDiv(
            col("est_pairs") + lit(targetPairsPerTask - 1),
            lit(targetPairsPerTask))))
  }
}
