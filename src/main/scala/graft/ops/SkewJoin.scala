package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Inner equi-join of `big` and `small` on `key`, salted. The salt is
    * `pmod(hash(ALL of big's columns), salts)` — derived purely from row
    * CONTENT, never from partition layout or row order. A salt involving
    * `monotonically_increasing_id()` (or any ordinal) is the SPARK-23207
    * trap: if `big` sits above a shuffle, a map-task recomputation after a
    * fetch failure can replay rows in a different order, re-salting them
    * into different reduce partitions than the non-retried ones — silent
    * row loss/duplication that no failure-free local test can catch.
    *
    * Trade-off: rows of a hot key that are identical in EVERY column
    * share a salt bucket. That is the correct price — full-row duplicates
    * carry no distinguishing content, and any scheme that separates them
    * is order-dependent by construction. In practice hot-key rows differ
    * in some payload column (the `saltFrom`-style discriminator and the
    * rest of the row), so the hash fans them out across all `salts`
    * buckets deterministically. */
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
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salts))
    )
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
