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
}
