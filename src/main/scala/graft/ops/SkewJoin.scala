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
    * `hash(saltFrom) ⊕ per-row id`, mod salts: content alone would give
    * IDENTICAL rows of a hot key the SAME salt (the exact empty-string
    * pathology this operator exists for — zero fan-out), while the
    * monotonic id alone would still be deterministic per run but blind
    * to content; the combination fans out duplicates and stays stable
    * for distinct rows. */
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
      pmod(hash(col(saltFrom), monotonically_increasing_id()), lit(salts))
    )
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
