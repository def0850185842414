package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, ShiftLeft}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Deterministic Bloom-filter semi-join screen — the shuffle-avoidance
  * primitive for "filter the 100 TB side by membership in a small key
  * set" when even a broadcast hash join of the exact keys is
  * unnecessary weight (Bloom 1970; the engine-internal analog is
  * Spark's runtime row-group filter, but THIS one is deterministic and
  * engine-replayable, so its output — false positives included — is
  * hash-exact oracle-checkable).
  *
  * Layout: `m` bit positions packed 63 per long word (bit index
  * `p % 63` — the sign bit is never used, so `1L << bit` stays
  * positive and the word arithmetic is identical on any two's-
  * complement engine). The `k` probe positions slice DISJOINT
  * log2(m)-bit ranges of ONE 60-bit md5 (the [[Cardinality]] CMS
  * recipe): `p_i = (H / m^i) mod m`, requiring m a power of two and
  * k·log2(m) ≤ 60.
  *
  * Scale shape: the build is one map-side-combinable `bit_or` rollup
  * into ≤ ⌈m/63⌉ word rows, collected to the driver ONLY because a
  * Bloom filter IS a broadcast structure — the collect is bounded by
  * the caller's `m` (8 KiB per 2^16 bits), never the key count. The
  * probe side is a stateless codegen'd projection over the literal
  * word array: no join, no exchange, no per-row state.
  */
object Bloom {

  private def intDiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  private def shl(one: Column, bits: Column): Column =
    Bridge.column(ShiftLeft(Bridge.expression(one), Bridge.expression(bits.cast("int"))))

  private def checkParams(m: Int, k: Int): Unit = {
    require(m >= 64 && (m & (m - 1)) == 0, s"m must be a power of two >= 64, got $m")
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    val bits = java.lang.Integer.numberOfTrailingZeros(m)
    require(k * bits <= 60,
      s"k * log2(m) = ${k * bits} exceeds the 60 hash bits (k=$k, m=$m)")
    require(m <= (1 << 26), s"m = $m exceeds the 64 MiB broadcast-sanity cap")
  }

  /** The i-th probe position of a key's 60-bit hash. */
  private def pos(h: Column, i: Int, m: Int): Column = {
    val bits = java.lang.Integer.numberOfTrailingZeros(m)
    pmod(intDiv(h, lit(1L << (bits * i))), lit(m.toLong))
  }

  /** Build the filter over `keyCol`'s distinct values: ⌈m/63⌉ long
    * words, word `p / 63` holding bit `p % 63` for every probe
    * position p of every key. Driver-side array by design (a Bloom
    * filter is a broadcast structure); size bounded by `m`, not the
    * key count. */
  def buildWords(keys: DataFrame, keyCol: String, m: Int, k: Int): Array[Long] = {
    checkParams(m, k)
    val h = Cardinality.itemHash(col(keyCol).cast("string"))
    val positions = keys
      .where(col(keyCol).isNotNull)
      .withColumn("__h", h)
      .select(explode(array((0 until k).map(i => pos(col("__h"), i, m)): _*)).as("__p"))
    val words = positions
      .groupBy(intDiv(col("__p"), lit(63L)).as("__w"))
      .agg(expr("bit_or(shiftleft(1L, int(__p % 63)))").as("__bits"))
      .collect()
    val arr = new Array[Long]((m + 62) / 63)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test column for `keyCol` against a built word array:
    * true iff ALL k probed bits are set (possible false positives at
    * the standard Bloom rate, zero false negatives — and since the
    * hash is deterministic, the exact same false positives on every
    * engine). A stateless codegen'd projection: k array lookups + AND
    * chain over the literal words, no join. */
  def mightContain(keyCol: Column, words: Array[Long], m: Int, k: Int): Column = {
    checkParams(m, k)
    require(words.length == (m + 62) / 63,
      s"words length ${words.length} does not match m = $m (expected ${(m + 62) / 63})")
    val wordsCol = lit(words)
    val h = Cardinality.itemHash(keyCol.cast("string"))
    (0 until k)
      .map { i =>
        val p = pos(h, i, m)
        val word = element_at(wordsCol, (intDiv(p, lit(63L)) + 1).cast("int"))
        (word.bitwiseAND(shl(lit(1L), pmod(p, lit(63L)))) =!= 0)
      }
      .reduce(_ && _)
  }

  /** The composed screen: rows of `big` whose `bigKey` MIGHT be in
    * `small.smallKey` (Bloom semantics — supersets the exact semi-join
    * by the deterministic false positives). The big side never
    * shuffles and joins nothing. */
  def screen(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      m: Int,
      k: Int
  ): DataFrame = {
    val words = buildWords(small, smallKey, m, k)
    big.where(col(bigKey).isNotNull && mightContain(col(bigKey), words, m, k))
  }
}
