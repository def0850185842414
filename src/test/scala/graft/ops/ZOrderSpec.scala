package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** [[ZOrder]] — the oracle (q_zorder) pins the uniform kernel against
  * DuckDB bit arithmetic; this spec pins the pieces the oracle can't
  * reach: the reference Morton implementation (pure Scala), the
  * MSB-aligned mixed-width interleave, quantize bounds under
  * adversarial ranges (ANSI overflow freedom), and clusterByZ being
  * layout-only. */
class ZOrderSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  /** Pure-Scala reference: MSB-aligned mixed-width Morton code; within
    * a level, higher dim index takes the higher bit (the uniform
    * kernel's `i*n + j` convention). */
  private def refMorton(qs: Seq[Long], widths: Seq[Int]): Long = {
    var out = 0L
    var outPos = widths.sum
    for (l <- 0 until widths.max; j <- qs.indices.reverse if l < widths(j)) {
      outPos -= 1
      out |= ((qs(j) >> (widths(j) - 1 - l)) & 1L) << outPos
    }
    out
  }

  test("interleave (uniform) matches the pure-Scala reference bit for bit") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (43690L, 21845L), (12345L, 54321L))
    val df = rows.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(Seq(col("a"), col("b")), 16))
    val got = df.select("a", "b", "z").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == refMorton(Seq(a, b), Seq(16, 16)), s"($a, $b)")
    }
  }

  test("interleaveWidths: MSB alignment interleaves mixed-width dims at every level") {
    // 4-bit a against 8-bit b: top bits must alternate a3,b7,a2,b6...
    val df = Seq((10L, 170L)).toDF("a", "b") // a=1010, b=10101010
      .withColumn("z", ZOrder.interleaveWidths(Seq(col("a"), col("b")), Seq(4, 8)))
    val z = df.select("z").head().getLong(0)
    assert(z == refMorton(Seq(10L, 170L), Seq(4, 8)))
    // top 8 bits alternate the two dims; once a is exhausted, the
    // remaining 4 bits are b's low nibble verbatim
    assert((z & 15L) == (170L & 15L))
  }

  test("quantize: in-range, monotone, and overflow-free for timestamp-scale ranges") {
    val gen = for {
      mn <- Gen.choose(-1000000000000000L, 1000000000000000L)
      w <- Gen.choose(0L, 4000000000000000L)
      f <- Gen.choose(0.0, 1.0)
    } yield (mn, mn + w, mn + (w * f).toLong)
    val cases = Gen.listOfN(300, gen).apply(Gen.Parameters.default, Seed(7L)).get
    // one Spark job for all 300 cases: quantize each v against ITS bounds
    val got = cases.toDF("mn", "mx", "v")
      .select(col("mn"), col("mx"), col("v"),
        ZOrder.quantize(col("v"), col("mn"), col("mx"), 16).as("q"))
      .collect()
    got.foreach { r =>
      val q = r.getLong(3)
      assert(q >= 0L && q < 65536L, s"q=$q for v=${r.getLong(2)} in [${r.getLong(0)},${r.getLong(1)}]")
    }
    // monotone: quantized order never inverts the input order
    val vs = Seq(0L, 1L, 999L, 1000000000000L, 4000000000000000L)
    val qs = vs.toDF("v")
      .select(ZOrder.quantize(col("v"), lit(0L), lit(4000000000000000L), 16).as("q"))
      .collect().map(_.getLong(0))
    assert(qs.toSeq == qs.sorted.toSeq)
  }

  test("quantize and withZValue survive a span exceeding Long range") {
    // mx - mn = 2^64 - 1 overflows a long subtraction outright: the
    // decimal spelling must stay exact, in-range, and monotone
    val vs = Seq(Long.MinValue, -1L, 0L, 1L, Long.MaxValue)
    val qs = vs.toDF("v")
      .select(ZOrder.quantize(col("v"), lit(Long.MinValue), lit(Long.MaxValue), 16).as("q"))
      .collect().map(_.getLong(0))
    qs.foreach(q => assert(q >= 0L && q < 65536L, s"q=$q"))
    assert(qs.toSeq == qs.sorted.toSeq)
    assert(qs.head == 0L && qs.last == 65535L)
    // end-to-end: the driver-side width derivation must not trip on the
    // wrapped span either
    val df = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L), (0L, 3L)).toDF("a", "b")
    val z = ZOrder.withZValue(df, Seq("a", "b"), 8, balanced = true)
    assert(z.select("z").collect().map(_.getLong(0)).forall(_ >= 0L))
  }

  test("effectiveBits: exact widths at powers of two") {
    assert(ZOrder.effectiveBits(0L) == 1)
    assert(ZOrder.effectiveBits(1L) == 1)
    assert(ZOrder.effectiveBits(2L) == 2)
    assert(ZOrder.effectiveBits(255L) == 8)
    assert(ZOrder.effectiveBits(256L) == 9)
    assert(ZOrder.effectiveBits(Long.MaxValue) == 63)
  }

  test("withZValue(balanced) uses effective widths: small-cardinality dim still splits the top bits") {
    // users 0..15 (4 bits effective) against a 1e12-wide ts range: with
    // balanced widths the top byte of the code must depend on the user
    val df = spark.range(0, 4096)
      .select(
        (col("id") % 16).as("u"),
        (col("id") * 244140625L).as("t")) // spread over ~1e12
    val z = ZOrder.withZValue(df, Seq("u", "t"), 16, balanced = true)
    // group by the top 4 code bits: if u participated at the top,
    // distinct u per top-nibble is a strict subset of all 16
    val widths = Seq(4, 16) // u eff 4 bits, t capped at 16
    val top = z.select(shiftright(col("z"), widths.sum - 4).as("hi"), col("u"))
      .groupBy("hi").agg(countDistinct("u").as("nu"))
      .agg(max("nu")).head().getLong(0)
    assert(top < 16L, s"top nibble saw all 16 users — user bits absent from the top (nu=$top)")
  }

  test("clusterByZ is layout-only: same rows, z column dropped") {
    val df = spark.range(0, 1000)
      .select(col("id").as("event_id"), (col("id") % 31).as("user_id"), (col("id") * 1000L).as("ts_us"))
    val out = ZOrder.clusterByZ(df, Seq("user_id", "ts_us"), 16, 8)
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.count() == 1000L)
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
  }
}
