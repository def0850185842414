package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[KMinValues]] — the bounded KMV sketch aggregate must equal the
  * unbounded SQL spelling `slice(sort_array(collect_set(x)), 1, k)`
  * on every partitioning, and the [[graft.ops.Cardinality]] estimator
  * must be exact under k and within the KMV error bound above it. */
class KMinValuesSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("kMinValues ≡ slice(sort_array(collect_set), 1, k) across repartitionings") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)((rnd.nextInt(4), rnd.nextLong() & 0x0FFFFFFFFFFFFFFFL))
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = df.groupBy("g")
        .agg(
          KMinValues.kMinValues(col("v"), 16).as("kmv"),
          slice(sort_array(collect_set(col("v"))), 1, 16).as("ref"))
      got.collect().foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"g=${r.getInt(0)} parts=$parts")
      }
    }
  }

  test("groups under k distinct return the full sorted universe; nulls ignored") {
    val df = Seq[(Int, Option[Long])]((0, Some(5L)), (0, Some(3L)), (0, Some(5L)), (0, None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(KMinValues.kMinValues(col("v"), 16)).head()
    assert(got.getSeq[Long](1) == Seq(3L, 5L))
  }

  test("cmsEstimates: never underestimates, exact at collision-free width, tight at small width") {
    val items = (0 until 1000).map(i => s"item_${i % 37}") ++ Seq.fill(500)("hot")
    val df = items.toDF("tok")
    // wide sketch (w >> distinct): no collisions, estimates exact
    val exact = graft.ops.Cardinality.cmsEstimates(df, "tok", d = 4, w = 4096, topN = 38)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.nonEmpty && exact.forall { case (_, t, e) => e == t })
    assert(exact.find(_._1 == "hot").exists(_._2 == 500L))
    // narrow sketch (w = 8 << 38 distinct): collisions guaranteed —
    // estimates are >= true everywhere and > true somewhere
    val tight = graft.ops.Cardinality.cmsEstimates(df, "tok", d = 2, w = 8, topN = 38)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(tight.forall { case (t, e) => e >= t }, "CMS must never underestimate")
    assert(tight.exists { case (t, e) => e > t }, "w=8 over 38 keys must collide")
  }

  test("joinSizeEstimate: never underestimates, exact at collision-free width") {
    // A-side key i repeats (i % 7) + 1 times; B-side key i repeats
    // (i % 3) + 1 times over the shared key range 0..99 → true join
    // size = Σ_i repA(i) · repB(i), computable exactly.
    val aRows = (0 until 100).flatMap(i => Seq.fill(i % 7 + 1)(i.toLong))
    val bRows = (0 until 100).flatMap(i => Seq.fill(i % 3 + 1)(i.toLong))
    val trueSize = (0 until 100).map(i => (i % 7 + 1).toLong * (i % 3 + 1)).sum
    val a = aRows.toDF("ka")
    val b = bRows.toDF("kb")
    // wide sketch (w >> 100 distinct keys): collision-free, estimate exact
    val exact = graft.ops.Cardinality.joinSizeEstimate(a, "ka", b, "kb", d = 4, w = 8192)
      .head().getLong(0)
    assert(exact == trueSize, s"collision-free estimate $exact != true $trueSize")
    // narrow sketch (w = 8): collisions inflate the inner product —
    // still an upper bound, never an underestimate
    val coarse = graft.ops.Cardinality.joinSizeEstimate(a, "ka", b, "kb", d = 2, w = 8)
      .head().getLong(0)
    assert(coarse >= trueSize, "CMS inner product must never underestimate")
  }

  test("estimator guards the k-th-value-0 corner: finite max estimate, never Infinity") {
    // hash 0 is in the 60-bit domain; an unguarded divide would yield
    // Infinity. Drive estimate() directly with a sketch whose k-th
    // smallest is 0 (only reachable when EVERY retained hash is 0).
    val df = Seq(Seq(0L, 0L)).toDF("kmv")
    val (_, est) = graft.ops.Cardinality.estimate(col("kmv"), 2)
    val got = df.select(est).head().getDouble(0)
    assert(!got.isInfinite && got == math.pow(2.0, 60.0))
  }

  test("estimator: exact below k, within 3/sqrt(k) relative error above") {
    val n = 20000
    val df = (0 until n).map(i => ("big", s"item_$i")).toDF("g", "item")
      .union(Seq(("small", "a"), ("small", "b"), ("small", "a")).toDF("g", "item"))
    val k = 256
    val got = graft.ops.Cardinality.kmvDistinct(df, "g", "item", k)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(got("small") == ((2, 2.0)))
    val (fill, est) = got("big")
    assert(fill == k)
    val relErr = math.abs(est - n) / n.toDouble
    assert(relErr < 3.0 / math.sqrt(k), s"est=$est relErr=$relErr")
  }
}
