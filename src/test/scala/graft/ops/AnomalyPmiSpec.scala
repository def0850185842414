package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Anomaly.zscoreFlags]] + [[Text.pmiBigrams]] semantics. */
class AnomalyPmiSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("zscoreFlags: flags only the outlier; all-equal groups never divide by zero") {
    // group "a": nine 10.0s and one 100.0 — mean 19, var 729 ⇒ std 27;
    // |100−19| = 81 = 3σ exactly ⇒ flagged at k=2, NOT at k=3 (strict >)
    val rows = (1L to 9L).map(i => (i, "a", 10.0)) ++ Seq((10L, "a", 100.0)) ++
      (11L to 15L).map(i => (i, "b", 5.0)) // constant group: std = 0
    val df = rows.toDF("event_id", "event_type", "value")
    val flagged = Anomaly.zscoreFlags(df, "value", Seq("event_type"), k = 2.0)
      .select("event_id", "z").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(flagged.map(_._1).toSeq == Seq(10L))
    assert(flagged.head._2 == 3.0)
    val strict = Anomaly.zscoreFlags(df, "value", Seq("event_type"), k = 3.0).count()
    assert(strict == 0L) // 3σ exactly fails the strict > comparison
  }

  test("zscoreFlags never shuffles the stream for the stats join") {
    val df = (1L to 100L).map(i => (i, s"t${i % 3}", i.toDouble)).toDF("event_id", "event_type", "value")
    val out = Anomaly.zscoreFlags(df, "value", Seq("event_type"), k = 1.0)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("cusumFlags: window closed form equals the textbook loop-carried recurrence") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      k <- 0L until 4L
      i <- 0 until 80
    } yield (k, i.toLong, math.rint(rnd.nextDouble() * 2000) / 100.0) // 2dp values
    val df = rows.toDF("k", "i", "v")
    val target = new java.math.BigDecimal("10.00")
    val slack = new java.math.BigDecimal("1.00")
    val h = new java.math.BigDecimal("20.00")
    val got = Anomaly
      .cusumFlags(df, "v", Seq("k"), Seq("i"), target, slack, h)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getDouble(4))))
      .toMap
    // driver reference: the literal recurrence, exact BigDecimal
    val expected = rows.groupBy(_._1).flatMap { case (k, ks) =>
      var su = BigDecimal(0); var sd = BigDecimal(0)
      ks.sortBy(_._2).flatMap { case (_, i, v) =>
        // BigDecimal.decimal == valueOf(double) — the canonical-string
        // route Spark's double→decimal cast takes (exact for 2dp inputs)
        val bv = BigDecimal.decimal(v).setScale(2)
        su = (su + (bv - BigDecimal("10.00") - BigDecimal("1.00"))).max(0)
        sd = (sd + (BigDecimal("10.00") - bv - BigDecimal("1.00"))).max(0)
        if (su > BigDecimal("20.00") || sd > BigDecimal("20.00"))
          Some((k, i) -> (su.toDouble, sd.toDouble))
        else None
      }
    }
    assert(got == expected)
    assert(got.nonEmpty, "fixture should produce flags")
  }

  test("cusumFlags: a persistent small shift fires CUSUM but never the z-score") {
    // 40 baseline points at 10, then 40 points at 11.2 — a 12% drift
    // far inside 2σ of the mixed distribution
    val rows = (0 until 40).map(i => (1L, i.toLong, 10.0)) ++
      (40 until 80).map(i => (1L, i.toLong, 11.2))
    val df = rows.toDF("k", "i", "v")
    val z = Anomaly.zscoreFlags(df.withColumnRenamed("k", "event_type"), "v", Seq("event_type"), k = 2.0)
    assert(z.count() == 0L)
    val cs = Anomaly.cusumFlags(
      df, "v", Seq("k"), Seq("i"),
      new java.math.BigDecimal("10.00"), new java.math.BigDecimal("0.50"),
      new java.math.BigDecimal("10.00"))
    // drift of +0.7/point past slack accumulates; fires from point 54 on
    val flaggedFrom = cs.agg(min("i")).head().getLong(0)
    assert(flaggedFrom == 54L, s"first flag at $flaggedFrom")
  }

  test("pmiBigrams: hand-computed counts and pmi on a fixed corpus") {
    // corpus: "x y x y" (bigrams: "x y","y x","x y"), "x y z"
    // (bigrams: "x y","y z") ⇒ c("x y")=3, N1=7, N2=5
    // c_x=3, c_y=3 ⇒ pmi(x,y) = ln((3/5)/((3/7)*(3/7)))
    val df = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = Text.pmiBigrams(df, minCount = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.length == 1)
    val (bg, cab, ca, cb, pmi) = got.head
    assert(bg == "x y" && cab == 3L && ca == 3L && cb == 3L)
    val want = math.rint(math.log((3.0 / 5.0) / ((3.0 / 7.0) * (3.0 / 7.0))) * 1e4) / 1e4
    assert(math.abs(pmi - want) < 1e-9, s"pmi $pmi want $want")
  }

  test("pmiBigrams: single-token docs contribute no bigrams and don't break totals") {
    val df = Seq((1L, "solo"), (2L, "a b a b a b a b")).toDF("doc_id", "text")
    val got = Text.pmiBigrams(df, minCount = 3, k = 5).collect()
    // "a b" occurs 4 times, "b a" 3 times
    assert(got.map(_.getString(0)).toSet == Set("a b", "b a"))
  }
}
