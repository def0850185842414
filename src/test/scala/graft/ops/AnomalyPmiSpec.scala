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
