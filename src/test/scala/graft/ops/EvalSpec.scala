package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  // gold a a a b b c ; pred a a b b c c — c never correct, a over-gold
  private val rows = Seq(
    ("a", "a"), ("a", "a"), ("a", "b"),
    ("b", "b"), ("b", "c"),
    ("c", "c")
  ).toDF("label", "pred")

  test("confusion counts every observed pair") {
    val got = Eval.confusion(rows, "label", "pred")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("a", "a") -> 2L, ("a", "b") -> 1L,
      ("b", "b") -> 1L, ("b", "c") -> 1L,
      ("c", "c") -> 1L))
  }

  test("per-class report: tp/fp/fn and the cleared-form f1") {
    val got = Eval.classReport(rows, "label", "pred")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)),
          (Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))))
      .toMap
    assert(got("a")._1 == ((2L, 0L, 1L))) // predicted a twice, both right; one a missed
    assert(got("b")._1 == ((1L, 1L, 1L)))
    assert(got("c")._1 == ((1L, 1L, 0L)))
    assert(got("a")._2 == ((Some(1.0), Some(0.666667), Some(0.8))))
    assert(got("b")._2 == ((Some(0.5), Some(0.5), Some(0.5))))
    assert(got("c")._2 == ((Some(0.5), Some(1.0), Some(0.666667))))
  }

  test("a class with zero predictions gets NULL precision, zero golds NULL recall") {
    // gold has d but pred never says d; pred says e but gold never has e
    val df = Seq(("d", "e")).toDF("label", "pred")
    val got = Eval.classReport(df, "label", "pred")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)),
        (r.isNullAt(4), r.isNullAt(5), r.isNullAt(6))))
      .toMap
    assert(got("d") == (((0L, 0L, 1L), (true, false, false)))) // no preds: null precision
    assert(got("e") == (((0L, 1L, 0L), (false, true, false)))) // no golds: null recall
  }

  test("NULL label fails loud") {
    val df = Seq((null.asInstanceOf[String], "a")).toDF("label", "pred")
    val e = intercept[Exception](Eval.confusion(df, "label", "pred").collect())
    assert(e.getMessage != null)
  }

  test("clusteringAgreement: hand-computed purity and NEGATIVE exact ARI") {
    // contingency [[2,1],[1,2]]: S=2 A=B=6 P=15 →
    // ari = (2 − 36/15)/(6 − 36/15) = −1/9; purity = 4/6
    val df = Seq(
      ("c1", "l1"), ("c1", "l1"), ("c1", "l2"),
      ("c2", "l1"), ("c2", "l2"), ("c2", "l2")).toDF("cl", "gold")
    val r = Eval.clusteringAgreement(df, "cl", "gold").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.666667)
    assert(r.getDouble(4) == -0.111111, r.toString)
  }

  test("clusteringAgreement: identical partitions score ARI 1, purity 1") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("cl", "gold")
    val r = Eval.clusteringAgreement(df, "cl", "gold").head()
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("clusteringAgreement: single cluster AND single label is degenerate — NULL ari") {
    val df = Seq(("a", "x"), ("a", "x")).toDF("cl", "gold")
    val r = Eval.clusteringAgreement(df, "cl", "gold").head()
    assert(r.getDouble(3) == 1.0 && r.isNullAt(4))
  }
}
