package graft.ops

import graft.SparkSpec

/** [[Labels]] and [[Calibration]] — label/score QA: hand-computed
  * kappa/ECE values, deterministic tie-breaks, loud failures. */
class LabelsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  test("majorityVote: modal label, bytewise tie-break, exact-dup dedup, nulls dropped") {
    val ann = Seq(
      // item 1: b wins 2-1
      (1L, "r1", "b"), (1L, "r2", "b"), (1L, "r3", "a"),
      // item 2: tie a/b → "a" (bytewise smallest)
      (2L, "r1", "a"), (2L, "r2", "b"),
      // item 3: exact duplicate counts once; null dropped
      (3L, "r1", "x"), (3L, "r1", "x"), (3L, "r2", null)
    ).toDF("item", "rater", "label")
    val got = Labels.majorityVote(ann, "item", "rater", "label")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == (("b", 2L, 3L, 0.666667)))
    assert(got(2L) == (("a", 1L, 2L, 0.5)))
    assert(got(3L) == (("x", 1L, 1L, 1.0)))
  }

  test("cohenKappa: hand-computed values incl. perfect, chance, negative, undefined") {
    def kappa(rows: Seq[(String, String)]): Option[Double] = {
      val r = Labels.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
      Option(r.get(3)).map(_.asInstanceOf[Double])
    }
    // n=4, agree=3, margins A(a3,b1) B(a2,b2) → Σ=8, κ=(12−8)/(16−8)=0.5
    assert(kappa(Seq(("a", "a"), ("a", "a"), ("b", "b"), ("a", "b"))) == Some(0.5))
    assert(kappa(Seq(("a", "a"), ("b", "b"))) == Some(1.0))        // perfect
    assert(kappa(Seq(("a", "b"), ("b", "a"))) == Some(-1.0))       // systematic disagree
    assert(kappa(Seq(("a", "a"), ("a", "a"))) == None)             // pe = 1 → undefined
    assert(kappa(Seq(("a", "b"), ("a", "b"))) == Some(0.0))        // disjoint constants
  }

  test("reliabilityBins: exact edges, 1.0 clamped, out-of-range fails loud") {
    val df = Seq((0.0, 0), (0.2499, 0), (0.25, 1), (0.9, 1), (1.0, 1))
      .toDF("score", "label")
    val got = Calibration.reliabilityBins(df, "score", "label", nBins = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDecimal(3).doubleValue)))
      .toMap
    assert(got(0L) == ((2L, 0L, 0.2499)))
    assert(got(1L) == ((1L, 1L, 0.25)))   // 0.25 lands in bin 1, not 0
    assert(got(3L) == ((2L, 2L, 1.9)))    // 0.9 and the clamped 1.0
    val bad = Seq((1.2, 1)).toDF("score", "label")
    val e = intercept[Throwable] {
      Calibration.reliabilityBins(bad, "score", "label", 4).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("Calibration: score outside"), chain)
  }

  test("ece: hand-computed telescoped value") {
    // 2 bins: high bin (0.9,1),(0.8,0) → |1−1.7| = 0.7;
    //         low bin (0.1,0),(0.2,1) → |1−0.3| = 0.7;  ece = 1.4/4
    val df = Seq((0.9, 1), (0.8, 0), (0.1, 0), (0.2, 1)).toDF("score", "label")
    val r = Calibration.ece(df, "score", "label", nBins = 2).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 0.35)
  }

  test("raterAccuracy: per-rater match rate vs the resolved majority") {
    val ann = Seq(
      // items 1..3: majority "a"; r2 wrong on item 2; r3 skips item 3
      (1L, "r1", "a"), (1L, "r2", "a"), (1L, "r3", "a"),
      (2L, "r1", "a"), (2L, "r2", "b"), (2L, "r3", "a"),
      (3L, "r1", "a"), (3L, "r2", "a")
    ).toDF("item", "rater", "label")
    val got = Labels.raterAccuracy(ann, "item", "rater", "label")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got("r1") == ((3L, 3L, 1.0)))
    assert(got("r2") == ((3L, 2L, 0.666667)))
    assert(got("r3") == ((2L, 2L, 1.0)))
  }

  test("keywordsTfIdf: rare tokens outrank common, k bound, bytewise ties") {
    val docs = Seq(
      (1L, "common rare1 common common"),
      (2L, "common rare2"),
      (3L, "common common")
    ).toDF("doc_id", "text")
    val got = Text.keywordsTfIdf(docs, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: rare1 (tf1, df1, idf ln(4)) vs common (tf3, df3, idf ln(2))
    // scores: 1·1.3863 = 1.3863 < 3·0.6931 = 2.0794 → common ranks first
    assert(got((1L, 1)) == (("common", 3L, 3L)))
    assert(got((1L, 2)) == (("rare1", 1L, 1L)))
    assert(got((2L, 1)) == (("rare2", 1L, 1L))) // 1.3863 > 0.6931
    assert(got((2L, 2)) == (("common", 1L, 3L)))
    assert(got((3L, 1)) == (("common", 2L, 3L)))
    // k bound: doc 3 has one distinct token → one row
    assert(!got.contains((3L, 2)))
  }

  test("ece: perfectly calibrated scores give zero") {
    // each bin's mean score equals its positive rate exactly
    val df = Seq(
      (0.25, 0), (0.25, 0), (0.25, 0), (0.25, 1),  // bin 0 of [0,.5): acc .25 = conf
      (0.75, 0), (0.75, 1), (0.75, 1), (0.75, 1)   // bin 1: acc .75 = conf
    ).toDF("score", "label")
    assert(Calibration.ece(df, "score", "label", 2).head().getDouble(1) == 0.0)
  }

  test("isotonicFit: PAV pools adjacent violators with exact rational means") {
    // scores .1 (0/2), .2 (2/2), .3 (1/2): means 0, 1, .5 → the last
    // two pool to 3/4; the fit is the step [0, .75, .75]
    val df = Seq(
      (0.1, 0), (0.1, 0), (0.2, 1), (0.2, 1), (0.3, 1), (0.3, 0)
    ).toDF("score", "label")
    val fit = Calibration.isotonicFit(df, "score", "label")
    assert(fit.map(_.scoreMicro) == Seq(100000L, 200000L, 300000L))
    assert(fit.map(_.calMicro) == Seq(0L, 750000L, 750000L))
    assert(fit.map(_.n) == Seq(2L, 2L, 2L))
    assert(fit.map(_.nPos) == Seq(0L, 2L, 1L))
  }

  test("isotonicFit: already-monotone rates pass through; fit is always non-decreasing") {
    val df = Seq((0.1, 0), (0.5, 1), (0.5, 0), (0.9, 1)).toDF("score", "label")
    val fit = Calibration.isotonicFit(df, "score", "label")
    assert(fit.map(_.calMicro) == Seq(0L, 500000L, 1000000L))
    val rnd = new scala.util.Random(42)
    val noisy = Seq.fill(200)((rnd.nextInt(20) / 20.0, rnd.nextInt(2))).toDF("score", "label")
    val f2 = Calibration.isotonicFit(noisy, "score", "label")
    f2.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a.scoreMicro < b.scoreMicro && a.calMicro <= b.calMicro, s"$a -> $b")
      case _ =>
    }
  }

  test("isotonicFit: distinct-score cap fails loud") {
    val df = Seq((0.1, 0), (0.2, 1), (0.3, 1)).toDF("score", "label")
    intercept[IllegalArgumentException] {
      Calibration.isotonicFit(df, "score", "label", maxDistinct = 2)
    }
  }

  test("krippendorffAlpha: hand-computed 2-rater table with one disagreement") {
    // A:(1,1) B:(2,2) C:(3,3) D:(3,3) E:(1,2):
    // Do = 2/10 = 0.2, De = (100−34)/90, alpha = 8/11
    val df = Seq(
      ("A", "r1", "1"), ("A", "r2", "1"), ("B", "r1", "2"), ("B", "r2", "2"),
      ("C", "r1", "3"), ("C", "r2", "3"), ("D", "r1", "3"), ("D", "r2", "3"),
      ("E", "r1", "1"), ("E", "r2", "2")).toDF("item", "rater", "label")
    val r = Labels.krippendorffAlpha(df, "item", "rater", "label").head()
    assert(r.getLong(0) == 5L && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 0.2)
    assert(r.getDouble(3) == 0.733333)
    assert(r.getDouble(4) == 0.727273, r.toString)
  }

  test("krippendorffAlpha: mixed rater counts weight by 1/(m-1); chance-level is zero") {
    // F:(1,1,2) m=3 contributes L/2-weighted pairs, G:(1,1) m=2:
    // Do = 0.4 = De → alpha = 0
    val df = Seq(
      ("F", "r1", "1"), ("F", "r2", "1"), ("F", "r3", "2"),
      ("G", "r1", "1"), ("G", "r2", "1")).toDF("item", "rater", "label")
    val r = Labels.krippendorffAlpha(df, "item", "rater", "label").head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.4 && r.getDouble(3) == 0.4)
    assert(r.getDouble(4) == 0.0)
  }

  test("krippendorffAlpha: singletons and NULL labels drop; one-label table has NULL alpha") {
    val df = Seq(
      ("A", "r1", "x"), ("A", "r2", "x"),
      ("B", "r1", "x"),                      // single rating → no pairs
      ("C", "r1", null.asInstanceOf[String]) // abstention
    ).toDF("item", "rater", "label")
    val r = Labels.krippendorffAlpha(df, "item", "rater", "label").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.0) // perfect observed agreement
    assert(r.isNullAt(4)) // De = 0 — alpha undefined, not crashed
  }

  test("classWeights: balanced heuristic N/(K·n_c), exact 6dp") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("label")
    val rows = Labels.classWeights(df, "label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("a", 6L, 0.6, 0.555556), ("b", 3L, 0.3, 1.111111), ("c", 1L, 0.1, 3.333333)))
  }

  test("classWeights: NULL labels fail loud") {
    val df = Seq("a", null).toDF("label")
    intercept[Exception] { Labels.classWeights(df, "label").collect() }
  }

  test("krippendorffAlpha: too many raters on one item fails loud") {
    val df = (1 to 4).map(i => ("A", s"r$i", "x")).toDF("item", "rater", "label")
    val e = intercept[Exception] {
      Labels.krippendorffAlpha(df, "item", "rater", "label", maxRaters = 3).collect()
    }
    assert(e.getMessage != null)
  }
}
