package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("conversion: matches the literal greedy-earliest reference on a random fixture") {
    val rnd = new scala.util.Random(7)
    val types = Vector("a", "b", "c", "x")
    val rows = for {
      u <- 0L until 25L
      i <- 0 until 40
    } yield (u, i.toLong * 1000L + rnd.nextInt(999), types(rnd.nextInt(types.size)))
    val df = rows.toDF("u", "ts", "t")
    val span = 15000L
    val got = Funnel
      .conversion(df, "ts", "u", "t", Seq("a", "b", "c"), span)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)

    // driver reference: per user, anchor at first 'a', then earliest
    // next step strictly after the previous and within span of anchor
    val perUser = rows.groupBy(_._1).values.map { es =>
      val sorted = es.sortBy(_._2)
      val t1 = sorted.collectFirst { case (_, ts, "a") => ts }
      val t2 = t1.flatMap(a => sorted.collectFirst { case (_, ts, "b") if ts > a && ts <= a + span => ts })
      val t3 = (t1, t2) match {
        case (Some(a), Some(b)) =>
          sorted.collectFirst { case (_, ts, "c") if ts > b && ts <= a + span => ts }
        case _ => None
      }
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }.toSeq
    val n1 = perUser.count(_._1).toLong
    val n2 = perUser.count(_._2).toLong
    val n3 = perUser.count(_._3).toLong
    def rate(n: Long) = if (n1 == 0) 0.0 else math.rint(n.toDouble / n1 * 10000) / 10000
    assert(got.toSeq == Seq(
      (1, "a", n1, rate(n1)), (2, "b", n2, rate(n2)), (3, "c", n3, rate(n3))))
    assert(n1 > 0 && n2 > 0, "fixture should exercise the funnel")
    assert(n2 < n1 || n3 < n2, "fixture should drop users between steps")
  }

  test("conversion: strict order and span are enforced") {
    // u1 completes in order; u2 has the click BEFORE the view (no
    // conversion); u3 clicks outside the span
    val df = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"),
      (2L, 200L, "click"), (2L, 300L, "view"),
      (3L, 100L, "view"), (3L, 5000L, "click")
    ).toDF("u", "ts", "t")
    val got = Funnel.conversion(df, "ts", "u", "t", Seq("view", "click"), maxSpanUs = 1000L)
      .orderBy("step_idx")
      .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("view", 3L), ("click", 1L)).map { case (s, n) =>
      (s, n, math.rint(n.toDouble / 3 * 10000) / 10000) })
  }

  test("conversion: the step chain runs in ONE user exchange") {
    val df = Seq((1L, 1L, "a"), (1L, 2L, "b"), (2L, 3L, "a")).toDF("u", "ts", "t")
    val plan = Funnel.conversion(df, "ts", "u", "t", Seq("a", "b"), 10L)
      .queryExecution.executedPlan.toString
    val userExchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(userExchanges == 1, s"expected one user exchange, plan:\n$plan")
  }

  test("retention: hand fixture — offsets, counts, offset-0 rate is 1.0") {
    // period = 100; u1 first in period 0 active in 0,1,3; u2 first in
    // period 0 active in 0; u3 first in period 1 active in 1,2
    val df = Seq(
      (1L, 10L), (1L, 150L), (1L, 320L),
      (2L, 20L),
      (3L, 110L), (3L, 250L)
    ).toDF("u", "ts")
    val got = Funnel.retention(df, "ts", "u", periodUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(
      (0L, 0L, 2L, 1.0), (0L, 1L, 1L, 0.5), (0L, 3L, 1L, 0.5),
      (1L, 0L, 1L, 1.0), (1L, 1L, 1L, 1.0)))
  }

  test("retention: period arithmetic is exact at epoch-microsecond magnitudes") {
    // a ts exactly on a period boundary and one just below it, at
    // realistic 1.7e15 magnitudes — the subtract-mod form must not
    // floor off by one
    val p = 604800000000L
    val boundary = 2811L * p
    val df = Seq((1L, boundary), (1L, boundary - 1L), (1L, boundary + 1L)).toDF("u", "ts")
    val got = Funnel.retention(df, "ts", "u", p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2810L, 0L), (2810L, 1L)))
  }

  test("growthAccounting: new/retained/resurrected/churned hand-computed") {
    // u1: p1 p2 p4 (resurrects at p4); u2: p1 only (churns at p2); u3: p2 p3 p4
    val p = 10L
    def ts(per: Long) = per * p + 3
    val df = Seq(
      (1L, ts(1)), (1L, ts(1) + 1), (1L, ts(2)), (1L, ts(4)),
      (2L, ts(1)), (3L, ts(2)), (3L, ts(3)), (3L, ts(4))).toDF("u", "t")
    val rows = Funnel.growthAccounting(df, "t", "u", p).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) null else r.getDouble(6)))
      .sortBy(_._1)
    assert(rows(0) == ((1L, 2L, 2L, 0L, 0L, 0L, null)))       // p1: both new
    assert(rows(1) == ((2L, 2L, 1L, 1L, 0L, 1L, 0.5)))        // u2 churned
    assert(rows(2) == ((3L, 1L, 0L, 1L, 0L, 1L, 0.5)))        // u1 churned
    assert(rows(3) == ((4L, 2L, 0L, 1L, 1L, 0L, 0.0)))        // u1 resurrected
  }

  test("growthAccounting: a period gap attributes no churn to the far side") {
    val df = Seq((1L, 10L), (1L, 50L)).toDF("u", "t") // active p1 and p5 only
    val full = Funnel.growthAccounting(df, "t", "u", 10L)
      .orderBy("period").collect()
    assert(full.length == 2)
    assert(full(1).getLong(0) == 5L && full(1).getLong(4) == 1L) // resurrected
    assert(full(1).getLong(5) == 0L && full(1).isNullAt(6))      // no churn row
  }

  test("growthAccountingDense: empty periods carry the all-churn transition; total churn sums") {
    // active p1 (u1,u2) — p2 empty (ALL churn) — p3 (u1 resurrects) —
    // p4 empty — p5 (u2 resurrects)
    val df = Seq((1L, 10L), (2L, 15L), (1L, 30L), (2L, 50L)).toDF("u", "t")
    val rows = Funnel.growthAccountingDense(df, "t", "u", 10L)
      .orderBy("period").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) null else r.getDouble(6)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L)) // contiguous spine
    assert(rows(0) == ((1L, 2L, 2L, 0L, 0L, 0L, null)))
    assert(rows(1) == ((2L, 0L, 0L, 0L, 0L, 2L, 1.0)))  // all-churn row EXISTS
    assert(rows(2) == ((3L, 1L, 0L, 0L, 1L, 0L, null))) // pa=0 → rate null
    assert(rows(3) == ((4L, 0L, 0L, 0L, 0L, 1L, 1.0)))
    assert(rows(4) == ((5L, 1L, 0L, 0L, 1L, 0L, null)))
    // the sparse caveat, quantified: dense churn total is the truth
    assert(rows.map(_._6).sum == 3L)
    val sparseChurn = Funnel.growthAccounting(df, "t", "u", 10L)
      .collect().map(_.getLong(5)).sum
    assert(sparseChurn == 0L) // sparse reports none of it
  }

  test("stepTiming: first-from to first-at-or-after-to deltas, exact quantile picks") {
    // u1 converts in 10; u2's early purchase (t=5) doesn't count — its
    // post-signup one (t=30) does (delta 20); u3 never converts;
    // u4 has no signup and is outside n_from entirely
    val df = Seq(
      (1L, 10L, "signup"), (1L, 20L, "purchase"),
      (2L, 10L, "signup"), (2L, 5L, "purchase"), (2L, 30L, "purchase"),
      (3L, 10L, "signup"),
      (4L, 50L, "purchase")).toDF("u", "t", "s")
    val r = Funnel.stepTiming(df, "u", "t", "s", "signup", "purchase").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 10L) // p50
    assert(r.getLong(3) == 20L && r.getLong(4) == 20L)
  }

  test("stepTiming: nobody converts → NULL quantiles, counts intact") {
    val df = Seq((1L, 10L, "signup"), (2L, 20L, "signup")).toDF("u", "t", "s")
    val r = Funnel.stepTiming(df, "u", "t", "s", "signup", "purchase").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
  }

  test("activeUsers: rolling distinct WAU counts each user once; dead tail days drop") {
    // u1 days 1,2; u2 day 1; u3 day 3; 2-day window:
    // WAU(1)={u1,u2}, WAU(2)={u1,u2}, WAU(3)={u1,u3}; day 4 has no dau row
    val p = 10L
    val df = Seq(
      (1L, 13L), (1L, 14L), (1L, 23L), (2L, 15L), (3L, 33L)).toDF("u", "t")
    val rows = Funnel.activeUsers(df, "t", "u", p, windowDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (1L, 2L, 2L, 1.0), (2L, 1L, 2L, 0.5), (3L, 1L, 2L, 0.5)))
  }

  test("activeUsers: window of 1 makes wau = dau, stickiness 1") {
    val df = Seq((1L, 10L), (2L, 10L), (1L, 20L)).toDF("u", "t")
    val rows = Funnel.activeUsers(df, "t", "u", 10L, windowDays = 1).collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2) && r.getDouble(3) == 1.0))
  }
}
