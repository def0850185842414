package graft.ops

import graft.SparkSpec

class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"), (3L, "b"), // duplicate collapses
    (4L, "c")
  ).toDF("basket", "item")

  test("pair counts with set semantics and canonical order") {
    val got = Itemsets.coOccurrence(rows, "basket", "item", minSupport = 1, maxBasketSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 3L, ("a", "c") -> 1L, ("b", "c") -> 1L))
  }

  test("minSupport filters; oversize baskets shed whole and are reported") {
    val withMega = rows.unionAll(
      (0 until 50).map(i => (99L, s"m$i")).toDF("basket", "item"))
    val got = Itemsets.coOccurrence(withMega, "basket", "item",
        minSupport = 2, maxBasketSize = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 3L)) // mega-basket pairs never appear
    val rep = Itemsets.oversizeReport(withMega, "basket", "item", 10).head()
    assert(rep.getLong(0) == 1L && rep.getLong(1) == 50L)
  }

  test("rules: confidences and lift from the same basket universe, hand-computed") {
    // baskets: {x,y} {x,y} {x,z} {y,z} → N=4, n_x=3 n_y=3 n_z=2;
    // (x,y): n=2, conf 2/3 both ways, lift 8/9
    val df = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "y"), (4L, "z")).toDF("basket", "item")
    val got = Itemsets.rules(df, "basket", "item", minSupport = 1, maxBasketSize = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(got(("x", "y")) == ((2L, 3L, 3L, 0.666667, 0.666667, 0.888889)), got.toString)
    assert(got(("x", "z")) == ((1L, 3L, 2L, 0.333333, 0.5, 0.666667)))
    assert(got(("y", "z")) == ((1L, 3L, 2L, 0.333333, 0.5, 0.666667)))
  }

  test("sorted-run kernel == collect_set lane on random baskets (A/B, both ops)") {
    // a DOUBLE basket key routes to the collect_set fallback lane
    // (sort-order/equality divergence class), so casting the basket
    // A/Bs the two physical lanes over the same logical input; the
    // output columns carry no basket, so results must match exactly.
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val data = (1 to 2000).map(_ => (rnd.nextInt(300).toLong, s"i${rnd.nextInt(40)}"))
    val df = data.toDF("basket", "item")
    val dfFallback = df.select(col("basket").cast("double").as("basket"), col("item"))
    def canon(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // cap 5 exercises both kept and shed baskets (mean distinct ~6)
    val k1 = canon(Itemsets.coOccurrence(df, "basket", "item", 2, 5))
    val f1 = canon(Itemsets.coOccurrence(dfFallback, "basket", "item", 2, 5))
    assert(k1 == f1 && k1.nonEmpty)
    val k2 = canon(Itemsets.rules(df, "basket", "item", 2, 5))
    val f2 = canon(Itemsets.rules(dfFallback, "basket", "item", 2, 5))
    assert(k2 == f2 && k2.nonEmpty)
  }

  test("kernel: basket exactly at the cap is kept, cap+1 shed, duplicates don't count") {
    val atCap = (0 until 3).map(i => (1L, s"c$i")) ++ Seq((1L, "c0"), (1L, "c1")) ++ // 3 distinct + dups
      (0 until 4).map(i => (2L, s"d$i")) // 4 distinct = over cap 3
    val df = atCap.toDF("basket", "item")
    val got = Itemsets.coOccurrence(df, "basket", "item", 1, 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("c0", "c1"), ("c0", "c2"), ("c1", "c2")))
  }

  test("rules: supports exclude baskets outside the [2, max] universe") {
    // a singleton basket with x must NOT inflate n_x
    val df = Seq(
      (1L, "x"), (1L, "y"), (2L, "x")).toDF("basket", "item")
    val r = Itemsets.rules(df, "basket", "item", minSupport = 1, maxBasketSize = 10).head()
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L) // n_x = n_y = 1
    assert(r.getDouble(7) == 1.0) // lift = 1·1/(1·1)
  }
}
