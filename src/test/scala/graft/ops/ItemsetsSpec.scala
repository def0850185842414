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
}
