package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Changelog]] — CDC maintenance: argmax-latest compaction with
  * tombstone-wins semantics, and type-2 SCD interval construction. */
class ChangelogSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def log =
    Seq(
      // key 1: insert, update, update — latest (ts=30) wins
      (1L, 10L, "I", "a"), (1L, 20L, "U", "b"), (1L, 30L, "U", "c"),
      // key 2: insert then delete — tombstone wins, key dropped
      (2L, 10L, "I", "x"), (2L, 40L, "D", "x"),
      // key 3: delete then REINSERT after — insert wins (order, not op, decides)
      (3L, 10L, "D", "-"), (3L, 20L, "I", "y"),
      // key 4: single insert
      (4L, 5L, "I", "z")
    ).toDF("k", "ts", "op", "v")

  test("compact: latest version wins, tombstone drops the key, reinsert revives it") {
    val got = Changelog.compact(log, Seq("k"), Seq("ts"), "op", Set("D"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3))))
      .toMap
    assert(got == Map(
      1L -> ((30L, "U", "c")),
      3L -> ((20L, "I", "y")),
      4L -> ((5L, "I", "z"))))
  }

  test("compact: ties on ts broken by the remaining struct fields, deterministically") {
    val tied = Seq((1L, 10L, "I", "a"), (1L, 10L, "U", "b")).toDF("k", "ts", "op", "v")
    val got = Changelog.compact(tied, Seq("k"), Seq("ts"), "op", Set("D")).collect()
    // struct-max on (ts, op, v): "U" > "I" bytewise
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1L, 10L, "U", "b")))
  }

  test("compact: one Exchange, partial aggregation before it") {
    val plan = Changelog.compact(log, Seq("k"), Seq("ts"), "op", Set("D"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    // partial agg must appear below the exchange (map-side combine)
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"), plan)
  }

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")

  test("compact / scd2: NULL in ordering columns fails loud") {
    val bad = Seq((1L, Some(10L), "I", "a"), (1L, None, "U", "b"))
      .toDF("k", "ts", "op", "v")
    val e1 = intercept[Throwable] {
      Changelog.compact(bad, Seq("k"), Seq("ts"), "op", Set("D")).collect()
    }
    assert(messageChain(e1).contains("Changelog: NULL"), messageChain(e1))
    val e2 = intercept[Throwable] {
      Changelog.scd2(bad, Seq("k"), "ts").collect()
    }
    assert(messageChain(e2).contains("Changelog: NULL"), messageChain(e2))
  }

  test("scd2: intervals chain per key, open current version, ties sequenced by tieCols") {
    val got = Changelog.scd2(log, Seq("k"), "ts", tieCols = Seq("v"))
      .select("k", "ts", "v", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))))
      .toMap
    assert(got((1L, 10L)) == ((10L, Some(20L), false)))
    assert(got((1L, 20L)) == ((20L, Some(30L), false)))
    assert(got((1L, 30L)) == ((30L, None, true)))
    assert(got((2L, 40L)) == ((40L, None, true)))   // a delete row still closes history
    assert(got((4L, 5L)) == ((5L, None, true)))
  }

  test("scd2: simultaneous changes get zero-width intervals in tieCol order") {
    val tied = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 20L, "c")).toDF("k", "ts", "v")
    val got = Changelog.scd2(tied, Seq("k"), "ts", tieCols = Seq("v"))
      .select("v", "valid_from", "valid_to").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got("a") == ((10L, Some(10L))))  // zero-width, superseded at the same instant
    assert(got("b") == ((10L, Some(20L))))
    assert(got("c") == ((20L, None)))
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe payload compare") {
    val old = Seq(
      (1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, Some(30.0), "c"), (4L, None, "d")
    ).toDF("k", "p", "s")
    val neu = Seq(
      (2L, Some(20.0), "b"),   // unchanged
      (3L, Some(31.0), "c"),   // changed (value)
      (4L, Some(40.0), "d"),   // changed (NULL -> value, null-safe)
      (5L, Some(50.0), "e")    // added
    ).toDF("k", "p", "s")      // key 1 removed
    val got = Changelog.snapshotDiff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
    val row5 = Changelog.snapshotDiff(old, neu, Seq("k"))
      .where(col("k") === 5L).head()
    assert(row5.isNullAt(1) && row5.isNullAt(2)) // old side absent
    intercept[IllegalArgumentException] {
      Changelog.snapshotDiff(old, neu.withColumnRenamed("p", "q"), Seq("k"))
    }
  }

  test("compact equals the row_number respelling on a shuffled changelog") {
    val big = spark.range(0, 2000)
      .select(
        (col("id") % 97).as("k"),
        (col("id") / 7).as("ts"),
        when(col("id") % 11 === 0, "D").otherwise("U").as("op"),
        concat(lit("v"), col("id")).as("v"))
      .repartition(13)
    val got = Changelog.compact(big, Seq("k"), Seq("ts", "v"), "op", Set("D"))
    val expected = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(col("ts").desc, col("v").desc)
      big.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("op") =!= "D")
        .drop("rn")
    }
    assert(got.select("k", "ts", "op", "v").except(expected.select("k", "ts", "op", "v")).isEmpty)
    assert(expected.select("k", "ts", "op", "v").except(got.select("k", "ts", "op", "v")).isEmpty)
  }
}
