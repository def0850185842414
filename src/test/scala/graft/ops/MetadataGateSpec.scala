package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** [[Metadata]] JSON parsing + [[Text.percentileGate]] semantics. */
class MetadataGateSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // ------------------------------------------------------------- Metadata

  private val propsRows = Seq(
    (1L, "click", """{"k": 10, "tag": "a"}"""),
    (2L, "click", """{"k": 20}"""),
    (3L, "view", """{"k": 7, "tag": "b"}"""),
    (4L, "view", """not json at all"""),
    (5L, "view", """{"tag": "no k field"}"""),
    (6L, "buy", null.asInstanceOf[String])
  ).toDF("event_id", "event_type", "props")

  test("parseTyped extracts typed fields; malformed/missing rows yield NULLs, never fail") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("tag", StringType)))
    val got = Metadata.parseTyped(propsRows, "props", schema)
      .select("event_id", "k", "tag")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), Option(r.getString(2)).getOrElse("")))
      .toSet
    assert(got == Set(
      (1L, 10L, "a"), (2L, 20L, ""), (3L, 7L, "b"),
      (4L, -1L, ""), (5L, -1L, "no k field"), (6L, -1L, "")))
  }

  test("fieldStats counts parsed vs total and divides the exact sum") {
    val got = Metadata
      .fieldStats(propsRows, "props", "k", Seq("event_type"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == Set(
      ("click", 2L, 2L, 30L, 15.0),
      ("view", 3L, 1L, 7L, 7.0),
      ("buy", 1L, 0L, 0L, -1.0))) // all-unparseable group: −1 sentinel mean
  }

  test("fieldStats handles nested paths") {
    val df = Seq((1L, "a", """{"meta": {"depth": 3}}"""), (2L, "a", """{"meta": {"depth": 5}}"""))
      .toDF("id", "g", "props")
    val got = Metadata.fieldStats(df, "props", "meta.depth", Seq("g")).collect()
    assert(got.length == 1 && got.head.getLong(3) == 8L)
  }

  // ------------------------------------------------------- percentileGate

  /** The textbook window spelling the histogram path must reproduce. */
  private def windowGate(scored: org.apache.spark.sql.DataFrame, minP: Double) = {
    val w = Window.partitionBy("lang").orderBy(col("score").asc)
    scored
      .withColumn("pr", percent_rank().over(w))
      .where(col("pr") >= minP)
      .select(col("doc_id"), col("lang"), col("score"), round(col("pr"), 6).as("pct"))
  }

  private val scored = Seq(
    // lang "en": scores 0.1, 0.2, 0.2, 0.4 — a tie straddling the median
    (1L, "en", 0.1), (2L, "en", 0.2), (3L, "en", 0.2), (4L, "en", 0.4),
    // lang "de": single row — percent_rank 0
    (5L, "de", 0.9),
    // lang "fr": two rows
    (6L, "fr", 0.3), (7L, "fr", 0.5)
  ).toDF("doc_id", "lang", "score")

  test("percentileGate matches the percent_rank window, ties and single-row groups included") {
    for (p <- Seq(0.0, 0.3, 0.5, 0.9)) {
      val got = Text.percentileGate(scored, "score", Seq("lang"), p)
        .select("doc_id", "lang", "score", "pct")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSet
      val want = windowGate(scored, p)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toSet
      assert(got == want, s"minPercentile=$p")
    }
  }

  test("percentileGate min-rank tie semantics: tied scores share the lower rank") {
    val got = Text.percentileGate(scored, "score", Seq("lang"), 0.0)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("pct"))).toMap
    // en: ranks over 4 rows (n−1 = 3): 0.1→0, 0.2→1/3 (both), 0.4→1
    assert(got(1L) == 0.0)
    assert(got(2L) == got(3L) && math.abs(got(2L) - 0.333333) < 1e-9)
    assert(got(4L) == 1.0)
    assert(got(5L) == 0.0) // single-row group
  }

  test("percentileGate never sorts the corpus: no per-key window over the input rows") {
    val df = Text.percentileGate(scored, "score", Seq("lang"), 0.5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only Window must run over the tiny histogram (post-aggregate),
    // so the corpus side of the final join has no Sort/Window above its
    // scan — assert the join is a broadcast hash join (histogram side
    // broadcast), not a sort-merge that would sort the corpus
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("percentileGate keeps everything at 0 and only the max at 1") {
    val all = Text.percentileGate(scored, "score", Seq("lang"), 0.0).count()
    assert(all == scored.count())
    val top = Text.percentileGate(scored, "score", Seq("lang"), 1.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // per-lang maxima: en 0.4 (doc 4), de 0.9 (doc 5, pr=0 < 1 — excluded
    // only if n>1; single-row groups rank 0 so doc 5 drops), fr 0.5 (doc 7)
    assert(top == Set(4L, 7L))
  }
}
