package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq("hello world", "a", "", "The 3 quick-foxes!").toDF("text")

  /** The HOF formulation the native expression replaced (char-based;
    * equal on ASCII input). */
  private val hof = expr(
    "aggregate(transform(split(text, ''), c -> ascii(c)), 0L, (acc, x) -> (acc * 31L + x) % 1000000007L)"
  )

  test("native hash matches the HOF formulation on ASCII text") {
    val rows = df.select(PolyHash.polyHash(col("text")).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("hand-computed values: empty string and single char") {
    val rows = df.select(col("text"), PolyHash.polyHash(col("text"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("") == 0L)
    assert(rows("a") == 'a'.toLong)
  }

  test("null text gives null") {
    val d = Seq(Option.empty[String]).toDF("text")
    assert(d.select(PolyHash.polyHash(col("text"))).first().isNullAt(0))
  }

  test("registered function is reachable from SQL") {
    PolyHash.register(spark)
    df.createOrReplaceTempView("ph_docs")
    val sql = spark.sql("SELECT poly_hash(text) AS h FROM ph_docs").collect().map(_.getLong(0))
    val api = df.select(PolyHash.polyHash(col("text"))).collect().map(_.getLong(0))
    assert(sql.toSeq == api.toSeq)
  }

  test("accumulator never leaves Long range (property over random ASCII)") {
    val gen = new scala.util.Random(7)
    val texts = (1 to 50).map(_ => gen.alphanumeric.take(gen.nextInt(2000)).mkString)
    val d = texts.toDF("text")
    val rows = d.select(PolyHash.polyHash(col("text")).as("n"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) >= 0L && r.getLong(0) < 1000000007L)
    }
  }
}
