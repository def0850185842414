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

  test("SQL builder honors base/mod literals and rejects bad arities") {
    PolyHash.register(spark)
    df.createOrReplaceTempView("ph_arity_docs")
    // poly_hash(text, 37) must compute the base-37 hash, not silently
    // fall back to the default base
    val sql37 = spark.sql("SELECT poly_hash(text, 37) AS h FROM ph_arity_docs")
      .collect().map(_.getLong(0))
    val api37 = df.select(PolyHash.polyHash(col("text"), base = 37L))
      .collect().map(_.getLong(0))
    assert(sql37.toSeq == api37.toSeq)
    val sqlMod = spark.sql("SELECT poly_hash(text, 31, 97) AS h FROM ph_arity_docs")
      .collect().map(_.getLong(0))
    val apiMod = df.select(PolyHash.polyHash(col("text"), 31L, 97L))
      .collect().map(_.getLong(0))
    assert(sqlMod.toSeq == apiMod.toSeq)
    val e0 = intercept[Exception](spark.sql("SELECT poly_hash() FROM ph_arity_docs"))
    assert(e0.getMessage.contains("poly_hash expects 1 to 3 arguments"))
    val e4 = intercept[Exception](
      spark.sql("SELECT poly_hash(text, 1, 2, 3) FROM ph_arity_docs"))
    assert(e4.getMessage.contains("poly_hash expects 1 to 3 arguments"))
    val eNonLit = intercept[Exception](
      spark.sql("SELECT poly_hash(text, length(text)) FROM ph_arity_docs"))
    assert(eNonLit.getMessage.contains("must be an integer literal"))
  }
}
