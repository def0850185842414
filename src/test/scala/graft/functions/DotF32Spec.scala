package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotF32Spec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.5f, -0.5f), Array(2.0f, 2.0f))
  ).toDF("a", "b")

  test("native dot matches HOF formulation bit-for-bit") {
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )
    val rows = df.select(DotF32.dot(col("a"), col("b")).as("native"), hof.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0)
  }

  test("registered function is reachable from SQL") {
    DotF32.register(spark)
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT dot_f32(a, b) AS d FROM vecs ORDER BY d").collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.0, 32.0))
  }

  test("null inputs give null, mismatched lengths use the common prefix") {
    val d2 = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]])
    ).toDF("a", "b")
    assert(d2.select(DotF32.dot(col("a"), col("b"))).first().isNullAt(0))
    val d3 = Seq((Array(1.0f, 2.0f, 9.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(d3.select(DotF32.dot(col("a"), col("b"))).first().getDouble(0) == 11.0)
  }

  test("codegen path actually executes (no fallback) on a wide pipeline") {
    // force whole-stage codegen usage through a filter + projection chain
    val big = spark.range(100).select(
      col("id"),
      transform(sequence(lit(0), lit(63)), i => (i + col("id")).cast("float")).as("a"),
      transform(sequence(lit(0), lit(63)), i => lit(1.0f)).as("b")
    )
    val out = big.select(DotF32.dot(col("a"), col("b")).as("d"))
      .where(col("d") > 0).count()
    assert(out == 100)
  }

  test("SQL builder rejects wrong arities with a named error") {
    DotF32.register(spark)
    Seq((Array(1.0f), Array(2.0f))).toDF("a", "b").createOrReplaceTempView("dot_arity")
    val e1 = intercept[Exception](spark.sql("SELECT dot_f32(a) FROM dot_arity"))
    assert(e1.getMessage.contains("dot_f32 expects exactly 2 arguments"))
    val e3 = intercept[Exception](spark.sql("SELECT dot_f32(a, b, a) FROM dot_arity"))
    assert(e3.getMessage.contains("dot_f32 expects exactly 2 arguments"))
  }
}
