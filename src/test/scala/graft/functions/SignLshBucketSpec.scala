package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class SignLshBucketSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val numPlanes = 6

  /** The HOF formulation the native expression replaced. */
  private def hofBucket(embedding: Column): Column = {
    val m = Similarity.planeMatrix(dim, numPlanes)
    val bits = (0 until numPlanes).map { p =>
      val plane = array(m(p).map(lit(_)): _*)
      val proj = aggregate(
        zip_with(embedding, plane, (x, c) => x.cast("double") * c),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(proj >= 0, shiftleft(lit(1), p)).otherwise(0)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  test("native bucket matches the HOF formulation on random vectors") {
    val gen = new scala.util.Random(11)
    val vecs = (1 to 300).map(_ => Array.fill(dim)(gen.nextFloat() * 2f - 1f))
    val df = vecs.toDF("embedding")
    val rows = df
      .select(
        Similarity.lshBucket(col("embedding"), dim, numPlanes).as("native"),
        hofBucket(col("embedding")).as("hof")
      )
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // sanity: the buckets actually spread
    assert(rows.map(_.getInt(0)).distinct.length > 1)
  }

  test("edge semantics match: null array, null element, length mismatch all give 0") {
    val df = Seq(
      (1L, Option(Array(Option(1.0f), Option(2.0f), None, Option(4.0f), Option(5.0f), Option(6.0f), Option(7.0f), Option(8.0f)))),
      (2L, None: Option[Array[Option[Float]]]),
      (3L, Option(Array(Option(1.0f), Option(2.0f)))) // wrong length
    ).toDF("id", "embedding")
    val rows = df
      .select(
        col("id"),
        Similarity.lshBucket(col("embedding"), dim, numPlanes).as("native"),
        hofBucket(col("embedding")).as("hof")
      )
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1) && r.getInt(1) == 0, r)
      assert(!r.isNullAt(2) && r.getInt(2) == 0, r)
    }
  }

  test("bucket is invariant to whole-stage codegen on/off") {
    val vecs = (1 to 50).map(i => Array.tabulate(dim)(j => (i * 31 + j).toFloat / 100f - 3f))
    val df = vecs.toDF("embedding")
    def run(): Seq[Int] =
      df.select(Similarity.lshBucket(col("embedding"), dim, numPlanes)).collect().map(_.getInt(0)).toSeq
    val on = run()
    val key = "spark.sql.codegen.wholeStage"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      assert(run() == on)
    } finally spark.conf.set(key, saved)
  }
}
