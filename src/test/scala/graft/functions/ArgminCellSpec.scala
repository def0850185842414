package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native [[ArgminCell]] vs the boxed-Seq UDF it replaced: identical
  * assignments on randomized embeddings/centroids, including exact-tie
  * vectors (lowest cell index wins in both) and degenerate centroids. */
class ArgminCellSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)
  ))

  private def assignBoth(rows: Seq[Row], centroids: Array[Array[Double]]): (Seq[(Int, Any)], Seq[(Int, Any)]) = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.orderBy("id").collect().map(r => (r.getInt(0), r.get(1))).toSeq
    val native = canon(df.select(col("id"), ArgminCell.argminCell(col("embedding"), centroids).as("cell")))
    val viaUdf = canon(df.select(col("id"), graft.ops.Ivf.cellUdf(spark, centroids)(col("embedding")).as("cell")))
    (native, viaUdf)
  }

  test("native kernel == UDF on random embeddings and centroids") {
    val rnd = new scala.util.Random(99)
    val dim = 16
    val centroids = Array.fill(8, dim)(rnd.nextDouble() * 4 - 2)
    val rows = (0 until 200).map { i =>
      Row(i, Seq.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat))
    }
    val (native, viaUdf) = assignBoth(rows, centroids)
    assert(native == viaUdf)
  }

  test("exact ties break to the lowest cell index in both forms") {
    // two identical centroids: every vector ties between cell 0 and 1
    val centroids = Array(Array(1.0, 1.0), Array(1.0, 1.0), Array(9.0, 9.0))
    val rows = (0 until 10).map(i => Row(i, Seq(i.toFloat / 10, i.toFloat / 10)))
    val (native, viaUdf) = assignBoth(rows, centroids)
    assert(native == viaUdf)
    assert(native.forall(_._2 == 0))
  }

  test("NaN / infinite components assign identically in both forms") {
    // NaN distances never win the strict < update (NaN < best is false),
    // so a vector with any NaN component keeps the first finite-beating
    // cell — or cell 0 if every distance is NaN. Both forms share that
    // logic; this pins it against the float-math path change.
    val rnd = new scala.util.Random(7)
    val dim = 8
    val centroids = Array.fill(6, dim)(rnd.nextDouble() * 2 - 1)
    val specials = Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity, -0.0f, 0.0f)
    val rows = (0 until 120).map { i =>
      Row(i, Seq.tabulate(dim) { j =>
        if (rnd.nextInt(4) == 0) specials(rnd.nextInt(specials.length))
        else (rnd.nextDouble() * 2 - 1).toFloat
      })
    }
    val allNaN = Seq(Row(999, Seq.fill(dim)(Float.NaN)))
    val (native, viaUdf) = assignBoth(rows ++ allNaN, centroids)
    assert(native == viaUdf)
    assert(native.find(_._1 == 999).get._2 == 0) // all-NaN -> cell 0, both forms
  }

  test("null embeddings stay null; assignCells end-to-end unchanged") {
    val centroids = Array(Array(0.0, 0.0), Array(5.0, 5.0))
    val rows = Seq(Row(0, Seq(0.1f, 0.2f)), Row(1, null), Row(2, Seq(4.9f, 5.1f)))
    val (native, _) = assignBoth(rows.filter(_.get(1) != null), centroids)
    assert(native == Seq((0, 0), (2, 1)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = df.select(ArgminCell.argminCell(col("embedding"), centroids).as("cell"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(out.toSeq == Seq(0, null, 1))
  }

  test("equal centroid tables give semantically equal expressions") {
    // Seq-typed param => structural equality; independently-built but
    // value-equal Array[Array[Double]] inputs must canonicalize together
    // (reference-equality on an array param would defeat plan reuse)
    import org.apache.spark.sql.graftbridge.Bridge
    // shared child isolates the param under test: the centroid table,
    // built twice from independent (non-eq) arrays, must compare equal
    val child = Bridge.expression(col("embedding"))
    def mk() = Array(Array(1.0, 2.0), Array(3.0, 4.0)).map(_.toVector).toVector
    val a = ArgminCell(child, mk())
    val b = ArgminCell(child, mk())
    assert(a.semanticEquals(b))
    val c = ArgminCell(child, Vector(Vector(1.0, 2.5), Vector(3.0, 4.0)))
    assert(!a.semanticEquals(c))
  }
}
