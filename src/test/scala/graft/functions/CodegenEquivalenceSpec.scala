package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** ScalaCheck equivalence for the two round-6 codegen kernels: the
  * INTERPRETED `eval` path, the whole-stage-CODEGEN DataFrame path, and
  * the HOF formulation each expression replaced must agree on random
  * inputs including NULLs, empty/wrong-length arrays, ±0.0, infinities,
  * and NaN. Deterministic seeds; DataFrame comparisons batch all
  * generated cases into one Spark job. */
class CodegenEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private def samples[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(seed)).get

  // ------------------------------------------------------------- PolyHash

  /** ASCII (1..127) — the documents.text contract; the byte-based native
    * hash equals the char-based ascii() HOF only there. */
  private val asciiGen: Gen[String] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, Gen.choose(1.toChar, 127.toChar)).map(_.mkString))

  private def refPolyHash(s: String, base: Long, mod: Long): Long = {
    var acc = 0L
    s.getBytes("US-ASCII").foreach(b => acc = (acc * base + (b & 0xff)) % mod)
    acc
  }

  test("scalacheck: PolyHash interpreted eval == pure fold (random ASCII × base × mod)") {
    val gen = for {
      s <- asciiGen
      base <- Gen.oneOf(31L, 37L, 257L)
      mod <- Gen.oneOf(1000000007L, 97L, 65521L)
    } yield (s, base, mod)
    check(Prop.forAll(gen) { case (s, base, mod) =>
      PolyHash(Literal(UTF8String.fromString(s), StringType), base, mod)
        .eval(null).asInstanceOf[Long] == refPolyHash(s, base, mod)
    })
  }

  test("scalacheck-generated: PolyHash codegen == HOF == interpreted, incl. NULLs") {
    val texts: List[Option[String]] = samples(Gen.option(asciiGen), 400, 1234L)
    val hof = expr(
      "aggregate(transform(split(text, ''), c -> ascii(c)), 0L, (acc, x) -> (acc * 31L + x) % 1000000007L)")
    val rows = Seq(texts: _*).toDF("text")
      .select(col("text"), PolyHash.polyHash(col("text")).as("native"), hof.as("hof"))
      .collect()
    assert(rows.length == texts.length)
    rows.foreach { r =>
      if (r.isNullAt(0)) {
        assert(r.isNullAt(1) && r.isNullAt(2), s"NULL text must hash to NULL: $r")
      } else {
        val s = r.getString(0)
        assert(r.getLong(1) == r.getLong(2), s"codegen != HOF for ${s.take(40)}")
        val interp = PolyHash(Literal(UTF8String.fromString(s), StringType), 31L, 1000000007L)
          .eval(null).asInstanceOf[Long]
        assert(r.getLong(1) == interp, s"codegen != interpreted for ${s.take(40)}")
      }
    }
  }

  // -------------------------------------------------------- SignLshBucket

  private val dim = 8
  private val numPlanes = 6
  private lazy val planes: Seq[Seq[Double]] = Similarity.planeMatrix(dim, numPlanes)

  /** The HOF formulation the native expression replaced. */
  private def hofBucket(embedding: Column): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = array(planes(p).map(lit(_)): _*)
      val proj = aggregate(
        zip_with(embedding, plane, (x, c) => x.cast("double") * c),
        lit(0.0),
        (acc, v) => acc + v
      )
      when(proj >= 0, shiftleft(lit(1), p)).otherwise(0)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  private val floatGen: Gen[Float] = Gen.frequency(
    8 -> Gen.chooseNum(-10f, 10f),
    1 -> Gen.oneOf(0.0f, -0.0f, Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, Float.MinPositiveValue, Float.MaxValue)
  )

  /** Mostly well-formed dim-length vectors; sometimes NULL elements,
    * wrong lengths, empties, or a NULL array. */
  private val vecGen: Gen[Option[List[Option[Float]]]] = Gen.frequency(
    8 -> Gen.listOfN(dim, floatGen.map(Option(_))).map(Option(_)),
    1 -> Gen.listOfN(dim, Gen.option(floatGen)).map(Option(_)),
    1 -> Gen.chooseNum(0, dim + 2).flatMap(n => Gen.listOfN(n, floatGen.map(Option(_)))).map(Option(_)),
    1 -> Gen.const(None)
  )

  test("scalacheck-generated: SignLshBucket codegen == HOF == interpreted (NaN, ±0, ∞, NULLs, ragged)") {
    val vecs = samples(vecGen, 400, 99L)
    val df = vecs.map(v => Tuple1(v.map(_.toArray))).toDF("embedding")
    val rows = df
      .select(
        Similarity.lshBucket(col("embedding"), dim, numPlanes).as("native"),
        hofBucket(col("embedding")).as("hof")
      )
      .collect()
    assert(rows.length == vecs.length)
    rows.zip(vecs).foreach { case (r, v) =>
      assert(!r.isNullAt(0) && !r.isNullAt(1), s"bucket must never be NULL: $v")
      assert(r.getInt(0) == r.getInt(1), s"codegen != HOF for $v")
      val catalystVal: Any = v.map(_.map(_.map(f => f: java.lang.Float).orNull)).orNull
      val interp = SignLshBucket(
        Literal.create(catalystVal, ArrayType(FloatType, containsNull = true)),
        planes
      ).eval(null).asInstanceOf[Int]
      assert(r.getInt(0) == interp, s"codegen != interpreted for $v")
    }
    // the well-formed majority should spread across buckets
    assert(rows.map(_.getInt(0)).distinct.length > 2)
  }

  test("scalacheck: SignLshBucket interpreted eval == pure fold (well-formed vectors)") {
    val gen = Gen.listOfN(dim, floatGen)
    def ref(a: List[Float]): Int =
      planes.zipWithIndex.foldLeft(0) { case (b, (plane, p)) =>
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += a(j).toDouble * plane(j); j += 1 }
        if (!(acc < 0)) b | (1 << p) else b // SQL NaN ordering: NaN sets the bit
      }
    check(Prop.forAll(gen) { a =>
      SignLshBucket(
        Literal.create(a.map(f => f: java.lang.Float), ArrayType(FloatType, containsNull = true)),
        planes
      ).eval(null).asInstanceOf[Int] == ref(a)
    })
  }
}
