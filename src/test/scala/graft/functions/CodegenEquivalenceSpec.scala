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

  // ------------------------------------------------------------- PqAdc

  private val doubleGen: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-100.0, 100.0),
    1 -> Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue))

  /** Mirror of PqAdc.nullSafeEval: the pure-fold truth. */
  private def refAdc(codes: Option[Array[Byte]], lut: Option[List[Option[Double]]]): Option[Double] =
    (codes, lut) match {
      case (Some(cs), Some(l)) if cs.nonEmpty && l.length % cs.length == 0 =>
        val ksub = l.length / cs.length
        var acc = 0.0
        var s = 0
        while (s < cs.length) {
          val c = cs(s) & 0xff
          if (c >= ksub) return None
          l(s * ksub + c) match {
            case Some(v) => acc += v
            case None => return None
          }
          s += 1
        }
        Some(acc)
      case _ => None
    }

  test("scalacheck-generated: PqAdc codegen == interpreted == pure fold (NULLs, ragged LUTs, out-of-range codes)") {
    val caseGen: Gen[(Option[Array[Byte]], Option[List[Option[Double]]])] = for {
      m <- Gen.chooseNum(1, 3)
      ksub <- Gen.chooseNum(1, 4)
      codes <- Gen.frequency(
        6 -> Gen.listOfN(m, Gen.chooseNum(0, ksub - 1)).map(l => Option(l.map(_.toByte).toArray)),
        2 -> Gen.listOfN(m, Gen.chooseNum(0, 255)).map(l => Option(l.map(_.toByte).toArray)),
        1 -> Gen.const(Option(Array.empty[Byte])),
        1 -> Gen.const(Option.empty[Array[Byte]]))
      lutLen <- Gen.frequency(
        7 -> Gen.const(m * ksub),
        1 -> Gen.const(m * ksub + 1),
        1 -> Gen.const(math.max(0, m * ksub - 1)),
        1 -> Gen.const(0))
      lut <- Gen.frequency(
        8 -> Gen.listOfN(lutLen, doubleGen.map(Option(_))).map(Option(_)),
        1 -> Gen.listOfN(lutLen, Gen.option(doubleGen)).map(Option(_)),
        1 -> Gen.const(Option.empty[List[Option[Double]]]))
    } yield (codes, lut)

    val cases = samples(caseGen, 500, 777L)
    val df = cases.map { case (c, l) => (c.orNull, l.map(_.map(_.map(d => d: java.lang.Double).orNull)).orNull) }
      .toDF("code", "lut")
    val rows = df.select(PqAdc.pqAdc(col("code"), col("lut")).as("native")).collect()
    assert(rows.length == cases.length)
    rows.zip(cases).foreach { case (r, (c, l)) =>
      val expected = refAdc(c, l)
      val interp = PqAdc(
        Literal.create(c.orNull, BinaryType),
        Literal.create(
          l.map(_.map(_.map(d => d: java.lang.Double).orNull)).orNull,
          ArrayType(DoubleType, containsNull = true))
      ).eval(null).asInstanceOf[java.lang.Double]
      expected match {
        case None =>
          assert(r.isNullAt(0), s"codegen should be NULL for codes=${c.map(_.toSeq)} lut=$l")
          assert(interp == null, s"interpreted should be NULL for codes=${c.map(_.toSeq)} lut=$l")
        case Some(v) =>
          assert(!r.isNullAt(0), s"codegen unexpectedly NULL for codes=${c.map(_.toSeq)} lut=$l")
          val g = r.getDouble(0)
          // NaN == NaN for this comparison; bit-identical otherwise
          assert(java.lang.Double.compare(g, v) == 0, s"codegen $g != ref $v")
          assert(java.lang.Double.compare(interp.doubleValue(), v) == 0, s"interp $interp != ref $v")
      }
    }
    // the well-formed majority should produce real sums
    assert(rows.count(r => !r.isNullAt(0)) > cases.length / 3)
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

  // ------------------------------------------------------------ Md5Top60

  /** Arbitrary unicode incl. empty — the item hash sees stringified
    * decimals/ints/dates but must equal the SQL chain on anything. */
  private val anyStringGen: Gen[String] =
    Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.choose(1.toChar, 127.toChar),
        2 -> Gen.choose(' ', '퟿'))).map(_.mkString))

  test("scalacheck: Md5Top60 interpreted eval == top-60-bits of MD5 digest") {
    check(Prop.forAll(anyStringGen) { s =>
      val bytes = s.getBytes("UTF-8")
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = d.map(b => f"$b%02x").mkString.take(15)
      val ref = java.lang.Long.parseLong(hex, 16)
      Md5Top60(Literal(UTF8String.fromString(s), StringType))
        .eval(null).asInstanceOf[Long] == ref
    })
  }

  test("scalacheck-generated: Md5Top60 codegen == conv(substring(md5(x),1,15),16,10), incl. NULLs") {
    val texts: List[Option[String]] = samples(Gen.option(anyStringGen), 400, 5150L)
    val sqlChain = conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10).cast("long")
    val rows = Seq(texts: _*).toDF("text")
      .select(col("text"), Md5Top60.md5Top60(col("text")).as("native"), sqlChain.as("chain"))
      .collect()
    assert(rows.length == texts.length)
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2), s"NULL must hash to NULL: $r")
      else {
        assert(r.getLong(1) == r.getLong(2),
          s"native ${r.getLong(1)} != sql chain ${r.getLong(2)} for ${r.getString(0).take(40)}")
        assert(r.getLong(1) >= 0L, "60-bit hash must be non-negative")
      }
    }
  }
}
