package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  // explicit escapes throughout: source files must not depend on the
  // editor's choice of composed vs decomposed bytes
  private val decomposed = "Cafe\u0301"        // e + combining acute
  private val precomposed = "Caf\u00e9"        // é

  private def normAll(rows: Seq[String]): Seq[String] = {
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    df.select(col("id"), NfcNormalize.nfc(col("t")).as("n"))
      .orderBy("id").collect().map(r => Option(r.getString(1)).orNull).toSeq
  }

  test("decomposed sequences compose to NFC; ASCII and precomposed pass through") {
    val hangulDecomp = "\u1100\u1161"          // ᄀ + ᅡ → 가
    val got = normAll(Seq(decomposed, precomposed, "plain ascii", hangulDecomp, ""))
    assert(got(0) == precomposed)
    assert(got(1) == precomposed)
    assert(got(2) == "plain ascii")
    assert(got(3) == "\uac00")
    assert(got(4) == "")
  }

  test("kernel matches java.text.Normalizer on mixed content, and is idempotent") {
    val samples = Seq(
      "a\u0301e\u0302i\u0308",                 // all-decomposed accents
      "ffi \ufb03",                            // ligature (NFC keeps it; NFKC would expand)
      "ascii only 123",
      "\u00c5 vs A\u030a",                   // precomposed A-ring vs A + combining ring
      s"mixed $decomposed and $precomposed and \u212b") // U+212B ANGSTROM SIGN -> U+00C5 under NFC
    samples.foreach { in =>
      val want = java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC)
      val got = NfcKernel.nfc(UTF8String.fromString(in)).toString
      assert(got == want, s"input=$in")
      assert(NfcKernel.nfc(UTF8String.fromString(got)).toString == got, "not idempotent")
    }
  }

  test("ASCII fast path returns the input object — no allocation") {
    val in = UTF8String.fromString("pure ascii fast path")
    assert(NfcKernel.nfc(in) eq in)
  }

  test("NULL in → NULL out, and the expression stays inside WholeStageCodegen") {
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // LocalTableScan and leave no codegen stage to observe
    val df = spark.range(2).select(
      col("id"),
      NfcNormalize.nfc(when(col("id") === 0, lit(decomposed))).as("n"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(1) == precomposed)
    assert(rows(1).isNullAt(1))
    // a `*(n)` prefix marks the WholeStageCodegen span; the Project
    // computing nfc_normalize must carry it (no CodegenFallback break)
    val plan = df.queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString)
  }

  test("non-string input fails analysis") {
    val df = Seq(1L).toDF("x")
    val e = intercept[Exception](df.select(NfcNormalize.nfc(col("x"))).collect())
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
