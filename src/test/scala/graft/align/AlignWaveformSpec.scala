package graft.align

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Native [[graft.functions.AlignWaveform]] vs the external-Row UDF
  * formulation it replaced: both call the same kernel, so this pins the
  * Catalyst plumbing (ArrayData in/out, null handling, nested array
  * shapes) bit-for-bit across randomized waveforms and both kinds. */
class AlignWaveformSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("waveform",
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false),
      nullable = true)
  ))

  private def randomWaveforms(seed: Int, n: Int): Seq[Row] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      // 3..16 samples, 1..6 channels; adversarial values incl. negatives,
      // plateaus (duplicate maxima), and edge peaks
      val s = 3 + rnd.nextInt(14)
      val c = 1 + rnd.nextInt(6)
      val wf = Seq.tabulate(s, c) { (si, ci) =>
        rnd.nextInt(4) match {
          case 0 => 0.0
          case 1 => -rnd.nextDouble() * 100
          case _ => rnd.nextDouble() * 100
        }
      }
      Row(i, wf)
    }
  }

  private def collectBoth(rows: Seq[Row], sBefore: Int, sAfter: Int, pad: Boolean, kind: String) = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    def canon(out: org.apache.spark.sql.DataFrame) = out
      .orderBy("id")
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) null
        else r.getSeq[scala.collection.Seq[Double]](1).map(_.toList).toList))
      .toList
    val native = canon(Align.alignColumn(df, "waveform", sBefore, sAfter, pad, kind))
    val viaUdf = canon(Align.alignColumnUdf(df, "waveform", sBefore, sAfter, pad, kind))
    (native, viaUdf)
  }

  test("native kernel == UDF on random waveforms, cubic, pad variants") {
    // cubic mirrors out-of-range resample points, so fully adversarial
    // (edge-peak) waveforms are fair game
    for (pad <- Seq(false, true)) {
      val (native, viaUdf) = collectBoth(randomWaveforms(42 + (if (pad) 1 else 0), 40), 2, 2, pad, "cubic")
      assert(native == viaUdf, s"pad=$pad")
    }
  }

  test("native kernel == UDF on interior-peak waveforms, linear") {
    // linear keeps the reference's bounds_error=True: the resample grid
    // must stay inside [0, n-1], so give every waveform a dominant
    // interior peak (vertex within ±0.5 of it)
    val rnd = new scala.util.Random(11)
    val rows = (0 until 30).map { i =>
      val s = 8 + rnd.nextInt(8)
      val c = 1 + rnd.nextInt(4)
      val center = 3 + rnd.nextInt(s - 6)
      val wf = Seq.tabulate(s, c) { (si, ci) =>
        100.0 * math.exp(-math.pow(si - center - (ci * 0.07), 2) / 3.0) + rnd.nextDouble()
      }
      Row(i, wf)
    }
    val (native, viaUdf) = collectBoth(rows, 2, 2, pad = false, kind = "linear")
    assert(native == viaUdf)
  }

  test("null waveform rows stay null (the UDF form NPE'd here; the kernel is null-in null-out)") {
    val rows = randomWaveforms(7, 10) :+ Row(99, null)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val native = Align.alignColumn(df, "waveform", 2, 2, pad = false, kind = "cubic")
      .orderBy("id").collect()
    assert(native.last.isNullAt(1))
    assert(native.init.forall(!_.isNullAt(1)))
  }

  test("defaults (sBefore/sAfter = -1: peak-split window) agree with the UDF") {
    val (native, viaUdf) = collectBoth(randomWaveforms(7, 10), -1, -1, pad = false, kind = "cubic")
    assert(native == viaUdf)
  }

  test("q_align-shaped input (6 samples, 1 channel) matches the shipped query path") {
    val rows = randomWaveforms(13, 25).map { r =>
      val wf = r.getSeq[scala.collection.Seq[Double]](1)
      Row(r.getInt(0), Seq.tabulate(6)(i => Seq(wf(i % wf.size).head)))
    }
    val (native, viaUdf) = collectBoth(rows, 2, 2, pad = false, kind = "cubic")
    assert(native == viaUdf)
  }
}
