package graft.dsp

import graft.SparkSpec
import graft.functions.FftPowerBins
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("FFT power bins match the naive O(n^2) DFT for random windows of every size") {
    for (n <- Seq(2, 4, 8, 16, 64); seed <- 1 to 3) {
      val x = Array.fill(n)(rng(seed * 100 + n).nextDouble() * 200 - 100)
      val re = x.clone(); val im = new Array[Double](n)
      FftPowerBins.fftInPlace(re, im)
      val fft = (0 to n / 2).map(k => re(k) * re(k) + im(k) * im(k))
      val dft = FftPowerBins.dftPowerBins(x)
      fft.zip(dft).zipWithIndex.foreach { case ((a, b), k) =>
        assert(math.abs(a - b) <= 1e-9 * (1.0 + math.abs(b)), s"n=$n k=$k fft=$a dft=$b")
      }
    }
  }

  test("a pure sinusoid at bin frequency concentrates all AC power in that bin") {
    val n = 32
    val k0 = 5
    val x = Array.tabulate(n)(j => math.cos(2 * math.Pi * k0 * j / n))
    val re = x.clone(); val im = new Array[Double](n)
    FftPowerBins.fftInPlace(re, im)
    val p = (0 to n / 2).map(k => re(k) * re(k) + im(k) * im(k))
    // |X_k0|² = (n/2)² for a unit cosine; every other bin ~0
    assert(math.abs(p(k0) - math.pow(n / 2.0, 2)) < 1e-9, p(k0).toString)
    p.zipWithIndex.filter(_._2 != k0).foreach { case (v, k) =>
      assert(v < 1e-18, s"bin $k leaked $v")
    }
  }

  test("Parseval: sum of two-sided powers equals n * time-domain energy") {
    val n = 16
    val x = Array.fill(n)(rng(7).nextDouble() * 10 - 5)
    val re = x.clone(); val im = new Array[Double](n)
    FftPowerBins.fftInPlace(re, im)
    val spec = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum
    val time = x.map(v => v * v).sum * n
    assert(math.abs(spec - time) < 1e-8 * time)
  }

  test("expression: null element / non-power-of-two / empty yield NULL") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)), // ok, n=4
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0)),      // n=3 → null
      (3L, Seq[java.lang.Double](1.0, null, 3.0, 4.0)), // null elem → null
      (4L, Seq.empty[java.lang.Double])                // empty → null
    ).toDF("id", "arr")
      .select(col("id"), FftPowerBins.powerBins(col("arr").cast("array<double>")).as("p"))
      .orderBy("id").collect()
    assert(!df(0).isNullAt(1) && df(0).getSeq[Double](1).length == 3)
    assert(df(1).isNullAt(1) && df(2).isNullAt(1) && df(3).isNullAt(1))
  }

  test("hopped windows: hop == size equals the non-overlapping form; 50% overlap doubles coverage") {
    val rows = (0 until 32).map(i => ("a", i.toLong, ((i * 7) % 11).toDouble))
    val df = rows.toDF("k", "ts", "value")
    def collect(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(r.fieldIndex("win")), r.getInt(r.fieldIndex("bin")),
        r.getDouble(r.fieldIndex("log_power")))).toSet
    val plain = collect(Spectral.windowPowerSpectra(df, Seq("k"), Seq(col("ts").asc), "value", 8))
    val hopFull = collect(Spectral.windowPowerSpectraHopped(df, Seq("k"), Seq(col("ts").asc), "value", 8, 8))
    assert(hopFull == plain)
    val hopped = Spectral.windowPowerSpectraHopped(df, Seq("k"), Seq(col("ts").asc), "value", 8, 4)
    // 32 samples, size 8, hop 4 → starts 0,4,...,24 = 7 complete windows
    assert(hopped.select("win").distinct().count() == 7L)
    // window w's spectrum equals the FFT of its slice, computed directly
    val w3 = hopped.where(col("win") === 3).orderBy("bin").collect()
      .map(r => r.getDouble(r.fieldIndex("log_power")))
    val slice = rows.slice(12, 20).map(_._3).toArray
    val re = slice.clone(); val im = new Array[Double](8)
    FftPowerBins.fftInPlace(re, im)
    val want = (0 to 4).map(k => math.rint(math.log10(re(k) * re(k) + im(k) * im(k) + 1) * 1e4) / 1e4)
    assert(w3.toSeq == want)
  }

  test("windowBandPower sums raw bin powers per band before log-compression") {
    val rows = (0 until 8).map(i => ("a", i.toLong, (i % 3).toDouble))
    val df = rows.toDF("k", "ts", "value")
    val bins = Spectral.windowPowerSpectra(df, Seq("k"), Seq(col("ts").asc), "value", 8)
      .orderBy("bin").collect()
      .map(r => math.pow(10, r.getDouble(r.fieldIndex("log_power"))) - 1.0)
    val bands = Spectral.windowBandPower(df, Seq("k"), Seq(col("ts").asc), "value", 8,
      Seq(("low", 0, 1), ("high", 2, 4)))
      .collect().map(r => r.getString(r.fieldIndex("band")) -> r.getDouble(r.fieldIndex("log_power"))).toMap
    // reconstructed raw sums agree to rounding error with the band rows
    def logc(p: Double) = math.rint(math.log10(p + 1) * 1e4) / 1e4
    assert(math.abs(bands("low") - logc(bins(0) + bins(1))) < 2e-4, bands.toString)
    assert(math.abs(bands("high") - logc(bins(2) + bins(3) + bins(4))) < 2e-4)
  }

  test("windowPowerSpectra drops partial tail windows and keys windows independently") {
    // key "a": 19 samples → 2 full windows of 8, tail of 3 dropped;
    // key "b": 8 samples → 1 window
    val rows = (0 until 19).map(i => ("a", i.toLong, (i % 5).toDouble)) ++
      (0 until 8).map(i => ("b", i.toLong, 1.0))
    val df = rows.toDF("k", "ts", "value")
    val out = Spectral.windowPowerSpectra(df, Seq("k"), Seq(col("ts").asc), "value", 8)
    val byKey = out.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5 bins per window (8/2 + 1)
    assert(byKey == Map("a" -> 10L, "b" -> 5L))
    // constant window: all power in DC → log10(64+1) at bin 0, 0 elsewhere
    val b = out.where(col("k") === "b").orderBy("bin")
      .collect().map(r => (r.getInt(r.fieldIndex("bin")), r.getDouble(r.fieldIndex("log_power"))))
    assert(b.head == ((0, math.rint(math.log10(65.0) * 1e4) / 1e4)))
    assert(b.tail.forall(_._2 == 0.0), b.mkString(","))
  }

  test("FftComplexBins: re^2 + im^2 reproduces FftPowerBins bit-for-bit") {
    for (n <- Seq(2, 4, 8, 16); seed <- 1 to 3) {
      val x = Array.fill(n)(rng(seed * 300 + n).nextDouble() * 200 - 100)
      val df = Seq(Tuple1(x.toSeq)).toDF("w")
      val c = df.select(
        graft.functions.FftComplexBins.complexBins(col("w")).as("c"),
        FftPowerBins.powerBins(col("w")).as("p")).head()
      val cx = c.getSeq[Double](0)
      val p = c.getSeq[Double](1)
      assert(cx.length == 2 * (n / 2 + 1))
      (0 to n / 2).foreach { k =>
        // identical float path (shared kernel), so exact equality
        assert(cx(2 * k) * cx(2 * k) + cx(2 * k + 1) * cx(2 * k + 1) == p(k))
      }
    }
  }

  test("coherence: identical channels cohere at exactly 1 on every live bin") {
    // interleave each sample with itself: x == y per window
    val vals = Seq(3.5, -1.25, 8.0, 0.5, 2.0, -4.75, 6.25, 1.0,
      -2.5, 5.0, 0.25, 7.75, -3.0, 4.5, 1.5, -0.75)
    val rows = vals.zipWithIndex.flatMap { case (v, i) =>
      Seq((1L, 2L * i, v), (1L, 2L * i + 1, v))
    }
    val df = rows.toDF("k", "ts", "value")
    val got = Spectral.coherence(df, Seq("k"), Seq(col("ts").asc), "value", 8)
      .collect()
      .map(r => r.getInt(1) -> (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got.keySet == Set(0, 1, 2, 3, 4))
    got.values.foreach { case (nw, coh) =>
      assert(nw == 2L)
      assert(coh.forall(_ == 1.0), got.toString)
    }
  }

  test("coherence: window-size-2 hand computation") {
    // one window per channel: x = (1, 2), y = (3, 5)
    // X = (3, -1), Y = (8, -2); single-window coherence is 1 by
    // construction — use TWO windows with different spectra so the
    // cross term actually averages: second window x = (2, 2), y = (1, 0)
    val xs = Seq(1.0, 2.0, 2.0, 2.0)
    val ys = Seq(3.0, 5.0, 1.0, 0.0)
    val rows = xs.zip(ys).zipWithIndex.flatMap { case ((x, y), i) =>
      Seq((1L, 2L * i, x), (1L, 2L * i + 1, y))
    }
    val df = rows.toDF("k", "ts", "value")
    val got = Spectral.coherence(df, Seq("k"), Seq(col("ts").asc), "value", 2)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    // bin 0: X = (3, 4), Y = (8, 1): cre = 24 + 4 = 28, cim = 0
    //   sxx = 9 + 16 = 25, syy = 64 + 1 = 65 -> 784 / 1625
    val want0 = math.rint(784.0 / 1625.0 * 1e6) / 1e6
    // bin 1: X bins (-1, 0), Y bins (-2, 1): cre = 2, sxx = 1, syy = 5 -> 4/5
    assert(got(0) == want0)
    assert(got(1) == 0.8)
  }

  test("coherence: dead channel yields NULL, partial window pair drops") {
    // 8 x-samples of zeros interleaved with a live y; window 4 -> 2
    // windows; plus a 3-sample tail that must drop
    val rows = (0 until 19).map { i =>
      (1L, i.toLong, if (i % 2 == 0) 0.0 else (i % 7).toDouble)
    }
    val df = rows.toDF("k", "ts", "value")
    val got = Spectral.coherence(df, Seq("k"), Seq(col("ts").asc), "value", 4)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(_.isNullAt(3)), got.mkString(","))
  }
}
