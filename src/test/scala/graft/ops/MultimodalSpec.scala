package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")

  test("payload features: byte length, md5, stub raster dims, pooled features") {
    val out = Multimodal
      .extractFeatures(Multimodal.withPayload(docs, "text"), "doc_id", dim = 4)
      .orderBy("doc_id")
      .collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("byte_len") == 11L)
    assert(r1.getAs[String]("content_md5") == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(r1.getAs[Int]("width") == 3) // floor(sqrt(11))
    assert(r1.getAs[Int]("height") == 3) // 11 / 3
    val feats = r1.getSeq[Float](5)
    assert(feats.length == 4)
    // deterministic pooling: 'h'+'o'+' '+'l' at positions 0,4,8 → bucket 0
    val expected0 = Seq(0, 4, 8).map(i => ("hello world" (i)).toInt / 255.0f).sum
    assert(math.abs(feats(0) - expected0) < 1e-6)
    // tiny payload
    assert(out(1).getAs[Int]("width") == 1)
    assert(out(1).getAs[Int]("height") == 1)
  }

  test("extractFeatures takes the REAL decode path for image payloads: true dims + integer-exact pooled luma") {
    val (w, h) = (10, 6)
    val rgb = Array.tabulate(w * h)(i => ((i * 37) % 256 << 16) | ((i * 91) % 256 << 8) | (i * 13) % 256)
    val png = Multimodal.encodePng(w, h, rgb)
    val df = Seq((7L, png)).toDF("doc_id", "payload")
    val r = Multimodal.extractFeatures(df, "doc_id", dim = 4).head()
    assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
    val feats = r.getSeq[Float](5)
    // recompute: 1-D box buckets over row-major pixel index, floor-mean luma
    val expected = Multimodal.pooledLumaFeatures(w, h, rgb, 4).toSeq
    assert(feats == expected)
    // and the reference value is itself the hand arithmetic for bucket 0
    val b0 = (0 until w * h).filter(p => p * 4 / (w * h) == 0)
    assert(expected(0) == (b0.map(p => Multimodal.grayOf(rgb(p)).toLong).sum / b0.length).toFloat)
  }

  test("frame sampling splits the byte stream with stride") {
    val out = Multimodal
      .sampleFrames(Multimodal.withPayload(docs.where(col("doc_id") === 1), "text"), frameBytes = 2, stride = 2)
      .select("frame_idx", "frame")
      .orderBy("frame_idx")
      .collect()
    // 11 bytes → 5 whole frames (0..4), stride 2 → frames 0, 2, 4
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 2, 4))
    assert(new String(out(0).getAs[Array[Byte]](1)) == "he")
    assert(new String(out(1).getAs[Array[Byte]](1)) == "o ")
  }

  test("resize stage nearest-neighbor samples the stub raster") {
    val sixteen = Seq((1L, "abcdefghijklmnop")).toDF("doc_id", "text") // 4x4 raster
    val out = Multimodal
      .resize(Multimodal.withPayload(sixteen, "text"), outW = 2, outH = 2)
      .select("resized")
      .collect()
    val r = out(0).getAs[Array[Byte]](0)
    // 4x4 'abcd/efgh/ijkl/mnop' → rows 0,2 cols 0,2 → a, c, i, k
    assert(new String(r) == "acik")
    assert(r.length == 4)
  }

  test("PNG and BMP codecs round-trip pixels exactly") {
    val (w, h) = (9, 5)
    val rgb = Array.tabulate(w * h)(i => ((i * 37) % 256 << 16) | ((i * 91) % 256 << 8) | (i * 13) % 256)
    Seq(Multimodal.encodePng(w, h, rgb), Multimodal.encodeBmp(w, h, rgb)).foreach { bytes =>
      val Some((dw, dh, drgb)) = Multimodal.decodeImage(bytes)
      assert((dw, dh) == ((w, h)))
      assert(drgb.toSeq == rgb.toSeq)
    }
    // non-image bytes → None (the stub-fallback cue)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

  test("box-filter resize is the exact integer bucket mean") {
    // 4x2 → 2x1: buckets {(0,0),(1,0),(0,1),(1,1)} and {(2,*),(3,*)}
    val rgb = Array(
      0x010203, 0x050607, 0x090a0b, 0x0d0e0f,
      0x111213, 0x151617, 0x191a1b, 0x1d1e1f)
    val out = Multimodal.boxResizeRgb(4, 2, rgb, 2, 1)
    // channel means: ((1+5+17+21)/4, ...) = (11, 12, 13); ((9+13+25+29)/4, ...) = (19, 20, 21)
    assert(out.toSeq == Seq(0x0b0c0d, 0x131415))
  }

  test("resize stage takes the real path for decodable payloads") {
    import org.apache.spark.sql.functions.udf
    val (w, h) = (8, 6)
    val rgb = Array.tabulate(w * h)(i => (i * 31) % 256 << 16 | (i * 7) % 256)
    val png = Multimodal.encodePng(w, h, rgb)
    val toPayload = udf(() => png)
    val df = Seq(1L).toDF("doc_id").withColumn("payload", toPayload())
    val out = Multimodal.resize(df, outW = 4, outH = 3).select("resized").collect()
    val Some((rw, rh, rrgb)) = Multimodal.decodeImage(out(0).getAs[Array[Byte]](0))
    assert((rw, rh) == ((4, 3)))
    assert(rrgb.toSeq == Multimodal.boxResizeRgb(w, h, rgb, 4, 3).toSeq)
  }

  test("q_image_resize pixels match a local recompute of the fixture math") {
    val got = graft.SparkEntry.queries("q_image_resize")(spark, "unused")
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1), r.getInt(2)), (r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    assert(got.size == 40 * 8 * 6)
    // spot-check a handful of images against the independent pixel formula
    Seq(0L, 1L, 13L, 39L).foreach { id =>
      val (w, h) = (16 + (id % 7).toInt, 12 + (id % 5).toInt)
      val buckets = scala.collection.mutable.Map
        .empty[(Int, Int), (Long, Long, Long, Long)].withDefaultValue((0L, 0L, 0L, 0L))
      for (y <- 0 until h; x <- 0 until w) {
        val key = (x * 8 / w, y * 6 / h)
        val (sr, sg, sb, n) = buckets(key)
        buckets(key) = (
          sr + (id * 31 + x * 7 + y * 13) % 256,
          sg + (id * 17 + x * 3 + y * 11) % 256,
          sb + (id * 23 + x * 5 + y * 19) % 256,
          n + 1)
      }
      buckets.foreach { case ((ox, oy), (sr, sg, sb, n)) =>
        assert(got((id, ox, oy)) == (((sr / n).toInt, (sg / n).toInt, (sb / n).toInt)), s"img $id ($ox,$oy)")
      }
    }
  }

  test("WAV PCM16 encode -> JDK decode round-trips samples exactly") {
    val samples = Array.tabulate(1000)(i =>
      (((i * 7919) % 65536) - 32768).toShort)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    val (rate, back) = Multimodal.decodeWavPcm16(wav).get
    assert(rate == 8000)
    assert(back.toSeq == samples.toSeq)
    assert(Multimodal.decodeWavPcm16("not audio".getBytes).isEmpty)
  }

  test("audioFrames matches an independent driver-side recompute") {
    val df = Multimodal.audioFixture(spark, n = 12).repartition(5)
    val got = Multimodal
      .audioFrames(df, "aud_id", frameSize = 160)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getInt(2), r.getLong(3), r.getInt(4)))
      .toMap
    for (id <- 0L until 12L) {
      val len = 400 + (id % 5).toInt * 160
      val s = Array.tabulate(len)(i => (((id * 37 + i.toLong * 131) % 65536L) - 32768L).toInt)
      val nFrames = (len + 159) / 160
      for (f <- 0 until nFrames) {
        val fr = s.slice(f * 160, math.min((f + 1) * 160, len))
        val sumSq = fr.map(v => v.toLong * v).sum
        val zc = fr.sliding(2).count(p => p.length == 2 && (p(1) < 0) != (p(0) < 0))
        assert(got((id, f)) == ((fr.length, sumSq, zc)), s"aud $id frame $f")
      }
    }
  }

  test("vadSegments: silent/loud frame runs segment exactly, boundary frame is NOT voiced (strict >)") {
    // clip 0: frames of 4 samples - loud(1000) loud silent(0) loud -> segments [0,1] and [3,3]
    // threshold meanSq 100: frame sum_sq = 4*1000^2 > 400 voiced; silent 0 not
    val loud = Array.fill[Short](4)(1000)
    val silent = Array.fill[Short](4)(0)
    // clip 1: exactly threshold meanSq (10*10=100, sum_sq=400 = 100*4) -> strict > makes it SILENT
    val border = Array.fill[Short](4)(10)
    val clips = Seq(
      (0L, Multimodal.encodeWavPcm16(8000, loud ++ loud ++ silent ++ loud)),
      (1L, Multimodal.encodeWavPcm16(8000, border ++ loud))
    ).toDF("aud_id", "payload")
    val got = Multimodal.vadSegments(clips, "aud_id", frameSize = 4, thrMeanSq = 100L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSet
    assert(got == Set(
      (0L, 0, 0, 1, 2), // frames 0-1 voiced
      (0L, 1, 3, 3, 1), // frame 3 voiced after the silent gap
      (1L, 0, 1, 1, 1)  // border frame 0 excluded by strict >
    ))
  }

  test("dhash64: hand-computed bits on a 9x8 gradient raster; flat raster hashes to 0") {
    // 9x8 raster increasing left-to-right in gray: every adjacent pair
    // has right > left -> all 64 bits set
    val grad = Array.tabulate(9 * 8) { i => val x = i % 9; val g = x * 20; (g << 16) | (g << 8) | g }
    assert(Multimodal.dhash64(9, 8, grad) == -1L)
    val flat = Array.fill(9 * 8)(0x7f7f7f)
    assert(Multimodal.dhash64(9, 8, flat) == 0L)
  }

  test("dhash is invariant across PNG/BMP encodes of the same raster") {
    val rgb = Array.tabulate(18 * 16) { i => (i * 2654435761L & 0xffffff).toInt }
    val png = Multimodal.decodeImage(Multimodal.encodePng(18, 16, rgb)).get
    val bmp = Multimodal.decodeImage(Multimodal.encodeBmp(18, 16, rgb)).get
    assert(Multimodal.dhash64(png._1, png._2, png._3) == Multimodal.dhash64(bmp._1, bmp._2, bmp._3))
  }

  test("dhashNearDupPairs: planted single-pixel edits pair with their base at small hamming") {
    val fx = Multimodal.imageFixturePaired(spark, nBase = 8)
    val hashes = Multimodal.dhash(fx, "img_id")
    val pairs = Multimodal.dhashNearDupPairs(hashes, "img_id", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // each base i should pair with its perturbed copy i+8
    val planted = pairs.filter { case (a, b, _) => b == a + 8 }
    assert(planted.length == 8, s"got ${pairs.mkString(",")}")
    assert(planted.forall(_._3 <= 2))
  }

  test("window-gather patch variant matches the range-join values") {
    val samples = (0L to 20L).map(i => (i, i.toDouble * 2)).toDF("idx", "v")
    val peaks = Seq(5L, 12L).toDF("idx")
    val viaJoin = graft.spikes.Spikes
      .extractPatches(samples, peaks, "idx", "v", halfWidth = 3)
      .groupBy("peak_idx")
      .agg(sort_array(collect_list(struct(col("offset"), col("value")))).as("p"))
      .select(col("peak_idx"), expr("transform(p, x -> x.value)").as("patch"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val viaWindow = graft.spikes.Spikes
      .extractPatchesWindow(samples, peaks, "idx", "v", halfWidth = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(viaJoin == viaWindow)
  }

  test("phash64: constant raster sets ONLY the DC bit") {
    // all non-DC coefficients are 0 for a flat image (cos rows sum to
    // ~0 in the fixed-point table EXACTLY: the quantized table keeps
    // the symmetry cq(x,u) = -cq(31-x,u) for odd u etc. — checked via
    // the hash, not assumed)
    val rgb = Array.fill(18 * 16)((100 << 16) | (100 << 8) | 100)
    val h = Multimodal.phash64(18, 16, rgb)
    assert(h == 1L, h.toString) // only bit 0 (DC > mean-of-rest = 0)
  }

  test("phash64: one-pixel perturbation stays Hamming-close; different bases differ") {
    def fixtureRgb(base: Int, pert: Boolean): (Int, Int, Array[Int]) = {
      val (w, hh) = (18 + base % 5, 16 + base % 3)
      val rgb = Array.tabulate(w * hh) { i =>
        val x = i % w; val y = i / w
        var pr = (base * 31 + x * 7 + y * 13) % 256
        if (pert && x == 0 && y == 0) pr = (pr + 1) % 256
        ((pr << 16) | (((base * 17 + x * 3 + y * 11) % 256) << 8)
          | ((base * 23 + x * 5 + y * 19) % 256))
      }
      (w, hh, rgb)
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val pairs = (0 until 10).map { b =>
      val (w1, h1, r1) = fixtureRgb(b, pert = false)
      val (w2, h2, r2) = fixtureRgb(b, pert = true)
      ham(Multimodal.phash64(w1, h1, r1), Multimodal.phash64(w2, h2, r2))
    }
    assert(pairs.forall(_ <= 4), pairs.mkString(","))
    val others = (0 until 9).map { b =>
      val (w1, h1, r1) = fixtureRgb(b, pert = false)
      val (w2, h2, r2) = fixtureRgb(b + 1, pert = false)
      ham(Multimodal.phash64(w1, h1, r1), Multimodal.phash64(w2, h2, r2))
    }
    assert(others.count(_ > 8) >= 6, others.mkString(","))
  }

  test("phash over the paired fixture: decode path matches the kernel on raw pixels") {
    val hashes = Multimodal
      .phash(Multimodal.imageFixturePaired(spark, nBase = 5), "img_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1) << 32) | r.getLong(2)))
      .toMap
    assert(hashes.size == 10)
    // spot-check one: recompute from the fixture formula directly
    val (w, hh) = (18 + 2 % 5, 16 + 2 % 3)
    val rgb = Array.tabulate(w * hh) { i =>
      val x = i % w; val y = i / w
      (((2 * 31 + x * 7 + y * 13) % 256) << 16) |
        (((2 * 17 + x * 3 + y * 11) % 256) << 8) |
        ((2 * 23 + x * 5 + y * 19) % 256)
    }
    assert(hashes(2L) == Multimodal.phash64(w, hh, rgb))
  }
}
