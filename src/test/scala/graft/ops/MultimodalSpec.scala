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
}
