package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GunzipAll]]: multi-member .warc.gz-style round-trip, corrupt
  * input quarantine, output cap, and the composed
  * gunzip → warc_records lane. */
class GunzipSpec extends SparkSpec {
  import spark.implicits._

  private def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8"))
    g.close()
    bos.toByteArray
  }

  test("multi-member blob decompresses to the concatenated plaintext") {
    val blob = gzip("member-one ") ++ gzip("member-two ") ++ gzip("member-three")
    val r = Seq(blob).toDF("b").select(GunzipAll.gunzipAll(col("b"))).head()
    assert(r.getString(0) == "member-one member-two member-three")
  }

  test("corrupt bytes and truncated members → NULL, empty input → empty string") {
    val truncated = gzip("hello world, this should not survive").dropRight(5)
    val rows = Seq(
      Array[Byte](1, 2, 3, 4), truncated, Array.empty[Byte]).toDF("b")
      .select(GunzipAll.gunzipAll(col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getString(0) == "")
  }

  test("output cap: expansion past maxOutBytes → NULL (bomb quarantine)") {
    val bomb = gzip("x" * 100000) // ~100 KB plaintext, tiny gz
    val df = Seq(bomb).toDF("b")
    assert(df.select(GunzipAll.gunzipAll(col("b"), 1024)).head().isNullAt(0))
    assert(df.select(GunzipAll.gunzipAll(col("b"), 200000)).head().getString(0).length == 100000)
  }

  test("the .warc.gz lane composes: gunzip members → warc_records") {
    val rec1 = "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    val rec2 = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://ex.com/p\r\n" +
      "Content-Length: 4\r\n\r\nbody\r\n\r\n"
    // per-record gzip members, the CommonCrawl layout
    val blob = gzip(rec1) ++ gzip(rec2)
    val rows = Seq(blob).toDF("b")
      .select(explode(WarcRecords.warcRecords(GunzipAll.gunzipAll(col("b")))).as("r"))
      .select("r.warc_type", "r.target_uri", "r.payload")
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "warcinfo")
    assert(rows(1).getString(0) == "response")
    assert(rows(1).getString(1) == "http://ex.com/p")
    assert(rows(1).getString(2) == "body")
  }
}
