package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[graft.ops.Warc]] / [[graft.functions.WarcRecords]]: length-driven
  * record parsing (the phantom-record adversarial case), malformation
  * sentinels, HTTP sub-parse, and the responses() projection. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(
      typ: String, uri: Option[String], payload: String,
      date: String = "2026-01-01T00:00:00Z", rid: String = "<urn:uuid:1>"): String = {
    val uriLine = uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("")
    s"WARC/1.0\r\nWARC-Type: $typ\r\n" + uriLine +
      s"WARC-Date: $date\r\nWARC-Record-ID: $rid\r\n" +
      s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n" +
      payload + "\r\n\r\n"
  }

  private def parse1(blob: String) =
    Warc.parseWarc(Seq(blob).toDF("w"), "w", carry = Seq.empty).collect()

  test("two records round-trip: fields, order, offsets") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>ok</html>"
    val blob = rec("warcinfo", None, "") + rec("response", Some("http://ex.com/p"), http)
    val rows = parse1(blob)
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[Long]("rec_idx") == 0L && r0.getAs[Long]("offset") == 0L)
    assert(r0.getAs[String]("warc_type") == "warcinfo")
    assert(r0.getAs[String]("target_uri") == null)
    assert(r0.getAs[Long]("content_length") == 0L && r0.getAs[String]("payload") == "")
    val r1 = rows(1)
    assert(r1.getAs[String]("warc_type") == "response")
    assert(r1.getAs[String]("target_uri") == "http://ex.com/p")
    assert(r1.getAs[String]("warc_date") == "2026-01-01T00:00:00Z")
    assert(r1.getAs[String]("record_id") == "<urn:uuid:1>")
    assert(r1.getAs[String]("payload") == http)
    assert(r1.getAs[Long]("offset") > 0L)
  }

  test("ADVERSARIAL: a payload containing the WARC magic yields NO phantom record") {
    val evil = "HTTP/1.1 200 OK\r\n\r\nabout WARC:\r\nWARC/1.0\r\nWARC-Type: fake\r\n" +
      "Content-Length: 0\r\n\r\nmore"
    val blob = rec("response", Some("http://ex.com/a"), evil) +
      rec("response", Some("http://ex.com/b"), "HTTP/1.1 404 NF\r\n\r\ngone")
    val rows = parse1(blob)
    assert(rows.length == 2, s"phantom record parsed: ${rows.toSeq}")
    assert(rows(0).getAs[String]("payload") == evil)
    assert(rows(1).getAs[String]("target_uri") == "http://ex.com/b")
  }

  test("truncated declared length → __truncated sentinel, prior records kept") {
    val good = rec("response", Some("http://ex.com/x"), "HTTP/1.1 200 OK\r\n\r\nbody")
    val blob = good + "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    val rows = parse1(blob)
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("warc_type") == "response")
    assert(rows(1).getAs[String]("warc_type") == "__truncated")
    assert(rows(1).getAs[Long]("content_length") == 999L)
    assert(rows(1).getAs[String]("payload") == "")
  }

  test("malformed cases → __malformed sentinel: bad magic / no colon / missing or bad Content-Length") {
    for (blob <- Seq(
        "GARBAGE",
        "WARC/1.0\r\nWARC-Type response\r\nContent-Length: 0\r\n\r\n",
        "WARC/1.0\r\nWARC-Type: response\r\n\r\n",
        "WARC/1.0\r\nContent-Length: 12x\r\n\r\n",
        // 19+ digits would overflow the Long accumulator and wrap to a
        // small positive slice (ADVICE r17): overflow IS malformation
        "WARC/1.0\r\nContent-Length: 9999999999999999999\r\n\r\npayload",
        "WARC/1.0\r\nContent-Length: 18446744073709551617\r\n\r\npayload")) {
      val rows = parse1(blob)
      assert(rows.length == 1, s"for <$blob>")
      assert(rows(0).getAs[String]("warc_type") == "__malformed", s"for <$blob>")
      assert(rows(0).getAs[Long]("content_length") == -1L)
    }
    assert(parse1("").isEmpty)
  }

  test("bare-LF line endings and case-insensitive header names tolerated; unknown headers skipped") {
    val blob = "WARC/1.0\nwarc-type: METADATA\nX-Custom: zzz\ncontent-length: 3\n\nabc\n\n"
    val rows = parse1(blob)
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("warc_type") == "METADATA")
    assert(rows(0).getAs[String]("payload") == "abc")
  }

  test("httpStatus/httpBody: status code, body keeps its own blank lines, non-HTTP → NULL") {
    val rows = Seq(
      "HTTP/1.1 200 OK\r\nH: v\r\n\r\npart1\r\n\r\npart2",
      "HTTP/1.1 noncode\r\n\r\nx",
      "not-http").toDF("p")
      .select(Warc.httpStatus(col("p")).as("s"), Warc.httpBody(col("p")).as("b"))
      .collect()
    assert(rows(0).getInt(0) == 200 && rows(0).getString(1) == "part1\r\n\r\npart2")
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "x")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("STREAMING: .warc.gz files tail-followed through binaryFile → gunzip → records (stateless lane)") {
    // the live-crawl shape: segment files land in a directory, the
    // stateless kernel chain runs per micro-batch with no state store
    import java.nio.file.Files
    def gzip(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    val dir = Files.createTempDirectory("warcstream").toFile
    try {
      Files.write(new java.io.File(dir, "seg0.warc.gz").toPath,
        gzip(rec("response", Some("http://ex.com/0"), "HTTP/1.1 200 OK\r\n\r\na")))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
      val stream = spark.readStream.schema(schema).format("binaryFile")
        .load(dir.getAbsolutePath)
        .select(explode(graft.functions.WarcRecords.warcRecords(
          graft.functions.GunzipAll.gunzipAll(col("content")))).as("r"))
        .select("r.warc_type", "r.target_uri")
      val q = stream.writeStream.format("memory").queryName("warc_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(spark.table("warc_stream").count() == 1)
        // a new segment file arrives: only its records append
        Files.write(new java.io.File(dir, "seg1.warc.gz").toPath,
          gzip(rec("response", Some("http://ex.com/1"), "HTTP/1.1 200 OK\r\n\r\nb")) ++
            gzip(rec("warcinfo", None, "")))
        q.processAllAvailable()
        val rows = spark.table("warc_stream").collect()
        assert(rows.length == 3)
        assert(rows.map(_.getString(0)).count(_ == "response") == 2)
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("FUZZ: parser is total — random garbage and mutated blobs never throw; sentinel invariants hold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
      Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get
    val valid = rec("response", Some("http://ex.com/p"), "HTTP/1.1 200 OK\r\n\r\nbody")
    val garbage: Gen[String] = Gen.oneOf(
      Gen.listOf(Gen.choose(0.toChar, 255.toChar)).map(_.mkString),
      // mutations of a valid blob: truncation, splice, header damage
      Gen.choose(0, valid.length).map(valid.take),
      Gen.choose(0, valid.length).map(i => valid.take(i) + "WARC/" + valid.drop(i)),
      Gen.const(valid.replace("Content-Length", "Content-Lies")),
      Gen.const(valid * 3),
      Gen.const("WARC/1.0\r\nContent-Length: 999999999999\r\n\r\n"))
    samples(garbage, 400, 99L).foreach { blob =>
      val arr = graft.functions.WarcRecords.parse(
        org.apache.spark.unsafe.types.UTF8String.fromString(blob))
      // invariants: at most one sentinel and it is LAST; every
      // non-sentinel's payload length equals its content_length;
      // offsets strictly increase
      val n = arr.numElements()
      var prevOff = -1L
      (0 until n).foreach { i =>
        val row = arr.getStruct(i, 7)
        val wt = if (row.isNullAt(1)) null else row.getUTF8String(1).toString
        val off = row.getLong(0)
        assert(off > prevOff, s"offsets must increase in <${blob.take(40)}>")
        prevOff = off
        if (wt == "__malformed" || wt == "__truncated") {
          assert(i == n - 1, "sentinel must be last")
          assert(row.getUTF8String(6).toString.isEmpty)
        } else {
          assert(row.getUTF8String(6).numBytes() == row.getLong(5),
            s"payload length must equal content_length in <${blob.take(40)}>")
        }
      }
    }
  }

  test("responses(): response records only, carry preserved, status+body split") {
    val blob = rec("warcinfo", None, "") +
      rec("response", Some("http://ex.com/1"), "HTTP/1.1 301 Moved\r\nLocation: x\r\n\r\n") +
      rec("request", Some("http://ex.com/1"), "GET /1 HTTP/1.1\r\n\r\n") +
      rec("response", Some("http://ex.com/2"), "HTTP/1.1 200 OK\r\n\r\n<html/>")
    val rows = Warc.responses(Seq((7L, blob)).toDF("id", "w"), "w", carry = Seq("id"))
      .orderBy("target_uri").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("id") == 7L))
    assert(rows(0).getAs[Int]("http_status") == 301 && rows(0).getAs[String]("body") == "")
    assert(rows(1).getAs[Int]("http_status") == 200 && rows(1).getAs[String]("body") == "<html/>")
  }
}
