package graft.io

import java.nio.file.Files

import graft.SparkSpec
import graft.io.warc.WarcGzFixture
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.io.warc.WarcGzDataSourceV2]] — the record-granular `.warc.gz`
  * source (r17 verdict #1): scalar-lane parity, byte-range splits with
  * boundary resynchronization, per-member quarantine (`__corrupt_gz` /
  * `__oversize`) with recovery, beyond-the-scalar-cap segments, the
  * stored-block fake-magic adversarial shape, and column pruning. */
class WarcGzSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) = Files.createTempDirectory(prefix).toFile

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  private def writeSeg(dir: java.io.File, name: String, bytes: Array[Byte]): Unit =
    Files.write(new java.io.File(dir, name).toPath, bytes)

  private def readSrc(path: String, opts: (String, String)*): DataFrame = {
    val r = spark.read.format("warcgz")
    opts.foldLeft(r) { case (rr, (k, v)) => rr.option(k, v) }.load(path)
  }

  private val recCols = Seq("warc_type", "target_uri", "warc_date", "record_id",
    "content_length", "payload")

  test("fixture parity: source rows == scalar gunzip_all→warc_records lane, per segment") {
    val dir = WarcGzFixture.ensure()
    val viaSource = readSrc(dir)
      .select((col("path") +: recCols.map(col)): _*).collect()
      .map(r => r.toSeq.updated(0, new java.io.File(r.getString(0)).getName)).toSeq
    val viaScalar = spark.read.format("binaryFile").load(dir + "/*.warc.gz")
      .select(col("path"),
        explode(graft.functions.WarcRecords.warcRecords(
          graft.functions.GunzipAll.gunzipAll(col("content")))).as("r"))
      .select((col("path") +: recCols.map(c => col(s"r.$c"))): _*).collect()
      .map(r => r.toSeq.updated(0, new java.io.File(r.getString(0)).getName)).toSeq
    assert(viaSource.nonEmpty && viaSource.size == WarcGzFixture.NumDocs + 1)
    assert(viaSource.sortBy(_.toString) == viaScalar.sortBy(_.toString))
  }

  test("a segment past the scalar cap: gunzip_all quarantines the WHOLE segment, the source reads every record") {
    // 300 records with ~1 KiB bodies → ~330 KiB decompressed: past a
    // 64 KiB scalar cap (stand-in for the real 256 MiB default, which
    // a ~4 GiB CommonCrawl segment exceeds just the same — and past
    // the 2 GiB array ceiling no cap tuning can fix)
    val dir = tmpDir("warcgz-big")
    try {
      val pad = "x" * 1024
      val members = (0 until 300).map { i =>
        val http = s"HTTP/1.1 200 OK\r\n\r\n$pad-$i"
        WarcGzFixture.gzipMember(
          s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://b.com/$i\r\n" +
            s"Content-Length: ${http.length}\r\n\r\n$http\r\n\r\n")
      }
      writeSeg(dir, "big.warc.gz", members.foldLeft(Array.emptyByteArray)(_ ++ _))
      val scalarRows = spark.read.format("binaryFile").load(dir.getAbsolutePath)
        .select(graft.functions.GunzipAll.gunzipAll(col("content"), 64 * 1024).as("txt"))
        .collect()
      assert(scalarRows.length == 1 && scalarRows(0).isNullAt(0),
        "scalar lane should NULL the over-cap segment")
      val srcRows = readSrc(dir.getAbsolutePath)
      assert(srcRows.count() == 300)
      assert(srcRows.where(col("warc_type") === "response").count() == 300)
    } finally rm(dir)
  }

  test("byte-range splits resynchronize at member boundaries: tiny splits == one split, no dupes, no losses") {
    val dir = WarcGzFixture.ensure()
    val whole = readSrc(dir, "targetsplitbytes" -> (1L << 30).toString)
    val tiny = readSrc(dir, "targetsplitbytes" -> "512")
    assert(tiny.rdd.getNumPartitions > whole.rdd.getNumPartitions,
      s"512-byte splits should fan out (got ${tiny.rdd.getNumPartitions})")
    val a = whole.select(recCols.map(col): _*).collect().map(_.toString).sorted.toSeq
    val b = tiny.select(recCols.map(col): _*).collect().map(_.toString).sorted.toSeq
    assert(a == b)
    // member coordinates are exact in both
    val offs = tiny.select("member_offset").as[Long].collect().sorted.toSeq
    assert(offs == whole.select("member_offset").as[Long].collect().sorted.toSeq)
  }

  test("corrupt member → one __corrupt_gz sentinel, reader resynchronizes and later members parse") {
    val dir = tmpDir("warcgz-corrupt")
    try {
      val m0 = WarcGzFixture.gzipMember(WarcGzFixture.record(0))
      val m1 = WarcGzFixture.gzipMember(WarcGzFixture.record(1))
      val m2 = WarcGzFixture.gzipMember(WarcGzFixture.record(2))
      // flip bytes in m1's deflate body (past the 10-byte header) —
      // inflate error or CRC mismatch, either way gzip-level damage
      val bad = m1.clone()
      var i = 12
      while (i < bad.length - 9) { bad(i) = (bad(i) ^ 0x5a).toByte; i += 1 }
      writeSeg(dir, "seg.warc.gz", m0 ++ bad ++ m2)
      val rows = readSrc(dir.getAbsolutePath)
        .select("warc_type", "target_uri", "member_offset").orderBy("member_offset")
        .collect()
      assert(rows.length == 3)
      assert(rows(0).getString(0) == "response" && rows(0).getString(1).endsWith("/p0"))
      assert(rows(1).getString(0) == "__corrupt_gz" && rows(1).isNullAt(1))
      assert(rows(1).getLong(2) == m0.length.toLong)
      assert(rows(2).getString(0) == "response" && rows(2).getString(1).endsWith("/p2"))
      assert(rows(2).getLong(2) == (m0.length + bad.length).toLong)
    } finally rm(dir)
  }

  test("member past maxRecordBytes → __oversize with its true inflated size, next member unaffected") {
    val dir = tmpDir("warcgz-oversize")
    try {
      val fat = {
        val http = "HTTP/1.1 200 OK\r\n\r\n" + ("y" * 4096)
        s"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
      }
      writeSeg(dir, "seg.warc.gz",
        WarcGzFixture.gzipMember(fat) ++ WarcGzFixture.gzipMember(WarcGzFixture.record(7)))
      val rows = readSrc(dir.getAbsolutePath, "maxrecordbytes" -> "1024")
        .select("warc_type", "content_length").orderBy("member_offset").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "__oversize")
      assert(rows(0).getLong(1) == fat.length.toLong) // drained to the true end
      assert(rows(1).getString(0) == "response")
    } finally rm(dir)
  }

  test("ADVERSARIAL: stored-block payload embedding the gzip magic does not fool split resynchronization") {
    val dir = tmpDir("warcgz-fakemagic")
    try {
      // NO_COMPRESSION → stored deflate blocks: payload bytes (incl. a
      // fake 1f 8b 08 00 header) appear LITERALLY in the compressed
      // stream; a scan candidate lands there and verification must
      // reject it (what follows is not a member inflating to WARC/)
      val fakeMagic = Array(0x1f, 0x8b, 0x08, 0x00, 0, 0, 0, 0, 0, 0).map(_.toByte)
      val httpBytes = "HTTP/1.1 200 OK\r\n\r\ngz-inside:".getBytes("UTF-8") ++
        fakeMagic ++ ":end".getBytes("UTF-8")
      val evilBytes =
        ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://e.com/evil\r\n" +
          s"Content-Length: ${httpBytes.length}\r\n\r\n").getBytes("UTF-8") ++
          httpBytes ++ "\r\n\r\n".getBytes("UTF-8")
      val members =
        WarcGzFixture.gzipMemberBytes(evilBytes, java.util.zip.Deflater.NO_COMPRESSION) ++
          WarcGzFixture.gzipMember(WarcGzFixture.record(3))
      writeSeg(dir, "seg.warc.gz", members)
      // force splits small enough that some split start lands inside
      // the stored-block member, making the scan walk the fake magic
      val rows = readSrc(dir.getAbsolutePath, "targetsplitbytes" -> "64")
        .select("warc_type", "target_uri").collect()
      assert(rows.length == 2, s"phantom records: ${rows.toSeq}")
      assert(rows.map(_.getString(1)).toSet == Set("http://e.com/evil", "http://site3.com/p3"))
    } finally rm(dir)
  }

  test("column pruning: a projection without payload still yields exact record coordinates") {
    val dir = WarcGzFixture.ensure()
    val pruned = readSrc(dir).select("target_uri", "content_length")
      .where(col("target_uri").isNotNull)
    assert(pruned.schema.fieldNames.toSeq == Seq("target_uri", "content_length"))
    assert(pruned.count() == WarcGzFixture.NumDocs.toLong)
    // the scan itself reads only the required columns
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.get
    assert(!scan.readSchema().fieldNames.contains("payload"),
      s"payload not pruned from scan: ${scan.readSchema()}")
  }

  test("empty file and trailing garbage: empty → zero rows; garbage tail → sentinel after the records") {
    val dir = tmpDir("warcgz-edges")
    try {
      writeSeg(dir, "empty.warc.gz", Array.emptyByteArray)
      writeSeg(dir, "tail.warc.gz",
        WarcGzFixture.gzipMember(WarcGzFixture.record(9)) ++ "not-gzip-at-all".getBytes)
      val rows = readSrc(dir.getAbsolutePath)
        .select("path", "warc_type").collect()
      val byFile = rows.groupBy(r => new java.io.File(r.getString(0)).getName)
      assert(!byFile.contains("empty.warc.gz"))
      val tail = byFile("tail.warc.gz").map(_.getString(1)).toSeq
      assert(tail == Seq("response", "__corrupt_gz"))
    } finally rm(dir)
  }

  test("composed lane: source → responsesFromRecords matches the fixture arithmetic") {
    val dir = WarcGzFixture.ensure()
    val resp = graft.ops.Warc.responsesFromRecords(readSrc(dir), carry = Seq("rec_idx"))
    val rows = resp.orderBy(length(col("target_uri")), col("target_uri")).collect()
    assert(rows.length == WarcGzFixture.NumDocs)
    assert(rows.forall(_.getAs[Int]("http_status") == 200))
    assert(rows.forall(_.getAs[Long]("rec_idx") == 0L)) // one record per member
    val bodies = rows.map(_.getAs[String]("body")).toSet
    assert(bodies == (0 until WarcGzFixture.NumDocs).map(i => s"body-$i").toSet)
  }
}
