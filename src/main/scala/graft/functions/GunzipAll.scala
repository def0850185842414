package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decompress a (possibly MULTI-MEMBER) gzip blob to its concatenated
  * plaintext — the `.warc.gz` convention: crawlers gzip each WARC
  * record as its OWN gzip member and concatenate the members, so
  * random access can seek to a member boundary; reading the whole file
  * through one gzip stream yields the plain concatenated WARC that
  * [[WarcRecords]] parses. `binaryFile` source → `gunzip_all(content)`
  * → `warc_records(...)` is the full .warc.gz lane.
  *
  * Input is BINARY (the raw file bytes); output is STRING with the
  * decompressed octets carried through as-is (the [[WarcRecords]]
  * payload contract). Decompression bombs are bounded loudly:
  * `maxOutBytes` (default 256 MiB — generous for a WARC segment;
  * CommonCrawl ships ~1 GiB gz files of ~4× expansion, a deployment
  * re-tunes the cap) — past it, or on corrupt gzip bytes, the result
  * is NULL rather than an executor OOM or a crashed job: quarantine,
  * not crash, same policy as the WARC sentinels.
  *
  * Not SQL-replicable (DuckDB has no gunzip scalar) — spec-pinned
  * (GunzipSpec: multi-member round-trip, corrupt tail, bomb cap,
  * empty input), the [[DeflateSize]] precedent. CodegenFallback:
  * per-row work dominates.
  */
case class GunzipAll(child: Expression, maxOutBytes: Int = 256 * 1024 * 1024)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gunzip_all expects a binary arg, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // corrupt / over-cap input → NULL
  override def prettyName: String = "gunzip_all"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) return UTF8String.fromString("")
    try {
      // GZIPInputStream reads CONCATENATED members natively (it probes
      // for a further member header after each trailer)
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes), 64 * 1024)
      // LONG math: `bytes.length * 4` overflows Int past 512 MiB input
      // and a negative initial capacity throws IllegalArgumentException
      // — outside the IOException quarantine, so it would kill the task
      // at exactly the ~1 GiB segment size the scaladoc targets
      // (ADVICE r17). The hint is capped at 1 MiB anyway (the stream
      // grows it as needed), so the min keeps the arithmetic total.
      val out = new java.io.ByteArrayOutputStream(
        math.min(bytes.length.toLong * 4, 1L << 20).toInt)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      var over = false
      while (n >= 0 && !over) {
        out.write(buf, 0, n)
        if (out.size() > maxOutBytes) over = true else n = in.read(buf)
      }
      in.close()
      if (over) null else UTF8String.fromBytes(out.toByteArray)
    } catch {
      // corrupt gzip → quarantine. NonFatal (not just IOException): the
      // quarantine-not-crash contract must hold for ANY per-row decode
      // failure — an unexpected runtime exception from the zlib wrapper
      // must not kill a 100 TB job over one bad segment (OOM/fatal
      // errors still propagate)
      case scala.util.control.NonFatal(_) => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GunzipAll {

  /** Column-level surface. */
  def gunzipAll(blob: Column): Column =
    Bridge.column(GunzipAll(Bridge.expression(blob)))

  /** Cap-overriding variant for deployments with known expansion. */
  def gunzipAll(blob: Column, maxOutBytes: Int): Column =
    Bridge.column(GunzipAll(Bridge.expression(blob), maxOutBytes))
}
