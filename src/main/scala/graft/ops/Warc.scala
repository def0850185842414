package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC container ingestion — the crawl-side source format in front of
  * everything in [[Urls]]/[[Text]]/[[DedupDocs]]: CommonCrawl and every
  * Heritrix-lineage crawler deliver page captures as WARC records
  * (ISO 28500), and a pretraining pipeline's first move is
  * WARC → (uri, fetch time, HTTP status, body) rows. The reference
  * engine has no crawl surface; this extends the LLM-pipeline family
  * (SURVEY §2 additions) at the S-layer.
  *
  * Parsing is the length-driven single-pass kernel
  * [[graft.functions.WarcRecords]] (see its scaladoc for the
  * malformation sentinels) followed by a stateless explode — zero
  * shuffle at any scale, one output row per record. HTTP sub-parsing
  * of response payloads is plain Column arithmetic on the FIRST
  * CRLF-CRLF boundary (the HTTP header/body split; a body containing
  * its own blank lines is untouched — it extends to the record's
  * Content-Length, not to a delimiter).
  *
  * A gzipped-per-record .warc.gz deployment decompresses at the file
  * source (binaryFile + per-record gunzip) before this operator; the
  * record algebra is unchanged.
  */
object Warc {

  /** Explode a WARC blob column into one row per record: `carry`
    * columns + `rec_idx` (0-based position in the blob) + the kernel's
    * fields (`offset warc_type target_uri warc_date record_id
    * content_length payload`). Sentinel rows (`warc_type` of
    * `__malformed` / `__truncated`) pass through for the caller to
    * quarantine. */
  def parseWarc(df: DataFrame, contentCol: String, carry: Seq[String]): DataFrame =
    df.select(
        (carry.map(col) :+
          posexplode(graft.functions.WarcRecords.warcRecords(col(contentCol)))
            .as(Seq("rec_idx", "__rec"))): _*)
      .select(
        (carry.map(col) :+ col("rec_idx").cast("long").as("rec_idx") :+
          col("__rec.offset").as("offset") :+
          col("__rec.warc_type").as("warc_type") :+
          col("__rec.target_uri").as("target_uri") :+
          col("__rec.warc_date").as("warc_date") :+
          col("__rec.record_id").as("record_id") :+
          col("__rec.content_length").as("content_length") :+
          col("__rec.payload").as("payload")): _*)

  /** HTTP status code of a response payload (`HTTP/<v> <code> …`
    * status line), NULL for non-HTTP payloads. */
  def httpStatus(payload: Column): Column = {
    // get() (0-based) is NULL-safe on a status line with no code, and
    // the digits guard keeps the int cast total (ANSI-safe) on
    // malformed status lines
    val code = get(split(substring_index(payload, "\r\n", 1), " ", 3), lit(1))
    when(payload.startsWith("HTTP/") && code.rlike("^[0-9]{1,9}$"), code.cast("int"))
  }

  /** HTTP body of a response payload: everything after the FIRST
    * CRLF-CRLF (end of the HTTP headers), NULL when there is none.
    * A body containing its own `\r\n\r\n` is returned whole — the
    * record's Content-Length already bounded the payload.
    *
    * When the header block declares `Transfer-Encoding: chunked`, the
    * wire framing is DECODED ([[graft.functions.DechunkHttp]]): WARC
    * payloads preserve raw wire bytes, and a large fraction of real
    * crawl responses are chunked — without this, downstream text ops
    * ingest `1a\r\n` size lines as content (r17 verdict). A chunked
    * body with malformed framing yields NULL (quarantine). The
    * chunked test is on the HEADER BLOCK only (`(?m)` line anchor,
    * value token list containing `chunked`, case-insensitive), so a
    * body merely MENTIONING the header is untouched. */
  def httpBody(payload: Column): Column = {
    val pos = locate("\r\n\r\n", payload)
    val headers = substring(payload, lit(1), pos - 1)
    val raw = substring(payload, pos + 4, lit(Int.MaxValue))
    val chunked = headers.rlike("(?mi)^transfer-encoding:[^\r\n]*\\bchunked\\b")
    when(pos > 0,
      when(chunked, graft.functions.DechunkHttp.dechunkHttp(raw)).otherwise(raw))
  }

  /** The fetch rows a curation pipeline starts from: `response`
    * records only, with `http_status` and `body` split out of the
    * payload (plus `carry`, `target_uri`, `warc_date`, `record_id`).
    * Still a stateless projection — filter + explode, no exchange. */
  def responses(df: DataFrame, contentCol: String, carry: Seq[String]): DataFrame =
    responsesFromRecords(parseWarc(df, contentCol, carry), carry)

  /** [[responses]] over ALREADY-EXPLODED record rows — the shape the
    * record-granular `.warc.gz` source
    * ([[graft.io.warc.WarcGzDataSourceV2]]) emits, one row per record
    * with `warc_type`/`target_uri`/`warc_date`/`record_id`/`payload`
    * columns. Shared tail of the scalar lane (container sentinels like
    * `__corrupt_gz`/`__oversize` fail the `response` filter, so
    * quarantine rows drop here by construction). */
  def responsesFromRecords(records: DataFrame, carry: Seq[String]): DataFrame =
    records
      .where(col("warc_type") === "response")
      .select(
        (carry.map(col) :+ col("target_uri") :+ col("warc_date") :+
          col("record_id") :+ httpStatus(col("payload")).as("http_status") :+
          httpBody(col("payload")).as("body")): _*)
}
