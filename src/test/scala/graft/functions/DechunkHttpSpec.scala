package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[DechunkHttp]] — RFC 9112 chunked-framing decode: happy paths,
  * extension/trailer handling, bare-LF leniency, and the malformation
  * quarantine; plus the [[graft.ops.Warc.httpBody]] header gate. */
class DechunkHttpSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): String = {
    val r = DechunkHttp.dechunk(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("two chunks concatenate; hex sizes in either case; extension skipped") {
    assert(d("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n") == "hello world")
    assert(d("A\r\n0123456789\r\n0\r\n\r\n") == "0123456789")
    assert(d("a\r\n0123456789\r\n0\r\n\r\n") == "0123456789")
    assert(d("5;name=v\r\nhello\r\n0\r\n\r\n") == "hello")
  }

  test("trailer fields after the 0-chunk are discarded; empty body is just the 0-chunk") {
    assert(d("1\r\nx\r\n0\r\nX-Trailer: v\r\nAnother: w\r\n\r\n") == "x")
    assert(d("0\r\n\r\n") == "")
    assert(d("0\r\n") == "") // trailer section is discard-only
  }

  test("bare-LF framing tolerated (the WARC header-parse leniency)") {
    assert(d("3\nabc\n0\n\n") == "abc")
    assert(d("3\nabc\r\n0\r\n\r\n") == "abc")
  }

  test("chunk data may contain CRLF and hex-looking lines — length-driven, not delimiter-driven") {
    assert(d("9\r\nab\r\n3\r\ncd\r\n0\r\n\r\n") == "ab\r\n3\r\ncd")
  }

  test("malformed framing → NULL: bad size, truncated data, missing terminator, no final chunk, overflow") {
    assert(d("") == null)
    assert(d("zz\r\nhello\r\n0\r\n\r\n") == null)
    assert(d("5\r\nab") == null) // data runs past input
    assert(d("5\r\nhello") == null) // missing terminator
    assert(d("5\r\nhelloXX0\r\n\r\n") == null) // garbage instead of CRLF
    assert(d("5\r\nhello\r\n") == null) // no final 0-chunk
    assert(d("5 \r\nhello\r\n0\r\n\r\n") == null) // space before CRLF is not ext
    assert(d("11111111111111111\r\nx\r\n0\r\n\r\n") == null) // >15 hex digits
  }

  test("httpBody gate: chunked header → decoded; plain body untouched; body MENTIONING the header untouched") {
    val chunkedPayload = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    val listPayload = "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n" +
      "2\r\nhi\r\n0\r\n\r\n"
    val plainPayload = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n5\r\nhello\r\n0\r\n\r\n"
    val mentionPayload = "HTTP/1.1 200 OK\r\n\r\nsee Transfer-Encoding: chunked docs"
    val casePayload = "HTTP/1.1 200 OK\r\ntransfer-encoding: CHUNKED\r\n\r\n2\r\nok\r\n0\r\n\r\n"
    val malformedChunked = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nnot-chunked-at-all"
    val rows = Seq(chunkedPayload, listPayload, plainPayload, mentionPayload,
      casePayload, malformedChunked).toDF("p")
      .select(graft.ops.Warc.httpBody(col("p")).as("b")).collect()
    assert(rows(0).getString(0) == "hello world")
    assert(rows(1).getString(0) == "hi")
    assert(rows(2).getString(0) == "5\r\nhello\r\n0\r\n\r\n") // NOT declared chunked
    assert(rows(3).getString(0) == "see Transfer-Encoding: chunked docs")
    assert(rows(4).getString(0) == "ok")
    assert(rows(5).isNullAt(0)) // declared chunked but malformed → quarantine
  }
}
