package graft.functions

import graft.SparkSpec
import graft.ops.Urls
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Equivalence oracles for the round-17 native URL kernels
  * ([[UrlKernels]]): the interpreted `eval` path, the whole-stage-
  * CODEGEN DataFrame path, and the retained Column-chain twins in
  * [[graft.ops.Urls]] (`hostCols` / `registrableDomainCols` /
  * `resolveHrefCols` / `hrefValuesCols`) must agree on adversarial
  * hand-picked cases AND on generated random inputs — including
  * no-scheme garbage, multi-`@` userinfo, trailing-dot hosts, empty
  * ports, fragment-only hrefs, unclosed quotes, and newlines inside
  * href values (the Java-regex `.` can't cross a line terminator, so
  * neither may the scanner). Deterministic seeds; each DataFrame
  * comparison batches all cases into one job. */
class UrlKernelSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, gen).apply(Gen.Parameters.default, Seed(seed)).get

  // URL-ish generator: structured pieces + mutations that hit every
  // parser branch (scheme validity, userinfo, ports, empty host, case)
  private val schemeGen = Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp", "a", "x+y.z-1", "1bad", "")
  // \r/\n-bearing hosts/userinfo/ports: the authority scan includes
  // line terminators ([^/?#] crosses them), so the twin's userinfo
  // strip needs (?s) and its port strip \z — ADVICE r17 found the old
  // generators emitted none, leaving that divergence unfuzzed
  private val hostGen = Gen.oneOf(
    "Example.COM", "a.b.example.co.uk", "co.uk", "uk", "ex_ample.com.", "..",
    "site0.com", "xn--bcher-kva.example", "127.0.0.1", "[::1]", "h", "",
    "ho\nst.com", "host.com\n", "host\r.com")
  private val portGen = Gen.oneOf("", ":80", ":443", ":8080", ":", ":8a", ":00",
    ":80\n", ":\n80")
  private val userGen = Gen.oneOf("", "user@", "user:p@ss@", "a@b@", "@",
    "a\nb@", "u@\n@")
  private val pathGen = Gen.oneOf("", "/", "/a/b/page.html", "/a/b/", "/x%41y", "/tr%61iling/")
  private val tailGen = Gen.oneOf("", "?b=2&a=1", "?utm_source=x&a=1", "#frag", "?q#f", "?", "#")
  private val sepGen = Gen.oneOf("://", ":/", ":", "//", "")
  private val urlGen: Gen[String] = for {
    s <- schemeGen; sep <- sepGen; u <- userGen; h <- hostGen; p <- portGen
    path <- pathGen; t <- tailGen
  } yield s + sep + u + h + p + path + t
  private val anyStringGen: Gen[String] = Gen.oneOf(
    urlGen,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('a', '.', '@', ':', '/', '?', '#', '%', 'é', '中', ' ')).map(_.mkString))

  private val adversarialUrls = Seq(
    null,
    "", "http://", "http://a", "https://User@HOST.Example.co.UK:443/x?y#z",
    "http://a@b@c.co.uk:8080/p", "http://ex.com.", "http://ex.com.:80/",
    "http://:80", "http://@", "http://@:", "http://ex.com:", "http://ex.com:8a/p",
    "http://ex.com:080", "ftp://ex.co.uk", "a://b.c", "http:/ex.com", "//ex.com/p",
    "http://EX.com//double//slash/", "http://host?q=1", "http://host#f",
    "http://host/:80", "http://[::1]:8080/x", "http://ex_am-ple.waw.pl/q",
    "mailto:a@b.c", "http://中文.example/路径", "http://a.b.c.d.co.uk",
    "HTTPS://ok.com:443", "hTtP://ok.com:80", "http://ok.com:443", "x+y-z.9://host/p",
    // line terminators inside the authority (ADVICE r17): userinfo
    // crossing '\n', trailing '\n' after a port, bare trailing '\n'
    "http://a\nb@host.com/x", "http://host.com:80\n", "http://host.com\n",
    "http://HOST\r\n.co.uk:8080/p", "http://u@host:\n/x")

  test("UrlHost / UrlRegistrableDomain: codegen == Column twins on adversarial + 600 random") {
    val inputs: Seq[String] = adversarialUrls ++ samples(anyStringGen, 600, 41L)
    val rows = inputs.toDF("u")
      .select(
        Urls.host(col("u")).as("n_h"), Urls.hostCols(col("u")).as("t_h"),
        Urls.registrableDomain(col("u")).as("n_d"), Urls.registrableDomainCols(col("u")).as("t_d"),
        col("u"))
      .collect()
    rows.foreach { r =>
      def g(i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
      assert(g(0) == g(1), s"host mismatch for <${g(4)}>: native=${g(0)} twin=${g(1)}")
      assert(g(2) == g(3), s"domain mismatch for <${g(4)}>: native=${g(2)} twin=${g(3)}")
    }
  }

  test("UrlHost / UrlRegistrableDomain: interpreted eval == codegen") {
    (adversarialUrls.filter(_ != null) ++ samples(urlGen, 150, 42L)).foreach { u =>
      val lit = Literal(UTF8String.fromString(u), StringType)
      val ih = UrlHost(lit).eval(null)
      val id = UrlRegistrableDomain(lit).eval(null)
      val r = Seq(u).toDF("u")
        .select(Urls.host(col("u")), Urls.registrableDomain(col("u"))).head()
      assert((if (r.isNullAt(0)) null else UTF8String.fromString(r.getString(0))) == ih, s"host interp for <$u>")
      assert((if (r.isNullAt(1)) null else UTF8String.fromString(r.getString(1))) == id, s"dom interp for <$u>")
    }
  }

  private val hrefGen: Gen[String] = Gen.oneOf(
    Gen.oneOf(
      "http://abs.com/x", "HTTPS://abs.com", "//proto.rel/x", "/root/rel", "//",
      "?page=2", "?", "", "#", "#top", "  /spaced  ", " sub/p.html ", "sub/p.html",
      "mailto:a@b.c", "javascript:void(0)", "MAILTO:x", "a+b.c:rest", "1notscheme:x",
      "ftp://f.co/x", "..", "../up/x", "./here", ":", "x://", "tel:123", "a:"),
    Gen.asciiPrintableStr)
  private val baseGen: Gen[String] = Gen.oneOf(
    Gen.oneOf(
      "http://site0.com/a/b/page1.html", "HTTP://Site.COM", "https://h.co.uk:443",
      "http://host", "http://host/", "http://host?q=1", "http://host/dir/", "notaurl",
      "", "http://", "http://h#f"),
    urlGen)

  test("ResolveHref: codegen == Column twin on the cross of adversarial hrefs × bases + random") {
    val fixedH = samples(hrefGen, 0, 1L) // (placeholder to keep style uniform)
    val pairs: Seq[(String, String)] =
      (for {
        h <- Seq("http://abs.com/x", "//p.rel/x", "/r", "?p=2", "", "#t", " sub/x ",
          "mailto:a@b", "a:", "../u", "sub/p.html", ":")
        b <- Seq("http://site0.com/a/b/page1.html", "http://host", "http://host?q=1",
          "notaurl", "", "HtTp://X.com/d/")
      } yield (h, b)) ++
        samples(Gen.zip(hrefGen, baseGen), 500, 43L) ++
        Seq((null, "http://x.com"), ("x", null), (null, null))
    val rows = pairs.toDF("h", "b")
      .select(
        Urls.resolveHref(col("h"), col("b")).as("n"),
        Urls.resolveHrefCols(col("h"), col("b")).as("t"),
        col("h"), col("b"))
      .collect()
    rows.foreach { r =>
      def g(i: Int): String = if (r.isNullAt(i)) null else r.getString(i)
      assert(g(0) == g(1), s"resolve mismatch for href=<${g(2)}> base=<${g(3)}>: native=${g(0)} twin=${g(1)}")
    }
    assert(fixedH.isEmpty)
  }

  test("ResolveHref: interpreted eval == codegen") {
    val pairs = samples(Gen.zip(hrefGen, baseGen), 120, 44L)
    pairs.foreach { case (h, b) =>
      val interp = ResolveHref(
        Literal(UTF8String.fromString(h), StringType),
        Literal(UTF8String.fromString(b), StringType)).eval(null)
      val r = Seq((h, b)).toDF("h", "b")
        .select(Urls.resolveHref(col("h"), col("b"))).head()
      assert((if (r.isNullAt(0)) null else UTF8String.fromString(r.getString(0))) == interp,
        s"interp mismatch for href=<$h> base=<$b>")
    }
  }

  // HTML snippets exercising the scanner's failure/rescan paths: an
  // href token whose = never comes, unclosed quotes, newline inside the
  // value (regex `.` blocks), mixed case, back-to-back hrefs, a quote
  // mismatch, tabs/newlines around '=' (\s crosses lines), CRLF, NEL
  private val htmlPieces: Gen[String] = Gen.oneOf(
    "<a href=\"http://x.com/1\">a</a>", "<a HREF='y'>b</a>", "href = 'z1'",
    "HrEf\t=\n\"q2\"", "href=unquoted", "href'no-eq'", "href=\"unclosed",
    "href=\"line\nbreak\"", "href=\"cr\rbreak\"", "href=''", "href=\"\"",
    "href href=\"inner\"", "href=\"a'b\"", "href='a\"b'", "text with no links",
    "href=\"nel\u0085break\"", "href=\"ls\u2028break\"", "<a href = \"s p a c e\">",
    "xhref=\"still-matches\"", "href==\"double-eq\"", "href= ", "href")
  private val htmlGen: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, htmlPieces).map(_.mkString(" ")))

  test("HrefValues: codegen == regexp_extract_all twin on adversarial + 400 random HTML") {
    val inputs: Seq[String] = Seq(
      null, "", "href=\"a\"href=\"b\"", "HREF='x'<a href=\"y\">", "href=\"terminal") ++
      samples(htmlGen, 400, 45L)
    val rows = inputs.toDF("h")
      .select(
        graft.functions.HrefValues.hrefValues(col("h")).as("n"),
        Urls.hrefValuesCols(col("h")).as("t"),
        col("h"))
      .collect()
    rows.foreach { r =>
      val n = if (r.isNullAt(0)) null else r.getSeq[String](0)
      val t = if (r.isNullAt(1)) null else r.getSeq[String](1)
      assert(n == t, s"href scan mismatch for <${if (r.isNullAt(2)) null else r.getString(2)}>: native=$n twin=$t")
    }
  }

  test("HrefValues: interpreted eval == codegen") {
    samples(htmlGen, 80, 46L).foreach { h =>
      val interp = HrefValues(Literal(UTF8String.fromString(h), StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val fromDf = Seq(h).toDF("h")
        .select(graft.functions.HrefValues.hrefValues(col("h"))).head().getSeq[String](0)
      val interpSeq = (0 until interp.numElements()).map(i => interp.getUTF8String(i).toString)
      assert(interpSeq == fromDf, s"interp mismatch for <$h>")
    }
  }
}
