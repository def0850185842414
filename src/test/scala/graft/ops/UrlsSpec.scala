package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Urls]] canonicalization contract — the edge cases the oracle
  * fixture's arithmetic doesn't reach. */
class UrlsSpec extends SparkSpec {

  private lazy val s = spark
  import s.implicits._

  private def norm(url: String): Option[String] = {
    val r = Seq(url).toDF("u").select(Urls.normalizeUrl(col("u"))).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("normalizeUrl: scheme/host lowercase, default port, fragment, tracking params, param sort, trailing slash") {
    assert(norm("HTTP://WWW.Ex.COM:80/a/b/?b=2&a=1&utm_campaign=z#frag")
      == Some("http://www.ex.com/a/b?a=1&b=2"))
    assert(norm("https://Ex.com:443/x") == Some("https://ex.com/x"))
  }

  test("normalizeUrl: non-default port kept, root slash kept, empty path kept") {
    assert(norm("http://ex.com:8080/a") == Some("http://ex.com:8080/a"))
    assert(norm("https://ex.com:80/a") == Some("https://ex.com:80/a")) // :80 is NOT https default
    assert(norm("http://ex.com/") == Some("http://ex.com/"))
    assert(norm("http://ex.com") == Some("http://ex.com"))
  }

  test("normalizeUrl: all-tracking query drops entirely; mixed keeps sorted survivors; '=' in values survives") {
    assert(norm("http://ex.com/p?utm_source=a&gclid=1&fbclid=2") == Some("http://ex.com/p"))
    assert(norm("http://ex.com/p?z=9&a=b=c") == Some("http://ex.com/p?a=b=c&z=9"))
    // utm must match the PARAM NAME, not a value
    assert(norm("http://ex.com/p?q=utm_source") == Some("http://ex.com/p?q=utm_source"))
  }

  test("normalizeUrl: a '?' inside the fragment is NOT a query — fragment drops whole") {
    assert(norm("http://ex.com/p#section?b=1") == Some("http://ex.com/p"))
    assert(norm("http://ex.com/p?a=1#frag?b=2") == Some("http://ex.com/p?a=1"))
  }

  test("dedupByUrl passes unparseable (NULL-canonical) rows through instead of collapsing them") {
    val df = Seq(
      (1L, "garbage-a"),
      (2L, "garbage-b"),
      (3L, "http://ex.com/x")
    ).toDF("doc_id", "url")
    val kept = Urls.dedupByUrl(df, "url", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("normalizeUrl: non-URL strings are NULL (quarantine signal)") {
    assert(norm("not a url") == None)
    assert(norm("//protocol-relative.com/x") == None)
  }

  test("registrableDomain: last two labels; single-label host passes through") {
    val got = Seq(
      "http://a.b.Example.COM/x",
      "https://localhost/x",
      "http://ex.com:8080/y"
    ).toDF("u").select(Urls.registrableDomain(col("u"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.com", "localhost", "ex.com"))
  }

  test("registrableDomain consults the pinned PSL: co.uk-style suffixes keep three labels") {
    val got = Seq(
      "http://shop.Example.CO.UK/x",   // 2-label public suffix → 3 labels
      "http://a.b.news.ac.jp/x",       // deep subdomain under a PSL suffix
      "https://www.big.com.au/x",
      "http://GOV.UK/services",        // host IS a bare suffix → passthrough (total-function contract)
      "http://co.uk.example.com/x"     // 'co.uk' as SUBdomain labels is NOT a suffix position
    ).toDF("u").select(Urls.registrableDomain(col("u"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.co.uk", "news.ac.jp", "big.com.au", "gov.uk", "example.com"))
  }

  test("percent-decoding: unreserved escapes decode (both hex cases), reserved escapes survive") {
    assert(norm("http://ex.com/%7Ealice/%2Fkeep?%61=1")
      == Some("http://ex.com/~alice/%2Fkeep?a=1"))
    assert(norm("http://ex.com/%7e%30%39") == Some("http://ex.com/~09"))
    // %2F is '/', %3D is '=', %25 is '%' — all reserved, all kept
    assert(norm("http://ex.com/a%2Fb?x=%3D&y=%25") == Some("http://ex.com/a%2Fb?x=%3D&y=%25"))
    // decoded '~' trailing a dir path doesn't break trailing-slash logic
    assert(norm("http://ex.com/%7E/") == Some("http://ex.com/~"))
  }

  test("filterBlockedDomains drops blocked registrable domains, keeps null-domain rows") {
    val df = Seq(
      (1L, "http://spam.bad.com/x"),
      (2L, "http://ok.good.com/x"),
      (3L, "garbage")
    ).toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url", Seq("BAD.com"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("normQuery anchors on the FIRST '?': a literal '?' in the query keeps earlier params") {
    // greedy-anchor bug: params before the second '?' were dropped
    assert(norm("http://ex.com/p?a=1?x=2") == Some("http://ex.com/p?a=1?x=2"))
    assert(norm("http://ex.com/p?b=2?z&a=1#f") == Some("http://ex.com/p?a=1&b=2?z"))
  }

  test("host/registrableDomain strip userinfo — credentials can't smuggle a domain past the blocklist") {
    val got = Seq(
      "http://user:pw@Host.COM/x",
      "http://user@a.b.ex.com:8080/y"
    ).toDF("u").select(Urls.host(col("u")), Urls.registrableDomain(col("u")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("host.com", "host.com"), ("a.b.ex.com", "ex.com")))
    val df = Seq((1L, "http://creds:x@spam.bad.com/x"), (2L, "http://ok.good.com/x"))
      .toDF("id", "url")
    val kept = Urls.filterBlockedDomains(df, "url", Seq("bad.com"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("normalizeUrl preserves userinfo case, lowercases only scheme+host, drops default port behind userinfo") {
    assert(norm("HTTP://User:PW@Ex.COM:80/a") == Some("http://User:PW@ex.com/a"))
  }

  test("dedupByUrl keeps smallest id per canonical url across messy variants") {
    val df = Seq(
      (5L, "HTTP://Ex.COM:80/a?b=2&a=1#f"),
      (9L, "http://ex.com/a?a=1&b=2"),
      (7L, "http://ex.com/b")
    ).toDF("doc_id", "url")
    val kept = Urls.dedupByUrl(df, "url", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 7L))
  }

  test("percent-decode native kernel ≡ HOF split twin on adversarial escapes; single-pass, no cascade") {
    val cases = Seq(
      "http://ex.com/%7Euser",      // lowercase-hex unreserved
      "http://ex.com/%7euser",
      "http://ex.com/a%2Fb",        // reserved survives
      "http://ex.com/%41%42%43",    // consecutive decodes
      "http://ex.com/%%41",         // bare % then escape
      "http://ex.com/%7%41",        // THE cascade case: must stay %7A, never z
      "http://ex.com/%4",           // truncated escape at end
      "http://ex.com/%",            // trailing %
      "http://ex.com/%zz%G1",       // invalid hex
      "http://ex.com/%2541",        // %25 = '%' is reserved: stays %2541
      "héllo%20wörld%2E",           // multi-byte UTF-8 around escapes
      ""                            // empty
    )
    val df = cases.toDF("u").select(
      col("u"),
      Urls.percentDecodeUnreserved(col("u")).as("native"),
      Urls.percentDecodeUnreservedHof(col("u")).as("hof"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(2), s"input '${r.getString(0)}'")
    }
    // the cascade case pinned literally: one pass decodes %41→A and
    // leaves the manufactured-looking %7A alone
    val cascade = Seq("x%7%41y").toDF("u")
      .select(Urls.percentDecodeUnreserved(col("u"))).head().getString(0)
    assert(cascade == "x%7Ay")
  }

  private def resolve(href: String, base: String): Option[String] = {
    val r = Seq((href, base)).toDF("h", "b")
      .select(Urls.resolveHref(col("h"), col("b"))).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("resolveHref: every resolution shape") {
    val base = "http://ex.com/a/b/page.html"
    assert(resolve("https://other.org/x", base) == Some("https://other.org/x"))
    assert(resolve("//cdn.net/y", base) == Some("http://cdn.net/y"))
    assert(resolve("//cdn.net/y", "https://ex.com/p") == Some("https://cdn.net/y"))
    assert(resolve("/root/z", base) == Some("http://ex.com/root/z"))
    assert(resolve("sub/p.html", base) == Some("http://ex.com/a/b/sub/p.html"))
    assert(resolve("p2.html", "http://ex.com") == Some("http://ex.com/p2.html"))
    // query-relative (RFC 3986 §5.3): same path, replaced query — NOT
    // the path-relative fallback (which would drop the final segment)
    assert(resolve("?page=2", base) == Some("http://ex.com/a/b/page.html?page=2"))
    assert(resolve("?p=1", "http://ex.com/q?old=0#f") == Some("http://ex.com/q?p=1"))
    assert(resolve("?x", "http://ex.com") == Some("http://ex.com?x"))
    assert(resolve("", base) == None)
    assert(resolve("#frag", base) == None)
    assert(resolve("mailto:a@b.c", base) == None)
    assert(resolve("javascript:void(0)", base) == None)
    assert(resolve("x.html", "not a url") == None)
  }

  test("extractLinks: quote styles, attr case, http(s)-only filter, carry columns") {
    val html =
      """<a href="http://a.com/1">x</a><a HREF='//b.com/2'>y</a>
        |<a href="/p">z</a><a href="ftp://files.net/f">f</a>
        |<a href="#top">t</a><img src="i.png">""".stripMargin
    val df = Seq((7L, "http://ex.com/d/page.html", html)).toDF("doc_id", "base", "html")
    val got = Urls.extractLinks(df, "html", "base", carry = Seq("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (7L, "http://a.com/1"),
      (7L, "http://b.com/2"),
      (7L, "http://ex.com/p")))
  }

  test("extractLinksWithText: href/text alignment, markup strip, multiline text") {
    val html =
      """<a href="http://a.com/1"><b>Breaking</b> News</a>
        |<a HREF='/p' class="x">local
        |link</a><a href="mailto:z@b.c">drop</a>""".stripMargin
    val df = Seq((1L, "http://ex.com/d/page.html", html)).toDF("doc_id", "base", "html")
    val got = Urls.extractLinksWithText(df, "html", "base", carry = Seq("doc_id"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("http://a.com/1", "Breaking News"),
      ("http://ex.com/p", "local\nlink")))
  }

  test("anchorTermStats: case fold, term split, top-m per destination domain") {
    val df = Seq(
      ("http://s.com/1", "<a href=\"http://t.com/a\">Breaking News</a>"),
      ("http://s.com/2", "<a href=\"http://t.com/b\">news archive</a>"),
      ("http://s.com/3", "<a href=\"http://t.com/c\">news</a><a href=\"http://u.com/\">Sports!</a>")
    ).toDF("base", "html")
    val got = Urls.anchorTermStats(df, "html", "base", topM = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == Set(
      ("t.com", "news", 3L, 1),
      ("t.com", "archive", 1L, 2), // ties with 'breaking' break bytewise: archive < breaking
      ("u.com", "sports", 1L, 1)))
  }

  test("parseRobotsRules: directive case, comments (full-line + inline), empty Disallow, whitespace") {
    val robots =
      """User-agent: *
        |# staging area
        |Disallow: /private/
        |disallow:   /tmp/ # staging mirror
        |Disallow:
        |Allow: /
        |""".stripMargin
    val df = Seq(("ex.com", robots)).toDF("domain", "robots")
    val got = Urls.parseRobotsRules(df, "robots", "domain")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("ex.com", "disallow", "/private/"),
      ("ex.com", "disallow", "/tmp/"),
      ("ex.com", "allow", "/")))
  }

  test("filterDisallowedPaths: prefix match per host, query included, unknown host passes") {
    val rules = Seq(
      ("ex.com", "disallow", "/private/"),
      ("ex.com", "disallow", "/p?drop"),
      ("other.net", "disallow", "/"))
      .toDF("domain", "rule_type", "path_prefix")
    val urls = Seq(
      (1L, "http://ex.com/private/x.html"),   // dropped: prefix
      (2L, "http://sub.ex.com/private/y"),    // kept: robots scope is per-HOST (RFC 9309 §2.3)
      (3L, "http://ex.com/privateer"),        // kept: /private/ is not a prefix of /privateer
      (4L, "http://ex.com/p?drop=1"),         // dropped: query participates in the path test
      (5L, "http://other.net"),               // dropped: "/" rule matches the empty→"/" path
      (6L, "http://new.org/private/z")        // kept: no rules for new.org
    ).toDF("doc_id", "url")
    val kept = Urls.filterDisallowedPaths(urls, "url", rules)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 6L))
  }

  test("filterDisallowedPaths: Allow longest-match precedence (RFC 9309 §2.2.2)") {
    // Disallow-everything site with Allow carve-outs — the case the
    // Disallow-only read gets entirely wrong (drops the whole site)
    val rules = Seq(
      ("ex.com", "disallow", "/"),
      ("ex.com", "allow", "/public/"),
      ("ex.com", "allow", "/a"),
      ("tie.com", "allow", "/dir/"),
      ("tie.com", "disallow", "/dir/")) // equal length → allow wins
      .toDF("domain", "rule_type", "path_prefix")
    val urls = Seq(
      (1L, "http://ex.com/public/page.html"), // kept: /public/ (7) beats / (1)
      (2L, "http://ex.com/secret/page.html"), // dropped: only / matches
      (3L, "http://ex.com/about"),            // kept: /a (2) beats / (1)
      (4L, "http://ex.com/"),                 // dropped: only / matches
      (5L, "http://tie.com/dir/x")            // kept: allow wins the equal-length tie
    ).toDF("doc_id", "url")
    val kept = Urls.filterDisallowedPaths(urls, "url", rules)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 5L))
  }

  test("filterDisallowedPaths: * and trailing-$ wildcards; $ elsewhere and regex chars literal") {
    val rules = Seq(
      ("ex.com", "disallow", "/*.pdf$"),      // any path ending .pdf
      ("ex.com", "disallow", "/tmp*/"),       // /tmp…/ anywhere below
      ("ex.com", "allow", "/tmpfiles/keep/"), // longest-match carve-out
      ("lit.com", "disallow", "/a$b/"),       // $ not trailing → literal
      ("lit.com", "disallow", "/c.d/"))       // . is literal, must not match /cxd/
      .toDF("domain", "rule_type", "path_prefix")
    val urls = Seq(
      (1L, "http://ex.com/docs/manual.pdf"),      // dropped: *.pdf$
      (2L, "http://ex.com/docs/manual.pdf.html"), // kept: $ anchors the end
      (3L, "http://ex.com/tmpfiles/x"),           // dropped: /tmp*/
      (4L, "http://ex.com/tmpfiles/keep/y"),      // kept: longer Allow wins
      (5L, "http://lit.com/a$b/z"),               // dropped: literal $
      (6L, "http://lit.com/ab/z"),                // kept: $ is not a wildcard here
      (7L, "http://lit.com/cxd/z"),               // kept: . escaped, no regex match
      (8L, "http://lit.com/c.d/z")                // dropped: literal .
    ).toDF("doc_id", "url")
    val kept = Urls.filterDisallowedPaths(urls, "url", rules)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L, 7L))
  }

  test("domainEdges: registrable-domain rollup with counts") {
    val df = Seq(
      ("http://www.sub.site1.com/p", "<a href=\"http://a.site2.com/x\">1</a><a href=\"/self\">2</a>"),
      ("http://site1.com/q", "<a href=\"https://site2.com/y\">3</a>")
    ).toDF("base", "html")
    val got = Urls.domainEdges(df, "html", "base")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("site1.com", "site2.com", 2L),
      ("site1.com", "site1.com", 1L)))
  }

  test("politenessSchedule: per-host spacing exactly delayUs, offsets in range, deterministic") {
    import spark.implicits._
    val urls = (0 until 30).map(i => (s"http://h${i % 3}.com/p$i", s"h${i % 3}.com"))
      .toDF("url", "host")
    val got = Urls.politenessSchedule(urls, "url", "host", delayUs = 1000L)
      .collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3)))
    // consecutive fetches of the same host are exactly delayUs apart
    got.groupBy(_._1).foreach { case (h, rows) =>
      val bys = rows.sortBy(_._2)
      assert(bys.map(_._2).toSeq == (1 to 10))
      bys.sliding(2).foreach { case Array(a, b) => assert(b._3 - a._3 == 1000L) }
      assert(bys.head._3 >= 0 && bys.head._3 < 1000L, s"$h offset ${bys.head._3}")
    }
    // hosts don't all start at the same instant (md5 de-sync)
    assert(got.filter(_._2 == 1).map(_._3).distinct.length > 1)
    // pure function of inputs: repartition changes nothing
    val again = Urls.politenessSchedule(urls.repartition(7), "url", "host", 1000L)
      .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(3))).sorted
    assert(again.toSeq == got.sorted.toSeq)
  }
}
