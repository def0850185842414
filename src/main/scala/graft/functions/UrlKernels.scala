package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass URL kernels for the crawl link-graph front end —
  * the extraction subtree every graph-family query pays
  * (q_link_graph/q_pagerank/q_ppr/q_hits/q_label_prop/q_modularity/
  * q_triangles/q_bfs_hops/q_anchor_text): per HTML row a regex scan for
  * hrefs, then PER LINK a 3-regex resolve ([[graft.ops.Urls.resolveHref]])
  * and a 3-regex + split host/domain derivation
  * ([[graft.ops.Urls.registrableDomain]]) — measured ~1.5 s × 8 queries
  * per bench pass (r16 ModularityCostSplit), a pure CPU scale-tax at
  * 100 TB. Each kernel is one left-to-right scan over the UTF-8 bytes
  * (structural URL chars are all ASCII, so byte-level parsing is exact;
  * lowercasing goes through `UTF8String.toLowerCase`, the same Unicode
  * fold `lower()` applies), exposed as a codegen'd Catalyst Expression
  * calling a static helper — the [[Md5Top60]]/[[PercentDecodeUnreserved]]
  * precedent (SURVEY.md §4.3 case b).
  *
  * The Column-chain formulations these replace are RETAINED as
  * `private[ops]` twins in [[graft.ops.Urls]] and serve as the
  * equivalence oracles (UrlKernelSpec: random + adversarial inputs,
  * interpreted eval == codegen == twin).
  */
object UrlKernels {

  @inline private def isAlpha(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  @inline private def isSchemeChar(c: Int): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  @inline private def isDigit(c: Int): Boolean = c >= '0' && c <= '9'

  /** Java-regex `\s`: [ \t\n\x0B\f\r] (ASCII-only without UNICODE_CHARACTER_CLASS). */
  @inline private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** Index just past `scheme://` when the bytes match
    * `^[A-Za-z][A-Za-z0-9+.-]*://`, else -1. */
  private def afterScheme(b: Array[Byte]): Int = {
    if (b.length == 0 || !isAlpha(b(0) & 0xff)) return -1
    var i = 1
    while (i < b.length && isSchemeChar(b(i) & 0xff)) i += 1
    if (i + 2 < b.length && b(i) == ':' && b(i + 1) == '/' && b(i + 2) == '/') i + 3
    else -1
  }

  /** End of the authority component: first `/`, `?` or `#` at/after
    * `start`, else length. */
  private def authorityEnd(b: Array[Byte], start: Int): Int = {
    var i = start
    while (i < b.length && b(i) != '/' && b(i) != '?' && b(i) != '#') i += 1
    i
  }

  /** Lowercased host of a URL (userinfo up to the authority's LAST `@`
    * and a trailing `:[0-9]*` port stripped), or null when the URL has
    * no `scheme://` or the host is empty — byte-for-byte the
    * [[graft.ops.Urls.hostCols]] chain. Static: called from generated
    * code. */
  def hostOf(url: UTF8String): UTF8String = {
    val b = url.getBytes
    val as = afterScheme(b)
    if (as < 0) return null
    val ae = authorityEnd(b, as)
    // userinfo: everything up to the LAST '@' ('@' is illegal in host)
    var hs = as
    var i = ae - 1
    while (i >= as && hs == as) { if (b(i) == '@') hs = i + 1; i -= 1 }
    // port: ':' followed by zero or more digits at the end
    var j = ae
    while (j > hs && isDigit(b(j - 1) & 0xff)) j -= 1
    val he = if (j > hs && b(j - 1) == ':') j - 1 else ae
    if (he <= hs) null
    else UTF8String.fromBytes(b, hs, he - hs).toLowerCase
  }

  /** Registrable domain per the pinned PSL subset
    * ([[graft.ops.Urls.publicSuffixes2]]): last THREE labels when the
    * host's last two are a public suffix, else last TWO, else the host
    * itself; null when [[hostOf]] is null. Split keeps empty labels
    * (exactly `split(h, "\\.")`), so a trailing-dot host yields the
    * same odd-but-defined `com.`-style result as the Column twin. */
  def registrableDomainOf(url: UTF8String): UTF8String = {
    val host = hostOf(url)
    if (host == null) return null
    val hb = host.getBytes
    // label start offsets (split on '.', empties kept)
    var nLabels = 1
    var i = 0
    while (i < hb.length) { if (hb(i) == '.') nLabels += 1; i += 1 }
    if (nLabels < 2) return host
    // find start offsets of the last three labels
    var lastDot = -1
    var prevDot = -1
    var prev2Dot = -1
    i = 0
    while (i < hb.length) {
      if (hb(i) == '.') { prev2Dot = prevDot; prevDot = lastDot; lastDot = i }
      i += 1
    }
    val last2Start = prevDot + 1 // start of second-to-last label
    val last2 = new String(hb, last2Start, hb.length - last2Start,
      java.nio.charset.StandardCharsets.UTF_8)
    if (nLabels >= 3 && pslSet.contains(last2)) {
      val last3Start = prev2Dot + 1
      UTF8String.fromBytes(hb, last3Start, hb.length - last3Start)
    } else {
      UTF8String.fromBytes(hb, last2Start, hb.length - last2Start)
    }
  }

  /** Pinned 2-label public-suffix subset — the single source of truth
    * ([[graft.ops.Urls.publicSuffixes2]] re-exports it; defined here so
    * `functions` never depends on `ops`). See the Urls scaladoc for
    * provenance (Mozilla PSL, ICANN section). */
  private[graft] val publicSuffixes2: Seq[String] = Seq(
    // uk / ie / il / ae / at
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk", "ac.uk", "gov.uk", "sch.uk",
    "nhs.uk", "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "k12.il",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "sch.ae", "mil.ae",
    "co.at", "or.at", "ac.at", "gv.at",
    // jp / kr / tw / hk / sg / th / id / my / ph / vn / cn / in
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr", "ac.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "sch.id", "web.id", "my.id", "biz.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn", "biz.vn",
    "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in", "edu.in",
    "res.in", "gov.in", "mil.in", "nic.in",
    // au / nz
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz", "geek.nz", "gen.nz",
    "kiwi.nz", "maori.nz",
    // americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br", "blog.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "co.ve",
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "mil.ec",
    // europe / africa / middle east
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "k12.tr", "gen.tr",
    "av.tr", "bel.tr", "biz.tr", "info.tr",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl", "info.pl", "biz.pl",
    "waw.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "sc.ke", "ac.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "mil.ng", "mobi.ng", "name.ng",
    "sch.ng", "i.ng",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "eun.eg", "mil.eg", "name.eg",
    "sci.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa", "sch.sa",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt", "nome.pt"
  )

  private val pslSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](publicSuffixes2.size * 2)
    publicSuffixes2.foreach(s.add)
    s
  }

  /** RFC 3986 §5 subset href resolution — byte-for-byte the
    * [[graft.ops.Urls.resolveHrefCols]] chain (see its scaladoc for the
    * branch contract). Null for fragment-only/empty/other-scheme hrefs
    * and for an unparseable base. Static: called from generated code. */
  def resolveHrefOf(href: UTF8String, base: UTF8String): UTF8String = {
    val bb = base.getBytes
    val as = afterScheme(bb)
    if (as < 0) return null // scheme or origin empty
    val ae = authorityEnd(bb, as)
    // pathEnd: first '?' or '#' at/after ae ('/' belongs to the path)
    var pe = ae
    while (pe < bb.length && bb(pe) != '?' && bb(pe) != '#') pe += 1

    val h = href.trim() // StringTrim semantics: 0x20 only
    val hb = h.getBytes

    // 1. absolute scheme://
    val hAs = afterScheme(hb)
    if (hAs >= 0) return h
    // 2. protocol-relative //host/...
    if (hb.length >= 2 && hb(0) == '/' && hb(1) == '/') {
      val scheme = UTF8String.fromBytes(bb, 0, as - 3).toLowerCase
      return UTF8String.concat(scheme, UTF8String.fromString(":"), h)
    }
    val origin = UTF8String.fromBytes(bb, 0, ae)
    // 3. root-relative /path
    if (hb.length >= 1 && hb(0) == '/') return UTF8String.concat(origin, h)
    // 4. query-relative ?page=2 → origin + base PATH + href
    if (hb.length >= 1 && hb(0) == '?') {
      val basePath = UTF8String.fromBytes(bb, ae, pe - ae)
      return UTF8String.concat(origin, basePath, h)
    }
    // 5. empty / fragment-only → null
    if (hb.length == 0 || hb(0) == '#') return null
    // 6. other scheme (mailto:, javascript:) → null
    if (isAlpha(hb(0) & 0xff)) {
      var i = 1
      while (i < hb.length && isSchemeChar(hb(i) & 0xff)) i += 1
      if (i < hb.length && hb(i) == ':') return null
    }
    // 7. path-relative → origin + baseDir + href
    val baseDir =
      if (pe == ae) UTF8String.fromString("/")
      else {
        // strip the final path segment: keep through the LAST '/'
        var ls = pe - 1
        while (ls >= ae && bb(ls) != '/') ls -= 1
        // basePath is non-empty ⇒ starts with '/', so ls >= ae
        UTF8String.fromBytes(bb, ae, ls - ae + 1)
      }
    UTF8String.concat(origin, baseDir, h)
  }

  /** All `href = "…"` / `href = '…'` attribute values of an HTML blob,
    * in document order — the value array of
    * `regexp_extract_all(html, "(?i)href\\s*=\\s*([\"'])(.*?)\\1", 2)`:
    * attribute name case-insensitive (ASCII fold, as `(?i)` without
    * UNICODE_CASE), `\s` = Java-regex ASCII whitespace, the lazy `.`
    * cannot cross a line terminator (\n \r U+0085 U+2028 U+2029), and
    * matches are non-overlapping left-to-right (a failed candidate
    * resumes scanning at the next byte, a successful one after its
    * closing quote). Static: called from generated code. */
  def hrefValuesOf(html: UTF8String): GenericArrayData = {
    val b = html.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var pos = 0
    while (pos + 4 <= b.length) {
      if ((b(pos) | 0x20) == 'h' && (b(pos + 1) | 0x20) == 'r' &&
        (b(pos + 2) | 0x20) == 'e' && (b(pos + 3) | 0x20) == 'f') {
        var i = pos + 4
        while (i < b.length && isWs(b(i) & 0xff)) i += 1
        var matched = false
        if (i < b.length && b(i) == '=') {
          i += 1
          while (i < b.length && isWs(b(i) & 0xff)) i += 1
          if (i < b.length && (b(i) == '"' || b(i) == '\'')) {
            val q = b(i)
            i += 1
            var j = i
            var blocked = false
            while (!blocked && j < b.length && b(j) != q) {
              val c = b(j) & 0xff
              if (c == 0x0a || c == 0x0d) blocked = true
              else if (c == 0xc2 && j + 1 < b.length && (b(j + 1) & 0xff) == 0x85)
                blocked = true // U+0085 NEL
              else if (c == 0xe2 && j + 2 < b.length && (b(j + 1) & 0xff) == 0x80 &&
                ((b(j + 2) & 0xff) == 0xa8 || (b(j + 2) & 0xff) == 0xa9))
                blocked = true // U+2028 / U+2029
              else j += 1
            }
            if (!blocked && j < b.length) {
              out.add(UTF8String.fromBytes(b, i, j - i))
              pos = j + 1
              matched = true
            }
          }
        }
        if (!matched) pos += 1
      } else pos += 1
    }
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

/** `url_host(url)`: lowercased host or NULL — native twin of the
  * 3-regex chain in [[graft.ops.Urls.hostCols]]. */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"url_host expects a string arg, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // null on no-scheme/empty-host input
  override def prettyName: String = "url_host"
  override protected def nullSafeEval(input: Any): Any =
    UrlKernels.hostOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.UrlKernels.hostOf($c);
       |${ev.isNull} = ${ev.value} == null;
       |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlHost {
  def urlHost(url: Column): Column = Bridge.column(UrlHost(Bridge.expression(url)))
}

/** `url_registrable_domain(url)`: PSL-aware registrable domain or NULL —
  * native twin of [[graft.ops.Urls.registrableDomainCols]]. */
case class UrlRegistrableDomain(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"url_registrable_domain expects a string arg, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_registrable_domain"
  override protected def nullSafeEval(input: Any): Any =
    UrlKernels.registrableDomainOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.UrlKernels.registrableDomainOf($c);
       |${ev.isNull} = ${ev.value} == null;
       |""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlRegistrableDomain {
  def registrableDomain(url: Column): Column =
    Bridge.column(UrlRegistrableDomain(Bridge.expression(url)))
}

/** `resolve_href(href, base)`: RFC 3986 §5 subset resolution or NULL —
  * native twin of [[graft.ops.Urls.resolveHrefCols]]. */
case class ResolveHref(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"resolve_href expects (string, string) args, got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // null for fragment-only/mailto/bad base
  override def prettyName: String = "resolve_href"
  override protected def nullSafeEval(href: Any, base: Any): Any =
    UrlKernels.resolveHrefOf(href.asInstanceOf[UTF8String], base.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, b) => s"""
       |${ev.value} = graft.functions.UrlKernels.resolveHrefOf($h, $b);
       |${ev.isNull} = ${ev.value} == null;
       |""".stripMargin)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ResolveHref {
  def resolveHref(href: Column, base: Column): Column =
    Bridge.column(ResolveHref(Bridge.expression(href), Bridge.expression(base)))
}

/** `href_values(html)`: array of href attribute values — native twin of
  * the `regexp_extract_all` group-2 scan in
  * [[graft.ops.Urls.hrefValuesCols]]. */
case class HrefValues(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"href_values expects a string arg, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "href_values"
  override protected def nullSafeEval(input: Any): Any =
    UrlKernels.hrefValuesOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlKernels.hrefValuesOf($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HrefValues {
  def hrefValues(html: Column): Column = Bridge.column(HrefValues(Bridge.expression(html)))
}
