package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain rollups — the web-crawl curation steps
  * that precede URL-level dedup and domain-level quality policy (crawl
  * frontiers and pretraining pipelines both key on the canonical URL,
  * and domain blocklists/stats are the first quality cut on a crawl).
  *
  * Everything here is a pure expression chain (native single-pass URL
  * kernels ([[graft.functions.UrlKernels]]) + regexp + array ops, all
  * codegen'd — no UDF), so the operators are stateless projections:
  * zero shuffle at any scale, and an oracle can respell the same
  * arithmetic in SQL. The reference engine has no web-crawl
  * surface; these extend the LLM-pipeline family (SURVEY §2 additions).
  *
  * Normalization contract (the standard safe subset of RFC 3986
  * normalization plus the tracking-param strip every crawl pipeline
  * applies):
  *   - scheme and host lowercased
  *   - fragment dropped
  *   - default ports dropped (`:80` for http, `:443` for https)
  *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`)
  *   - surviving query params sorted bytewise (order-insensitive dedup)
  *   - trailing `/` dropped from a non-root path
  *
  * [[registrableDomain]] consults a pinned subset of the Mozilla
  * Public Suffix List ([[publicSuffixes2]]) so `a.example.co.uk`
  * groups under `example.co.uk`, not `co.uk`; a deployment tracking
  * the full published list swaps the constant, same plan shape.
  *
  * Limitation (documented, deliberate): percent-encoding
  * normalization decodes only the UNRESERVED escapes (see
  * [[normalizeUrl]]); reserved escapes keep their original hex case.
  */
object Urls {

  /** `scheme://[user@]host[:port]` → lowercased scheme + host, default
    * port dropped. Userinfo (anything up to the authority's last `@`) is
    * passed through CASE-PRESERVED — credentials are case-sensitive,
    * only scheme and host are case-insensitive per RFC 3986 §6.2.2.1.
    * Input column must be a URL string. */
  private def lowerAuthority(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo = up to the LAST '@' ('@' is illegal in host, so any '@'
    // in the authority belongs to userinfo)
    val userinfo = regexp_extract(auth, "^(.*@)", 1)
    val hostPort = lower(regexp_replace(auth, "^.*@", ""))
    val noDefPort = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    concat(scheme, lit("://"), userinfo, noDefPort)
  }

  /** Path component (everything between authority and `?`/`#`),
    * trailing slash dropped unless the path IS the root slash. */
  private def normPath(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(p === "" || p === "/", p).otherwise(regexp_replace(p, "/$", ""))
  }

  /** Query string with tracking params removed and survivors sorted
    * bytewise; empty when nothing survives. */
  private def normQuery(url: Column): Column = {
    // anchor on the FIRST '?' before any '#': `^[^#]*\?` is greedy and
    // would anchor on the LAST '?', silently dropping params before a
    // literal '?' inside the query (http://ex.com/p?a=1?x=2 → ?x=2);
    // and a bare "\\?" would match inside the fragment and leak
    // fragment content into the canonical form
    val q = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val parts = filter(
      split(q, "&"),
      kv => kv =!= "" && !kv.rlike("^(utm_[^=]*|fbclid|gclid)(=|$)"))
    when(size(parts) > 0, concat(lit("?"), array_join(array_sort(parts), "&")))
      .otherwise(lit(""))
  }

  /** Decode the RFC 3986 UNRESERVED percent-escapes (ALPHA / DIGIT /
    * "-" / "." / "_" / "~", both hex cases) of a URL column in ONE
    * left-to-right pass — the escapes that are ALWAYS safe to decode
    * (`%7Euser` ≡ `~user`); decoding a reserved escape (`%2F`) would
    * change URL structure, so those keep their bytes. Native codegen'd
    * kernel ([[graft.functions.PercentDecodeUnreserved]]): the
    * original 66-pattern regexp_replace chain was the 100× sweep's
    * worst regression AND cascaded on adversarial input (`%7%41` →
    * `z` — the `%41`→`A` pass manufactures a new `%7A` escape for a
    * later pass; a single pass decodes each SOURCE escape once:
    * `%7%41` → `%7A`). */
  def percentDecodeUnreserved(url: Column): Column =
    graft.functions.PercentDecodeUnreserved.percentDecodeUnreserved(url)

  /** HOF twin of [[percentDecodeUnreserved]] — split on '%', decode
    * each piece's leading hex pair iff unreserved. Single-pass by
    * construction (every '%' in the INPUT heads exactly one piece, so
    * no decoded output can be re-decoded). Retained as the kernel's
    * equivalence oracle (UrlsSpec). */
  private[ops] def percentDecodeUnreservedHof(url: Column): Column = {
    val parts = split(url, "%", -1)
    // decode each piece after the first: leading 2 hex digits that
    // decode to an unreserved char → chr(code) ++ rest, else restore '%'
    val decoded = transform(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))),
      s => {
        val hex = substring(s, 1, 2)
        val code = conv(hex, 16, 10).cast("int")
        val isUnres = hex.rlike("^[0-9A-Fa-f]{2}$") && (
          code.between(65, 90) || code.between(97, 122) ||
            code.between(48, 57) || code.isin(45, 46, 95, 126))
        when(isUnres, concat(chr(code), substring(s, 3, 1000000)))
          .otherwise(concat(lit("%"), s))
      })
    concat(element_at(parts, 1), array_join(decoded, ""))
  }

  /** DuckDB SQL for [[percentDecodeUnreserved]] — the same
    * split-on-'%' single-pass formulation as the HOF twin, so engine
    * and oracle share semantics by construction. */
  def percentDecodeUnreservedSql(expr: String): String = {
    val p = s"str_split($expr, '%')"
    val code = "('0x' || substr(s, 1, 2))::INT"
    val isUnres = s"regexp_matches(s, '^[0-9A-Fa-f]{2}') AND " +
      s"(($code BETWEEN 65 AND 90) OR ($code BETWEEN 97 AND 122) OR " +
      s"($code BETWEEN 48 AND 57) OR $code IN (45, 46, 95, 126))"
    s"($p[1] || array_to_string(list_transform($p[2:], " +
      s"s -> CASE WHEN $isUnres THEN chr($code) || substr(s, 3) " +
      s"ELSE '%' || s END), ''))"
  }

  /** The canonical form of a URL column (see the object doc for the
    * exact contract; unreserved percent-escapes are decoded FIRST —
    * decoded characters are never structural, so the downstream
    * scheme/path/query parsing is unaffected). Non-URL strings (no
    * `scheme://`) normalize to NULL — the caller's signal to
    * quarantine the row. */
  def normalizeUrl(url: Column): Column = {
    val u = percentDecodeUnreserved(url)
    when(
      u.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(lowerAuthority(u), normPath(u), normQuery(u)))
  }

  /** Lowercased host of a URL (userinfo and port stripped). Userinfo
    * runs to the authority's LAST `@` ('@' is illegal in a host), so
    * `http://user:pw@host.com/x` yields `host.com`, not `user` — a
    * blocklisted domain cannot smuggle past [[filterBlockedDomains]]
    * behind credentials. Native single-pass kernel
    * ([[graft.functions.UrlHost]]); [[hostCols]] is the retained
    * regex-chain twin and equivalence oracle (UrlKernelSpec). */
  def host(url: Column): Column = graft.functions.UrlHost.urlHost(url)

  /** Regex-chain twin of [[host]] — the equivalence oracle. `(?s)` and
    * `\z` matter: the byte kernel scans the WHOLE authority, so the
    * userinfo strip must cross line terminators (default-mode `.`
    * stops at '\n') and the port strip must anchor at true end-of-input
    * (default-mode `$` also matches before a trailing '\n') — without
    * them the twin diverges on authorities containing \r/\n (ADVICE
    * r17; the UrlKernelSpec generators now emit such inputs). */
  private[graft] def hostCols(url: Column): Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val h = lower(regexp_replace(regexp_replace(auth, "(?s)^.*@", ""), ":[0-9]*\\z", ""))
    when(h =!= "", h)
  }

  /** Pinned subset of the Mozilla Public Suffix List (ICANN section,
    * publicsuffix.org): the widely-registered TWO-LABEL public suffixes
    * under which third-level names are what a registrant actually owns
    * (`example.co.uk`, not `co.uk`). A deployment tracking the full
    * list (incl. 3-label suffixes and wildcard rules) swaps this
    * constant for the published file — the plan shape (a literal IN
    * set folded into codegen) is unchanged. */
  private[ops] val publicSuffixes2: Seq[String] =
    graft.functions.UrlKernels.publicSuffixes2

  /** Registrable domain per the pinned PSL subset: if the host's last
    * TWO labels are a public suffix (`co.uk`), the registrable domain
    * is the last THREE labels (`example.co.uk`); otherwise the last
    * two (`example.com`). A host that IS a bare public suffix (or a
    * bare TLD / single label) passes through unchanged — this operator
    * is total by design (the strict PSL returns "no registrable
    * domain" there; a crawl rollup wants a non-null group key).
    * Userinfo and port are stripped via [[host]]. Native single-pass
    * kernel ([[graft.functions.UrlRegistrableDomain]]);
    * [[registrableDomainCols]] is the retained twin and equivalence
    * oracle (UrlKernelSpec). */
  def registrableDomain(url: Column): Column =
    graft.functions.UrlRegistrableDomain.registrableDomain(url)

  /** Column-chain twin of [[registrableDomain]] — the equivalence
    * oracle. */
  private[graft] def registrableDomainCols(url: Column): Column = {
    val h = hostCols(url)
    val labels = split(h, "\\.")
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(size(labels) >= 3 && last2.isin(publicSuffixes2: _*),
      concat_ws(".",
        element_at(labels, -3), element_at(labels, -2), element_at(labels, -1)))
      .when(size(labels) >= 2, last2)
      .otherwise(h)
  }

  /** Canonicalize, then per-registrable-domain rollup: page count,
    * distinct canonical URLs, dup rate (1 − distinct/count). ONE
    * map-side-combinable aggregate over the canonical projection — the
    * only exchange is the per-domain combine, which is as small as the
    * domain cardinality. */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val canon = normalizeUrl(col(urlCol))
    df.select(registrableDomain(col(urlCol)).as("domain"), canon.as("__u"))
      .where(col("domain").isNotNull)
      .groupBy("domain")
      .agg(
        count(lit(1)).as("n_pages"),
        countDistinct(col("__u")).as("n_unique_urls"))
      .withColumn(
        "dup_rate",
        round(lit(1.0) - col("n_unique_urls").cast("double") / col("n_pages").cast("double"), 4))
  }

  /** Drop rows whose registrable domain is on the blocklist. Small
    * blocklists fold into the plan as a literal IN-set (no join at
    * all); callers with huge lists use a broadcast anti-join instead —
    * [[Decontaminate]]'s gate pattern. */
  def filterBlockedDomains(df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame = {
    require(blocked.size <= 10000,
      s"literal IN-set capped at 10k domains (got ${blocked.size}) — use a broadcast anti-join")
    df.where(!registrableDomain(col(urlCol)).isin(blocked.map(_.toLowerCase): _*) ||
      registrableDomain(col(urlCol)).isNull)
  }

  /** URL-keyed dedup: keep the smallest `idCol` per canonical URL — the
    * crawl-side exact dedup that runs before any content hash (a
    * canonical-URL collision IS a duplicate fetch). Same
    * deterministic-keep-first contract as [[DedupDocs.dedupExact]]. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val canon = normalizeUrl(col(urlCol))
    val w = Window.partitionBy(canon).orderBy(col(idCol))
    // rows with an unparseable URL canonicalize to NULL — they are NOT
    // duplicates of each other (quarantine contract), so they pass
    // through unconditionally instead of collapsing into the shared
    // NULL window partition
    df.withColumn("__rn", row_number().over(w))
      .where(canon.isNull || col("__rn") === 1)
      .drop("__rn")
  }

  /** Resolve an href against its page's base URL (RFC 3986 §5 subset —
    * the cases a crawler meets; no dot-segment collapse, so `../x`
    * resolves to the EQUIVALENT un-collapsed `dir/../x` form):
    *   - absolute (`scheme://…`) → itself
    *   - protocol-relative (`//host/…`) → base scheme + href
    *   - root-relative (`/path`) → base origin + href
    *   - query-relative (`?page=2`) → base origin + base PATH + href
    *     (RFC 3986 §5.3: same path, replaced query — the common
    *     pagination link; routing it through the path-relative fallback
    *     would silently drop the final path segment)
    *   - path-relative (`sub/p.html`) → base origin + base dir + href
    *   - empty / fragment-only / other schemes (`mailto:` …) → NULL
    * NULL for an unparseable base. Native single-pass kernel
    * ([[graft.functions.ResolveHref]]); [[resolveHrefCols]] is the
    * retained twin and equivalence oracle (UrlKernelSpec). */
  private[graft] def resolveHref(href: Column, base: Column): Column =
    graft.functions.ResolveHref.resolveHref(href, base)

  /** Column-chain twin of [[resolveHref]] — the equivalence oracle. */
  private[graft] def resolveHrefCols(href: Column, base: Column): Column = {
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val basePath = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val baseDir = when(basePath === "", lit("/"))
      .otherwise(regexp_replace(basePath, "/[^/]*$", "/"))
    val h = trim(href)
    when(scheme === "" || origin === "", lit(null).cast("string"))
      .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), h)
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"), concat(origin, h))
      .when(h.startsWith("?"), concat(origin, basePath, h))
      .when(h === "" || h.startsWith("#"), lit(null).cast("string"))
      .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null).cast("string")) // mailto:, javascript:
      .otherwise(concat(origin, baseDir, h))
  }

  /** Outbound links of an HTML column: every quoted `href` attribute
    * (either quote style, attribute name case-insensitive), resolved
    * against `baseCol` with [[resolveHref]], http(s) targets only.
    * Output: `carry` columns + `url` (one row per link — a stateless
    * explode, zero shuffle; the crawl-graph front end). The href scan
    * is the native [[graft.functions.HrefValues]] kernel;
    * [[hrefValuesCols]] retains the regex formulation as its
    * equivalence oracle (UrlKernelSpec). */
  def extractLinks(df: DataFrame, htmlCol: String, baseCol: String, carry: Seq[String]): DataFrame = {
    val hrefs = graft.functions.HrefValues.hrefValues(col(htmlCol))
    df.select((carry.map(col) :+ col(baseCol).as("__b") :+ explode(hrefs).as("__h")): _*)
      .select((carry.map(col) :+ resolveHref(col("__h"), col("__b")).as("url")): _*)
      .where(col("url").isNotNull && col("url").rlike("^(?i)https?://"))
  }

  /** Regex twin of [[graft.functions.HrefValues]] — the equivalence
    * oracle (backreference pairs the quote style; group 2 is the href
    * value). */
  private[graft] def hrefValuesCols(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href\\s*=\\s*([\"'])(.*?)\\1"), lit(2))

  /** Outbound links WITH their anchor text: full `<a …>text</a>`
    * elements (either quote style, attribute case-insensitive, text may
    * span lines), href resolved against `baseCol` with [[resolveHref]],
    * http(s) targets only; inner markup (`<b>`, spans) is stripped from
    * the text. Output: `carry` columns + `url` + `anchor` — one row per
    * link, a stateless explode like [[extractLinks]] (zero shuffle).
    * The two `regexp_extract_all` calls share one pattern, so the href
    * and text arrays are position-aligned by construction. */
  def extractLinksWithText(
      df: DataFrame, htmlCol: String, baseCol: String, carry: Seq[String]): DataFrame = {
    val pat = lit("(?is)<a\\s[^>]*?href\\s*=\\s*([\"'])(.*?)\\1[^>]*>(.*?)</a>")
    val hrefs = regexp_extract_all(col(htmlCol), pat, lit(2)).as("h")
    val texts = regexp_extract_all(col(htmlCol), pat, lit(3)).as("t")
    df.select((carry.map(col) :+ col(baseCol).as("__b") :+
        explode(arrays_zip(hrefs, texts)).as("__ht")): _*)
      .select((carry.map(col) :+
        resolveHref(col("__ht.h"), col("__b")).as("url") :+
        trim(regexp_replace(col("__ht.t"), "<[^>]*>", "")).as("anchor")): _*)
      .where(col("url").isNotNull && col("url").rlike("^(?i)https?://"))
  }

  /** Anchor-text term rollup per DESTINATION domain — the classic
    * anchor-text relevance/label signal (what the web calls a page is
    * often a better topic label than the page itself; search engines
    * and crawl-curation quality priors both key on it). Terms are the
    * lowercased alphanumeric runs of each anchor; top `topM` terms per
    * registrable destination domain by (count desc, term asc).
    *
    * Plan: stateless link+term explode → ONE map-side-combinable
    * (domain, term) count → a window per domain partition. The
    * exchange is bounded by the distinct (domain, term) cardinality,
    * not the page count — the same scaling argument as
    * [[domainStats]]/[[domainEdges]]. */
  def anchorTermStats(
      df: DataFrame, htmlCol: String, baseCol: String, topM: Int): DataFrame = {
    require(topM > 0, s"topM must be positive, got $topM")
    val links = extractLinksWithText(df, htmlCol, baseCol, carry = Seq.empty)
    val terms = links
      .select(
        registrableDomain(col("url")).as("dst_domain"),
        explode(split(lower(col("anchor")), "[^a-z0-9]+")).as("term"))
      .where(col("dst_domain").isNotNull && col("term") =!= "")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("dst_domain")).orderBy(col("n").desc, col("term").asc)
    terms
      .groupBy("dst_domain", "term")
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topM)
  }

  /** Parse robots.txt-style documents into per-host path rules: one
    * row per `Allow:`/`Disallow:` directive — `(domain, rule_type,
    * path_prefix)` with `rule_type ∈ {"allow", "disallow"}`. Case-
    * insensitive directive names; the value stops at whitespace or an
    * inline `#` comment (a literal `#` never occurs in a path — it
    * delimits the fragment); empty-value directives (`Disallow:` =
    * "allow everything") are no-op rows and are dropped. `domainCol`
    * carries the HOST the robots file was fetched from — robots.txt
    * scope is per-host (RFC 9309 §2.3), and [[filterDisallowedPaths]]
    * joins on the URL's host verbatim. Stateless extract + explode,
    * zero shuffle. Documented subset: rules of ALL user-agent groups
    * are honored together (the conservative read a bulk crawler takes
    * — no per-agent group resolution). */
  def parseRobotsRules(df: DataFrame, robotsCol: String, domainCol: String): DataFrame =
    df.select(
        col(domainCol).as("domain"),
        explode(regexp_extract_all(
          col(robotsCol),
          lit("(?im)^[ \\t]*(?:Allow|Disallow)[ \\t]*:[ \\t]*[^\\s#]+"), lit(0)))
          .as("__line"))
      .select(
        col("domain"),
        lower(regexp_extract(col("__line"), "(?i)^[ \\t]*(Allow|Disallow)", 1))
          .as("rule_type"),
        regexp_extract(col("__line"), "(?i)^[ \\t]*(?:Allow|Disallow)[ \\t]*:[ \\t]*([^\\s#]+)", 1)
          .as("path_prefix"))
      .where(col("path_prefix") =!= "")

  /** Regex compiled from a robots path pattern: every regex metachar
    * escaped, then `*` → `.*` (any sequence, RFC 9309 §2.2.3) and a
    * TRAILING `$` → end anchor (elsewhere `$` is literal), anchored at
    * the path start. */
  private def robotsPatternRegex(pat: Column): Column = {
    val esc = regexp_replace(pat, "([\\\\.\\[\\]{}()*+?^$|])", "\\\\$1")
    val wild = regexp_replace(esc, "\\\\\\*", ".*")
    val anch = regexp_replace(wild, "\\\\\\$$", "\\$")
    concat(lit("^"), anch)
  }

  /** Drop URLs a robots rule set forbids — the crawl-policy gate
    * between frontier and fetch (or, curation-side, the retroactive
    * policy filter over an already-fetched corpus). `rules` is
    * [[parseRobotsRules]] output `(domain, rule_type, path_prefix)`,
    * keyed by HOST; the URL's full lowercased host (port and userinfo
    * stripped) is the join key — a rule set fetched from `sub.ex.com`
    * governs `sub.ex.com` only, per RFC 9309 §2.3.
    *
    * Evaluation is the RFC 9309 §2.2.2 match: among the rules whose
    * pattern matches the URL's path (query included; `*` matches any
    * sequence, trailing `$` anchors the end), the LONGEST pattern
    * (octet length of the raw value) wins; an allow/disallow tie at
    * equal length resolves to allow; no matching rule ⇒ allowed.
    *
    * Plan: the rules side collapses to ONE row per host (collect_list
    * over the tiny rules frame, regex precompiled per rule before the
    * collapse), then ONE equi left join on the host key — broadcast in
    * the common case — and the verdict is a per-row HOF fold over the
    * host's bounded rule array (`array_max` over (len, is_allow)
    * structs = longest-match-wins with allow tie-break, by struct
    * ordering). The corpus is never exploded per rule. Wildcard-free
    * rules take a `startsWith` fast path; only wildcard rules pay the
    * per-row regex. A URL with no parseable host passes (quarantine
    * handled elsewhere — this operator answers only "does a rule
    * forbid it"). */
  def filterDisallowedPaths(df: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val perHost = rules
      .select(
        col("domain"),
        struct(
          col("path_prefix").as("pat"),
          robotsPatternRegex(col("path_prefix")).as("rx"),
          (col("path_prefix").contains("*") || col("path_prefix").endsWith("$")).as("wild"),
          length(col("path_prefix")).as("len"),
          (col("rule_type") === "allow").as("is_allow")).as("__rule"))
      .groupBy(col("domain").as("__r_dom"))
      .agg(collect_list(col("__rule")).as("__rules"))
    val rawPath = regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val joined = df
      .withColumn("__host", host(col(urlCol)))
      .withColumn("__path", path)
      .join(perHost, col("__host") === col("__r_dom"), "left")
    val matched = filter(
      col("__rules"),
      r =>
        when(r.getField("wild"), regexp_like(col("__path"), r.getField("rx")))
          .otherwise(col("__path").startsWith(r.getField("pat"))))
    val best = array_max(
      transform(matched, r => struct(r.getField("len").as("len"), r.getField("is_allow").as("is_allow"))))
    joined
      .where(col("__rules").isNull || best.isNull || best.getField("is_allow"))
      .drop("__host", "__path", "__r_dom", "__rules")
  }

  /** Domain-level crawl graph: [[extractLinks]] rolled up to
    * (src_domain, dst_domain, n_links) over registrable domains — the
    * edge list [[graft.ops.Graph.pagerank]] consumes for authority
    * scoring. ONE map-side-combinable aggregate past the stateless
    * link explode; edge cardinality (≤ domains²) bounds the exchange,
    * not the page count. */
  def domainEdges(df: DataFrame, htmlCol: String, baseCol: String): DataFrame =
    extractLinks(df, htmlCol, baseCol, carry = Seq(baseCol))
      .select(
        registrableDomain(col(baseCol)).as("src_domain"),
        registrableDomain(col("url")).as("dst_domain"))
      .where(col("src_domain").isNotNull && col("dst_domain").isNotNull)
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))

  /** Politeness-aware frontier schedule: assign every URL a
    * deterministic fetch slot so no host is hit more than once per
    * `delayUs` — the RFC 9309 crawl-delay contract turned into a
    * data-parallel plan a fetcher fleet can consume by simply
    * filtering its time window. Per host: `fetch_seq` (1-based) in
    * bytewise URL order, `fetch_at_us = offset + (seq − 1)·delayUs`,
    * where `offset = md5(host) mod delayUs` de-synchronizes hosts so
    * the fleet's aggregate request rate is flat instead of pulsing on
    * the delay boundary (every host firing at t ≡ 0 otherwise).
    *
    * ONE exchange on the host key; a host's URLs sort within its own
    * partition slice — inherent to a per-host ordered schedule, and a
    * million-URL host occupies its fetchers for 10⁶·delay regardless,
    * so the sort is never the bottleneck. The schedule is a pure
    * function of (host, url, delayUs): retries, repartitions, and
    * re-runs regenerate the identical timetable. */
  def politenessSchedule(
      urls: DataFrame,
      urlCol: String,
      hostCol: String,
      delayUs: Long
  ): DataFrame = {
    require(delayUs >= 1, s"delayUs must be >= 1, got $delayUs")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(hostCol)).orderBy(col(urlCol))
    val offset = pmod(
      conv(substring(md5(col(hostCol).cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(delayUs))
    urls
      .where(col(urlCol).isNotNull && col(hostCol).isNotNull)
      .withColumn("fetch_seq", row_number().over(w))
      .withColumn("fetch_at_us", offset + (col("fetch_seq") - 1) * lit(delayUs))
  }
}
