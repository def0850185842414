package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain rollups — the web-crawl curation steps
  * that precede URL-level dedup and domain-level quality policy (crawl
  * frontiers and pretraining pipelines both key on the canonical URL,
  * and domain blocklists/stats are the first quality cut on a crawl).
  *
  * Everything here is a pure Column expression chain (regexp + array
  * ops, all codegen'd — no UDF), so the operators are stateless
  * projections: zero shuffle at any scale, and an oracle can respell
  * the same arithmetic in SQL. The reference engine has no web-crawl
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
  * Limitations (documented, deliberate): no percent-encoding
  * normalization, and [[registrableDomain]] is public-suffix-LITE (last
  * two host labels) — a real deployment swaps in the Mozilla PSL table
  * as a broadcast map join, same plan shape.
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

  /** The canonical form of a URL column (see the object doc for the
    * exact contract). Non-URL strings (no `scheme://`) normalize to
    * NULL — the caller's signal to quarantine the row. */
  def normalizeUrl(url: Column): Column =
    when(
      url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
      concat(lowerAuthority(url), normPath(url), normQuery(url)))

  /** Lowercased host of a URL (userinfo and port stripped). Userinfo
    * runs to the authority's LAST `@` ('@' is illegal in a host), so
    * `http://user:pw@host.com/x` yields `host.com`, not `user` — a
    * blocklisted domain cannot smuggle past [[filterBlockedDomains]]
    * behind credentials. */
  def host(url: Column): Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val h = lower(regexp_replace(regexp_replace(auth, "^.*@", ""), ":[0-9]*$", ""))
    when(h =!= "", h)
  }

  /** Public-suffix-LITE registrable domain: the last two labels of the
    * host (`a.b.example.com` → `example.com`). Swap in a broadcast PSL
    * map for exactness on multi-label suffixes (`.co.uk`). */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    when(size(labels) >= 2,
      concat_ws(".", element_at(labels, -2), element_at(labels, -1)))
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
}
