package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the FIRST dedup key of every crawl pipeline:
  * two fetches of one page differ in scheme/host case, default ports,
  * tracking parameters, parameter order, and fragments long before
  * their bodies differ, so corpora dedupe on the canonical URL before
  * any content fingerprint runs (CommonCrawl/C4 practice; Raffel et
  * al. 2020 dedupe pages by URL first).
  *
  * Everything here is a pure scan projection of codegen'd regex/array
  * builtins — no UDF, no java.net.URI (whose parser raises on the
  * malformed URLs a crawl is full of; these expressions just yield
  * null). The DuckDB oracle replays the same chain 1:1
  * (regexp_extract, list_filter/list_sort, array_to_string).
  */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme, null when the string isn't scheme://-shaped. */
  def schemeOf(url: Column): Column = {
    val s = lower(regexp_extract(url, SchemeRe, 1))
    when(s =!= "", s)
  }

  /** Lowercased host: authority minus userinfo and minus the SCHEME'S
    * default port (:80 only under http, :443 only under https —
    * http://host:443/ is a non-default port addressing a different
    * server and keeps it). Null for non-URLs. */
  def hostOf(url: Column): Column = {
    val auth = regexp_extract(url, SchemeRe + "([^/?#]*)", 2)
    val noUser = regexp_extract(auth, "([^@]*)$", 1)
    val stripped = when(schemeOf(url) === "http",
        regexp_replace(noUser, ":80$", ""))
      .when(schemeOf(url) === "https",
        regexp_replace(noUser, ":443$", ""))
      .otherwise(noUser)
    val h = lower(stripped)
    when(h =!= "", h)
  }

  /** Registrable-ish domain: the host with one leading `www.` label
    * dropped. (True eTLD+1 needs the public-suffix list — a corpus
    * resource, not an expression; per-domain caps/quotas group fine on
    * this.) */
  def domainOf(url: Column): Column =
    regexp_replace(hostOf(url), "^www\\.", "")

  /** Canonical form: lowercased scheme://host, path verbatim (paths
    * are case-sensitive; empty path → "/"), query parameters with
    * tracking keys (`utm_*`, `gclid`, `fbclid`, `ref`) removed and the
    * REST SORTED (param order is transport noise), fragment dropped
    * (never sent to the server). Null when scheme or host is missing —
    * a non-URL has no canonical form. */
  def canonicalizeUrl(url: Column): Column = {
    val path0 = regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 2)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // the query is what follows the FIRST '?' BEFORE any '#': a '?'
    // occurring only inside the fragment ("/p#x?y") is fragment text,
    // not a query
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)="))), "&")
    when(schemeOf(url).isNotNull && hostOf(url).isNotNull,
      concat(schemeOf(url), lit("://"), hostOf(url), path,
        when(kept =!= "", concat(lit("?"), kept)).otherwise(lit(""))))
  }

  /** [[canonicalizeUrl]] + [[domainOf]] as columns `url_canonical` and
    * `url_domain` — the projection in front of URL-level exact dedup
    * ([[Dedup.exactKeepMinId]] on `url_canonical`) and per-domain
    * caps ([[Sampling.perKeyCap]] on `url_domain`). */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("url_canonical", canonicalizeUrl(col(urlCol)))
      .withColumn("url_domain", domainOf(col(urlCol)))

  /** Harvest http(s) URLs OUT of free text — the outlink-graph /
    * citation extractor that feeds [[graft.operators.Graph.pagerank]]
    * (page → outlink edges) and per-domain reference counts, run
    * BEFORE any canonicalization: one exploded row per occurrence (a
    * page linking twice votes twice — dedupe downstream as policy,
    * not here) with the [[domainOf]] grouping key alongside. The match
    * is the crawl-practical `https?://` + non-whitespace run —
    * trailing punctuation stays attached (documented; stripping it
    * needs language-specific heuristics that belong in a cleanup
    * pass, and both engines must agree byte-for-byte anyway). Pure
    * scan projection + generator, zero shuffles.
    *
    * Output: `(idCol, url, domain)`, rows only where a URL matched. */
  def extractUrls(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(regexp_extract_all(col(textCol),
          lit("https?://[^\\s]+"), lit(0))).as("url"))
      .withColumn("domain", domainOf(col("url")))
}
