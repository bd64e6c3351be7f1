package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing and canonicalization for crawl-corpus curation — the step
  * between WARC ingest and URL-level dedup / domain-level mixing: split a
  * URL into its components, derive the registered domain (the unit crawl
  * quotas and domain mixes operate on), and rewrite to a canonical form so
  * syntactic variants of the same resource dedup together.
  *
  * Everything is pure per-row column math over RE2-compatible regexes —
  * zero shuffles at any scale, whole-stage-codegen-friendly, and mirrored
  * verbatim by the DuckDB oracle. Canonical rules (the common subset of
  * RFC 3986 §6 normalization + tracker stripping):
  *   - scheme and host lowercased (path/query case is semantic — kept)
  *   - default ports dropped (http:80, https:443)
  *   - fragment dropped
  *   - tracking params dropped (utm_*, fbclid, gclid, msclkid)
  *   - remaining query params sorted byte-wise
  *   - empty path becomes "/"
  */
object UrlOps {

  /** RE2-safe alternation of tracking-parameter names. */
  val TrackingParams: String = "utm_[a-z]+|fbclid|gclid|msclkid"

  /** Country-code second-level suffixes under which the registered domain
    * is three labels, not two (a bounded, code-reviewed subset of the
    * public-suffix list — the full list would ride along the same way). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.cn", "net.cn", "org.cn",
    "com.br", "co.in", "com.mx", "co.kr", "com.tr", "com.ar", "co.za")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*):"
  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  def host(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, AuthorityRe, 1), "^([^:]*)", 1))

  /** Explicit port as a string, "" when absent. */
  def port(url: Column): Column =
    regexp_extract(regexp_extract(url, AuthorityRe, 1), ":([0-9]+)$", 1)

  def path(url: Column): Column = {
    val p = regexp_extract(url, PathRe, 1)
    when(p === "", lit("/")).otherwise(p)
  }

  def query(url: Column): Column = regexp_extract(url, "\\?([^#]*)", 1)

  /** Query params minus trackers, byte-sorted — "" when none survive. */
  def canonicalParams(url: Column): Column = {
    val kept = array_sort(filter(split(query(url), "&"), p =>
      p =!= "" && !p.rlike(s"^($TrackingParams)=")))
    array_join(kept, "&")
  }

  def nParams(url: Column): Column =
    size(filter(split(query(url), "&"), p =>
      p =!= "" && !p.rlike(s"^($TrackingParams)=")))

  /** Registered domain: last two host labels, or last three under a
    * listed second-level suffix (co.uk etc.). */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n >= 3 && last2.isin(TwoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** Canonical URL under the rules above. */
  def canonicalize(url: Column): Column = {
    val s = scheme(url)
    val h = host(url)
    val pt = port(url)
    val defaultPort = (s === "http" && pt === "80") || (s === "https" && pt === "443")
    val portPart = when(pt === "" || defaultPort, lit("")).otherwise(concat(lit(":"), pt))
    val params = canonicalParams(url)
    val queryPart = when(params === "", lit("")).otherwise(concat(lit("?"), params))
    concat(s, lit("://"), h, portPart, path(url), queryPart)
  }
}
