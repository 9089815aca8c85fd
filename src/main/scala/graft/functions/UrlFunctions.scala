package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the CCNet/RefinedWeb
  * step ahead of URL-level dedup and per-domain statistics: the same
  * page arrives under `HTTP://Www.Site.com:80/a?utm_source=x&b=2&a=1#s`
  * and `http://www.site.com/a?a=1&b=2`, and a 100 TB crawl dedups on
  * the CANONICAL form, never the raw string.
  *
  * Everything here is a pure per-row expression (codegen'd regexp /
  * array ops, no UDF): canonicalizing a crawl is a scan, and the
  * per-domain aggregation downstream shuffles 8-byte hashes and short
  * hosts, never page text.
  *
  * Canonical form (documented policy, mirrored bit-for-bit by the
  * DuckDB oracle):
  *   - scheme and host lowercased; an explicit default port (`:80` for
  *     http, `:443` for https) drops, any other explicit port stays;
  *   - fragment drops;
  *   - query parameters: tracking params drop (`utm_*`, `fbclid`,
  *     `gclid`, `msclkid`, `ref` — matched case-sensitively on the
  *     lowercase names, the forms trackers actually emit), survivors
  *     sort bytewise and rejoin (duplicate keys kept — `a=0&a=1` is
  *     order-normalized, not collapsed);
  *   - an empty path becomes `/`;
  *   - percent-encoding and path case are preserved (case-sensitive by
  *     RFC 3986; decoding is NOT attempted — a decoder that guesses
  *     charsets un-canonicalizes as often as it canonicalizes).
  */
object UrlFunctions {

  /** Tracking-parameter name pattern (anchored at the param start,
    * through the `=`). Public so callers can see exactly what drops.
    */
  val trackingParamPattern = "^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|ref)="

  /** Lowercased scheme of a `scheme://...` URL ('' when absent). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host without the port ('' when unparseable). */
  def urlHost(url: Column): Column = {
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    lower(regexp_replace(regexp_extract(rest, "^([^/?#]*)", 1), ":[0-9]+$", ""))
  }

  /** The canonical URL per the object policy. Input must carry a
    * scheme (crawl records do); a scheme-less string canonicalizes to
    * a host-less form the caller should treat as invalid.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val host = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val pathqf = rest.substr(length(hostport) + 1, length(rest))
    val path0 = regexp_extract(pathqf, "^([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathqf, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern))
    val sortedQuery = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQuery =!= "", concat(lit("?"), sortedQuery))
        .otherwise(lit("")))
  }
}
