package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed deduplication — the first dedup pass
  * of every web-crawl curation pipeline (the same document is fetched
  * under `HTTP://WWW.x.com:80/a/` and `http://x.com/a?utm_source=feed`;
  * text-level near-dup machinery should never have to pay for copies the
  * URL already identifies).
  *
  * The canonical form applied here (each step a plain Column expression —
  * no UDF, engine-reproducible):
  *  - scheme and host lowercase; path case is PRESERVED (case-sensitive
  *    by spec)
  *  - default ports stripped (`:80` for http, `:443` for https; any other
  *    port kept)
  *  - leading `www.` stripped from the host
  *  - duplicate path slashes collapsed, trailing slashes dropped (so the
  *    root path canonicalizes to the bare authority)
  *  - fragment dropped (never sent to the server)
  *  - query params: tracking params dropped (`utm_*`, `fbclid`, `gclid`,
  *    `ref`), empties dropped, the rest SORTED (param order is
  *    server-insignificant in practice and is the #1 source of spurious
  *    URL variants) and rejoined; an emptied query loses its `?`
  *  - scheme-less input treated as `http://` (see [[ensureScheme]]) —
  *    with it the canonical form is always itself a URL, making
  *    canonicalization IDEMPOTENT (property-tested)
  *
  * Scale shape: canonicalization is a narrow per-row map (regex + one
  * bounded list sort over the params of one URL); [[dedupByUrl]] then
  * reduces per canonical URL with a map-side-combinable `min` — one
  * exchange carrying (url, id) pairs only, never document text. At 100 TB
  * the text column stays partition-local until the keep-set joins back.
  */
object UrlOps {

  private val trackingRe = "^(utm_[^=&]*|fbclid|gclid|ref)="

  /** Treat scheme-less input as `http://` — a bare `example.com/x` is
    * what crawl frontiers actually hold. Without this the canonical form
    * came out as `://example.com/x`, which is not itself a URL, so
    * re-canonicalizing COMPOUNDED garbage (`://:/example.com/x`) — a
    * non-idempotence caught by the URL-soup property test: re-running
    * the pipeline would churn every scheme-less dedup key.
    */
  private def ensureScheme(url: Column): Column =
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), url)
      .otherwise(concat(lit("http://"), url))

  /** The `scheme` part, lowercased (`http` for scheme-less input). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(ensureScheme(trim(url)),
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Canonical host: lowercased, `www.`-stripped, default port removed. */
  def urlHost(url: Column): Column = {
    val u = ensureScheme(trim(url))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    val noDefault = when(urlScheme(u) === "http",
        regexp_replace(hostport, ":80$", ""))
      .when(urlScheme(u) === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    regexp_replace(noDefault, "^www\\.", "")
  }

  /** Naive registrable domain: the last two host labels (`a.b.c.com` →
    * `c.com`). A public-suffix list would refine multi-label TLDs; the
    * two-label rule is the standard PSL-free approximation for
    * per-domain crawl stats and politeness grouping.
    */
  def urlDomain(url: Column): Column =
    regexp_extract(urlHost(url), "([^.]+\\.[^.]+)$", 1)

  /** Full canonical URL per the rules in the object doc. */
  def canonicalizeUrl(url: Column): Column = {
    val u = ensureScheme(trim(url))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val pathq = regexp_replace(rest, "^[^/?#]*", "")
    // fragment off FIRST: extracting the query from the un-stripped tail
    // let a '?' inside a fragment (`/x#a?b=1`) leak in as a query
    val nofrag = regexp_extract(pathq, "^([^#]*)", 1)
    val path = regexp_extract(nofrag, "^([^?]*)", 1)
    val query = regexp_extract(nofrag, "\\?(.*)$", 1)
    val cpath = regexp_replace(regexp_replace(path, "/{2,}", "/"), "/+$", "")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingRe))
    val cquery = array_join(array_sort(params), "&")
    concat(urlScheme(u), lit("://"), urlHost(u), cpath,
      when(cquery === "", lit("")).otherwise(concat(lit("?"), cquery)))
  }

  /** URL-keyed exact dedup: one row per canonical URL — the kept member
    * is the min id (first-crawled under a monotone id assignment), plus
    * the variant count and the canonical domain. Map-side-combinable
    * aggregate; a million-variant hot URL ships one partial row per map
    * partition.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"),
        urlDomain(col(urlCol)).as("domain"))
      .groupBy(col("canonical_url"), col("domain"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_variants"))
}
