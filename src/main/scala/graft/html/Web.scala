package graft.html

import graft.textops.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators — the domain-level curation stages a
  * crawl-derived training pipeline runs between raw HTML and the text
  * filters: parse URLs into host/path/registered-domain, aggregate
  * document quality per domain, derive and apply a domain blocklist,
  * and harvest outlinks into the edge list the crawl-graph analytics
  * (PageRank, components) consume.
  *
  * All parsing is codegen'd `regexp_extract` over plain columns — no
  * UDFs, no driver round-trips; the per-domain aggregation is one
  * map-side-combined groupBy keyed by registered domain (domains are
  * the canonical mild-skew key: the profile operator + salting guard
  * the giants). Quality is carried as integer micro-units so the
  * per-domain sums are immune to float summation order (the engine's
  * standard cross-engine construction).
  */
object Web {

  /** Host part of an absolute URL (empty string if no scheme). */
  def urlHost(u: Column): Column =
    regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** Path part (leading slash; empty if none). */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Last two dot-labels of a host — the registered domain under
    * single-label public suffixes (com/org/...); a full
    * public-suffix-list variant is a lookup-table join away and shares
    * this seam.
    */
  def registeredDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** All href="..." targets of an HTML fragment, document order. */
  def outlinks(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))

  /** (href, anchor) pairs of an HTML fragment's <a> tags, document
    * order. The per-element lambda touches only its own tag string (no
    * captured subtree — the HOF-CSE hazard doesn't apply).
    */
  def anchorLinks(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("<a href=\"[^\"]*\"[^>]*>[^<]*</a>"), lit(0)),
      t => struct(
        regexp_extract(t, "href=\"([^\"]*)\"", 1).as("href"),
        regexp_extract(t, ">([^<]*)</a>", 1).as("anchor")))

  /** Per-target anchor-text aggregation over a link table — the
    * classic web-graph signal (anchor text describes the TARGET page
    * better than the page itself; search and retrieval training both
    * key on it): for each link target, total inlinks, distinct linking
    * documents, and the most frequent anchor text (ties break to the
    * lexicographically smallest anchor).
    *
    * Scale shape: one map-side-combined groupBy per statistic — the
    * top-anchor window partitions over the per-target ANCHOR HISTOGRAM
    * (bounded by distinct anchor strings, not inlink count), so a page
    * with 10^8 inlinks never funnels its raw links through one task.
    */
  def anchorProfile(links: DataFrame, targetCol: String, anchorCol: String,
      srcCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byAnchor = links.groupBy(col(targetCol), col(anchorCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(targetCol))
      .orderBy(col("__cnt").desc, col(anchorCol).asc)
    val top = byAnchor.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(targetCol), col(anchorCol).as("top_anchor"))
    val stats = links.groupBy(col(targetCol)).agg(
      count(lit(1)).as("n_links"),
      countDistinct(col(srcCol)).as("n_src_docs"))
    stats.join(top, Seq(targetCol))
  }

  /** Query string (text between '?' and '#', no '?'; empty if none). */
  def urlQuery(u: Column): Column =
    regexp_extract(u, "\\?([^#]*)", 1)

  /** Canonical form of an absolute URL — the normalization a crawl
    * dedup keys on, so that trivially-distinct fetches of one page
    * collapse: scheme and host lowercased, leading `www.` and default
    * ports `:80`/`:443` stripped from the host, fragment dropped,
    * trailing slashes trimmed from the path, and tracking parameters
    * (`utm_*`, `fbclid`, `gclid`) removed from the query (remaining
    * params keep their original order). Pure codegen'd regex/array
    * columns; the one higher-order `filter` lambda touches only its
    * own element (no captured subtree — the CSE hazard doesn't apply).
    */
  def canonicalUrl(u: Column): Column = {
    // scheme-case-insensitive parse (HTTPS:// is legal on the wire;
    // urlHost/urlPath stay strict for already-normalized inputs)
    val scheme = lower(regexp_extract(u, "(?i)^([a-z][a-z0-9+.-]*)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(u, "(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val path = regexp_replace(
      regexp_extract(u, "(?i)^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1),
      "/+$", "")
    val params = filter(
      split(urlQuery(u), "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid)=") || p === ""))
    val query = array_join(params, "&")
    when(scheme === "", u) // not an absolute URL: pass through untouched
      .otherwise(concat(
        scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Drop URL-duplicate documents: key on [[canonicalUrl]], keep the
    * smallest-id row per key (deterministic winner — swap the
    * ordering column for a quality score to keep-best instead).
    * Exactly ONE shuffle: a map-side-combined `min_by(struct(*), id)`
    * aggregation on the canonical URL — no window sort, no
    * self-join. Output = input columns plus `canon_url`.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("canon_url", canonicalUrl(col(urlCol)))
    val payload = keyed.columns.filter(_ != "canon_url")
    keyed
      .groupBy(col("canon_url"))
      .agg(min_by(struct(payload.map(col): _*), col(idCol)).as("w"))
      .select(col("canon_url") +: payload.map(c => col(s"w.$c").as(c)): _*)
  }

  /** Per-registered-domain (n_docs, sum_q_micro, mean_q) where
    * quality is TextOps.qualityScore discretized to micro-units
    * before summing. One shuffle.
    */
  def domainStats(df: DataFrame, urlCol: String, textCol: String): DataFrame =
    df.select(
        registeredDomain(urlHost(col(urlCol))).as("domain"),
        floor(TextOps.qualityScore(col(textCol)) * 1e6).cast("long")
          .as("q_micro"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("q_micro")).as("sum_q_micro"))
      .withColumn("mean_q",
        col("sum_q_micro").cast("double") / lit(1e6) / col("n_docs").cast("double"))

  /** Domains whose floor-average micro-quality sits below the global
    * floor-average — integer compares only, so the cut replays
    * bit-for-bit on any engine and never overflows (no cross
    * multiplication).
    */
  def lowQualityDomains(stats: DataFrame): DataFrame = {
    val totals = stats.agg(
      sum(col("n_docs")).as("t_docs"), sum(col("sum_q_micro")).as("t_micro"))
    stats.crossJoin(broadcast(totals))
      .filter(expr("sum_q_micro div n_docs") < expr("t_micro div t_docs"))
      .select("domain")
  }

  /** Drop documents whose URL's registered domain is blocklisted —
    * broadcast anti-join (blocklists are small relative to the
    * corpus; a non-broadcastable blocklist would shuffle on the same
    * domain key).
    */
  def filterBlockedDomains(
      df: DataFrame, urlCol: String, blocked: DataFrame): DataFrame =
    df.withColumn("domain", registeredDomain(urlHost(col(urlCol))))
      .join(broadcast(blocked.select(col("domain"))), Seq("domain"), "left_anti")
}
