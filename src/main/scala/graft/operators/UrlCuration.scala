package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain-level curation — the first stage of a
  * web-crawl training-data pipeline (URL-level dedup runs BEFORE content
  * dedup because it needs no text at all: CommonCrawl-style pipelines
  * drop ~30% of fetches on canonical-URL collisions alone, cf. RefinedWeb
  * §3.1 / CCNet's URL dedup pass — public pipeline literature, not the
  * reference, which has no crawl surface; this family is part of the
  * beyond-reference training-data tier).
  *
  * Everything here is a row-local chain of codegen'd built-in expressions
  * (regexp_extract / split / filter / array_sort / concat) — zero
  * shuffles for normalization, one hash shuffle keyed by the canonical
  * URL for dedup, one domain-keyed bounded-heap aggregate for capping.
  * At 100 TB the normalize step is embarrassingly parallel and the dedup
  * shuffle moves one (url_norm, id) pair per row — the same 16 B/row
  * story as [[Dedup.exact]].
  *
  * Normal form implemented (RFC 3986 §6 syntax-based normalization plus
  * the SEO-canonical extensions every crawler applies):
  *   - scheme and host lowercased (path/query case is significant);
  *   - default port stripped (`:443` for https, `:80` for http);
  *   - fragment dropped (never sent to the server);
  *   - tracking query parameters removed (`utm_*`, `ref`, `gclid`,
  *     `fbclid` — the standard kill-list);
  *   - remaining query parameters sorted bytewise (param order is
  *     almost never semantic; sorting makes `?a=1&z=2` ≡ `?z=2&a=1`);
  *   - trailing slashes collapsed off the path, empty path → `/`.
  */
object UrlCuration {

  /** Lowercased scheme (`https`), '' when the value is not a URL. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def authority(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))

  private def rawPath(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)

  private def rawQuery(url: Column): Column =
    regexp_extract(url, "\\?([^#]*)", 1)

  /** Lowercased host with the scheme's default port stripped. */
  def urlHost(url: Column): Column = {
    val auth = authority(url)
    val sch = urlScheme(url)
    when(sch === "https" && auth.endsWith(":443"),
      regexp_replace(auth, ":443$", ""))
      .when(sch === "http" && auth.endsWith(":80"),
        regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
  }

  /** Tracking parameters every crawler strips; anchored at the param
    * name so `xref=1` survives while `ref=1` dies. Portable between
    * Java regex (Spark rlike) and RE2 (DuckDB regexp_matches). */
  val TrackingParamRe = "^(utm_[^=]*|ref|gclid|fbclid)="

  private def normQuery(url: Column): Column =
    array_join(
      array_sort(filter(split(rawQuery(url), "&"),
        p => !p.rlike(TrackingParamRe) && p =!= lit(""))),
      "&")

  private def normPath(url: Column): Column = {
    val stripped = regexp_replace(rawPath(url), "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Full canonical form — one codegen'd expression tree per row. */
  def normalizeUrl(url: Column): Column = {
    val q = normQuery(url)
    concat(
      urlScheme(url), lit("://"), urlHost(url), normPath(url),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Two-label public suffixes recognized by [[registeredDomain]].
    * A plan-time literal allow-list (the full PSL is ~10k entries and
    * would ship the same way — a when-chain is fine to ~100 suffixes;
    * beyond that, broadcast-join a suffix table keyed on the candidate
    * suffix). */
  val DefaultTwoLabelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")

  /** eTLD+1 (the "registered domain"): the unit crawler politeness,
    * per-domain caps, and domain-level quality priors all key on.
    * `www.news.bbc.co.uk` → `bbc.co.uk`; `a.example.com` →
    * `example.com`. */
  def registeredDomain(host: Column,
                       twoLabelSuffixes: Seq[String] = DefaultTwoLabelSuffixes): Column = {
    val fallback = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    twoLabelSuffixes.foldRight(fallback) { (suf, els) =>
      val esc = suf.replace(".", "\\.")
      when(host.rlike("[^.]+\\." + esc + "$"),
        regexp_extract(host, "([^.]+\\." + esc + ")$", 1))
        .otherwise(els)
    }
  }

  /** Per-document canonical view: raw URL plus its normal form, host and
    * registered domain — shuffle-free, row-local. */
  def normalized(docs: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val host = urlHost(col(urlCol))
    docs.select(
      col(idCol), col(urlCol),
      normalizeUrl(col(urlCol)).as("url_norm"),
      host.as("host"),
      registeredDomain(host).as("registered_domain"))
  }

  /** URL-level dedup: group fetches by canonical URL, keep the minimum
    * id as the cluster representative. ONE shuffle keyed by the
    * normalized URL (post-normalization, so `?a=1&z=2` and
    * `?z=2&a=1#x` land in the same reducer). Emits the canonical doc
    * id and the collision count — the collision count is the crawl-
    * frequency signal quality pipelines feed back into fetch
    * scheduling. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(normalizeUrl(col(urlCol)).as("url_norm"), col(idCol))
      .groupBy("url_norm")
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).cast("long").as("n_fetches"))

  /** Per-registered-domain document cap (the CommonCrawl politeness /
    * anti-SEO-farm rule: no single domain contributes more than `cap`
    * documents). Deterministic salt-hash priority; delegates to the
    * bounded-heap quota aggregate ([[Sampling.quotaPerGroupAgg]]), so
    * the shuffle moves ≤ partitions × domains × cap candidate ids —
    * never a domain's full posting list (the measured 2× win over the
    * window plan at 1M rows/group, PERF.md round 5). */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
                cap: Int, salt: String): DataFrame = {
    val withDomain = docs.withColumn("registered_domain",
      registeredDomain(urlHost(col(urlCol))))
    // semi-join on the (unique) id alone: the quota output's domain
    // column is redundant with withDomain's, and keying the join-back on
    // it would force the regex-derived domain to be computed on both
    // sides of the shuffle
    val kept = Sampling.quotaPerGroupAgg(
      withDomain, Seq("registered_domain"), idCol, cap, salt)
      .select(col(idCol))
    // shuffle_hash with the kept-id list as build: its size is
    // domains×cap — corpus-scale in the worst case (every domain under
    // cap) while its estimate rides the explode-blind BottomK explode,
    // so an unhinted plan may broadcast it; hashing the slim 8-byte ids
    // streams the corpus side and never risks the 8 GiB limit
    withDomain.join(kept.hint("shuffle_hash"), Seq(idCol), "left_semi")
  }
}
