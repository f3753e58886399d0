package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation operators — the stage every web-crawl
  * training pipeline runs BEFORE text analysis: canonicalize the URL,
  * dedup captures of the same page, cap per-domain volume, and drop
  * blocklisted hosts (C4 §2.2 keeps one page per URL; FineWeb and
  * RefinedWeb add per-domain caps and the UT1 host blocklist; Dolma
  * documents the same three steps). The reference engine has no web
  * layer — this is §2.5b beyond-reference surface, same posture as
  * Dedup/Selection.
  *
  * Scale shapes (the part that matters at 100 TB):
  *  - [[canonicalUrl]] / [[hostOf]] / [[registeredDomain]] are pure
  *    column expressions — map-only, codegen'd, no UDF, no shuffle;
  *    they ride the scan like every other metric kernel here.
  *  - [[dropDuplicateUrls]] is ONE hash aggregation on the canonical
  *    URL (max_by, a declarative aggregate with a map-side partial),
  *    not a window: no per-group sort, no skewed-partition sort
  *    buffer. A mega-URL (a crawler bug that captures one URL 10⁹
  *    times) costs a combine, not a single-reducer sort.
  *  - [[capPerDomain]] reuses Selection.topKPerGroup (one shuffle on
  *    the registered domain).
  *  - [[dropBlockedHosts]] never LIKE-scans: the host explodes into
  *    its ≤ maxSuffixLabels dot-suffixes (a bounded ×k flatmap) and
  *    the match is an EQUI-join against the blocklist. Below
  *    `spark.graft.web.blocklistBroadcastThreshold` entries the join
  *    collapses further to a map-only `arrays_overlap` against a
  *    plan-literal set — zero shuffle, the q_bloom_decontam posture.
  *
  * Canonicalization contract (deterministic, idempotent — WebSpec
  * pins canon∘canon = canon):
  *  1. drop the fragment;
  *  2. scheme lowercased;
  *  3. host lowercased, the trailing-dot run stripped (`example.com.`
  *     is the same FQDN as `example.com`), the leading `www.`-label
  *     RUN stripped (the whole run, not one label — a single strip is
  *     not idempotent on crawler-noise hosts like `www.www.e.com`),
  *     default port (`:443` for https, `:80` for http) stripped,
  *     other ports kept (an IPv6 `[...]` authority passes through the
  *     port logic unharmed — the port regex needs a trailing digit);
  *  4. trailing `/`-run stripped from the path (root collapses to
  *     no path: `https://a.com/` ≡ `https://a.com`);
  *  5. query split on `&`; empty params and tracking params
  *     ([[TrackingKeyRe]]: utm_*, fbclid, gclid, msclkid, mc_cid,
  *     mc_eid, ref, ref_src, igshid — matched on the LOWERCASED key,
  *     `UTM_SOURCE` is the same tracker) dropped; survivors sorted
  *     lexicographically (binary, the cross-engine-stable order) and
  *     rejoined — no `?` when none survive.
  * Input must be an absolute URL (`scheme://…`); percent-encoding is
  * preserved as-is (decoding is NOT canonicalization-safe: `%2F` in a
  * path segment is not `/`).
  */
object Web {

  /** Tracking-parameter keys dropped by [[canonicalUrl]] — the
    * analytics/click-id params that vary per referral without changing
    * the page. Anchored full-key match. */
  val TrackingKeyRe: String =
    "^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)$"

  /** Heuristic public-suffix set for [[registeredDomain]] — the
    * common two-label suffixes (ccTLD second-level registries). A
    * production deployment swaps in the full Public Suffix List as a
    * reference table; the ALGORITHM (longest known suffix + one
    * label) is the PSL algorithm either way, and the suffix set is a
    * parameter so callers can pass their own. */
  val DefaultPublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.kr", "co.za", "com.sa", "com.eg", "com.ng",
    "co.id", "com.my", "com.ph", "com.vn", "com.pk", "com.bd")

  /** Authority (host[:port]) of an absolute URL, original case. */
  private def authorityOf(url: Column): Column = {
    val defrag = regexp_replace(url, "#.*$", "")
    val rest = regexp_replace(defrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    regexp_extract(rest, "^([^/?]*)", 1)
  }

  /** Lowercased host of an absolute URL: authority minus port, minus
    * the leading `www.`-label run. Map-only column expression. */
  def hostOf(url: Column): Column = {
    val hostPort = lower(authorityOf(url))
    regexp_replace(
      regexp_replace(
        regexp_replace(hostPort, ":[0-9]+$", ""), "\\.+$", ""),
      "^(www\\.)+", "")
  }

  /** Canonical form of an absolute URL — see the object scaladoc for
    * the five normalization rules. Pure `functions._` composition
    * (regexp single-match by construction, so Spark's replace-all and
    * an engine's replace-first agree), codegen-friendly, no UDF. */
  def canonicalUrl(url: Column): Column = {
    val defrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(defrag, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(defrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val authority = regexp_extract(rest, "^([^/?]*)", 1)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val hostPort = lower(authority)
    val host = regexp_replace(
      regexp_replace(
        regexp_replace(hostPort, ":[0-9]+$", ""), "\\.+$", ""),
      "^(www\\.)+", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80"),
      lit("")).otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = when(pathq.contains("?"),
      regexp_replace(pathq, "^[^?]*\\?", "")).otherwise(lit(""))
    val params = array_sort(filter(split(query, "&"), p =>
      length(p) > 0 &&
        !lower(regexp_extract(p, "^([^=]*)", 1)).rlike(TrackingKeyRe)))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** eTLD+1 of a lowercased host (PSL algorithm over a heuristic
    * suffix set): last-two labels unless they are a known public
    * suffix, in which case last-three. Hosts with ≤ 2 labels (or a
    * bare known suffix) pass through whole, and so do IPv4-literal
    * hosts — `192.168.0.1` has no registered domain; truncating it to
    * `0.1` would merge unrelated addresses under one cap/blocklist
    * key. Map-only. */
  def registeredDomain(host: Column,
                       suffixes: Seq[String] = DefaultPublicSuffixes): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(n <= lit(2) || host.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"), host)
      .when(last2.isin(suffixes: _*), last3)
      .otherwise(last2)
  }

  /** All dot-suffixes of `host` with at most `maxLabels` labels, as
    * an array — `a.b.c.d` → [`a.b.c.d`,`b.c.d`,`c.d`,`d`]. The label
    * cap bounds the flatmap against an adversarial 10⁴-label host
    * (same rationale as the band indexes' maxBucket): blocklist
    * entries longer than `maxLabels` labels cannot match, which
    * [[dropBlockedHosts]] enforces on the blocklist side. */
  def hostSuffixes(host: Column, maxLabels: Int = 10): Column = {
    require(maxLabels >= 1, "maxLabels must be >= 1")
    val labels = split(host, "\\.")
    val n = size(labels)
    transform(
      sequence(greatest(lit(0), n - lit(maxLabels)), n - lit(1)),
      i => array_join(slice(labels, i + lit(1), n - i), "."))
  }

  /** Keep ONE row per canonical URL: highest `scoreCol` (non-null by
    * contract), ties broken by ascending `idCol` (unique by contract)
    * — the C4 "one page per URL, keep the best capture" step,
    * deterministic under re-runs. ONE aggregation with a map-side
    * partial and no sort: the built-in `max_by`/`max(struct)` put a
    * struct in the aggregation buffer and sink the plan into
    * SortAggregateExec (the exact fallback PlanAuditSpec forbids), so
    * this routes through [[graft.functions.ExtremumByAgg]] →
    * ObjectHashAggregateExec, the ReduceExprs argmin/argmax posture.
    * The canonical URL is appended as `outCol`. */
  def dropDuplicateUrls(df: DataFrame, urlCol: String, idCol: String,
                        scoreCol: String,
                        outCol: String = "canonical_url"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    val withCanon = df.withColumn(outCol, canonicalUrl(col(urlCol)))
    val payload = struct(withCanon.columns.map(col): _*)
    // max of (score, -id) = highest score, then LOWEST id
    val ord = struct(col(scoreCol), col(idCol).cast("long") * lit(-1L))
    val best = withCanon.groupBy(col(outCol).as("__canon_key"))
      .agg(graft.functions.VectorExprs
        .extremumBy(payload, ord, isMax = true).as("__best"))
    best.select(withCanon.columns.map(c => col(s"__best.`$c`").as(c)): _*)
  }

  /** At most `k` rows per registered domain, best `scoreCol` first
    * (ties: ascending `tieCol`) — the FineWeb-style per-domain volume
    * cap. One shuffle on the domain. */
  def capPerDomain(df: DataFrame, urlCol: String, scoreCol: String,
                   tieCol: String, k: Int,
                   suffixes: Seq[String] = DefaultPublicSuffixes,
                   domainCol: String = "domain"): DataFrame = {
    require(!df.columns.contains(domainCol),
      s"output column '$domainCol' already exists in the input")
    val withDom = df.withColumn(domainCol,
      registeredDomain(hostOf(col(urlCol)), suffixes))
    Selection.topKPerGroup(withDom, domainCol, scoreCol, tieCol, k)
  }

  /** Drop rows whose host matches the blocklist by domain-suffix
    * semantics (entry `d` blocks host `d` and every `*.d` — the UT1 /
    * FineWeb convention). `blocked` is one string column of
    * lowercased entries.
    *
    * Never a LIKE scan: the host's bounded suffix set is matched by
    * EQUALITY. Two tiers, size-gated like Dedup's broadcasts:
    *  - blocklist count ≤ `spark.graft.web.blocklistBroadcastThreshold`
    *    (default 100k): collect to a plan-literal array and filter
    *    with `arrays_overlap` — map-only, no shuffle, pushes past
    *    column pruning;
    *  - larger: explode the suffixes and LEFT SEMI join the blocklist
    *    (broadcast-eligible under AQE) to get blocked ids, then LEFT
    *    ANTI on `idCol` — corpus rows never fan out through a shuffle
    *    wider than ×maxSuffixLabels, and only ids travel.
    * Entries with more labels than `maxSuffixLabels` cannot match the
    * generated suffixes and are refused loudly rather than silently
    * ignored. */
  def dropBlockedHosts(df: DataFrame, urlCol: String, idCol: String,
                       blocked: DataFrame,
                       maxSuffixLabels: Int = 10): DataFrame = {
    require(blocked.columns.length == 1,
      s"blocklist must have exactly one column, got ${blocked.columns.toSeq}")
    val spark = df.sparkSession
    val dcol = blocked.columns.head
    val threshold = spark.conf
      .getOption("spark.graft.web.blocklistBroadcastThreshold")
      .map(_.toLong).getOrElse(100000L)
    // normalize entries the way hosts are normalized (lowercase, no
    // surrounding whitespace, no trailing FQDN dot) — a mixed-case or
    // 'Example.COM.' blocklist row must still block example.com
    val entries = blocked
      .select(regexp_replace(lower(trim(col(dcol))), "\\.+$", "")
        .as("__bl_domain"))
      .na.drop().filter(length(col("__bl_domain")) > 0).distinct()
    val tooLong = entries
      .filter(size(split(col("__bl_domain"), "\\.")) > maxSuffixLabels)
      .limit(1).collect()
    require(tooLong.isEmpty,
      s"blocklist entry '${tooLong.headOption.map(_.getString(0)).getOrElse("")}' " +
        s"has more than maxSuffixLabels=$maxSuffixLabels labels and could " +
        "never match a generated host suffix — raise maxSuffixLabels")
    val sufs = hostSuffixes(hostOf(col(urlCol)), maxSuffixLabels)
    val n = entries.count()
    if (n <= threshold) {
      // map-only tier: the blocklist is a plan literal; arrays_overlap
      // short-circuits per row, no join, no shuffle
      val set = entries.collect().map(_.getString(0))
      if (set.isEmpty) df
      else df.filter(!arrays_overlap(sufs,
        array(set.map(lit(_)).toIndexedSeq: _*)))
    } else {
      val blockedIds = df.select(col(idCol), explode(sufs).as("__suf"))
        .join(entries, col("__suf") === col("__bl_domain"), "left_semi")
        .select(idCol).distinct()
      df.join(blockedIds, Seq(idCol), "left_anti")
    }
  }
}
