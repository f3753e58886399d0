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
  *  3. authority userinfo (`user:pass@`) dropped — credentials are
  *     not page identity; host lowercased, the trailing-dot run
  *     stripped (`example.com.`
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

  /** Shared host normalization: lowercase, trimmed, trailing-dot run
    * off, and the leading `www.`-label run off UNLESS the remainder
    * has fewer than two labels — `www.com` IS the registrable domain
    * (r18 review find), and stripping it would merge that site into
    * the bare TLD. The run strips whole or not at all: `www.www.com`
    * keeps its full form (conservative — placing it under `www.com`
    * needs the real PSL). Applied identically to crawl hosts, blocklist
    * entries, and parsed robots hosts, so every host-keyed join in
    * the family compares the same form. */
  def normalizeHost(h: Column): Column = {
    val base = regexp_replace(lower(trim(h)), "\\.+$", "")
    val stripped = regexp_replace(base, "^(www\\.)+", "")
    when(size(split(stripped, "\\.")) >= 2, stripped).otherwise(base)
  }

  /** Strip RFC 3986 userinfo (`user:pass@`) from an authority —
    * credentials are not page identity: `https://user@example.com/`
    * must dedup against, blocklist as, and rank under `example.com`
    * (r18 verdict's un-swept edge, r19 ADVICE fix). The authority is
    * already `/`-free, so `^[^@]*@` can only match userinfo. */
  private def stripUserinfo(authority: Column): Column =
    regexp_replace(authority, "^[^@]*@", "")

  /** Lowercased host of an absolute URL: authority minus userinfo and
    * port, [[normalizeHost]]-normalized. Map-only column expression. */
  def hostOf(url: Column): Column =
    normalizeHost(regexp_replace(
      stripUserinfo(lower(authorityOf(url))), ":[0-9]+$", ""))

  /** Path-and-query of an absolute URL (`/a/b?x=1` — fragment
    * dropped, empty path → `/`), the string robots rules match
    * against (RFC 9309 matches the path with query). Map-only. */
  def pathOf(url: Column): Column = {
    val defrag = regexp_replace(url, "#.*$", "")
    val rest = regexp_replace(defrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    when(length(pathq) === 0, lit("/")).otherwise(pathq)
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
    val hostPort = stripUserinfo(lower(authority))
    val host = normalizeHost(regexp_replace(hostPort, ":[0-9]+$", ""))
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

  /** `registeredDomain(hostOf(url))` as ONE compiled kernel call
    * (functions/WebKernels.scala) — bit-identical to the column
    * composition (PropertySpec fuzz-pins the equivalence), but a
    * single static call inside whole-stage codegen. Use this form
    * wherever the value is referenced by several downstream
    * expressions: the column when-chains repeat their own host
    * subtree, and Catalyst inlines an alias per reference, so a few
    * references multiply into a 64 KB generated-method blowup and a
    * silent interpreted fallback (r19 verdict lead finding —
    * [[edgesFromDocuments]] was the victim). */
  def registeredDomainOfUrl(url: Column,
                            suffixes: Seq[String] = DefaultPublicSuffixes): Column =
    graft.functions.VectorExprs.withKernels(call_function(
      "graft_registered_domain_url", url, array(suffixes.map(lit): _*)))

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
    * The canonical URL is appended as `outCol`. `idCol` must be an
    * integral column (the deterministic tie-break negates it as a
    * long); a non-numeric id would cast to null and silently degrade
    * the tie-break to encounter order, so it is refused loudly. */
  def dropDuplicateUrls(df: DataFrame, urlCol: String, idCol: String,
                        scoreCol: String,
                        outCol: String = "canonical_url"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists in the input")
    Selection.requireIntegralCol(df, idCol, "dropDuplicateUrls idCol")
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
    * (ties: ascending numeric `tieCol`) — the FineWeb-style
    * per-domain volume cap. One shuffle on the domain via the
    * k-BOUNDED heap aggregation ([[Selection.topKPerGroupBounded]]):
    * a mega-domain holding 10% of the crawl costs O(k) state per
    * stage, not a full window sort of its rows on one task. Priced
    * honestly (WebScaleProbe act f): the heap pays ~1.8× CPU locally
    * vs Tungsten's window sort — it is chosen for the DISTRIBUTION
    * property (no unbounded single-task sort when one registered
    * domain holds 10⁸ rows), which is what a cap exists for. */
  def capPerDomain(df: DataFrame, urlCol: String, scoreCol: String,
                   tieCol: String, k: Int,
                   suffixes: Seq[String] = DefaultPublicSuffixes,
                   domainCol: String = "domain"): DataFrame = {
    require(!df.columns.contains(domainCol),
      s"output column '$domainCol' already exists in the input")
    // compiled kernel form — the heap aggregation and its partial
    // reference the domain several times; the column chain inlined
    // per reference is the 64 KB codegen hazard (see
    // [[registeredDomainOfUrl]])
    val withDom = df.withColumn(domainCol,
      registeredDomainOfUrl(col(urlCol), suffixes))
    Selection.topKPerGroupBounded(withDom, domainCol, scoreCol, tieCol, k)
  }

  /** Drop rows whose host matches the blocklist by domain-suffix
    * semantics (entry `d` blocks host `d` and every `*.d` — the UT1 /
    * FineWeb convention). `blocked` is one string column of
    * lowercased entries.
    *
    * Never a LIKE scan: the host's bounded suffix set is matched by
    * EQUALITY. Two tiers, size-gated like Dedup's broadcasts:
    *  - blocklist count ≤ `spark.graft.web.blocklistBroadcastThreshold`
    *    (default 1000): collect to a plan-literal array and filter
    *    with `arrays_overlap` — map-only, no shuffle, pushes past
    *    column pruning. The default is deliberately SMALL:
    *    ArraysOverlap hashes the smaller side (the ≤10 suffixes) and
    *    iterates the literal, so a 100k-entry literal would cost 10⁵
    *    comparisons per corpus row on the scan path — far past the
    *    crossover where the join tier wins (r18 review find);
    *  - larger: explode the suffixes and LEFT SEMI join the blocklist
    *    (broadcast-eligible under AQE) to get blocked ids, then LEFT
    *    ANTI on `idCol` — corpus rows never fan out through a shuffle
    *    wider than ×maxSuffixLabels, and only ids travel.
    * Entries with more labels than `maxSuffixLabels` cannot match the
    * generated suffixes and are refused loudly rather than silently
    * ignored. Entries normalize like hosts ([[normalizeHost]] — a
    * UT1-style `www.badsite.com` row must block the www-stripped
    * host). A null-URL row matches nothing and is KEPT, identically
    * in both tiers. */
  def dropBlockedHosts(df: DataFrame, urlCol: String, idCol: String,
                       blocked: DataFrame,
                       maxSuffixLabels: Int = 10): DataFrame = {
    require(blocked.columns.length == 1,
      s"blocklist must have exactly one column, got ${blocked.columns.toSeq}")
    val spark = df.sparkSession
    val dcol = blocked.columns.head
    val threshold = spark.conf
      .getOption("spark.graft.web.blocklistBroadcastThreshold")
      .map(_.toLong).getOrElse(1000L)
    // normalize entries EXACTLY the way hosts are normalized — a
    // mixed-case, FQDN-dotted, or www-prefixed blocklist row must
    // still block the normalized host
    val entries = blocked
      .select(normalizeHost(col(dcol)).as("__bl_domain"))
      .na.drop().filter(length(col("__bl_domain")) > 0).distinct()
    // one aggregate job decides BOTH gates (count for the broadcast
    // tier, max label depth for the matchability refusal); the job
    // that names an offending entry runs only on the failure path
    val stats = entries.agg(
      count(lit(1)).as("n"),
      max(size(split(col("__bl_domain"), "\\."))).as("max_labels")).head()
    val n = stats.getLong(0)
    val maxLabelsSeen = if (stats.isNullAt(1)) 0 else stats.getInt(1)
    if (maxLabelsSeen > maxSuffixLabels) {
      val offender = entries
        .filter(size(split(col("__bl_domain"), "\\.")) > maxSuffixLabels)
        .limit(1).collect().head.getString(0)
      throw new IllegalArgumentException(
        s"blocklist entry '$offender' has more than " +
          s"maxSuffixLabels=$maxSuffixLabels labels and could never match " +
          "a generated host suffix — raise maxSuffixLabels")
    }
    val sufs = hostSuffixes(hostOf(col(urlCol)), maxSuffixLabels)
    if (n <= threshold) {
      // map-only tier: the blocklist is a plan literal; arrays_overlap
      // short-circuits per row, no join, no shuffle
      val set = entries.collect().map(_.getString(0))
      if (set.isEmpty) df
      // coalesce: a null URL yields null suffixes → null predicate —
      // KEEP the row, matching the join tier's anti-join semantics
      else df.filter(coalesce(!arrays_overlap(sufs,
        array(set.map(lit(_)).toIndexedSeq: _*)), lit(true)))
    } else {
      val blockedIds = df.select(col(idCol), explode(sufs).as("__suf"))
        .join(entries, col("__suf") === col("__bl_domain"), "left_semi")
        .select(idCol).distinct()
      df.join(blockedIds, Seq(idCol), "left_anti")
    }
  }

  /** Plain text from an HTML page — the crawl pipeline's EXTRACTION
    * stage (the deterministic core of the trafilatura/jusText step),
    * as one codegen'd map-only expression chain:
    *  1. `<script>`/`<style>` subtrees dropped whole (their text is
    *     code, not content — and it is where `<` appears unescaped);
    *  2. `<br>` and block-CLOSING tags (`</p> </div> </li> </h1-6>
    *     </tr> </table> </ul> </ol>`) become line breaks, so block
    *     structure survives tag stripping;
    *  3. every remaining tag is stripped to a space;
    *  4. the five ubiquitous entities decode — `&amp;` LAST, the
    *     standard order, so `&amp;lt;` becomes the literal `&lt;` and
    *     not `<`;
    *  5. horizontal whitespace collapses, lines trim, blank lines
    *     drop, survivors rejoin with `\n`.
    * This is a HEURISTIC extractor (regex, not an HTML parser): good
    * for quality/dedup featurization at corpus scale, not a DOM. Feed
    * the output to the C4/Gopher gates ([[RuleFilters]]) for the
    * boilerplate-line pass. Run it ONCE, at ingest — it is NOT
    * idempotent: entity decoding is one-way, so a decoded `&lt;tag&gt;`
    * re-reads as markup on a second pass (WebSpec pins this). */
  def htmlToText(html: Column): Column = {
    val noScript0 = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    // an UNCLOSED script/style (truncated page) never matches the
    // paired rule — without this the whole tail of JS would leak into
    // the extracted text as words
    val noScript = regexp_replace(noScript0,
      "(?is)<(script|style)[^>]*>.*$", " ")
    val breaks = regexp_replace(noScript,
      "(?i)<br[^>]*>|</p>|</div>|</li>|</h[1-6]>|</tr>|</table>|</ul>|</ol>",
      "\n")
    val noTags = regexp_replace(breaks, "<[^>]*>", " ")
    val decoded = xmlEntityDecode(noTags)
    val lines = filter(
      transform(split(decoded, "\n"),
        l => trim(regexp_replace(l, "[ \\t\\r]+", " "))),
      l => length(l) > 0)
    array_join(lines, "\n")
  }

  /** All outgoing link URLs of an HTML page, resolved ABSOLUTE against
    * the page's own URL — the producer of the link graph that
    * [[domainRank]] / [[crawlBudgets]] consume (r18 verdict's missing
    * arrow: WARC → extract → LINKS → rank → budgets). One codegen'd
    * map-only expression chain, the [[htmlToText]] regex discipline:
    *  1. every `<a … href=…>` value is scanned out (double-quoted,
    *     single-quoted, or bare; tag and attribute match
    *     case-insensitively). `<area>`/`<link>`/`<iframe>` targets are
    *     NOT links a crawler follows for authority — `<a>` only,
    *     documented;
    *  2. the fragment is dropped from each value (`#…` is not sent);
    *  3. resolution (RFC 3986 subset): absolute `http(s)://` values
    *     pass through; any OTHER scheme (`mailto:` `javascript:`
    *     `data:` `tel:` …) is dropped; `//host/p` takes the base
    *     scheme; `/p` takes the base scheme://authority; a relative
    *     value appends to the base path's DIRECTORY with leading
    *     `./` runs stripped. Dot-segment (`../`) normalization is out
    *     of scope (heuristic extractor, same posture as htmlToText —
    *     the registered-domain grain [[edgesFromDocuments]] feeds on
    *     is unaffected because `..` never crosses the authority). A
    *     `<base href>` tag IS honored (r19): an absolute http(s)
    *     value replaces the resolution base whole; root-relative and
    *     protocol-relative values rebase against the page's
    *     scheme/authority; any other value (a RELATIVE base — rare,
    *     usually an authoring bug) falls back to the page URL. The
    *     tag is picked up wherever it appears (a real parser requires
    *     `<head>`; position-independence is the heuristic trade);
    *  4. empty values drop; DUPLICATES ARE KEPT — a page linking twice
    *     votes twice, matching [[domainRank]] multi-edge semantics.
    * Null html or base yields null (explode skips it downstream). */
  def extractOutlinks(html: Column, baseUrl: Column): Column = {
    // \s before href, not \b: a word BOUNDARY matches after '-', so
    // \bhref would extract data-href="…" values (r19 sweep find) —
    // and attributes are whitespace-separated in valid HTML anyway.
    // Compiled kernel (functions/WebKernels.scala), not the
    // transform()-over-when-chains column formulation: that chain
    // re-derived the full <base href>/scheme/authority subtree in
    // every element lambda, blew Janino's 64 KB method cap, and ran
    // interpreted (r19 verdict lead finding). Same regexes, same
    // order, bit-identical output; base parts derive once per row.
    graft.functions.VectorExprs.withKernels(
      call_function("graft_outlinks", html, baseUrl))
  }

  /** (href, anchor text) pairs — the link-TEXT signal ([[
    * extractOutlinks]] keeps only targets): anchor-text corpora feed
    * retrieval training and the classic what-others-call-this-page
    * quality prior. Array of structs (href resolved ABSOLUTE exactly
    * like extractOutlinks — same [[effectiveBase]]/[[resolveHref]]
    * rule, `<base href>` included; text de-tagged/entity-decoded/
    * whitespace-collapsed); anchors whose `</a>` never closes
    * (truncated pages) are dropped — extractOutlinks still sees their
    * targets, so the GRAPH never loses an edge, only its label
    * (documented asymmetry). Same one-pass codegen'd regex
    * discipline; empty anchor text (image links) yields an empty
    * string, not a drop — the caller decides. */
  def extractAnchors(html: Column, baseUrl: Column): Column = {
    // whole <a …>…</a> elements; (?s) lets anchor text span lines.
    // RE2 and Java both run the lazy quantifier linearly here (the
    // closing tag is a literal). Same compiled kernel as
    // [[extractOutlinks]] — effectiveBase/resolveHref live in ONE
    // place (functions/WebKernels.scala) so the extractors cannot
    // drift; see extractOutlinks for why a kernel and not the
    // transform() column chain.
    graft.functions.VectorExprs.withKernels(
      call_function("graft_anchors", html, baseUrl))
  }

  /** Anchor-text corpus at the consumable (dst registered-domain,
    * anchor text) grain — the classic "what others call this page"
    * retrieval-training / quality-prior signal, aggregated from
    * [[extractAnchors]] in the SAME pass discipline as
    * [[edgesFromDocuments]] (one extraction scan, no second HTML
    * read; WebSpec pins the single-scan plan).
    *
    * Per (domain, anchor_text):
    *  - `n_src`  = # distinct SOURCE registered domains using that
    *    text for that target;
    *  - `votes`  = Σ over source domains of min(pairs from that
    *    source, `maxPerSourceDomain`) — the per-source cap is the
    *    anti-spam clamp: a link farm repeating one anchor 10⁶ times
    *    contributes `maxPerSourceDomain` votes, not 10⁶ (same
    *    rationale as [[capPerDomain]], applied at the aggregation
    *    grain so it needs no sort and no heap).
    *
    * Dropped rows: empty anchor text (image links — this is a TEXT
    * corpus; the GRAPH keeps those edges via [[edgesFromDocuments]]),
    * self-references (src == dst is how a site describes itself, not
    * what OTHERS call it), junk endpoints (null/empty domains), and
    * pages whose own URL is not absolute http(s) — all matching the
    * edge contract.
    *
    * Scale shape: map-only extraction → two hash aggregations with
    * map-side partials (first on (dst, text, src), second on the
    * strictly smaller capped grain). No window, no driver state;
    * skew-safe because a mega-target's rows still key on (dst, text,
    * src), never on dst alone.
    *
    * `urlGrain = true` keys the corpus by the target's CANONICAL URL
    * instead of its registered domain (output column `url`) — the
    * per-page anchor profile retrieval training wants; the
    * per-SOURCE-domain cap and all drop rules are identical, and
    * self-reference still means same registered domain (a site's own
    * deep links are still how it describes itself). */
  def anchorTextCorpus(df: DataFrame, urlCol: String, htmlCol: String,
                       maxPerSourceDomain: Int = 3,
                       suffixes: Seq[String] = DefaultPublicSuffixes,
                       urlGrain: Boolean = false): DataFrame = {
    require(maxPerSourceDomain >= 1,
      s"maxPerSourceDomain must be >= 1, got $maxPerSourceDomain")
    val outCol = if (urlGrain) "url" else "domain"
    val dstKey: Column => Column =
      if (urlGrain) canonicalUrl else (registeredDomainOfUrl(_, suffixes))
    val pairs = df
      .filter(col(urlCol).rlike("^(?i)https?://"))
      .select(registeredDomainOfUrl(col(urlCol), suffixes).as("src"),
        explode(extractAnchors(col(htmlCol), col(urlCol))).as("__a"))
      .select(col("src"), dstKey(col("__a.href")).as("dst"),
        // the self gate stays DOMAIN-grain under both keys
        registeredDomainOfUrl(col("__a.href"), suffixes).as("__dstdom"),
        col("__a.text").as("anchor_text"))
      .na.drop()
      .filter(length(col("src")) > 0 && length(col("dst")) > 0 &&
        length(col("anchor_text")) > 0 && col("src") =!= col("__dstdom"))
    pairs
      .groupBy("dst", "anchor_text", "src")
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("dst").as(outCol), col("anchor_text"))
      .agg(count(lit(1)).as("n_src"),
        sum(least(col("__n"), lit(maxPerSourceDomain.toLong))).as("votes"))
  }

  /** (src, dst) link edges at REGISTERED-DOMAIN grain from a crawled
    * pages frame — the [[domainRank]] input, one explode over
    * [[extractOutlinks]] (map-only until the rank's own shuffle).
    * Multi-edges are kept (domainRank counts votes); self-loops
    * (intra-domain links — the overwhelming majority of a real page's
    * links, and zero authority signal) drop by default. A page whose
    * own URL is not absolute http(s) contributes nothing (hostOf of
    * schemeless junk would otherwise mint a phantom vertex from the
    * junk string itself); resolved outlinks are absolute http(s) by
    * construction. */
  def edgesFromDocuments(df: DataFrame, urlCol: String, htmlCol: String,
                         suffixes: Seq[String] = DefaultPublicSuffixes,
                         dropSelf: Boolean = true): DataFrame =
    // the page-URL guard runs ONCE, per page, BEFORE the explode —
    // routing through edgesFromLinks would re-evaluate the same rlike
    // per exploded link row on the dominant crawl scan (r20 review)
    edgesProjection(
      df.filter(col(urlCol).rlike("^(?i)https?://"))
        .select(col(urlCol).as("__page"),
          explode(extractOutlinks(col(htmlCol), col(urlCol))).as("__link")),
      "__page", "__link", suffixes, dropSelf)

  /** [[edgesFromDocuments]]' registered-domain projection over an
    * ALREADY-RESOLVED (page url, link url) frame — the shared tail,
    * so link tables that arrive pre-extracted (Common Crawl WAT via
    * [[graft.sources.Wat.watToLinks]]) produce edges through the SAME
    * rule as the HTML scan (law-pinned: WAT edges ≡ document edges on
    * the linked fixture). Contract matches the parent: multi-edges
    * kept, self-loops dropped by default, junk/null endpoints and
    * non-http(s) page URLs contribute nothing. */
  def edgesFromLinks(df: DataFrame, urlCol: String, linkCol: String,
                     suffixes: Seq[String] = DefaultPublicSuffixes,
                     dropSelf: Boolean = true): DataFrame =
    edgesProjection(df.filter(col(urlCol).rlike("^(?i)https?://")),
      urlCol, linkCol, suffixes, dropSelf)

  /** The shared (src, dst) registered-domain projection — page-URL
    * validity is the CALLER's filter (once per page on the HTML path,
    * once per link row on pre-extracted tables where there is no
    * page grain to hoist to). */
  private def edgesProjection(df: DataFrame, urlCol: String,
                              linkCol: String, suffixes: Seq[String],
                              dropSelf: Boolean): DataFrame = {
    def rdom(url: Column): Column = registeredDomainOfUrl(url, suffixes)
    val out = df
      .select(rdom(col(urlCol)).as("src"), rdom(col(linkCol)).as("dst"))
      .na.drop()
      .filter(length(col("src")) > 0 && length(col("dst")) > 0)
    if (dropSelf) out.filter(col("src") =!= col("dst")) else out
  }

  /** robots.txt-style crawl-permission filter (RFC 9309 semantics):
    * `rules` has exactly the columns (host, prefix, allow) —
    * lowercased exact host, path rule, boolean. A URL is kept iff the
    * MOST SPECIFIC (longest rule text — the googlebot measure)
    * matching rule for its host allows it, ties broken allow-wins; a
    * URL with NO matching rule is allowed. The RFC's `*` wildcard
    * (any char sequence) and trailing `$` end-anchor are supported —
    * MUST-level requirements in RFC 9309 §2.2.3 (r19; previously a
    * documented gap).
    *
    * Shape: ONE equi-join on host (rules for other hosts never meet a
    * row — no cartesian, no LIKE scan), rule test + most-specific
    * argmax via the ObjectHashAggregate extremum aggregate, then a
    * left-anti on the disallowed ids. Rules tables are small (per-host
    * handfuls) — AQE broadcasts them. The rule test is the compiled
    * [[graft.functions.RobotsPathMatch]] kernel, tiered PER RULE (r19
    * verdict #3 — the old gate was table-global, so one wildcard rule
    * on one host pushed EVERY host's rules onto a per-join-row regex
    * compile): a rule with no `*` and no trailing `$` is a plain
    * `startsWith` with zero matcher machinery; a wildcard rule splits
    * once per distinct prefix (bounded memo cache) and matches with a
    * LINEAR greedy glob walk — never java.util.regex, whose
    * backtracking a crafted crawled `*a*a*a*…` rule can drive
    * superlinear. No driver-side gate job at all. */
  def robotsFilter(df: DataFrame, urlCol: String, idCol: String,
                   rules: DataFrame): DataFrame = {
    require(rules.columns.toSeq == Seq("host", "prefix", "allow"),
      s"rules must have columns (host, prefix, allow), got " +
        rules.columns.mkString("(", ", ", ")"))
    val keyed = df.select(col(idCol).as("__rid"),
      hostOf(col(urlCol)).as("__rhost"), pathOf(col(urlCol)).as("__rpath"))
    val ruleTest: Column = graft.functions.VectorExprs.withKernels(
      call_function("graft_robots_match", col("__rpath"), col("prefix")))
    // normalize the rules' host side too, so hand-built tables with
    // mixed-case/www-prefixed keys meet hostOf output
    val matched = keyed.join(
      rules.withColumn("host", normalizeHost(col("host"))),
      col("__rhost") === col("host"))
      .filter(ruleTest)
    // longest prefix wins, allow wins ties: max by (len, allow)
    val verdict = matched.groupBy("__rid")
      .agg(graft.functions.VectorExprs.extremumBy(
        col("allow"),
        struct(length(col("prefix")), col("allow")),
        isMax = true).as("__allowed"))
    val disallowed = verdict.filter(!col("__allowed"))
      .select(col("__rid").as(idCol))
    df.join(disallowed, Seq(idCol), "left_anti")
  }

  /** Parse raw robots.txt documents into the (host, prefix, allow)
    * rules table [[robotsFilter]] consumes — RFC 9309 group semantics:
    * a GROUP is a maximal run of `User-agent:` lines followed by its
    * `Allow:`/`Disallow:` rules; comments (`#…`) and unknown
    * directives (Sitemap, Crawl-delay) are ignored; rules before any
    * group are ignored; an empty rule path is a no-op. Agent
    * selection per host: if ANY group names `agent` exactly
    * (case-insensitive), the rules of exactly those groups apply;
    * otherwise the `*` groups' rules do (the RFC's fallback —
    * substring/longest-prefix product-token matching is out of scope,
    * documented, like path wildcards in [[robotsFilter]]).
    *
    * Shape: posexplode of lines → one window over (host, line order)
    * to number the user-agent RUNS → groups aggregated host-locally →
    * rules equi-joined back on (host, group). Everything keys on
    * host, so one shuffle family; robots documents are KB-scale per
    * host and the output is handfuls of rows per host.
    *
    * MULTI-DOCUMENT contract (r19 ADVICE fix): when one host carries
    * several DISTINCT robots.txt documents (re-crawls), each parses
    * independently, but the default output keys rules by host alone —
    * feeding that union to [[robotsFilter]] resolves longest-prefix
    * across a rule set that corresponds to NEITHER document. Callers
    * with re-crawled robots must reduce to one document per host
    * first (e.g. keep the latest capture), or pass
    * `keepDoc = true` to get a `doc` column (md5 of the document) and
    * pick a winner per host before filtering. */
  def parseRobotsTxt(df: DataFrame, hostCol: String, txtCol: String,
                     agent: String, keepDoc: Boolean = false): DataFrame =
    applicableRuleLines(df, hostCol, txtCol, agent,
      Seq("allow", "disallow"))
      // normalize the host key so the output joins against hostOf(url)
      // in robotsFilter — a rules table keyed 'www.Example.com' would
      // otherwise be silently dead (r18 review find)
      .select((Seq(normalizeHost(col("__rb_host")).as("host"),
        col("__value").as("prefix"),
        (col("__key") === "allow").as("allow")) ++
        (if (keepDoc) Seq(col("__doc").as("doc")) else Nil)): _*)

  /** Per-host `Crawl-delay` for `agent` — the politeness knob a
    * scheduler needs to spend a [[crawlBudgets]] budget WITHIN a
    * domain (RFC 9309 leaves it non-standard; Bing/Yandex honor it).
    * Group semantics are exactly [[parseRobotsTxt]]'s: the delay lines
    * of the APPLICABLE groups apply — when any group names `agent`
    * exactly, only those groups' delays count (a `*` group's delay is
    * never mixed in: the matched group beats the fallback, WebSpec
    * law), otherwise the `*` groups'. Multiple applicable delay lines
    * resolve to the MAXIMUM (the conservative politeness posture);
    * non-numeric and negative values drop. Output:
    * (host, crawl_delay DOUBLE) — or +(doc) with `keepDoc`, the
    * multi-document contract of [[parseRobotsTxt]]. */
  def parseCrawlDelays(df: DataFrame, hostCol: String, txtCol: String,
                       agent: String, keepDoc: Boolean = false): DataFrame = {
    val keys =
      (if (keepDoc) Seq(col("__rb_host"), col("__doc"))
       else Seq(col("__rb_host")))
    applicableRuleLines(df, hostCol, txtCol, agent, Seq("crawl-delay"))
      // try_cast: a malformed delay value is junk to drop, not an
      // ANSI cast error to fail the job on. Finite-only: 'Infinity'
      // try_casts to a real Double that passes >= 0 and then wins
      // every max() — a schedule with an infinite delay never fetches
      // (r20 sweep find). NaN needs its OWN guard: Spark orders NaN
      // LARGER than every double, so NaN >= 0 is true and NaN would
      // win max() too (it happens to fail `< Infinity`, but that is
      // incidental — make the intent explicit; r20 review find)
      .withColumn("__delay", col("__value").try_cast("double"))
      .filter(col("__delay").isNotNull && !isnan(col("__delay")) &&
        col("__delay") >= 0 &&
        col("__delay") < lit(Double.PositiveInfinity))
      .groupBy(keys: _*)
      .agg(max(col("__delay")).as("crawl_delay"))
      .select((Seq(normalizeHost(col("__rb_host")).as("host"),
        col("crawl_delay")) ++
        (if (keepDoc) Seq(col("__doc").as("doc")) else Nil)): _*)
  }

  /** Per-host `Sitemap` URLs — frontier seeds. Group-INDEPENDENT per
    * the sitemaps protocol (a Sitemap line applies wherever it appears
    * in the file, including before any group), so there is no agent
    * parameter; distinct (host, sitemap) pairs, absolute-URL values
    * only (the protocol requires absolute URLs — a relative value is
    * junk and drops). */
  def parseSitemaps(df: DataFrame, hostCol: String,
                    txtCol: String): DataFrame =
    robotsKeyedLines(df, hostCol, txtCol)
      .filter(col("__key") === "sitemap" &&
        col("__value").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"))
      .select(normalizeHost(col("__rb_host")).as("host"),
        col("__value").as("sitemap"))
      .distinct()

  /** The six ubiquitous XML/HTML entities, `&amp;` LAST (the standard
    * order) — the ONE entity table: [[htmlToText]]'s step 4 and
    * [[parseSitemapXml]]'s loc decode both call this, so the decode
    * paths cannot drift (r20 review find). */
  private def xmlEntityDecode(c: Column): Column =
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      }

  /** Parse sitemap XML documents (the sitemaps.org protocol) into
    * frontier seed rows — the arrow between [[parseSitemaps]] (robots
    * → sitemap URLs) and [[frontierPlan]] (seed URLs → schedule):
    * `<urlset>` documents yield their `<url>` entries, a
    * `<sitemapindex>` yields its child `<sitemap>` entries with
    * `is_child_sitemap = true` (the caller fetches and feeds them
    * back — recursion is I/O, not a plan shape). Per entry: `loc`
    * (XML entities decoded, surrounding whitespace trimmed,
    * ABSOLUTE-URL values only — the protocol requires absolute; junk
    * drops) and nullable `lastmod` (verbatim text — W3C datetime
    * parsing is the caller's cast, `try_cast` posture). Map-only
    * regex extraction (the [[htmlToText]] heuristic discipline —
    * namespaces/CDATA are out of scope, documented); two scans of
    * each document (url blocks, sitemap blocks), each codegen'd.
    * Output: (sitemap_url, loc, lastmod, is_child_sitemap). */
  def parseSitemapXml(df: DataFrame, urlCol: String,
                      xmlCol: String): DataFrame = {
    def entries(tag: String, isChild: Boolean): DataFrame =
      df.select(col(urlCol).as("sitemap_url"),
        explode(regexp_extract_all(col(xmlCol),
          lit(s"(?is)<$tag>(.*?)</$tag>"), lit(1))).as("__b"))
        .select(col("sitemap_url"),
          xmlEntityDecode(trim(regexp_extract(col("__b"),
            "(?is)<loc>\\s*(.*?)\\s*</loc>", 1))).as("loc"),
          regexp_extract(col("__b"),
            "(?is)<lastmod>\\s*(.*?)\\s*</lastmod>", 1).as("__lm"),
          lit(isChild).as("is_child_sitemap"))
        .withColumn("lastmod",
          when(length(col("__lm")) > 0, col("__lm"))
            .otherwise(lit(null).cast("string")))
        .select("sitemap_url", "loc", "lastmod", "is_child_sitemap")
    entries("url", isChild = false)
      .unionByName(entries("sitemap", isChild = true))
      .filter(col("loc").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"))
  }

  /** Shared robots.txt line scan: documents deduped and keyed
    * ([[parseRobotsTxt]]'s per-document discipline), lines posexploded,
    * comments stripped, keys lowercased/trimmed (RFC 9309's ABNF
    * allows whitespace before the colon — r18 review find). Emits
    * (__rb_host, __doc, __pos, __key, __value) for EVERY keyed line. */
  private def robotsKeyedLines(df: DataFrame, hostCol: String,
                               txtCol: String): DataFrame = {
    // identical documents are ONE document (re-crawled robots.txt
    // rows dedup here), and distinct documents for the same host
    // parse independently — without the per-document window key, two
    // rows for one host would interleave at equal line positions and
    // corrupt the group numbering (r18 sweep find, law-pinned)
    val docs = df.select(col(hostCol).as("__rb_host"),
      col(txtCol).as("__rb_txt")).distinct()
      .withColumn("__doc", md5(col("__rb_txt")))
    val lines = docs.select(col("__rb_host"), col("__doc"),
      posexplode(split(col("__rb_txt"), "\n")).as(Seq("__pos", "__raw")))
    val content = trim(regexp_replace(col("__raw"), "#.*$", ""))
    val key = lower(trim(regexp_extract(content, "^([^:]+):", 1)))
    val value = trim(regexp_replace(content, "^[^:]+:", ""))
    lines.select(col("__rb_host"), col("__doc"), col("__pos"),
      key.as("__key"), value.as("__value"))
  }

  /** The group-scoped robots directives: GROUP-RUN STRUCTURE is
    * computed over exactly this line set, whichever rule kind a caller
    * extracts — numbering over a SUBSET would merge two user-agent
    * runs separated only by a directive outside the subset and leak
    * one group's rules into another (caught by the WebSpec
    * matched-group-beats-* law). `sitemap` is global per the sitemaps
    * protocol — it is never EMITTED as a group rule — but it still
    * participates in run NUMBERING: per RFC 9309 / the Google parser,
    * any non-user-agent record ends user-agent collection, so a
    * Sitemap line between two user-agent runs must SEPARATE them
    * (excluding it merged the runs and leaked one group's rules into
    * the other's agent — r19 ADVICE). */
  private val GroupScopedKeys =
    Seq("user-agent", "allow", "disallow", "crawl-delay")

  /** [[GroupScopedKeys]] plus the non-group lines that still END a
    * user-agent run — the line set run numbering is computed over. */
  private val RunNumberingKeys = GroupScopedKeys :+ "sitemap"

  /** The group machinery shared by [[parseRobotsTxt]] and
    * [[parseCrawlDelays]]: classed lines restricted to
    * [[GroupScopedKeys]], user-agent RUNS numbered by one
    * (host, doc)-partitioned window, then the RFC 9309 agent
    * fallback: rules of exact-matching groups when any exist in the
    * document, else the `*` groups'. Returns the applicable non-UA
    * rule lines of the `ruleKeys` kinds (non-empty values) with their
    * `__rb_host`/`__doc`/`__key`/`__value`. */
  private def applicableRuleLines(df: DataFrame, hostCol: String,
                                  txtCol: String, agent: String,
                                  ruleKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val classed = robotsKeyedLines(df, hostCol, txtCol)
      .filter(col("__key").isin(RunNumberingKeys: _*))
    val w = Window.partitionBy("__rb_host", "__doc").orderBy("__pos")
    val isUa = col("__key") === "user-agent"
    val runStart = isUa &&
      coalesce(lag(isUa, 1).over(w), lit(false)) === false
    val grouped = classed
      .withColumn("__gid", sum(when(runStart, 1L).otherwise(0L)).over(w))
      .filter(col("__gid") > 0) // rules before any group are ignored
    val groups = grouped.filter(isUa)
      .groupBy("__rb_host", "__doc", "__gid")
      .agg(max((lower(col("__value")) === "*").cast("int")).as("__star"),
        max((lower(col("__value")) === agentLc).cast("int")).as("__exact"))
    // agent selection is per DOCUMENT (each document is a
    // self-contained robots.txt)
    val docExact = groups.groupBy("__rb_host", "__doc")
      .agg(max(col("__exact")).as("__doc_exact"))
    grouped.filter(!isUa && length(col("__value")) > 0 &&
        col("__key").isin(ruleKeys: _*))
      .join(groups, Seq("__rb_host", "__doc", "__gid"))
      .join(docExact, Seq("__rb_host", "__doc"))
      .filter(when(col("__doc_exact") === 1, col("__exact") === 1)
        .otherwise(col("__star") === 1))
  }

  // ---- persisted URL index: incremental (daily-crawl) URL dedup --------
  //
  // The dedup family's index economics applied to the URL layer: build
  // the canonical-URL index ONCE from the published corpus, persist it
  // bucketed on the key (graft.api.Layout — the corpus-sized side never
  // shuffles again), then each day's crawl anti-joins its day-scale keys
  // against index ∪ delta. Admitted survivors ride a small parquet
  // delta side table (Layout correctly refuses appending into a
  // bucketed layout); compaction folds deltas into a NEW layout
  // version. Conflict posture: the INDEX WINS (first capture published
  // stays published — the family's "corpus always wins"), and within a
  // day's batch [[dropDuplicateUrls]] picks the best capture first.

  /** Config stamp carried by every URL-index row — bump when the
    * canonicalization rules change, so a stale index is refused at
    * scan time instead of silently missing rewritten keys. */
  val UrlCfg: String = "url:canon-v1"

  /** One row per canonical URL of the corpus: (url_key, id, cfg) with
    * the best capture's id ([[dropDuplicateUrls]] semantics — max
    * `scoreCol`, min `idCol` on ties). Scores are NOT stored: the
    * index answers membership, and at 10⁹ URLs every dropped column
    * is real bytes per row. */
  def urlIndex(df: DataFrame, urlCol: String, idCol: String,
               scoreCol: String): DataFrame =
    dropDuplicateUrls(df, urlCol, idCol, scoreCol, outCol = "__url_key")
      .select(col("__url_key").as("url_key"),
        col(idCol).cast("long").as("id"), lit(UrlCfg).as("cfg"))

  /** Persist [[urlIndex]] as a bucketed Layout table on `url_key`:
    * the daily anti-join shuffles ONLY the batch's keys into the
    * index's bucketing. */
  def writeUrlIndex(df: DataFrame, urlCol: String, idCol: String,
                    scoreCol: String, table: String, buckets: Int,
                    path: Option[String] = None): Unit =
    graft.api.Layout.writeBucketed(
      urlIndex(df, urlCol, idCol, scoreCol), table, Seq("url_key"),
      buckets, path = path)

  /** A day's ADMITTED survivors as index-schema delta rows — append
    * to the delta side table ([[appendUrlIndexDelta]]) and pass as
    * `delta` to [[dropUrlsAgainstIndex]] until the next
    * [[compactUrlIndex]]. Same exactly-once caveat as the band-index
    * delta: job-level re-runs double the day's rows (the compactor
    * drops exact duplicates, but admission commit protocol is the
    * caller's). */
  def urlIndexDelta(admitted: DataFrame, urlCol: String, idCol: String,
                    scoreCol: String): DataFrame =
    urlIndex(admitted, urlCol, idCol, scoreCol)

  def appendUrlIndexDelta(admitted: DataFrame, urlCol: String,
                          idCol: String, scoreCol: String,
                          deltaPath: String): Unit =
    urlIndexDelta(admitted, urlCol, idCol, scoreCol)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(deltaPath)

  /** Batch rows whose canonical URL is NOT in the index (∪ `delta`):
    * the daily-crawl admission filter. Two left-anti equi-joins — the
    * bucketed index side never shuffles, the delta side is day-scale.
    * Pure plan (no driver jobs), so it also runs UNCHANGED on a
    * STREAMING batch frame (stream-static left-anti joins are
    * append-mode-safe); for a per-trigger map-only lookup instead,
    * build [[urlKeyBloom]] and filter with [[dropUrlsAgainstBloom]]
    * (false positives only over-drop). A cfg-stamp mismatch (index
    * built under different canonicalization rules) throws at scan
    * time — silent under-dropping is the direction URL dedup cannot
    * absorb. */
  def dropUrlsAgainstIndex(batch: DataFrame, urlCol: String,
                           index: DataFrame,
                           delta: Option[DataFrame] = None): DataFrame = {
    require(!batch.columns.contains("__url_key"),
      "staging column '__url_key' already exists in the batch")
    val keyed = batch.withColumn("__url_key", canonicalUrl(col(urlCol)))
    def anti(df: DataFrame, ix: DataFrame) =
      df.join(Dedup.requireCfg(ix, UrlCfg)
        .select(col("url_key").as("__url_key")), Seq("__url_key"),
        "left_anti")
    delta.fold(anti(keyed, index))(d => anti(anti(keyed, index), d))
      .drop("__url_key")
  }

  /** Fold the delta back into a NEW bucketed layout version (never in
    * place — readers keep the old version until cutover). Exact
    * duplicate rows (a re-run append) collapse at the full-row grain,
    * matching a rebuild. A url_key still duplicated AFTER that —
    * possible only when admission skipped the anti-join or replayed a
    * batch with a different id — is REFUSED loudly with the key in
    * the message: the index stores no scores, so the compactor cannot
    * re-run keep-best, and silently picking a row would diverge from
    * a rebuild. */
  def compactUrlIndex(spark: org.apache.spark.sql.SparkSession,
                      indexTable: String, delta: DataFrame,
                      outTable: String, buckets: Int,
                      path: Option[String] = None): Unit = {
    require(outTable != indexTable,
      "compactUrlIndex writes a NEW table version — compact to a new " +
        "name and cut readers over")
    val index = Dedup.requireCfg(
      graft.api.Layout.table(spark, indexTable), UrlCfg)
    val deltaClean = Dedup.requireCfg(delta, UrlCfg)
      .select(index.columns.map(col): _*).dropDuplicates()
    val unioned = index.unionByName(deltaClean)
    val dup = unioned.groupBy("url_key").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"url_key '${dup.headOption.map(_.getString(0)).getOrElse("")}' has " +
        "multiple ids across index ∪ delta — admission must anti-join " +
        "against the index (dropUrlsAgainstIndex) before appending a " +
        "delta; rebuild the index from the corpus to resolve")
    graft.api.Layout.writeBucketed(unioned, outTable, Seq("url_key"),
      buckets, path = path)
  }

  /** Domain-graph PageRank — the Common-Crawl-style authority signal
    * (FineWeb/RefinedWeb pipelines rank registered domains by link
    * authority as a quality prior). The non-normalized Brin/Page
    * recurrence, iterated a FIXED number of rounds from rank = 1:
    *   r'(v) = (1 − d) + d · Σ_{(u,v)∈E} r(u) / outdeg(u)
    * Multi-edges count (a page linking twice votes twice); dangling
    * mass is deliberately NOT redistributed (the original paper's
    * simplification — dangling nodes absorb rank, which for a QUALITY
    * PRIOR is harmless and keeps the recurrence one join + one
    * aggregation).
    *
    * Cross-engine-exact by construction (the quality classifier's
    * trainCertified trick): every per-edge contribution AND every new
    * rank snaps to an exact 2⁻²⁰ multiple (floor), so the aggregation
    * sums exact dyadic doubles — associative, order-independent,
    * engine-independent — and the whole trajectory is certifiable
    * against an unrolled SQL replica with NO float tolerance.
    *
    * Scale: edges checkpoint once (reused every round); each
    * round is ONE shuffle (the contribution aggregation on dst) plus
    * an edges⋈ranks equi-join where ranks is |V|-bounded (domains,
    * not pages — millions, not billions; broadcastable by AQE);
    * lineage is cut per round so the plan stays flat at any iteration
    * count.
    *
    * Checkpoint durability (r18 verdict #5): the default
    * `localCheckpoint` is EXECUTOR-MEMORY-resident and not
    * fault-tolerant — on a real cluster one lost executor kills the
    * job mid-iteration. `reliable = true` routes every per-round cut
    * through `Dataset.checkpoint` (HDFS/object-store files under
    * `spark.sparkContext.setCheckpointDir`, which must be set — a
    * missing dir is refused up front, not at iteration 1's write):
    * each round then restarts from durable files instead of
    * recomputing, at the price of one write+read of |E| (once) and
    * |V| (per round) — the right trade for a 100-TB-cluster run,
    * priced in DESIGN. Same values bit-for-bit either way (WebSpec
    * law: the snapped trajectory does not depend on how lineage is
    * cut). */
  def domainRank(edges: DataFrame, srcCol: String, dstCol: String,
                 iterations: Int, damping: Double = 0.85,
                 reliable: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1,100], got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"damping must be in (0,1), got $damping")
    if (reliable)
      require(edges.sparkSession.sparkContext.getCheckpointDir.nonEmpty,
        "domainRank(reliable = true) needs " +
          "spark.sparkContext.setCheckpointDir(...) — reliable " +
          "checkpoints are files under that directory")
    // The default (localCheckpoint-lineage, string-keyed) path runs the
    // RDD loop below (r22 — the connectedComponents precedent: a
    // fixed-point is the one shape where per-round Catalyst re-planning
    // + a per-round checkpoint job is pure overhead; the RDD loop is
    // ONE job whose cached adjacency joins NARROW every round). The
    // DataFrame loop remains for reliable=true (durable per-round
    // checkpoint FILES — the 100-TB-cluster posture) and for
    // non-string node types; WebSpec's reliable≡local law now
    // cross-checks the two implementations bit-for-bit, which the
    // exact-dyadic snap arithmetic guarantees: every summed term is an
    // exact 2^-20 multiple, so sums are order-independent, and the
    // per-row ops (divide, multiply, add, floor) are identical
    // correctly-rounded IEEE ops in both loops.
    val stringKeys =
      edges.schema(srcCol).dataType == org.apache.spark.sql.types.StringType &&
      edges.schema(dstCol).dataType == org.apache.spark.sql.types.StringType
    if (!reliable && stringKeys)
      return domainRankRdd(edges, srcCol, dstCol, iterations, damping)
    def cut(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val snapUnit = lit(1048576.0) // 2^20
    // grid-clearance guard (r22, the trainCertified posture): a value
    // within 1e-9 of a floor boundary (in the scaled domain, grid step
    // 1.0) is refused LOUDLY — engines computing 1 ulp apart could
    // floor to different grid cells and silently diverge from the
    // oracle. Values exactly ON the boundary are fine (identical
    // doubles floor identically); cross-engine jitter for these exact
    // dyadic sums is 0-1 ulp (~1e-16 relative), so 1e-9 gives ~7
    // decades of margin while firing spuriously with probability
    // ~2e-9 per snapped value.
    def snap(c: Column): Column = {
      val scaled = c * snapUnit
      val frac = scaled - floor(scaled)
      when(frac === 0.0 || (frac > 1e-9 && frac < lit(1.0) - lit(1e-9)),
        floor(scaled) / snapUnit)
        .otherwise(raise_error(concat(
          lit("domainRank grid-clearance guard: a rank term sits within " +
            "1e-9 of a 2^-20 floor boundary — cross-engine rounding " +
            "could diverge; change damping/iterations (value "),
          c.cast("string"), lit(")"))))
    }
    // null endpoints (a schemeless/garbage URL upstream yields a null
    // domain) cannot vote or be ranked — drop them here rather than
    // letting a null node ride the joins as a phantom vertex
    val e = cut(edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .na.drop())
    val nodes = cut(e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct())
    val esd = cut(
      e.join(e.groupBy("src").agg(count(lit(1)).as("__deg")), "src"))
    var ranks = nodes.select(col("node"), lit(1.0).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = esd
        .join(ranks, esd("src") === ranks("node"))
        .select(col("dst").as("node"),
          snap(col("rank") / col("__deg")).as("__c"))
      val summed = contrib.groupBy("node").agg(sum("__c").as("__s"))
      ranks = cut(nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          snap(lit(1.0 - damping) +
            lit(damping) * coalesce(col("__s"), lit(0.0))).as("rank")))
    }
    ranks
  }

  /** The default-path RDD fixed-point loop for [[domainRank]] (r22):
    * same recurrence, same 2^-20 floor snap, same grid-clearance
    * guard, bit-identical values (exact-dyadic summation is
    * order-independent; per-row IEEE ops identical) — WebSpec pins the
    * equality against the DataFrame loop via the reliable≡local law.
    * Shape: the adjacency (src, (dst, outdeg)) is partitioned once and
    * cached; each round is join → map → reduceByKey → leftOuterJoin,
    * all on the SAME partitioner (narrow against the cache), with NO
    * per-round action or checkpoint — the whole loop materializes as
    * one job at the final localCheckpoint, so per-round cost is three
    * small shuffles instead of Catalyst re-plan + checkpoint job. */
  private def domainRankRdd(edges: DataFrame, srcCol: String,
                            dstCol: String, iterations: Int,
                            damping: Double): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    import spark.implicits._
    def snapChecked(x: Double): Double = {
      val scaled = x * 1048576.0
      val fl = math.floor(scaled)
      val frac = scaled - fl
      // same guard and thresholds as the DataFrame path's snap()
      require(frac == 0.0 || (frac > 1e-9 && frac < 1.0 - 1e-9),
        s"domainRank grid-clearance guard: a rank term sits within " +
          s"1e-9 of a 2^-20 floor boundary — cross-engine rounding " +
          s"could diverge; change damping/iterations (value $x)")
      fl / 1048576.0
    }
    val eRdd = edges.select(col(srcCol).as("_1"), col(dstCol).as("_2"))
      .na.drop().as[(String, String)].rdd
    val part = new HashPartitioner(math.max(eRdd.getNumPartitions, 1))
    val e = eRdd.partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.mapValues(_ => 1L).reduceByKey(part, _ + _)
    val esd = e.join(deg, part).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.flatMap { case (s, d) => Iterator((s, ()), (d, ())) }
      .reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oneMinusD = 1.0 - damping
    var ranks = nodes.mapValues(_ => 1.0)
    for (_ <- 1 to iterations) {
      val contrib = esd.join(ranks, part).map {
        case (_, ((dst, dg), rank)) => (dst, snapChecked(rank / dg))
      }
      val summed = contrib.reduceByKey(part, _ + _)
      ranks = nodes.leftOuterJoin(summed, part).mapValues {
        case (_, so) => snapChecked(oneMinusD + damping * so.getOrElse(0.0))
      }
    }
    // one materializing pin (the CC convention): construction runs the
    // loop's job here; loop caches release afterwards
    val out = ranks.toDF("node", "rank").localCheckpoint()
    esd.unpersist(false)
    nodes.unpersist(false)
    e.unpersist(false)
    out
  }

  /** Crawl-budget allocation: per-domain budgets ∝ rank^(1/T) — the
    * Pile/GPT-3 temperature recipe ([[Selection.temperatureBudgets]])
    * applied to the [[domainRank]] authority prior, closing the loop
    * from link graph to crawl scheduling. Ranks are exact 2⁻²⁰
    * multiples, so scaling by 2²⁰ gives exact integer masses and an
    * integral 1/T keeps the powers exact (the q_mix_temperature
    * discipline — certifiable with no float slop).
    *
    * SMALL-K FORM: collects #domains rows to the driver — right for a
    * focused crawl (thousands of domains), a driver-memory ceiling at
    * Common-Crawl scale (~10⁸ registered domains). The scheduling
    * arrow at that scale is [[crawlBudgetsDf]], which computes the
    * identical budgets distributed (WebSpec pins Map ≡ DF). */
  def crawlBudgets(ranks: DataFrame, totalBudget: Long,
                   temperature: Double): Map[String, Long] = {
    val masses = ranks.collect()
      .map(r => r.getString(0) -> (r.getDouble(1) * 1048576.0).toLong)
      .toMap
    Selection.temperatureBudgets(masses, totalBudget, temperature)
  }

  /** [[crawlBudgets]] DISTRIBUTED (r18 verdict's What's-wrong #1): the
    * n^(1/T) normalization as a DataFrame — one aggregation for the
    * normalizer Z, broadcast back as a 1-row total (the funnel/recipe
    * scalar-delivery pattern), one map-only budget projection. Nothing
    * ever leaves the cluster, so 10⁸ domains cost a shuffle, not
    * driver heap — and the output is the natural frontier-join input.
    * Bit-identical to the Map form: masses are exact 2²⁰-scaled
    * integers, integral 1/T keeps `pow` exact, Z is then a sum of
    * exact integers-in-double (order-independent below 2⁵³), and the
    * final mul-then-div follows the same IEEE op order as the driver
    * form — so the same oracle certifies both. Output: (dom, budget),
    * floor()-ed so Σ budgets ≤ totalBudget. Columns are read
    * POSITIONALLY (domain, rank), matching the Map form. */
  def crawlBudgetsDf(ranks: DataFrame, totalBudget: Long,
                     temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    require(totalBudget >= 0, "totalBudget must be non-negative")
    val Seq(domCol, rankCol) = ranks.columns.toSeq.take(2)
    val p = ranks.select(col(domCol).as("dom"),
      pow((col(rankCol) * lit(1048576.0)).cast("long").cast("double"),
        lit(1.0 / temperature)).as("__pw"))
    val z = p.agg(sum("__pw").as("__z"))
    p.crossJoin(broadcast(z))
      .select(col("dom"),
        when(col("__z") === 0.0 || col("__z").isNull, lit(0L))
          .otherwise(floor(lit(totalBudget).cast("double") * col("__pw") /
            col("__z")).cast("long")).as("budget"))
  }

  /** Turn budgets + politeness into an executable FETCH SCHEDULE —
    * the last arrow of the crawl-scheduling story: each domain's
    * URLs are ranked (score desc, id asc — deterministic), the
    * per-domain BUDGET caps how many are taken, and each taken URL
    * gets `fetch_at = (rank − 1) · crawl_delay` seconds into the
    * domain's window (RFC-politeness spacing; domains without a
    * delay row use `defaultDelay`). The `delays` join runs at
    * REGISTERED-DOMAIN grain (keys go through [[normalizeHost]]):
    * robots delays parsed at subdomain grain should be reduced to
    * one row per registered domain first (e.g. max — the
    * conservative posture [[parseCrawlDelays]] itself uses).
    *
    * Scale shape: the per-domain rank is
    * [[graft.api.GlobalScan.groupedRowNumber]] — range-partitioned,
    * boundary-only bookkeeping — NOT a `Window.partitionBy(domain)`,
    * because budgets are VARIABLE per domain (a bounded heap needs one
    * k) and a mega-domain must not sort on one task; budgets and
    * delays join per-domain/host (AQE broadcasts the small sides).
    * Output: the input columns + (domain, rank, fetch_at). */
  def frontierPlan(urls: DataFrame, urlCol: String, scoreCol: String,
                   idCol: String, budgets: DataFrame,
                   delays: DataFrame, defaultDelay: Double = 1.0,
                   suffixes: Seq[String] = DefaultPublicSuffixes,
                   domainCol: String = "domain"): DataFrame = {
    require(budgets.columns.length == 2,
      s"budgets must be (domain, budget), got ${budgets.columns.toSeq}")
    require(delays.columns.length == 2,
      s"delays must be (host, crawl_delay), got ${delays.columns.toSeq}")
    (Seq(domainCol, "rank", "fetch_at", "__budget", "__delay")).foreach(c =>
      require(!urls.columns.contains(c),
        s"frontierPlan stages a column named '$c'; rename the input's"))
    Selection.requireIntegralCol(urls, idCol, "frontierPlan idCol")
    val Seq(bDom, bCol) = budgets.columns.toSeq
    val Seq(dHost, dCol) = delays.columns.toSeq
    // compiled kernel form, not the column chain — the domain column
    // is referenced by the budget join, the rank, and the schedule
    // projection; inlined per reference the chain blew the 64 KB
    // codegen cap (see [[registeredDomainOfUrl]])
    val withDom = urls.withColumn(domainCol,
      registeredDomainOfUrl(col(urlCol), suffixes))
    // budget join is INNER: a domain with no budget is not crawled
    val budgeted = withDom.join(
      budgets.select(normalizeHost(col(bDom)).as(domainCol),
        col(bCol).cast("long").as("__budget")), domainCol)
    val ranked = graft.api.GlobalScan.groupedRowNumber(budgeted,
      Seq(domainCol),
      Seq(col(scoreCol).desc, col(idCol).asc), "rank")
      .filter(col("rank") <= col("__budget")).drop("__budget")
    ranked.join(
      delays.select(normalizeHost(col(dHost)).as(domainCol),
        col(dCol).cast("double").as("__delay")), Seq(domainCol), "left")
      .withColumn("fetch_at",
        (col("rank") - lit(1L)).cast("double") *
          coalesce(col("__delay"), lit(defaultDelay)))
      .drop("__delay")
  }

  /** Bloom over the index's url_keys for map-only streaming lookups
    * ([[graft.ops.Dedup.keyBloom]] — same treeAggregate build, byte
    * budget, and size-gated broadcast delivery as the band families).
    * Refresh at delta cost with [[urlKeyBloomDelta]] +
    * [[graft.ops.Dedup.mergeKeyBlooms]]; rebuild at compaction. */
  def urlKeyBloom(index: DataFrame, fpp: Double = 0.001,
                  sizeForKeys: Option[Long] = None): Dedup.BandKeyBloom =
    Dedup.keyBloom(index, "url_key", UrlCfg, fpp, sizeForKeys)

  def urlKeyBloomDelta(delta: DataFrame,
                       sizedLike: Dedup.BandKeyBloom): Dedup.BandKeyBloom =
    Dedup.keyBloomDelta(delta, "url_key", sizedLike)

  /** Map-only URL-membership drop for streams: keep rows whose
    * canonical URL is (probably) NOT in the bloom. False positives
    * over-drop (a new URL discarded), never under-drop — the
    * absorbable direction. Zero joins, zero state, zero per-trigger
    * index scans. */
  def dropUrlsAgainstBloom(df: DataFrame, urlCol: String,
                           bloom: Dedup.BandKeyBloom): DataFrame = {
    require(bloom.cfg == UrlCfg,
      s"bloom built under cfg '${bloom.cfg}', expected '$UrlCfg'")
    val contains = Dedup.bloomKeyFilter(df.sparkSession, bloom)
    df.filter(!contains(canonicalUrl(col(urlCol))))
  }
}
