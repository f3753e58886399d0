package graft.functions

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass HTML link-extraction kernels — the compiled form of the
  * r18/r19 `extractOutlinks` / `extractAnchors` column chains.
  *
  * Why a kernel and not the Column formulation it replaces: the chain
  * `transform(hrefs, v => resolveHref(effectiveBase(html, url))(v))`
  * re-inlined the FULL base-derivation expression subtree (the
  * `<base href>` when-chain plus scheme/authority/directory regexes)
  * into every `when` branch of every element lambda — the generated
  * Java method multiplied a large common subexpression per branch and
  * blew Janino's 64 KB method cap, so Spark silently fell back to
  * interpreted evaluation on THE dominant scan of the crawl pipeline
  * (r19 verdict lead finding; `ERROR CodeGenerator … Code grows beyond
  * 64 KB` in any link-graph run). Here the base parts (scheme,
  * authority, directory) are derived ONCE per row, each href resolves
  * with four small anchored regexes, and the expression compiles to a
  * single static call inside whole-stage codegen — the
  * [[TextKernels]] discipline (SURVEY.md §7 preference order: custom
  * Expression before mapPartitions). PlanAuditSpec's codegen-health
  * law keeps the fallback from regressing.
  *
  * Semantics are BIT-IDENTICAL to the certified column chains they
  * replace (q_outlinks / q_anchors / q_crawl_edges oracles, WebSpec
  * pins): every regex below is the exact pattern the old chain passed
  * to `regexp_extract(_all)` / `regexp_replace` / `rlike` — all of
  * which are java.util.regex under the hood — applied in the same
  * order, with Spark's `trim` (ASCII space only) and literal
  * `replace` semantics reproduced exactly. Reference for WHAT to
  * extract: flox has no web layer; this is §2.5b beyond-reference
  * surface (see ops/Web.scala's scaladoc for the resolution
  * contract).
  */
object WebKernels {

  // exact patterns from the r19 column chain (ops/Web.scala history)
  private val AHREF = Pattern.compile(
    "(?i)<a\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)")
  private val BASE = Pattern.compile(
    "(?i)<base\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)")
  private val ANCHOR_ELEM = Pattern.compile(
    "(?is)<a\\b[^>]*?\\shref\\s*=\\s*(?:\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>.*?</a>")
  private val AHREF_IS = Pattern.compile(
    "(?is)<a\\b[^>]*?\\shref\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)")
  private val QUOTES = Pattern.compile("^[\"']|[\"']$")
  private val FRAG = Pattern.compile("#.*$")
  private val HTTP_ABS = Pattern.compile("^(?i)https?://")
  private val ANY_SCHEME = Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*:")
  private val SCHEME_CAP = Pattern.compile("^([a-zA-Z][a-zA-Z0-9+.-]*)://")
  private val SCHEME_STRIP = Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*://")
  private val AUTH_CAP = Pattern.compile("^([^/?]*)")
  private val AUTH_STRIP = Pattern.compile("^[^/?]*")
  private val PATH_CAP = Pattern.compile("^([^?]*)")
  private val DIR_TAIL = Pattern.compile("[^/]*$")
  private val DOTSLASH = Pattern.compile("^(\\./)+")
  private val OPEN_TAG = Pattern.compile("(?is)^<a[^>]*>")
  private val CLOSE_TAG = Pattern.compile("(?is)</a>$")
  private val TAGS = Pattern.compile("<[^>]*>")
  private val WS_RUN = Pattern.compile("\\s+")
  // entity decode BEFORE whitespace collapse (the htmlToText order)
  private val entities = Array(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** `regexp_extract(s, p, 1)` — group 1 of the first find, `""` when
    * no match (Spark's no-match value). */
  private def extract1(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  /** Spark `trim`: ASCII space only, never \t\n. */
  private def trimSpaces(s: String): String = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == 0 && e == s.length) s else s.substring(b, e)
  }

  /** quote strip → fragment strip → trim, the shared href cleanup. */
  private def cleanHref(raw: String): String =
    trimSpaces(FRAG.matcher(
      QUOTES.matcher(raw).replaceAll("")).replaceAll(""))

  /** First match of `p` in `s` NOT inside an HTML comment, or null.
    *
    * LINEAR TIME against adversarial (attacker-supplied — this is
    * crawled HTML) pages: matches arrive in increasing position, and
    * the comment cursor below only ever moves FORWARD, so a page of
    * 60k commented tags costs one pass, not 60k × O(n) backward scans
    * (r20 review find — the same hardening class as the BMFF depth
    * cap). Comments do not nest: the first `-->` after an opener
    * closes it; an unclosed opener swallows the tail. Shared by the
    * `<base href>` scan and the `<meta charset>` sniff — BOTH corrupt
    * the WHOLE page when a commented-out tag is honored. */
  private def findUncommented(p: Pattern,
                              s: String): java.util.regex.Matcher = {
    val m = p.matcher(s)
    // current candidate comment span [cOpen, cEnd); cOpen < 0 = no
    // further comments; cEnd = Int.MaxValue = unclosed
    var cOpen = s.indexOf("<!--")
    var cEnd = -1
    def closeOf(open: Int): Int = {
      val c = s.indexOf("-->", open)
      if (c < 0) Int.MaxValue else c + 3
    }
    if (cOpen >= 0) cEnd = closeOf(cOpen)
    while (m.find()) {
      val pos = m.start()
      // advance the cursor over spans that end at/before pos
      while (cOpen >= 0 && cEnd != Int.MaxValue && cEnd <= pos) {
        cOpen = s.indexOf("<!--", cEnd)
        if (cOpen >= 0) cEnd = closeOf(cOpen)
      }
      if (!(cOpen >= 0 && cOpen <= pos && pos < cEnd)) return m
    }
    null
  }

  /** First `<base href>` value NOT inside an HTML comment — a
    * commented-out `<base>` tag must not silently rebase every link
    * on the page (r20 sweep; `<a>` inside comments stays extracted,
    * the documented heuristic trade). Multiple `<base>` tags: the
    * first (uncommented) one wins, per the HTML spec. */
  private def findBaseAttr(html: String): String = {
    val m = findUncommented(BASE, html)
    if (m == null) ""
    else {
      val g = m.group(1)
      if (g == null) "" else g
    }
  }

  /** The effective resolution base of a page: its own (defragmented)
    * URL unless a `<base href>` overrides it — absolute http(s)
    * replaces whole, root-/protocol-relative rebase on the page's
    * scheme/authority, anything else (relative base, no tag) falls
    * back to the page URL. Null baseUrl: only an absolute `<base>`
    * can still produce a base (the old chain's concat-null
    * propagation). */
  private def effectiveBase(html: String, baseUrl: String): String =
    effectiveBaseFromAttr(findBaseAttr(html), baseUrl)

  /** [[effectiveBase]] from an already-extracted RAW base attribute
    * value (quotes/fragment not yet stripped — the form a `<base>`
    * scan or a WAT `Head.Base` field carries) — the shared rule, so
    * the HTML extractors and the WAT link resolver cannot drift. */
  private[functions] def effectiveBaseFromAttr(rawBaseAttr: String,
                                               baseUrl: String): String = {
    val rawBase = cleanHref(if (rawBaseAttr == null) "" else rawBaseAttr)
    if (HTTP_ABS.matcher(rawBase).find()) return rawBase
    val pageDefrag =
      if (baseUrl == null) null else FRAG.matcher(baseUrl).replaceAll("")
    if (rawBase.startsWith("//")) {
      if (pageDefrag == null) return null
      val scheme = extract1(SCHEME_CAP, pageDefrag).toLowerCase(Locale.ROOT)
      scheme + ":" + rawBase
    } else if (rawBase.startsWith("/")) {
      if (pageDefrag == null) return null
      val scheme = extract1(SCHEME_CAP, pageDefrag).toLowerCase(Locale.ROOT)
      val rest = SCHEME_STRIP.matcher(pageDefrag).replaceAll("")
      scheme + "://" + extract1(AUTH_CAP, rest) + rawBase
    } else pageDefrag
  }

  /** scheme / authority / directory of the effective base, derived
    * ONCE per row — the parts the old chain re-derived per href per
    * when-branch. */
  private final class BaseParts(base: String) {
    val isNull: Boolean = base == null
    val scheme: String =
      if (isNull) null
      else extract1(SCHEME_CAP, base).toLowerCase(Locale.ROOT)
    private val rest: String =
      if (isNull) null else SCHEME_STRIP.matcher(base).replaceAll("")
    val auth: String = if (isNull) null else extract1(AUTH_CAP, rest)
    val dir: String =
      if (isNull) null
      else {
        val path = extract1(PATH_CAP, AUTH_STRIP.matcher(rest).replaceAll(""))
        if (path.contains("/")) DIR_TAIL.matcher(path).replaceAll("")
        else "/"
      }
  }

  /** RFC 3986-subset resolution (the contract in extractOutlinks'
    * scaladoc): absolute http(s) passes, other schemes drop, `//` and
    * `/` rebase on scheme/authority, relative appends to the base
    * DIRECTORY with leading `./` runs stripped, empty drops. Null
    * base parts: only absolute http(s) survives (concat-null). */
  private def resolve(p: BaseParts, raw: String): String = {
    val v = cleanHref(raw)
    if (HTTP_ABS.matcher(v).find()) v
    else if (ANY_SCHEME.matcher(v).find()) null
    else if (v.startsWith("//")) {
      if (p.isNull) null else p.scheme + ":" + v
    } else if (v.startsWith("/")) {
      if (p.isNull) null else p.scheme + "://" + p.auth + v
    } else if (v.nonEmpty) {
      if (p.isNull) null
      else p.scheme + "://" + p.auth + p.dir +
        DOTSLASH.matcher(v).replaceAll("")
    } else null
  }

  private val USERINFO = Pattern.compile("^[^@]*@")
  private val PORT = Pattern.compile(":[0-9]+$")
  private val TRAILING_DOTS = Pattern.compile("\\.+$")
  private val WWW_RUN = Pattern.compile("^(www\\.)+")
  private val IPV4 = Pattern.compile("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")

  /** Spark `lower` (UTF8_BINARY collation) — reuse UTF8String's own
    * implementation so non-ASCII casing is identical by construction. */
  private def lowerLikeSpark(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** `registeredDomain(hostOf(url), suffixes)` as ONE compiled call —
    * the edge-grain projection of [[graft.ops.Web.edgesFromDocuments]].
    * The column form is a when-chain that references its own host
    * subtree ~6 times, and the edge query references src/dst four
    * times each (project, null drop, length gate, self-loop filter):
    * fully inlined, the generated consume method multiplied the
    * authority regexes ~24× per side and blew Janino's 64 KB cap
    * right after the extractor fix moved the blowup downstream (r20).
    * Bit-identical mirror, regex for regex, of authorityOf → lower →
    * stripUserinfo → port strip → normalizeHost → registeredDomain
    * (ops/Web.scala:85-180); PropertySpec fuzzes the equivalence
    * against the column chain. */
  def registeredDomainOfUrl(urlU: UTF8String,
                            suffixes: java.util.HashSet[String]): UTF8String = {
    val url = urlU.toString
    // authorityOf: defrag, scheme strip, authority capture
    val rest = SCHEME_STRIP.matcher(
      FRAG.matcher(url).replaceAll("")).replaceAll("")
    val auth = extract1(AUTH_CAP, rest)
    // hostOf: lower → userinfo strip → port strip → normalizeHost
    val bare = PORT.matcher(
      USERINFO.matcher(lowerLikeSpark(auth)).replaceAll("")).replaceAll("")
    // normalizeHost: lower(trim(h)), trailing-dot run off, www. run
    // off unless the remainder has < 2 labels
    val base = TRAILING_DOTS.matcher(
      lowerLikeSpark(trimSpaces(bare))).replaceAll("")
    val stripped = WWW_RUN.matcher(base).replaceAll("")
    val host =
      if (stripped.split("\\.", -1).length >= 2) stripped else base
    // registeredDomain: last2 unless a known suffix (then last3);
    // <= 2 labels and IPv4 literals pass through whole
    val labels = host.split("\\.", -1)
    val n = labels.length
    val out =
      if (n <= 2 || IPV4.matcher(host).find()) host
      else {
        val last2 = labels(n - 2) + "." + labels(n - 1)
        if (suffixes.contains(last2)) labels(n - 3) + "." + last2
        else last2
      }
    UTF8String.fromString(out)
  }

  /** All resolved absolute outlink URLs of a page, duplicates kept in
    * document order (a page linking twice votes twice — the
    * domainRank multi-edge contract). */
  def extractOutlinks(htmlU: UTF8String, baseU: UTF8String): ArrayData = {
    val html = htmlU.toString
    val parts = new BaseParts(
      effectiveBase(html, if (baseU == null) null else baseU.toString))
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val m = AHREF.matcher(html)
    while (m.find()) {
      val r = resolve(parts, m.group(1))
      if (r != null) out += UTF8String.fromString(r)
    }
    new GenericArrayData(out.toArray)
  }

  /** Resolve ONE raw href value against (pageUrl, rawBaseAttr) — the
    * WAT ingest path: Common Crawl's WAT metadata carries RAW link
    * attribute values plus the page's `<base href>` as a separate
    * `Head.Base` field, so resolution runs per value instead of per
    * page scan. Same [[effectiveBaseFromAttr]]/[[resolve]] rule as
    * the HTML extractors, bit for bit (law-pinned: WAT-derived edges
    * ≡ [[extractOutlinks]]-derived edges on the linked fixture).
    * Null/dropped-scheme/empty values resolve to null. */
  def resolveHref(valueU: UTF8String, pageU: UTF8String,
                  baseAttrU: UTF8String): UTF8String = {
    if (valueU == null) return null
    val base = effectiveBaseFromAttr(
      if (baseAttrU == null) null else baseAttrU.toString,
      if (pageU == null) null else pageU.toString)
    val r = resolve(new BaseParts(base), valueU.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** The WHOLE-PAGE form of [[resolveHref]]: all of a capture's raw
    * values resolve against base parts derived ONCE — a 100-link WAT
    * record must not re-run the scheme/authority/directory regexes
    * 100× (r20 review find: the per-href re-derivation is exactly
    * what the r19 extractor kernels were built to eliminate;
    * [[graft.sources.Wat.watToLinks]] calls this BEFORE its
    * posexplode). Returns array&lt;struct&lt;raw, href&gt;&gt; so the
    * raw value rides along; a null element resolves to (null, null). */
  def resolveHrefs(valsU: ArrayData, pageU: UTF8String,
                   baseAttrU: UTF8String): ArrayData = {
    val parts = new BaseParts(effectiveBaseFromAttr(
      if (baseAttrU == null) null else baseAttrU.toString,
      if (pageU == null) null else pageU.toString))
    val n = valsU.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v = if (valsU.isNullAt(i)) null else valsU.getUTF8String(i)
      val r = if (v == null) null else resolve(parts, v.toString)
      out(i) = new GenericInternalRow(Array[Any](
        v, if (r == null) null else UTF8String.fromString(r)))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- robots.txt path matching (RFC 9309 §2.2.2-2.2.3) ----------------
  //
  // The rule test robotsFilter applies per (url, rule) JOIN ROW. Two
  // tiers, decided PER RULE (not per table — r19 verdict #3: the old
  // table-global gate let one wildcard rule on one host push EVERY
  // host's rules onto a per-row-compiled regex):
  //  - a rule with no '*' and no trailing '$' is a plain startsWith —
  //    zero matcher machinery, the overwhelmingly common case;
  //  - a wildcard rule splits ONCE per distinct prefix into its
  //    literal segments (held in a bounded cache) and matches with a
  //    GREEDY LEFTMOST GLOB walk — linear in the path, never
  //    java.util.regex: robots rules are CRAWLED (attacker-supplied)
  //    content, and a crafted '*a*a*a*…' rule drives regex
  //    backtracking superlinear on long paths (r20; the findBaseAttr
  //    hardening class).
  // Semantics are the RFC's: '*' matches ANY octet sequence and '$'
  // anchors the TRUE end of the path. (The r19 java-regex translation
  // had line-terminator artifacts — '.' refused '\n' and '$' also
  // matched before a trailing newline; the glob walk deliberately
  // fixes both, a divergence only on paths containing raw line
  // terminators, which are crawler junk either way.) PropertySpec
  // fuzz-pins the walk against an independently built Pattern.quote
  // reference compiled with DOTALL + \z across metachar-heavy and
  // newline-bearing samples.

  /** A split wildcard rule: literal segments around '*' runs, plus
    * the trailing-'$' end-anchor flag. */
  private final class RobotsRule(val segments: Array[String],
                                 val hasEnd: Boolean)

  private val robotsPatterns =
    new java.util.concurrent.ConcurrentHashMap[String, RobotsRule]()
  /** Far above any real rules table's distinct wildcard prefixes; a
    * crafted table that overflows it costs re-splits, not memory. */
  private[graft] val RobotsCacheCap = 1 << 14

  private[graft] def robotsPatternCacheSize(): Int = robotsPatterns.size()
  private[graft] def robotsPatternCacheClear(): Unit = robotsPatterns.clear()

  private def robotsRule(prefix: String): RobotsRule = {
    val cached = robotsPatterns.get(prefix)
    if (cached != null) return cached
    val hasEnd = prefix.endsWith("$")
    val body = if (hasEnd) prefix.substring(0, prefix.length - 1) else prefix
    val r = new RobotsRule(body.split("\\*", -1), hasEnd)
    if (robotsPatterns.size() >= RobotsCacheCap) {
      // Evict ONE arbitrary entry instead of clear() (r20 ADVICE): a
      // rules table slightly over the cap would otherwise re-split
      // every hot rule on every join row once the memo blows away.
      // Racy across executor threads by design — a transient few-entry
      // overshoot is benign; losing the whole memo is not.
      val it = robotsPatterns.keySet().iterator()
      if (it.hasNext) { it.next(); it.remove() }
    }
    robotsPatterns.put(prefix, r)
    r
  }

  /** Greedy leftmost glob match ≡ `^s0.*s1.*…sk[$]`.find(): s0 must
    * be a path prefix; middle segments match leftmost after the
    * previous one (greedy-leftmost preserves existence — the classic
    * glob result); with the end anchor the LAST segment must also be
    * a path suffix starting at/after the walk position. Linear in
    * |path|·|rule| with zero backtracking. */
  private def globMatch(path: String, r: RobotsRule): Boolean = {
    val segs = r.segments
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    val lastIdx = segs.length - 1
    var i = 1
    val mid = if (r.hasEnd) lastIdx else segs.length
    while (i < mid) {
      val s = segs(i)
      if (s.nonEmpty) {
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (!r.hasEnd) true
    else if (lastIdx == 0) pos == path.length // no '*': exact match
    else {
      val s = segs(lastIdx)
      path.length - s.length >= pos && path.endsWith(s)
    }
  }

  // ---- charset-aware HTML decode ---------------------------------------
  //
  // Real crawls are not all UTF-8: a latin-1/windows-1252 page decoded
  // as UTF-8 shreds every non-ASCII char into U+FFFD before the
  // extractor ever runs. Resolution order (the WHATWG precedence,
  // heuristically): the HTTP Content-Type `charset=` parameter, else a
  // `<meta charset=…>` / http-equiv sniff over the first 1024 payload
  // bytes (read as ISO-8859-1 — an ASCII superset, safe for sniffing),
  // else UTF-8. Unknown/unsupported names fall back to UTF-8; decode
  // errors REPLACE (never throw — crawled bytes are arbitrary).

  private val CharsetParam = Pattern.compile(
    "(?i)charset\\s*=\\s*[\"']?([^;\\s\"']+)")
  private val MetaCharset = Pattern.compile(
    "(?i)<meta[^>]{0,200}?charset\\s*=\\s*[\"']?([^\\s\"'/>;]+)")

  private def charsetOrNull(name: String): java.nio.charset.Charset =
    try java.nio.charset.Charset.forName(name.trim)
    catch { case _: Exception => null }

  /** Decode an HTML payload with charset resolution — see the section
    * comment. Resolution order (WHATWG): a BYTE-ORDER MARK beats
    * everything (it is the encoder's own stamp — a BOM'd UTF-16 page
    * with a lying header must not shred; the BOM bytes are consumed,
    * never a phantom U+FEFF first char — r20 review find, the WET
    * defect's WARC twin), then the header `charset=` param, then the
    * `<meta charset>` sniff (COMMENT-AWARE — a commented-out meta
    * must not corrupt the page's decode, the findBaseAttr hardening
    * class), then UTF-8. An UNKNOWN header charset name falls THROUGH
    * to the sniff (the header said nothing usable); WarcSpec pins the
    * order. Null httpContentType is legal. Decoding is
    * `new String(bytes, charset)` — specified to REPLACE malformed/
    * unmappable input (identical to explicit CodingErrorAction
    * decoders) on the JDK's intrinsified fast paths, no per-row
    * decoder/CharBuffer allocation (r20 review find). */
  def decodeHtml(payload: Array[Byte], ctU: UTF8String): UTF8String = {
    val n = payload.length
    if (n >= 3 && payload(0) == 0xEF.toByte && payload(1) == 0xBB.toByte &&
      payload(2) == 0xBF.toByte)
      return UTF8String.fromString(new String(payload, 3, n - 3,
        java.nio.charset.StandardCharsets.UTF_8))
    if (n >= 2 && payload(0) == 0xFE.toByte && payload(1) == 0xFF.toByte)
      return UTF8String.fromString(new String(payload, 2, n - 2,
        java.nio.charset.StandardCharsets.UTF_16BE))
    if (n >= 2 && payload(0) == 0xFF.toByte && payload(1) == 0xFE.toByte)
      return UTF8String.fromString(new String(payload, 2, n - 2,
        java.nio.charset.StandardCharsets.UTF_16LE))
    var cs: java.nio.charset.Charset = null
    if (ctU != null) {
      val m = CharsetParam.matcher(ctU.toString)
      if (m.find()) cs = charsetOrNull(m.group(1))
    }
    if (cs == null) {
      val head = new String(payload, 0, math.min(1024, n),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val m = findUncommented(MetaCharset, head)
      if (m != null) cs = charsetOrNull(m.group(1))
    }
    if (cs == null) cs = java.nio.charset.StandardCharsets.UTF_8
    UTF8String.fromString(new String(payload, cs))
  }

  private val StarU = UTF8String.fromString("*")
  private val DollarU = UTF8String.fromString("$")

  /** Does robots rule `prefix` match URL `path` (RFC 9309 §2.2.2)?
    * Wildcard-free rules never touch the regex tier or its cache
    * (WebSpec law observes the cache to pin this). The fast tier is
    * ALLOCATION-FREE (UTF8String byte ops — '*'/'$' are ASCII and
    * cannot occur inside a UTF-8 continuation, so byte search is
    * exact): this runs once per (url × rule) join row, the hot path
    * the kernel exists for (r20 review find). */
  def robotsPathMatch(pathU: UTF8String, prefixU: UTF8String): Boolean = {
    if (!prefixU.contains(StarU) && !prefixU.endsWith(DollarU))
      pathU.startsWith(prefixU)
    else
      globMatch(pathU.toString, robotsRule(prefixU.toString))
  }

  /** (href, text) pairs of every CLOSED anchor element whose href
    * resolves — text de-tagged, entity-decoded (before the whitespace
    * collapse), collapsed, trimmed; empty text kept (image links). */
  def extractAnchors(htmlU: UTF8String, baseU: UTF8String): ArrayData = {
    val html = htmlU.toString
    val parts = new BaseParts(
      effectiveBase(html, if (baseU == null) null else baseU.toString))
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val m = ANCHOR_ELEM.matcher(html)
    while (m.find()) {
      val e = m.group(0)
      val href = resolve(parts, extract1(AHREF_IS, e))
      if (href != null) {
        val inner = CLOSE_TAG.matcher(
          OPEN_TAG.matcher(e).replaceAll("")).replaceAll("")
        var t = TAGS.matcher(inner).replaceAll(" ")
        var i = 0
        while (i < entities.length) {
          t = t.replace(entities(i)._1, entities(i)._2)
          i += 1
        }
        val text = trimSpaces(WS_RUN.matcher(t).replaceAll(" "))
        out += new GenericInternalRow(Array[Any](
          UTF8String.fromString(href), UTF8String.fromString(text)))
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `registeredDomain(hostOf(url))` as one compiled call — see
  * [[WebKernels.registeredDomainOfUrl]]. Null url → null. */
case class RegisteredDomainOfUrl(child: Expression, suffixes: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StringType

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    suffixes.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    WebKernels.registeredDomainOfUrl(input.asInstanceOf[UTF8String], set)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("suffixSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WebKernels.registeredDomainOfUrl($c, $ref)")
  }

  override protected def withNewChildInternal(
      c: Expression): RegisteredDomainOfUrl = copy(child = c)
}

/** Shared shape of the two link-extraction expressions: null iff the
  * HTML is null (a null page URL still extracts absolute links — the
  * certified concat-null semantics), so the default BinaryExpression
  * null contract (null if EITHER child is null) does not apply and
  * eval/codegen are written out by hand. */
abstract class HtmlExtractExpr extends BinaryExpression
    with ImplicitCastInputTypes {

  /** html */
  def left: Expression
  /** page URL (resolution base) */
  def right: Expression

  override def inputTypes = Seq(StringType, StringType)

  override def nullable: Boolean = left.nullable

  /** graft.functions.WebKernels method name the row maps through. */
  protected def kernel: String

  protected def kernelEval(html: UTF8String, base: UTF8String): ArrayData

  override def eval(input: InternalRow): Any = {
    val h = left.eval(input)
    if (h == null) null
    else kernelEval(h.asInstanceOf[UTF8String],
      right.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val h = left.genCode(ctx)
    val b = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${h.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${h.isNull}) {
          ${b.code}
          ${ev.value} = graft.functions.WebKernels.$kernel(
            ${h.value}, ${b.isNull} ? null : ${b.value});
          ${ev.isNull} = false;
        }
      """)
  }
}

/** array&lt;string&gt; of resolved absolute outlinks — see
  * [[WebKernels.extractOutlinks]]. */
case class ExtractOutlinksExpr(left: Expression, right: Expression)
    extends HtmlExtractExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def kernel = "extractOutlinks"
  override protected def kernelEval(h: UTF8String, b: UTF8String): ArrayData =
    WebKernels.extractOutlinks(h, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ExtractOutlinksExpr = copy(l, r)
}

/** array&lt;struct&lt;href,text&gt;&gt; of resolved anchors — see
  * [[WebKernels.extractAnchors]]. */
case class ExtractAnchorsExpr(left: Expression, right: Expression)
    extends HtmlExtractExpr {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)
  override protected def kernel = "extractAnchors"
  override protected def kernelEval(h: UTF8String, b: UTF8String): ArrayData =
    WebKernels.extractAnchors(h, b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ExtractAnchorsExpr = copy(l, r)
}

/** Charset-aware HTML payload decode — see [[WebKernels.decodeHtml]].
  * Null iff the payload is null (a null Content-Type just means
  * sniff-then-UTF-8), so eval/codegen are hand-written. */
case class DecodeHtmlExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(
    org.apache.spark.sql.types.BinaryType, StringType)

  override def dataType: DataType = StringType

  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    if (p == null) null
    else WebKernels.decodeHtml(p.asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val p = left.genCode(ctx)
    val c = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${p.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${p.isNull}) {
          ${c.code}
          ${ev.value} = graft.functions.WebKernels.decodeHtml(
            ${p.value}, ${c.isNull} ? null : ${c.value});
          ${ev.isNull} = false;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DecodeHtmlExpr = copy(l, r)
}

/** RFC 9309 rule match — see [[WebKernels.robotsPathMatch]]: per-rule
  * tiering (plain prefixes stay on startsWith; wildcard rules hit a
  * memoized segment split + linear glob walk), so one wildcard rule
  * anywhere no longer drags every host onto a per-row regex compile
  * (r19 verdict #3) and a crafted rule cannot drive regex
  * backtracking (r20). Null path or prefix → null (no match
  * decision). */
case class RobotsPathMatch(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType)

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType

  override protected def nullSafeEval(path: Any, prefix: Any): Any =
    WebKernels.robotsPathMatch(path.asInstanceOf[UTF8String],
      prefix.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, r) =>
      s"graft.functions.WebKernels.robotsPathMatch($p, $r)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): RobotsPathMatch = copy(l, r)
}

/** Resolve one raw href value against (pageUrl, baseAttr) — the WAT
  * link resolver, sharing [[WebKernels]]' effectiveBase/resolve rule
  * with the HTML extractors. NULLABLE BY DESIGN: a dropped scheme
  * (mailto/javascript), an empty value, or an unresolvable relative
  * (null page URL, no absolute base) yields null — the caller
  * filters. pageUrl/baseAttr null are legal inputs (concat-null
  * semantics live in the kernel), so eval/codegen are hand-written
  * like [[HtmlExtractExpr]]. */
case class ResolveHrefExpr(first: Expression, second: Expression,
                           third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType, StringType)

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    if (v == null) null
    else WebKernels.resolveHref(v.asInstanceOf[UTF8String],
      second.eval(input).asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val v = first.genCode(ctx)
    val p = second.genCode(ctx)
    val b = third.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${v.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${v.isNull}) {
          ${p.code}
          ${b.code}
          ${ev.value} = graft.functions.WebKernels.resolveHref(
            ${v.value},
            ${p.isNull} ? null : ${p.value},
            ${b.isNull} ? null : ${b.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ResolveHrefExpr =
    copy(f, s, t)
}

/** Whole-page href resolution — see [[WebKernels.resolveHrefs]]: base
  * parts derive once per row, every raw value maps through the shared
  * rule, output array&lt;struct&lt;raw, href&gt;&gt; (href null =
  * dropped scheme / empty / unresolvable). Null only when the VALUES
  * array is null (a WAT capture with no Links); pageUrl/baseAttr null
  * are legal inputs, so eval/codegen are hand-written like
  * [[HtmlExtractExpr]]. */
case class ResolveHrefsExpr(first: Expression, second: Expression,
                            third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), StringType,
    StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("raw", StringType, nullable = true),
    StructField("href", StringType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = first.nullable

  override def eval(input: InternalRow): Any = {
    val v = first.eval(input)
    if (v == null) null
    else WebKernels.resolveHrefs(v.asInstanceOf[ArrayData],
      second.eval(input).asInstanceOf[UTF8String],
      third.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val v = first.genCode(ctx)
    val p = second.genCode(ctx)
    val b = third.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${v.code}
        boolean ${ev.isNull} = true;
        $javaType ${ev.value} = null;
        if (!${v.isNull}) {
          ${p.code}
          ${b.code}
          ${ev.value} = graft.functions.WebKernels.resolveHrefs(
            ${v.value},
            ${p.isNull} ? null : ${p.value},
            ${b.isNull} ? null : ${b.value});
          ${ev.isNull} = false;
        }
      """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ResolveHrefsExpr =
    copy(f, s, t)
}
