package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-feature kernels. The quality-score query needed five
  * separate scans of every document (a regex replace per character
  * class plus interpreted HOF filters for stopwords) — at 100 TB each
  * extra pass is a full reread of the text corpus. These kernels fold
  * the passes into one tight loop each, with semantics bit-matched to
  * the certified column-expression formulations they replace (Java
  * regex `\s` whitespace set, `split` leading-empty-token behavior,
  * ASCII-only alnum classes, code-point counting).
  */
object TextKernels {

  /** All per-category PII match counts in ONE String conversion:
    * per pattern a plain find() loop — the count `size(
    * regexp_extract_all(text, re, 0))` computes, without materializing
    * the match array or converting the UTF8String once per category. */
  def piiCounts(text: UTF8String,
                patterns: Array[java.util.regex.Pattern]): ArrayData = {
    val s = text.toString
    val out = new Array[Long](patterns.length)
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      var c = 0L
      while (m.find()) c += 1
      out(i) = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Necessary-condition PII prefilter as ONE raw byte scan — no
    * String conversion, no regex: true iff the text contains '@' or
    * ':' or at least two digit bytes. Exactly equivalent to
    * `contains('@') || contains(':') || rlike("(?s)[0-9].*[0-9]")`
    * (two digit positions in order == any two digit occurrences), and
    * safe on raw UTF-8 bytes: 0x30-0x39/0x3A/0x40 never appear inside
    * multibyte sequences (continuation bytes are >= 0x80). The r13
    * measurement that motivated it: the rlike formulation cost about
    * as much as the kernels it gated (String conversion + regex scan),
    * making the sparse gate cost-neutral; this scan is ~free. */
  def mayContainPii(text: UTF8String): Boolean = {
    val n = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    var digits = 0
    var i = 0L
    while (i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b == '@' || b == ':') return true
      if (b >= '0' && b <= '9') {
        digits += 1
        if (digits >= 2) return true
      }
      i += 1
    }
    false
  }

  /** Ordered multi-category redaction in ONE String conversion:
    * replaceAll per pattern, in declared order — bit-identical to the
    * chained `regexp_replace` fold (mask tokens contain no `$`/`\`,
    * so literal replaceAll == regexp_replace's group-ref semantics). */
  def piiRedact(text: UTF8String, patterns: Array[java.util.regex.Pattern],
                tokens: Array[String]): UTF8String = {
    var s = text.toString
    var changed = false
    var i = 0
    while (i < patterns.length) {
      val m = patterns(i).matcher(s)
      // match-gated: a no-match row returns its INPUT UTF8String
      // bytes, never the String round-trip — on malformed UTF-8 the
      // round-trip substitutes U+FFFD, which broke the
      // scrubSparse ≡ scrub law bit-for-bit (Pii.scala's gated-off
      // path passes raw bytes through; r14 review). replaceAll
      // resets the matcher, so find-then-replaceAll is sound.
      if (m.find()) { s = m.replaceAll(tokens(i)); changed = true }
      i += 1
    }
    if (changed) UTF8String.fromString(s) else text
  }

  // Java regex \s — exactly [ \t\n\x0B\f\r], NOT Character.isWhitespace
  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  private val stopwords =
    Array("a", "the", "and", "of", "to", "is", "in")

  private def isStop(t: String, from: Int, until: Int): Boolean = {
    var k = 0
    while (k < stopwords.length) {
      val w = stopwords(k)
      if (until - from == w.length && t.regionMatches(from, w, 0, w.length))
        return true
      k += 1
    }
    false
  }

  /** (n_tokens, len_nws, n_stop, n_punct, n_digit) of LOWERCASED text in
    * one pass. Token semantics = `split(trim(s), "\\s+")` with the empty
    * guard: space-only trim, leading OR trailing non-space whitespace
    * each yield one empty token (split limit -1 keeps both), empty
    * trimmed string yields zero. Char classes count CODE POINTS
    * (Spark `length` semantics): digit = [0-9], punct = non-whitespace
    * that is not [a-z0-9] (non-Latin letters intentionally count as
    * punct — the certified heuristic's behavior). */
  def qualityFeatures(u: UTF8String): InternalRow = {
    val t = u.toString
    var lenNws = 0L
    var punct = 0L
    var digit = 0L
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      if (!isWs(cp)) {
        lenNws += 1
        if (cp >= '0' && cp <= '9') digit += 1
        else if (!(cp >= 'a' && cp <= 'z')) punct += 1
      }
      i += Character.charCount(cp)
    }
    var b = 0
    var e = t.length
    while (b < e && t.charAt(b) == ' ') b += 1
    while (e > b && t.charAt(e - 1) == ' ') e -= 1
    var nTok = 0L
    var nStop = 0L
    if (e > b) {
      // Spark split() runs with limit -1: a whitespace run at either end
      // of the (space-)trimmed string yields an EMPTY token there
      if (isWs(t.charAt(b))) nTok += 1
      if (isWs(t.charAt(e - 1))) nTok += 1
      var j = b
      while (j < e) {
        while (j < e && isWs(t.charAt(j))) j += 1
        if (j < e) {
          val st = j
          while (j < e && !isWs(t.charAt(j))) j += 1
          nTok += 1
          if (isStop(t, st, j)) nStop += 1
        }
      }
    }
    new GenericInternalRow(Array[Any](nTok, lenNws, nStop, punct, digit))
  }

  // Gopher's required-stopword list (Rae et al. 2021 A1.1), fixed by
  // the rule itself — membership is DISTINCT (array_contains per word,
  // counted once each), hence the bitmask, not a per-token counter.
  private val gopherStops =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  private def gopherStopIdx(t: String, from: Int, until: Int): Int = {
    var k = 0
    while (k < gopherStops.length) {
      val w = gopherStops(k)
      if (until - from == w.length && t.regionMatches(from, w, 0, w.length))
        return k
      k += 1
    }
    -1
  }

  /** (n_words, sum_len, n_alpha, n_stop) of LOWERCASED text in one
    * pass — the Gopher rule-filter counts (RuleFilters.gopherMetrics).
    * Token semantics = the nonempty elements of `split(trim(s),
    * "\\s+")`, i.e. maximal runs of non-`\s` chars; token length
    * counts CODE POINTS (Spark `length`); alpha = token contains an
    * [a-z] code point (the `rlike("[a-z]")` test); n_stop = distinct
    * Gopher stopwords present. Bit-identical to the HOF formulation
    * it replaces (RuleFiltersSpec pins the law). */
  def gopherStats(u: UTF8String): InternalRow = {
    val t = u.toString
    var words = 0L
    var sumLen = 0L
    var alpha = 0L
    var stopMask = 0
    var i = 0
    val n = t.length
    while (i < n) {
      val cp = t.codePointAt(i)
      if (isWs(cp)) i += Character.charCount(cp)
      else {
        val start = i
        var chars = 0L
        var hasAlpha = false
        var j = i
        while (j < n && !isWs(t.codePointAt(j))) {
          val c = t.codePointAt(j)
          if (c >= 'a' && c <= 'z') hasAlpha = true
          chars += 1
          j += Character.charCount(c)
        }
        words += 1
        sumLen += chars
        if (hasAlpha) alpha += 1
        val si = gopherStopIdx(t, start, j)
        if (si >= 0) stopMask |= 1 << si
        i = j
      }
    }
    new GenericInternalRow(Array[Any](
      words, sumLen, alpha, java.lang.Integer.bitCount(stopMask).toLong))
  }

  private val langs = Array("en", "es", "de", "fr", "zh")
  private val markers: Array[Array[UTF8String]] = Array(
    Array("the", "a", "is", "and"),
    Array("el", "la", "es", "que"),
    Array("der", "die", "und", "ist"),
    Array("le", "les", "est", "une"),
    Array("的", "是", "了")).map(_.map(UTF8String.fromString))
  private val langsU = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  /** Best marker-list language over a token array in one pass: highest
    * hit count wins, ties to the earlier list, zero evidence -> "und"
    * (identical to the foldRight of when() branches it replaces). */
  def langId(tokens: ArrayData): UTF8String = {
    val counts = new Array[Int](langs.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      if (tok != null) {
        var l = 0
        while (l < markers.length) {
          val ms = markers(l)
          var m = 0
          while (m < ms.length) {
            if (tok.equals(ms(m))) counts(l) += 1
            m += 1
          }
          l += 1
        }
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < counts.length) {
      if (counts(l) > counts(best)) best = l
      l += 1
    }
    if (counts(best) > 0) langsU(best) else und
  }

  private val space = UTF8String.fromString(" ")

  /** Depth-d deletion neighborhood of a string (itself + every string
    * reachable by deleting up to d chars), distinct, insertion-ordered. */
  def deletionNeighborhood(u: UTF8String, maxDeletes: Int): ArrayData = {
    val s = u.toString
    val out = new java.util.LinkedHashSet[String]()
    out.add(s)
    var frontier: Seq[String] = Seq(s)
    var d = 0
    while (d < maxDeletes) {
      frontier = frontier.flatMap { t =>
        (0 until t.length).iterator
          .map(i => t.substring(0, i) + t.substring(i + 1))
          .filter(out.add)
          .toSeq
      }
      d += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr)
  }

  /** (n_tokens, distinct_ratio, top_bigram_frac) of LOWERCASED text in
    * ONE pass — the fused form of tokenCount + size(array_distinct(
    * tokens)) + topShingleFrac(tokens, 2), which tokenized the text
    * three separate times and materialized two arrays per row. Token
    * semantics identical to `split(trim(s), "\s+")` limit -1 (empty
    * edge tokens for non-space whitespace at either end, zero tokens
    * for all-space text). Conventions preserved: blank doc -> (0, 0.0,
    * 0.0); single token -> top_bigram_frac 0.0. */
  def repetitionStats(u: UTF8String): InternalRow = {
    val t = u.toString
    var b = 0
    var e = t.length
    while (b < e && t.charAt(b) == ' ') b += 1
    while (e > b && t.charAt(e - 1) == ' ') e -= 1
    if (e <= b)
      return new GenericInternalRow(Array[Any](0L, 0.0, 0.0))
    val distinct = new java.util.HashSet[String]()
    val bigrams = new java.util.HashMap[String, Integer]()
    var nTok = 0L
    var prev: String = null
    var maxBi = 0
    def feed(tok: String): Unit = {
      nTok += 1
      distinct.add(tok)
      if (prev != null) {
        val c = bigrams.merge(prev + " " + tok, 1, (a: Integer, x: Integer) => a + x)
        if (c > maxBi) maxBi = c
      }
      prev = tok
    }
    if (isWs(t.charAt(b))) feed("")
    var j = b
    while (j < e) {
      while (j < e && isWs(t.charAt(j))) j += 1
      if (j < e) {
        val st = j
        while (j < e && !isWs(t.charAt(j))) j += 1
        feed(t.substring(st, j))
      }
    }
    if (isWs(t.charAt(e - 1))) feed("")
    val dr = distinct.size.toDouble / nTok
    val tf = if (nTok < 2) 0.0 else maxBi.toDouble / (nTok - 1)
    new GenericInternalRow(Array[Any](nTok, dr, tf))
  }

  /** Highest single-shingle share of a document's k-gram stream:
    * max(count) / total over space-joined k-grams of the token array —
    * the Gopher-style top-bigram fraction at k = 2, in ONE pass per
    * row. Replaces explode(shingles) + two grouped aggregations (a
    * corpus-wide shuffle of every bigram) with a per-row hash count.
    * < k tokens -> 0.0, matching the LEFT JOIN + coalesce(_, 0.0) of
    * the grouped formulation it replaces. Null token -> null (the
    * fraction over a partially-missing stream is garbage). */
  def topShingleFrac(tokens: ArrayData, k: Int): java.lang.Double = {
    val n = tokens.numElements()
    if (n < k) return 0.0
    val counts = new java.util.HashMap[UTF8String, Integer]()
    var max = 0
    var i = 0
    while (i <= n - k) {
      var s = tokens.getUTF8String(i)
      if (s == null) return null
      var j = 1
      while (j < k) {
        val t = tokens.getUTF8String(i + j)
        if (t == null) return null
        s = UTF8String.concat(s, space, t)
        j += 1
      }
      val c = counts.merge(s, 1, (a: Integer, b: Integer) => a + b)
      if (c > max) max = c
      i += 1
    }
    max.toDouble / (n - k + 1)
  }

  /** Add-k bigram NLL of a token array under a local model map (bigram
    * "l r" and history-marginal "l" keys share the map — unigram keys
    * contain no space, so they cannot collide). One pass, two O(1)
    * lookups per bigram. Semantics bit-matched to the join-path
    * [[graft.ops.LanguageModel.scoreDocs]]. */
  def bigramNll(arr: ArrayData,
                model: java.util.HashMap[String, java.lang.Long],
                v: Long, k: Double): InternalRow = {
    val n = arr.numElements()
    var sum = 0.0
    var cnt = 0L
    var i = 0
    var prev: String = if (n > 0) arr.getUTF8String(0).toString else null
    while (i < n - 1) {
      val cur = arr.getUTF8String(i + 1).toString
      val c = model.get(prev + " " + cur)
      val h = model.get(prev)
      sum -= math.log((if (c == null) 0L else c.longValue()) + k) -
        math.log((if (h == null) 0L else h.longValue()) + k * v)
      cnt += 1
      prev = cur
      i += 1
    }
    new GenericInternalRow(Array[Any](cnt, if (cnt == 0L) null else sum / cnt))
  }

  /** Canonical BPE encode of a token array under a LOCAL rank map
    * (key "l r" → merge rank): per token, repeatedly merge the
    * LOWEST-RANK adjacent pair present (all its non-overlapping
    * occurrences, left to right) until none remains — the
    * subword-nmt / HF-tokenizers apply_bpe loop. Subwords of all
    * tokens are emitted in order; empty tokens are skipped (the
    * wordFrequency filter). O(|word|²·merges-applied) per DISTINCT
    * word shape, on short natural-language tokens. */
  def bpeSegmentAll(arr: ArrayData,
                    ranks: java.util.HashMap[String, Integer],
                    marker: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val mark = marker.toString
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t).toString
      if (tok.nonEmpty) {
        var syms = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          syms += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        syms += mark
        var go = true
        while (go) {
          var bestRank = Integer.MAX_VALUE
          var bl: String = null
          var br: String = null
          var j = 0
          while (j < syms.length - 1) {
            val r = ranks.get(syms(j) + " " + syms(j + 1))
            if (r != null && r.intValue() < bestRank) {
              bestRank = r.intValue(); bl = syms(j); br = syms(j + 1)
            }
            j += 1
          }
          if (bl == null) go = false
          else {
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var p = 0
            while (p < syms.length) {
              if (p + 1 < syms.length && syms(p) == bl && syms(p + 1) == br) {
                merged += bl + br; p += 2
              } else { merged += syms(p); p += 1 }
            }
            syms = merged
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Struct of the five per-document quality counts from one text pass.
  * Input must already be lowercased (compose with `lower(text)`). */
case class QualityFeatures(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("len_nws", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.qualityFeatures(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.qualityFeatures($c)")

  override protected def withNewChildInternal(c: Expression): QualityFeatures =
    copy(child = c)
}

/** Struct of the four Gopher rule-filter counts from one text pass
  * (TextKernels.gopherStats). Input must already be lowercased. */
case class GopherStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.gopherStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.gopherStats($c)")

  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
}

/** All PII category counts over one text value as array<long> (order =
  * declared category order): one String conversion + one find() loop
  * per pattern, replacing a `size(regexp_extract_all(...))` per
  * category (each of which re-converted the string AND materialized
  * its match array). Patterns compile once per executor via the lazy
  * field; codegen references the compiled array (`addReferenceObj` —
  * java.util.regex.Pattern is Serializable). */
case class PiiCountsExpr(child: Expression, regexes: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    regexes.map(java.util.regex.Pattern.compile).toArray

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.piiCounts(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("piiPatterns", compiled,
      "java.util.regex.Pattern[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.piiCounts($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PiiCountsExpr =
    copy(child = c)
}

/** Byte-scan necessary-condition PII prefilter
  * ([[TextKernels.mayContainPii]]) — the `Pii.scrubSparse` gate. */
case class PiiMayContain(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.mayContainPii(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.mayContainPii($c)")

  override protected def withNewChildInternal(c: Expression): PiiMayContain =
    copy(child = c)
}

/** Ordered PII redaction over one text value: the chained
  * `regexp_replace` fold as one String conversion + in-order
  * replaceAll passes. Bit-identical by construction (mask tokens
  * contain no replacement metacharacters); PropertySpec pins the law
  * against the fold formulation. */
case class PiiRedactExpr(child: Expression, regexes: Seq[String],
                         tokens: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(regexes.length == tokens.length, "one token per regex")
  require(tokens.forall(t => !t.contains("$") && !t.contains("\\")),
    "mask tokens must be literal (no $ group refs / escapes)")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StringType

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    regexes.map(java.util.regex.Pattern.compile).toArray

  @transient private lazy val toks: Array[String] = tokens.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.piiRedact(input.asInstanceOf[UTF8String], compiled, toks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("piiPatterns", compiled,
      "java.util.regex.Pattern[]")
    val tRef = ctx.addReferenceObj("piiTokens", toks, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.piiRedact($c, $pRef, $tRef)")
  }

  override protected def withNewChildInternal(c: Expression): PiiRedactExpr =
    copy(child = c)
}

/** All distinct strings reachable by deleting up to `maxDeletes`
  * characters (the SymSpell deletion neighborhood; includes the string
  * itself). Two strings within Levenshtein distance d always share at
  * least one member of their depth-d neighborhoods, so an equi-join on
  * the exploded neighborhood is a LOSSLESS candidate generator for an
  * edit-distance join — the candidates are then verified with the exact
  * `levenshtein`. Neighborhood size is C(len, d)-ish per row (len+1 at
  * d=1), so keep d small (1-2) and strings short (names/titles, not
  * documents). */
case class DeletionNeighborhood(child: Expression, maxDeletes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(maxDeletes >= 1 && maxDeletes <= 2,
    "maxDeletes must be 1 or 2 (neighborhood size explodes beyond that)")

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deletionNeighborhood(input.asInstanceOf[UTF8String], maxDeletes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.deletionNeighborhood($c, $maxDeletes)")

  override protected def withNewChildInternal(c: Expression): DeletionNeighborhood =
    copy(child = c)
}

/** Struct of the three per-document repetition signals from one text
  * pass. Input must already be lowercased (compose with `lower(text)`). */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("distinct_ratio", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.repetitionStats($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** Marker-list language ID over a token array, single pass. */
case class LangIdBest(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")

  override protected def withNewChildInternal(c: Expression): LangIdBest =
    copy(child = c)
}

/** Context-window chunking as a one-pass GENERATOR: tokenize the
  * (already lowercased) text and emit one (chunk_idx, n_chunk_tokens,
  * chunk_text) row per stride-spaced window, straight off the token
  * boundaries. The composed formulation it replaces — split() to a
  * token array, explode(sequence(0, nc-1)), slice(), array_join() —
  * re-evaluated the regex split several times per row (filter +
  * projection branches) and copied the full token array into every
  * exploded output row before slicing, O(windows x doc) bytes per
  * document; this emits O(output) bytes total and reads the text once.
  *
  * Token semantics are bit-matched to `split(trim(lowered), "\s+")`
  * with Spark's space-only trim and Java split limit -1: a leading or
  * trailing non-space whitespace run yields an empty token at that end,
  * an all-space or empty string yields no rows (the old pipeline's
  * `tokenCount == 0` filter), null text yields no rows (the old
  * `null > 0` filter). Window count = ceil(max(n-size,0)/stride) + 1.
  */
case class ChunkWindows(child: Expression, size: Int, stride: Int,
                        emitEmptyDoc: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback
    with ImplicitCastInputTypes {

  require(size >= 1 && stride >= 1, "size and stride must be >= 1")
  require(stride <= size, "stride > size would drop tokens between windows")

  override def inputTypes = Seq(StringType)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("n_chunk_tokens", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  // Java regex \s — the token separator set of the certified split()
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val u = child.eval(input).asInstanceOf[UTF8String]
    if (u == null) return Nil
    val t = u.toString
    // Spark trim() strips 0x20 spaces only; other whitespace survives
    // and produces the empty edge tokens below
    var b = 0
    var e = t.length
    while (b < e && t.charAt(b) == ' ') b += 1
    while (e > b && t.charAt(e - 1) == ' ') e -= 1
    if (e <= b) {
      // all-space/empty text. chunks semantics (tokenCount == 0 filter):
      // no rows. passages semantics (ceil(size(split)/w), no zero
      // guard — split of the trimmed-empty string is [""], ONE token):
      // a single empty window.
      return if (!emitEmptyDoc) Nil
      else Seq(new GenericInternalRow(Array[Any](
        0L, 1L, UTF8String.EMPTY_UTF8)))
    }
    // token boundaries, including split-limit -1 empty edge tokens
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    if (isWs(t.charAt(b))) { starts.add(b); ends.add(b) }
    var j = b
    while (j < e) {
      while (j < e && isWs(t.charAt(j))) j += 1
      if (j < e) {
        val st = j
        while (j < e && !isWs(t.charAt(j))) j += 1
        starts.add(st); ends.add(j)
      }
    }
    if (isWs(t.charAt(e - 1))) { starts.add(e); ends.add(e) }
    val n = starts.size()
    val nc = ((math.max(n - size, 0) + stride - 1) / stride) + 1
    val out = new Array[InternalRow](nc)
    var ci = 0
    while (ci < nc) {
      val from = ci * stride
      val until = math.min(from + size, n)
      val sb = new java.lang.StringBuilder()
      var k = from
      while (k < until) {
        if (k > from) sb.append(' ')
        sb.append(t, starts.get(k), ends.get(k))
        k += 1
      }
      out(ci) = new GenericInternalRow(Array[Any](
        ci.toLong, (until - from).toLong, UTF8String.fromString(sb.toString)))
      ci += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): ChunkWindows =
    copy(child = c)
}

/** Per-row top k-gram share (max shingle count / total shingles). */
case class TopShingleFrac(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1, "k must be >= 1")

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val r = TextKernels.topShingleFrac(input.asInstanceOf[ArrayData], k)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("frac")
      s"""
         |java.lang.Double $boxed =
         |  graft.functions.TextKernels.topShingleFrac($c, $k);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TopShingleFrac =
    copy(child = c)
}

/** Per-row add-k bigram NLL against a LOCAL model table — the kernel
  * behind [[graft.ops.LanguageModel.scoreDocsLocal]] (the CCNet
  * deployment shape: a pruned filter model shipped to every worker).
  * Returns (n_bigrams, nll) with nll null when the document has no
  * bigrams. The model map is carried as an expression field and enters
  * generated code via `addReferenceObj`, so the kernel stays inside
  * whole-stage codegen. */
case class BigramNllExpr(child: Expression,
                         model: java.util.HashMap[String, java.lang.Long],
                         vocabSize: Long, k: Double)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("nll", DoubleType, nullable = true)))

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bigramNll(input.asInstanceOf[ArrayData], model, vocabSize, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("lmModel", model, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.bigramNll($c, $m, ${vocabSize}L, ${k}D)")
  }

  override protected def withNewChildInternal(c: Expression): BigramNllExpr =
    copy(child = c)
}

/** Canonical min-rank BPE encode of a token array against a LOCAL rank
  * map — the production tokenization shape: real merge tables are
  * tokenizer-sized (10⁴–10⁵ entries) and ship to every worker, making
  * per-document encoding a map-only projection. NOTE the semantic
  * fine print vs [[graft.ops.Bpe.applyMerges]] (rank-order replay):
  * on tables that can be LEARNED the two agree, but on arbitrary
  * (truncated/pruned/hand-built) tables min-rank iteration can merge
  * occurrences that replay already passed by — min-rank is what
  * subword-nmt and HF tokenizers do, so it is the contract here
  * (spec-pinned, including a constructed divergence case). */
case class BpeSegmentExpr(child: Expression,
                          ranks: java.util.HashMap[String, Integer],
                          marker: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val markerU = UTF8String.fromString(marker)

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.bpeSegmentAll(input.asInstanceOf[ArrayData], ranks, markerU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val m = ctx.addReferenceObj("bpeMarker", markerU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.bpeSegmentAll($c, $r, $m)")
  }

  override protected def withNewChildInternal(c: Expression): BpeSegmentExpr =
    copy(child = c)
}
