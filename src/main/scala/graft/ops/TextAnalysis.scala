package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column expressions (whole-stage codegen,
  * no UDFs) — each runs as a per-row map over the scan with no shuffle,
  * so they cost one pass at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** k-word shingles; < k tokens -> empty array. Codegen'd one-pass
    * kernel (graft.functions.ShinglesExpr) — the transform/concat_ws
    * HOF formulation it replaces ran interpreted per element. */
  def shingles(text: Column, k: Int): Column =
    graft.functions.VectorExprs.shingles(tokens(text), k)

  private val stopwords = Seq("a", "the", "and", "of", "to", "is", "in")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = tokens(text)
    val stops = typedlit(stopwords)
    size(filter(w, t => array_contains(stops, t))).cast("double") /
      greatest(size(w), lit(1)).cast("double")
  }

  /** Fraction of non-whitespace chars that are punctuation/symbols. */
  def punctRatio(text: Column): Column = {
    val nonWs = regexp_replace(lower(text), "\\s+", "")
    val punct = regexp_replace(nonWs, "[a-z0-9]", "")
    length(punct).cast("double") / greatest(length(nonWs), lit(1)).cast("double")
  }

  def digitRatio(text: Column): Column = {
    val nonWs = regexp_replace(lower(text), "\\s+", "")
    val digits = regexp_replace(nonWs, "[^0-9]", "")
    length(digits).cast("double") / greatest(length(nonWs), lit(1)).cast("double")
  }

  /** Mean token length (chars) over whitespace tokens. */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length saturation + low-stopword
    * + low-punctuation. Deterministic heuristic in the C4/Gopher-rule
    * style (thresholded length/punct/stopword features).
    */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / 100.0, lit(1.0)) * 0.5 +
      (lit(1.0) - stopwordRatio(text)) * 0.3 +
      (lit(1.0) - punctRatio(text)) * 0.2

  /** All five quality base counts (n_tokens, len_nws, n_stop, n_punct,
    * n_digit) as ONE struct from ONE pass over the text — the functions
    * above each rescan the document (regex replace per char class,
    * interpreted HOF filter for stopwords); at corpus scale every extra
    * pass rereads the dataset. Field semantics are identical to the
    * individual functions (kernel: graft.functions.TextKernels). */
  def qualityFeatures(text: Column): Column =
    graft.functions.VectorExprs.qualityFeatures(lower(text))

  /** Marker-word language-ID heuristic. Scores each candidate language
    * by marker-token hits; highest score wins (fixed tie order), zero
    * evidence -> "und". N-gram/stopword LID in miniature — swap the
    * marker lists for real wordlists in production.
    */
  def langId(text: Column): Column =
    graft.functions.VectorExprs.langIdBest(tokens(text))

  /** BPE-style subword pre-tokenization count: the GPT-2 pre-tokenizer
    * shape — contractions, letter runs, digit runs and punctuation
    * runs, each with an optional leading space. Counts the units a BPE
    * tokenizer would merge within, giving a far better token estimate
    * than whitespace splitting for code/punctuation-heavy text. Pure
    * RE2-compatible regex (no lookarounds), one codegen'd pass. */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"),
      lit(0)))

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text. Equal fingerprints = exact (mod whitespace) duplicates. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling-hash document fingerprint: the minimum shingle hash —
    * a 1-hash MinHash, winnowing-style representative of content.
    * Fused token-shingle kernel: shingle strings never materialize. */
  def rollingFingerprint(text: Column, k: Int = 3): Column =
    graft.functions.VectorExprs.minHashMd5Tokens(tokens(text), k, "")
}
