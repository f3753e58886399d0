package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** N-GRAM-overlap train/eval contamination — the GPT-3/PaLM
  * decontamination criterion (Brown et al. 2020 appendix C): a corpus
  * document is contaminated iff it shares ANY k-token n-gram with the
  * benchmark, catching partial inclusion that whole-document
  * fingerprint matching ([[Selection.contaminated]]) misses and exact
  * span discovery ([[Spans]]) only reports, not filters against a
  * second corpus.
  *
  * Two physical paths with IDENTICAL results:
  *
  *  - **Exact** ([[contaminated]]): corpus n-gram explode → left_semi
  *    against the BROADCAST distinct benchmark n-gram set → distinct
  *    doc ids → semi back. Correct at any scale (corpus never
  *    shuffles; everything joins against bench-bounded broadcasts) but
  *    pays the corpus-token-count explode for every document.
  *
  *  - **Bloom two-phase** ([[contaminatedBloom]]): a bloom filter
  *    over the benchmark n-gram `xxhash64`s is built once (driver-side
  *    object, size-gated — a benchmark is a few thousand eval docs by
  *    contract) and embedded in the plan as a constant; phase 1 is a
  *    codegen'd map-only prefilter
  *    ([[graft.functions.BloomContainsAnyShingle]] — one streamed
  *    hash+probe pass per document, NO explode, no shuffle, no state,
  *    streaming-safe); phase 2 runs the exact path over the surviving
  *    candidate sliver only. Because build and probe use the
  *    bit-identical hash, the bloom has NO false negatives — so the
  *    two-phase result EQUALS the exact result (false positives cost
  *    only wasted verify work, never a wrong answer). At 100 TB this
  *    turns "explode every document" into "explode the ~0.1% that
  *    might match", which is the only affordable shape.
  *
  * Certification: q_ngram_contam (exact path) and q_bloom_decontam
  * (bloom two-phase decontaminate) both hash-match the DuckDB oracle
  * computing exact k-gram overlap — the bloom path passing the EXACT
  * oracle is the no-false-negative law, machine-checked.
  */
object Contamination {

  /** k-token shingles of lowercased whitespace-tokenized text
    * ([[TextAnalysis.shingles]]; < k tokens → empty array). */
  private def grams(textCol: Column, k: Int): Column =
    TextAnalysis.shingles(textCol, k)

  /** Distinct benchmark k-gram strings, broadcast-ready. */
  private def benchGrams(bench: DataFrame, textCol: String, k: Int): DataFrame =
    bench.select(explode(grams(col(textCol), k)).as("__g")).distinct()

  /** Distinct ids of corpus docs sharing ≥ 1 k-gram with the
    * benchmark — the exact-path core. Corpus explode → left_semi
    * against the broadcast benchmark gram set → distinct ids: the
    * corpus is never shuffled (the only acceptable shape when the
    * corpus is 100 TB and the benchmark is a few thousand docs). */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, textCol: String,
                      idCol: String, k: Int = 8): DataFrame =
    corpus
      .select(col(idCol), explode(grams(col(textCol), k)).as("__g"))
      .join(broadcast(benchGrams(bench, textCol, k)), Seq("__g"), "left_semi")
      .select(idCol).distinct()

  /** Corpus rows sharing ≥ 1 k-gram with the benchmark (exact path). */
  def contaminated(corpus: DataFrame, bench: DataFrame, textCol: String,
                   idCol: String, k: Int = 8): DataFrame =
    corpus.join(broadcast(contaminatedIds(corpus, bench, textCol, idCol, k)),
      Seq(idCol), "left_semi")

  /** Corpus minus n-gram contamination (exact path). */
  def decontaminate(corpus: DataFrame, bench: DataFrame, textCol: String,
                    idCol: String, k: Int = 8): DataFrame =
    corpus.join(broadcast(contaminatedIds(corpus, bench, textCol, idCol, k)),
      Seq(idCol), "left_anti")

  /** Serialized bloom filter over the benchmark's distinct k-gram
    * `xxhash64`s. One small distributed build job (the distinct + the
    * count are bench-sized), one driver-side filter object — DECLARED
    * bounded: `maxGrams` (default 2^26 ≈ 67M n-grams ≈ 115 MB at the
    * default fpp 1e-3) gates the plan-constant size explicitly; a
    * benchmark is a few thousand eval documents by contract. */
  def benchNgramBloom(bench: DataFrame, textCol: String, k: Int,
                      fpp: Double = 1e-3,
                      maxGrams: Long = 1L << 26): Array[Byte] = {
    val hashes = bench
      .select(explode(grams(col(textCol), k)).as("__g"))
      .select(xxhash64(col("__g")).as("__h")).distinct()
    val n = hashes.count()
    require(n <= maxGrams,
      s"benchmark has $n distinct $k-grams > maxGrams=$maxGrams; " +
        "raise maxGrams (bigger plan constant) or use the exact path")
    val bf = hashes.stat.bloomFilter("__h", math.max(n, 1L), fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Map-only candidate predicate: might this doc share a k-gram with
    * the benchmark? False ⇒ PROVABLY clean (no false negatives).
    * Stateless, codegen'd, streaming-safe — the ingest-side prefilter
    * shape. */
  def mightBeContaminated(textCol: Column, bloomBytes: Array[Byte],
                          k: Int): Column =
    graft.functions.VectorExprs.bloomAnyShingle(
      TextAnalysis.tokens(textCol), bloomBytes, k)

  /** [[contaminated]] via the bloom two-phase plan: prefilter the
    * corpus with the bloom (map-only), exact-verify the sliver.
    * Result equals the exact path by the no-false-negative law. */
  def contaminatedBloom(corpus: DataFrame, bench: DataFrame, textCol: String,
                        idCol: String, k: Int = 8,
                        fpp: Double = 1e-3): DataFrame = {
    val bytes = benchNgramBloom(bench, textCol, k, fpp)
    val candidates =
      corpus.filter(mightBeContaminated(col(textCol), bytes, k))
    contaminated(candidates, bench, textCol, idCol, k)
  }

  /** [[decontaminate]] via the bloom two-phase plan: docs missing the
    * bloom are provably clean and never exploded; only the candidate
    * sliver pays the exact check. Result equals the exact path. */
  def decontaminateBloom(corpus: DataFrame, bench: DataFrame, textCol: String,
                         idCol: String, k: Int = 8,
                         fpp: Double = 1e-3): DataFrame = {
    val bytes = benchNgramBloom(bench, textCol, k, fpp)
    val candidates =
      corpus.filter(mightBeContaminated(col(textCol), bytes, k))
    corpus.join(
      broadcast(contaminatedIds(candidates, bench, textCol, idCol, k)),
      Seq(idCol), "left_anti")
  }
}
