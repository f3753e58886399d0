package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training and segmentation — the SentencePiece
  * algorithm (Kudo 2018), completing the tokenizer family next to
  * [[Bpe]]: seed a substring vocabulary, EM-fit piece probabilities
  * (each word's segmentation is a latent variable), prune, then
  * Viterbi-segment with the learned pieces.
  *
  * Scale contract (the [[Bpe.learnBpe]] shape): the corpus is read
  * ONCE (word-frequency shuffle). Seeding and every EM round run over
  * the DISTINCT-token table; the E-step is a map-only projection
  * (codegen'd forward-backward kernel,
  * [[graft.functions.UnigramExpectedCountsExpr]]) followed by one
  * piece-keyed hash aggregate. The piece table is tokenizer-sized BY
  * CONSTRUCTION (≤ maxSeed + alphabet), so collecting it each round
  * for the M-step is the centroid-table contract, and the local map
  * rides into the kernels via `addReferenceObj`.
  *
  * Deliberate divergences from the SentencePiece binary, documented:
  * pruning keeps the top pieces by expected count (not the
  * leave-one-out likelihood loss) and runs once after EM; all single
  * codepoints are always kept (full coverage — unsegmentable foreign
  * input falls back to raw codepoints at inference).
  */
object UnigramLm {

  /** All codepoint substrings of length 1..maxPieceLen of every
    * distinct token, occurrence-weighted by word frequency:
    * (piece, freq). One pass over the vocab table. */
  def substringCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    val tok = col("token")
    val pieces = flatten(transform(
      sequence(lit(1), length(tok)), s =>
        transform(sequence(lit(1), least(lit(maxPieceLen), length(tok) - s + 1)),
          l => tok.substr(s, l))))
    words.select(explode(pieces).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
  }

  /** Seed vocabulary: the top `maxSeed` multi-char substrings by
    * (freq desc, piece asc) plus ALL single codepoints (coverage).
    * Returns the local (piece, freq) seed — tokenizer-sized by
    * construction. */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
                maxSeed: Int): Seq[(String, Long)] = {
    val counts = substringCounts(words, maxPieceLen)
    val chars = counts.filter(length(col("piece")) === 1)
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(desc("freq"), asc("piece")).limit(maxSeed)
    chars.union(multi).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** EM-train piece log-probabilities. Returns the final local model
    * (piece, logp), pruned to `keepPieces` multi-char pieces (plus all
    * seeded single codepoints), renormalized. */
  def train(df: DataFrame, textCol: String, numRounds: Int = 3,
            maxPieceLen: Int = 6, maxSeed: Int = 2048,
            keepPieces: Int = 512): Seq[(String, Double)] = {
    require(numRounds >= 1 && maxPieceLen >= 1)
    val spark = df.sparkSession
    val words = Bpe.wordFrequency(df, textCol).localCheckpoint()
    val seed = seedVocab(words, maxPieceLen, maxSeed)
    require(seed.nonEmpty, "unigram-LM training corpus has no tokens")
    val total = seed.map(_._2).sum.toDouble
    var probs: Map[String, Double] = seed.map { case (p, f) => p -> f / total }.toMap
    var round = 0
    var expected: Map[String, Double] = Map.empty
    while (round < numRounds) {
      val pm = new java.util.HashMap[String, java.lang.Double](2 * probs.size)
      probs.foreach { case (p, v) => pm.put(p, java.lang.Double.valueOf(v)) }
      // E-step: map-only kernel + one piece-keyed aggregate; the
      // result is the piece table (bounded by the seed) -> M-step local
      expected = graft.functions.TempFunctions.withTempFunction(
        spark, "graft_ulm_expected",
        exprs => graft.functions.UnigramExpectedCountsExpr(
          exprs(0), pm, maxPieceLen)) { fn =>
        words
          .select(explode(call_function(fn, col("token"))).as("pc"), col("cnt"))
          .select(col("pc.piece").as("piece"),
            (col("pc.c") * col("cnt")).as("c"))
          .groupBy("piece").agg(sum("c").as("c"))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      }
      val z = expected.values.sum
      probs = expected.map { case (p, c) => p -> c / z }
      round += 1
    }
    // prune: top multi-char by expected count (freq desc, piece asc),
    // all single codepoints survive; renormalize in prob space
    val singles = probs.filter { case (p, _) => p.codePointCount(0, p.length) == 1 }
    val multis = probs.filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(keepPieces)
    val kept = singles.toSeq ++ multis
    val z = kept.map(_._2).sum
    kept.map { case (p, c) => p -> math.log(c / z) }.sortBy(_._1)
  }

  /** Viterbi-segment every document's tokens with a trained model —
    * map-only, the model local (tokenizer-sized): appends `subwords`.
    * Ties prefer the longer piece; tokens containing codepoints
    * outside the model fall back to raw codepoints (full coverage). */
  def segmentDocs(df: DataFrame, textCol: String,
                  model: Seq[(String, Double)], maxPieceLen: Int = 6): DataFrame = {
    val lm = new java.util.HashMap[String, java.lang.Double](2 * model.size)
    model.foreach { case (p, lp) => lm.put(p, java.lang.Double.valueOf(lp)) }
    graft.functions.TempFunctions.withTempFunction(
      df.sparkSession, "graft_ulm_viterbi",
      exprs => graft.functions.UnigramViterbiExpr(exprs(0), lm, maxPieceLen)) { fn =>
      df.withColumn("subwords",
        call_function(fn, TextAnalysis.tokens(col(textCol))))
    }
  }
}
