package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model training and perplexity scoring — the
  * CCNet/Gopher-style "LM quality" signal: score each document by the
  * average negative log-likelihood of its token bigrams under a model
  * trained on a (usually high-quality) corpus, then filter on the
  * score. Completes the quality family next to
  * [[TextAnalysis.qualityScore]]'s surface heuristics.
  *
  * Model semantics: add-k smoothing over the word-bigram table,
  * P(r | l) = (c(l,r) + k) / (c(l) + k·V), with c(l) = Σ_r c(l,r)
  * (bigram-marginal, so rows normalize exactly) and V = corpus
  * distinct-token count. Unseen bigrams with unseen history score
  * k/(k·V) = 1/V.
  *
  * Scale shape: training is ONE corpus pass (shingle explode → hash
  * aggregate). The model is a DataFrame, never broadcast or collected
  * — scoring joins document bigrams to it on the bigram string (one
  * equi-join shuffle), so model size is bounded by cluster storage,
  * not driver or executor memory. V rides along as a 1-row broadcast
  * (declared-domain crossJoin, the ExpectedGroups convention); the
  * only driver traffic is plan metadata.
  */
object LanguageModel {

  /** (bigram, lft, cnt) training table from the corpus: word bigrams
    * as space-joined strings (the join key downstream). */
  def trainBigram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.shingles(col(textCol), 2)).as("bigram"))
      .withColumn("lft", substring_index(col("bigram"), " ", 1))
      .groupBy("bigram", "lft").agg(count(lit(1)).as("cnt"))

  /** Corpus distinct-token count as a 1-row DataFrame (smoothing V). */
  def vocabSize(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .agg(countDistinct(col("t")).as("__lm_v"))

  /** Per-document average negative log-likelihood under the model:
    * (idCol, n_bigrams, nll). Documents with < 2 tokens keep
    * n_bigrams = 0 and null nll (no evidence, not "perfect"). `k` is
    * the add-k smoothing constant.
    *
    * Plan: doc-bigram explode → left join model on bigram (hash
    * shuffle) → left join the per-history marginal (derived from the
    * model, same shuffle key family) → one groupBy(id) average.
    */
  def scoreDocs(docs: DataFrame, model: DataFrame, vocab: DataFrame,
                textCol: String, idCol: String, k: Double = 1.0): DataFrame = {
    val hist = model.groupBy("lft").agg(sum("cnt").as("hcnt"))
    val pairs = docs
      .select(col(idCol), explode_outer(
        TextAnalysis.shingles(col(textCol), 2)).as("bigram"))
      .withColumn("lft", substring_index(col("bigram"), " ", 1))
      .join(model.select(col("bigram"), col("cnt")), Seq("bigram"), "left")
      .join(hist, Seq("lft"), "left")
      .crossJoin(broadcast(vocab))
    val nll = -(log(coalesce(col("cnt"), lit(0L)) + lit(k)) -
      log(coalesce(col("hcnt"), lit(0L)) + lit(k) * col("__lm_v")))
    pairs.groupBy(idCol).agg(
      count(col("bigram")).as("n_bigrams"),
      avg(when(col("bigram").isNotNull, nll)).as("nll"))
  }

  /** Keep documents whose average bigram NLL is at most `maxNll` —
    * the perplexity filter (ppl = exp(nll)). Zero-bigram documents
    * are dropped (no evidence). */
  def perplexityFilter(docs: DataFrame, model: DataFrame, vocab: DataFrame,
                       textCol: String, idCol: String, maxNll: Double,
                       k: Double = 1.0): DataFrame = {
    val scores = scoreDocs(docs, model, vocab, textCol, idCol, k)
      .filter(col("nll") <= maxNll).select(idCol)
    docs.join(scores, Seq(idCol), "left_semi")
  }
}
