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
    // NOT localCheckpoint'd like scoreDocsKneserNey: with only TWO
    // consumers of the model subtree the materialization write costs
    // more than the saved recompute (measured r13: 0.72s -> 0.96s at
    // sf0.1); KN's four consumers tip the balance the other way.
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

  /** Per-document average negative log-likelihood under INTERPOLATED
    * KNESER-NEY smoothing (Kneser & Ney 1995; Chen & Goodman 1998
    * eq. 4.28) — the smoothing family KenLM implements and CCNet's
    * shipped models actually use, next to [[scoreDocs]]'s simpler
    * add-k. Same model table ([[trainBigram]]'s one corpus pass);
    * everything KN adds is derived marginals of it:
    *
    *   P(w|h) = (max(c(h,w) − D, 0) + D · N1+(h,·) · Pcont(w)) / c(h)
    *   Pcont(w) = (N1+(·,w) + 1) / (B + V)        — continuation prob
    *   unseen history h:  P(w|h) = Pcont(w)
    *
    * where N1+(h,·) = distinct continuations of h, N1+(·,w) = distinct
    * histories of w, B = distinct bigrams, V = vocab size. The +1/+V
    * on Pcont is continuation add-one: it keeps Σ_w Pcont = 1 exactly
    * over the vocab while giving out-of-vocabulary words positive mass
    * (standard KN zeroes them; KenLM handles this with an <unk>
    * unigram — same role). With D ≤ 1 ≤ every count, each seen-history
    * row normalizes exactly: Σ_w max(c−D,0) = c(h) − D·N1+(h,·) and
    * the continuation term restores precisely that deficit.
    *
    * `discount` None estimates D = n1/(n1 + 2·n2) from the bigram
    * count-of-counts (Ney, Essen & Kneser 1994's leave-one-out
    * estimate — what KenLM computes); a degenerate corpus with
    * n1 + 2·n2 = 0 falls back to 0.5.
    *
    * Scale shape identical to [[scoreDocs]]: the model and both
    * marginals are DataFrames joined on token keys (never collected);
    * (B, n1, n2, V) ride as ONE broadcast row. */
  def scoreDocsKneserNey(docs: DataFrame, rawModel: DataFrame, vocab: DataFrame,
                         textCol: String, idCol: String,
                         discount: Option[Double] = None): DataFrame = {
    // four consumers of the model subtree (join, hist, cont, totals):
    // materialize it once or an inline-built model re-runs its corpus
    // pass four times (the perplexityBuckets precedent)
    val model = rawModel.localCheckpoint()
    val hist = model.groupBy("lft")
      .agg(sum("cnt").as("hcnt"), count(lit(1)).as("n1h"))
    val cont = model
      .withColumn("rgt", substring_index(col("bigram"), " ", -1))
      .groupBy("rgt").agg(count(lit(1)).as("n1c"))
    val totals = model.agg(
      count(lit(1)).as("__kn_b"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("__kn_n1"),
      sum(when(col("cnt") === 2, 1L).otherwise(0L)).as("__kn_n2"))
      .crossJoin(vocab)
    val pairs = docs
      .select(col(idCol), explode_outer(
        TextAnalysis.shingles(col(textCol), 2)).as("bigram"))
      .withColumn("lft", substring_index(col("bigram"), " ", 1))
      .withColumn("rgt", substring_index(col("bigram"), " ", -1))
      .join(model.select(col("bigram"), col("cnt")), Seq("bigram"), "left")
      .join(hist, Seq("lft"), "left")
      .join(cont, Seq("rgt"), "left")
      .crossJoin(broadcast(totals))
    val d = discount match {
      case Some(v) => lit(v)
      case None => when(col("__kn_n1") + lit(2L) * col("__kn_n2") > 0,
        col("__kn_n1").cast("double") /
          (col("__kn_n1") + lit(2L) * col("__kn_n2"))).otherwise(lit(0.5))
    }
    val pcont = (coalesce(col("n1c"), lit(0L)) + lit(1.0)) /
      (col("__kn_b") + col("__lm_v"))
    val p = when(col("hcnt").isNotNull,
      (greatest(coalesce(col("cnt"), lit(0L)) - d, lit(0.0)) +
        d * col("n1h") * pcont) / col("hcnt"))
      .otherwise(pcont)
    val nll = -log(p)
    pairs.groupBy(idCol).agg(
      count(col("bigram")).as("n_bigrams"),
      avg(when(col("bigram").isNotNull, nll)).as("nll"))
  }

  /** Collect the trained model into one local lookup table: bigram
    * keys ("l r") and history-marginal keys ("l") share the map
    * (unigram keys contain no space — no collision). SIZE-GATED: a
    * model beyond `maxEntries` bigrams refuses to collect — use the
    * [[scoreDocs]] join path, which never localizes the model. Under
    * the gate this is the CCNet deployment shape: the (pruned) filter
    * model ships to every worker and scoring becomes a stateless map
    * — which is also what makes [[scoreDocsLocal]] streaming-safe. */
  def localModel(model: DataFrame,
                 maxEntries: Long = 1L << 21): java.util.HashMap[String, java.lang.Long] = {
    val n = model.count()
    require(n <= maxEntries,
      s"model has $n bigrams > localModel gate $maxEntries; use scoreDocs")
    val m = new java.util.HashMap[String, java.lang.Long](2 * (n.toInt + 1))
    model.select(col("bigram"), col("lft"), col("cnt").cast("long")).collect()
      .foreach { r =>
        val c = java.lang.Long.valueOf(r.getLong(2))
        m.put(r.getString(0), c)
        m.merge(r.getString(1), c,
          (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.valueOf(a + b))
      }
    m
  }

  /** [[scoreDocs]] as a stateless map-only projection against a
    * [[localModel]]: zero shuffles, zero state — runs unchanged on a
    * stream (ingest-side quality filtering; spec-asserted equal to the
    * join path). The codegen'd kernel is
    * [[graft.functions.BigramNllExpr]]; each call registers it under a
    * fresh function name so concurrently built plans can't see each
    * other's model. */
  def scoreDocsLocal(docs: DataFrame,
                     model: java.util.HashMap[String, java.lang.Long],
                     vocabSize: Long, textCol: String, idCol: String,
                     k: Double = 1.0): DataFrame =
    graft.functions.TempFunctions.withTempFunction(
      docs.sparkSession, "graft_bigram_nll",
      exprs => graft.functions.BigramNllExpr(
        exprs(0), model, vocabSize, k)) { fn =>
      docs
        .withColumn("__lm_s",
          call_function(fn, TextAnalysis.tokens(col(textCol))))
        .select(col(idCol),
          // null text -> null tokens -> null struct; align with the join
          // path's count() = 0 for no-evidence docs
          coalesce(col("__lm_s.n_bigrams"), lit(0L)).as("n_bigrams"),
          col("__lm_s.nll").as("nll"))
    }

  /** The smoothing constant V as a driver scalar (one aggregate job)
    * — pairs with [[localModel]] for the local scoring path. */
  def vocabSizeLocal(df: DataFrame, textCol: String): Long =
    vocabSize(df, textCol).collect()(0).getLong(0)

  /** PMI-ranked collocations: bigrams scored by pointwise mutual
    * information ln(c(l,r)·T / (c(l)·c(r))) over corpus token counts
    * (T = total tokens), thresholded at `minCount` occurrences to
    * suppress the low-frequency PMI explosion — the classic
    * collocation/phrase-mining pass (Church & Hanks 1990; the
    * word2vec phrase heuristic is the same shape).
    *
    * Plan: reuses [[trainBigram]]'s one corpus pass; unigram counts
    * are one more pass; both marginals join on token keys (hash
    * equi-joins); T rides as a 1-row broadcast. Returns (bigram, cnt,
    * pmi) — filter/sort downstream as needed. */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5L): DataFrame = {
    val uni = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("t").agg(count(lit(1)).as("ucnt"))
    val total = uni.agg(sum("ucnt").as("__lm_t"))
    trainBigram(df, textCol)
      .filter(col("cnt") >= minCount)
      .withColumn("rgt", substring_index(col("bigram"), " ", -1))
      .join(uni.withColumnRenamed("ucnt", "lcnt"),
        col("lft") === col("t"), "inner").drop("t")
      .join(uni.withColumnRenamed("ucnt", "rcnt"),
        col("rgt") === col("t"), "inner").drop("t")
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("cnt"),
        // doubles BEFORE the multiply: cnt·T in integer space overflows
        // int64 at web-scale T (1e13 tokens x 1e5 count)
        log(col("cnt").cast("double") * col("__lm_t").cast("double") /
          (col("lcnt").cast("double") * col("rcnt").cast("double")))
          .as("pmi"))
  }

  /** [[perplexityFilter]] over the local-model path: a map-only filter
    * (no join at all), streaming-safe. */
  def perplexityFilterLocal(docs: DataFrame,
                            model: java.util.HashMap[String, java.lang.Long],
                            vocabSize: Long, textCol: String, idCol: String,
                            maxNll: Double, k: Double = 1.0): DataFrame =
    graft.functions.TempFunctions.withTempFunction(
      docs.sparkSession, "graft_bigram_nll",
      exprs => graft.functions.BigramNllExpr(
        exprs(0), model, vocabSize, k)) { fn =>
      docs.filter(
        call_function(fn, TextAnalysis.tokens(col(textCol)))
          .getField("nll") <= maxNll)
    }

  /** Keep documents whose average bigram NLL is at most `maxNll` —
    * the perplexity filter (ppl = exp(nll)). Zero-bigram documents
    * are dropped (no evidence). */
  /** CCNet-style per-language perplexity bucketing (Wenzek et al.
    * 2020 §4.3, the reference pipeline's "keep the head, downsample
    * the tail" curation signal): documents split into
    * head/middle/tail at the tercile cutoffs of their average bigram
    * NLL WITHIN their language. Scores AND cutoffs are rounded to
    * 6 dp before comparison so the bucket edges are stable across
    * engines: a rounded interpolated cutoff is either exactly a
    * sample value (where `<=` keeps the sample in the lower bucket in
    * both engines) or separated from every 6-dp sample by the
    * interpolation fraction. Zero-evidence docs (< 2 tokens: no
    * bigram, null nll) are dropped — no score, no bucket.
    *
    * Scale shape: one scoreDocs pass, one per-language exact-quantile
    * aggregate whose output is ONE ROW PER LANGUAGE (broadcast back),
    * never a per-language window sort — the same no-funnel contract
    * as the corpus mixer. */
  def perplexityBuckets(docs: DataFrame, model: DataFrame, vocab: DataFrame,
                        textCol: String, idCol: String, langCol: String,
                        k: Double = 1.0): DataFrame = {
    // materialize the scored table ONCE (executor-local storage, the
    // band-table precedent): both consumers — the tercile aggregate
    // and the bucket join — would otherwise re-run the whole scoreDocs
    // subtree, which re-trains the model when it is built inline
    val scored = scoreDocs(docs, model, vocab, textCol, idCol, k)
      .filter(col("n_bigrams") > 0)
      .withColumn("nllr", round(col("nll"), 6))
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
      .localCheckpoint()
    val cuts = graft.api.GroupByReduce(scored, Seq(langCol), "nllr",
      "quantile", "__q",
      graft.aggs.ReduceOptions(q = Seq(1.0 / 3, 2.0 / 3)))
      .select(col(langCol),
        round(element_at(col("__q"), 1), 6).as("__q1"),
        round(element_at(col("__q"), 2), 6).as("__q2"))
    scored.join(broadcast(cuts), Seq(langCol))
      .withColumn("bucket",
        when(col("nllr") <= col("__q1"), lit("head"))
          .when(col("nllr") <= col("__q2"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col(idCol), col(langCol), col("nllr"), col("bucket"))
  }

  def perplexityFilter(docs: DataFrame, model: DataFrame, vocab: DataFrame,
                       textCol: String, idCol: String, maxNll: Double,
                       k: Double = 1.0): DataFrame = {
    val scores = scoreDocs(docs, model, vocab, textCol, idCol, k)
      .filter(col("nll") <= maxNll).select(idCol)
    docs.join(scores, Seq(idCol), "left_semi")
  }
}
