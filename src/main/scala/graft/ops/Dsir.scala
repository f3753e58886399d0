package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents whose hashed-n-gram distribution looks
  * like a trusted TARGET corpus, by resampling with importance weights
  * log w(x) = log p_target(x) − log p_raw(x) under two hashed
  * bag-of-n-grams models. The GPT-3/LLaMA-class "domain selection"
  * stage, complementing the quality classifier ([[QualityClassifier]]
  * answers "does this look good"; DSIR answers "does this look like
  * the domain I want, proportionally") — the paper shows it beats
  * both random selection and classifier-top-k for domain transfer.
  *
  * Model semantics: features are hashed unigram + bigram buckets
  * (the paper's n-gram hashing, §4; bucket = 60-bit-md5 mod dim, the
  * certified [[QualityClassifier.featureIdx]] idiom). Each corpus
  * yields an add-1-smoothed bucket distribution
  * p_b = (c_b + 1) / (total + dim); the per-bucket log-ratio
  * r_b = ln p_target(b) − ln p_raw(b) is rounded to 6 dp so every
  * document score Σ_b c_b(x)·r_b is a 6-dp decimal multiple — the
  * classifier's bit-stability contract — and the resampling keys sort
  * identically on every engine.
  *
  * Resampling is the Gumbel-top-k trick (sampling k docs WITHOUT
  * replacement ∝ softmax of log w): key = log w(x) + g(x) with
  * g = −ln(−ln u) and u a deterministic md5 hash-uniform of the doc
  * id ([[Selection.hashSampleKey]] idiom) — reproducible across
  * engines and runs, no RNG state.
  *
  * Scale shape: each model is ONE corpus pass (explode → hash
  * aggregate) collapsing to ≤ dim rows; the ratio table is dim rows,
  * BROADCAST — scoring is explode → broadcast-hash join → one
  * groupBy(id) sum, a single shuffle keyed by doc. Top-k is
  * TakeOrdered (per-partition heaps + driver merge of k rows), never
  * a global sort. Nothing corpus-sized ever reaches the driver. A
  * pinned ratio vector also scores as a stateless map
  * ([[graft.functions.LinearBagScoreExpr]] over unigrams ++ bigrams —
  * spec-asserted equal to the join path), the streaming-ingest shape.
  */
object Dsir {

  /** Hashed unigram + bigram feature STRINGS of one document (bigrams
    * are space-joined, so unigram and bigram keys cannot collide
    * pre-hash). Bucket them with [[QualityClassifier.featureIdx]]. */
  def featureStrings(text: Column): Column =
    concat(
      filter(TextAnalysis.tokens(text), t => length(t) > 0),
      TextAnalysis.shingles(text, 2))

  /** (bucket, cnt) hashed-bag counts of a corpus: one codegen'd
    * map pass (per-doc count vector, no explode — the bucket is the
    * same top-60-md5-bits as [[QualityClassifier.featureIdx]],
    * DsirSpec pins the law) + one dim-length vector-sum aggregate,
    * ≤ dim rows out. */
  def bucketCounts(df: DataFrame, textCol: String, dim: Int): DataFrame =
    df.select(graft.functions.VectorExprs.hashedBagCounts(
        featureStrings(col(textCol)), dim).as("__v"))
      .agg(graft.functions.VectorExprs.vectorSum(col("__v")).as("__s"))
      .select(posexplode(col("__s")).as(Seq("bucket", "__c")))
      .filter(col("__c") > 0)
      .select(col("bucket"), col("__c").cast("long").as("cnt"))

  /** COMPLETE dim-row log-ratio table (bucket, r): r_b =
    * round(ln p_target(b) − ln p_raw(b), 6) with add-1 smoothing, a
    * row for every bucket in [0, dim) so scoring never needs a
    * missing-bucket default. Totals ride as one broadcast row. */
  def logRatios(target: DataFrame, raw: DataFrame, textCol: String,
                dim: Int): DataFrame =
    logRatiosFromCounts(
      bucketCounts(target, textCol, dim).withColumnRenamed("cnt", "tcnt"),
      bucketCounts(raw, textCol, dim).withColumnRenamed("cnt", "rcnt"),
      target.sparkSession, dim)

  private def logRatiosFromCounts(tc: DataFrame, rc: DataFrame,
                                  spark: org.apache.spark.sql.SparkSession,
                                  dim: Int): DataFrame = {
    val buckets = spark.range(0, dim).select(col("id").cast("int").as("bucket"))
    val joined = buckets
      .join(tc, Seq("bucket"), "left")
      .join(rc, Seq("bucket"), "left")
    val totals = joined.agg(
      sum(coalesce(col("tcnt"), lit(0L))).as("__tt"),
      sum(coalesce(col("rcnt"), lit(0L))).as("__tr"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), round(
        log((coalesce(col("tcnt"), lit(0L)) + lit(1.0)) /
          (col("__tt") + lit(dim))) -
          log((coalesce(col("rcnt"), lit(0L)) + lit(1.0)) /
            (col("__tr") + lit(dim))), 6).as("r"))
  }

  /** Per-document log importance weight: (idCol, n_feats, logw) with
    * logw = round(Σ features r_bucket, 6) — a sum of 6-dp multiples,
    * so the round is exact-decimal-stable. Docs with zero features
    * (empty text) are absent (no evidence, no weight). */
  def logImportance(docs: DataFrame, ratios: DataFrame, dim: Int,
                    textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol), explode(featureStrings(col(textCol))).as("__t"))
      .select(col(idCol), QualityClassifier.featureIdx(col("__t"), dim).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_feats"),
        round(sum(col("r")), 6).as("logw"))

  /** [[logImportance]] against a LOCAL pinned ratio vector (index =
    * bucket; a zero bias slot is appended internally for the kernel):
    * one codegen'd map-only fold per row
    * ([[graft.functions.LinearBagScoreExpr]] — same md5 bucket, same
    * accumulation), no join, no shuffle, no state — runs unchanged on
    * a stream, the ingest-side domain-scoring shape. Docs with no
    * features are dropped (null margin), matching the join path. */
  def logImportanceLocal(docs: DataFrame, ratios: Seq[Double], dim: Int,
                         textCol: String, idCol: String): DataFrame = {
    require(ratios.length == dim, s"need $dim ratios, got ${ratios.length}")
    docs.select(col(idCol),
      round(graft.functions.VectorExprs.linearBagScore(
        featureStrings(col(textCol)), ratios :+ 0.0, dim), 6).as("logw"))
      .filter(col("logw").isNotNull)
  }

  /** Deterministic Gumbel noise for one doc id: g = −ln(−ln u),
    * u = (md5-hash-uniform + 0.5) / 2^60 ∈ (0, 1), seeded so reruns
    * and engines agree. Rounded to 6 dp (resampling-key contract). */
  def gumbel(id: Column, seed: Int): Column = {
    val h = conv(substring(md5(concat(lit(s"$seed:"), id.cast("string"))),
      1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    round(-log(-log(u)), 6)
  }

  /** Gumbel-top-k importance resampling: k docs without replacement
    * with probability ∝ exp(logw) (Xie 2023 §3.3's sampled selection,
    * made reproducible). Returns (idCol, logw, key) of the selected
    * docs; key = round(logw + gumbel, 6) so cross-engine sort order is
    * exact, ties broken on the id. */
  def resample(docs: DataFrame, target: DataFrame, textCol: String,
               idCol: String, dim: Int, k: Int, seed: Int = 7): DataFrame = {
    require(dim <= (1 << 20),
      s"dim=$dim exceeds the local-ratio gate (2^20); compose " +
        "logRatios + logImportance (the join path) instead")
    // The model passes collapse to dim rows each (explode → map-side
    // partial agg → dim-row final); the ratio VECTOR is dim doubles —
    // a DECLARED size-gated collect (the localModel contract). Scoring
    // is then the stateless codegen'd fold (logImportanceLocal): no
    // doc×bucket shuffle, no join — the corpus is touched by exactly
    // one map pass plus TakeOrdered's per-partition heaps. The ratios
    // are rounded INSIDE the plan (executor round == join path), so
    // logw here is bit-equal to the join path's.
    val ratios = logRatios(target, docs, textCol, dim)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2)
    logImportanceLocal(docs, ratios.toSeq, dim, textCol, idCol)
      .select(col(idCol), col("logw"),
        round(col("logw") + gumbel(col(idCol), seed), 6).as("key"))
      .orderBy(desc("key"), col(idCol))
      .limit(k)
  }
}
