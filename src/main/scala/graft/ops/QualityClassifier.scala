package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** fastText-style supervised quality classifier (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification") — the
  * model-based document filter production curation pipelines train
  * against a trusted reference corpus ("does this page look like the
  * reference?"; the GPT-3/LLaMA quality-classifier stage and CCNet's
  * companion filter). A linear model over hashed bag-of-token
  * features with a logistic loss: the fastText recipe minus the
  * embedding indirection (rank-1 fastText with mean pooling IS a
  * linear model over the bag, so this is the same hypothesis class
  * for binary filtering).
  *
  * Scale contract:
  *  - FEATURES are 60-bit-md5 hash buckets (`dim` of them) — the
  *    model is O(dim) doubles no matter the corpus vocabulary, the
  *    hashing trick from the paper, cross-engine reproducible (the
  *    oracle recomputes the bucket in SQL: see
  *    [[Selection.hashSampleKey]] for the idiom's certification).
  *  - SCORING is one stateless map-only projection — the margin folds
  *    over the token array with the weight vector as a plan literal;
  *    no explode, no shuffle, no state: runs unchanged on a stream
  *    (the ingest-side filter shape, like [[Pii.scrub]]).
  *  - TRAINING is full-batch gradient descent: the corpus is
  *    tokenized ONCE into an integer feature-index table
  *    (localCheckpoint, the wordFrequency contract), then every
  *    iteration is one map (margins from the weight literal) + one
  *    explode + one (dim+1)-row aggregate collected to the driver —
  *    driver traffic per iteration is the MODEL, never the corpus,
  *    the same bounded-collect contract as Lloyd / BPE / unigram EM.
  */
object QualityClassifier {

  /** Hash bucket of one token: first 15 hex chars of md5 (60 bits,
    * non-negative in a signed long) mod `dim`. Oracle form:
    * `('0x' || substr(md5(t), 1, 15))::BIGINT % dim`. */
  def featureIdx(token: Column, dim: Int): Column =
    (conv(substring(md5(token), 1, 15), 16, 10).cast("long") % dim).cast("int")

  private def tokenFeats(text: Column, dim: Int): Column =
    transform(
      filter(TextAnalysis.tokens(text), t => length(t) > 0),
      t => featureIdx(t, dim))

  /** Raw kernel margin: null when the document has no nonempty token
    * (no evidence). One codegen'd streamed-digest pass per row
    * ([[graft.functions.LinearBagScoreExpr]]) — bit-identical to the
    * transform+aggregate HOF formulation (same bucket hash, same
    * left-to-right accumulation) but inside whole-stage codegen. */
  private def rawMargin(text: Column, weights: Seq[Double], dim: Int): Column = {
    require(weights.length == dim + 1,
      s"weights must be dim+1 = ${dim + 1} long (bias last), got ${weights.length}")
    graft.functions.VectorExprs.linearBagScore(
      TextAnalysis.tokens(text), weights, dim)
  }

  /** Linear margin w·x + b of one document under a LOCAL weight
    * vector (length dim + 1; last entry is the bias). Map-only,
    * streaming-safe. Zero-token documents score the bias alone. */
  def margin(text: Column, weights: Seq[Double], dim: Int): Column =
    coalesce(rawMargin(text, weights, dim), lit(weights.last))

  /** Per-document scores: (idCol, margin, prob). Documents with no
    * tokens are DROPPED (no evidence — the perplexity-filter
    * convention); the margin of the survivors includes the bias. */
  def scoreDocs(docs: DataFrame, weights: Seq[Double], dim: Int,
                textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol),
        rawMargin(col(textCol), weights, dim).as("margin"))
      .filter(col("margin").isNotNull)
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("margin"))))

  /** Keep documents the classifier accepts: margin >= `cut` (cut 0.0
    * = prob 0.5; no-evidence documents fail the gate). Map-only
    * filter over the scan, streaming-safe. */
  def filterByQuality(docs: DataFrame, weights: Seq[Double], dim: Int,
                      textCol: String, cut: Double = 0.0): DataFrame =
    docs.filter(rawMargin(col(textCol), weights, dim) >= cut)

  /** Train by full-batch gradient descent on the mean logistic loss;
    * returns the weight vector (length dim + 1, bias last).
    * `labelCol` must be 0/1 (cast to double). Zero-token documents
    * are dropped before training (they carry no feature evidence and
    * are dropped at scoring time too). Deterministic for a fixed
    * input: the feature table is hash-repartitioned on the id and
    * CACHED before the loop, so every iteration accumulates the
    * per-partition gradient slabs over the same pinned row order and
    * merges them in partition-index order (r21 — determinism now
    * rides the pinned layout, not keyed-aggregate order-independence;
    * do not drop the repartition or the cache without rethinking it). */
  def train(docs: DataFrame, textCol: String, idCol: String,
            labelCol: String, dim: Int = 128, iters: Int = 100,
            lr: Double = 0.5): Array[Double] =
    trainImpl(docs, textCol, idCol, labelCol, dim, iters, lr,
      gridRound = false)

  /** [[train]] with each post-update weight snapped to an exact
    * multiple of 2^-20 (floor(w·2²⁰ + 0.5)/2²⁰ — every step exact
    * double arithmetic: ·2²⁰ is a power-of-two scale, the result fits
    * 53 bits). This makes the WHOLE trajectory cross-engine
    * reproducible, which pinned-weight inference cannot certify (r12
    * missing #2): margins are then sums of grid multiples — exact,
    * hence order- and engine-independent — so the only cross-engine
    * drift left is libm exp() ulps inside the sigmoid, ~1e-13 against
    * a 9.5e-7 grid. A clearance guard REQUIRES every pre-round value
    * to sit > 1e-6 (scaled) from a rounding boundary, so a corpus that could
    * make the two engines round apart fails loudly instead of
    * producing a silent oracle mismatch. q_quality_train_infer
    * certifies train→infer end-to-end against the same GD unrolled in
    * DuckDB SQL (the q_bpe convention). */
  def trainCertified(docs: DataFrame, textCol: String, idCol: String,
                     labelCol: String, dim: Int, iters: Int,
                     lr: Double = 1.0): Array[Double] =
    trainImpl(docs, textCol, idCol, labelCol, dim, iters, lr,
      gridRound = true)

  private def trainImpl(docs: DataFrame, textCol: String, idCol: String,
                        labelCol: String, dim: Int, iters: Int,
                        lr: Double, gridRound: Boolean): Array[Double] = {
    require(dim >= 2 && iters >= 1)
    val bias = dim // bias pseudo-feature: one occurrence per document
    // one tokenize pass; ints-only table, persisted (as a primitive
    // RDD, below) for the loop
    val feats = docs
      .select(col(idCol), col(labelCol).cast("double").as("__y"),
        concat(tokenFeats(col(textCol), dim), array(lit(bias))).as("__f"))
      .filter(size(col("__f")) > 1)
      // hash-spread on the id BEFORE checkpointing: the slab otherwise
      // inherits the input's split count (ONE for a single-row-group
      // scan) and every gradient iteration's explode+aggregate runs on
      // one task (measured r13: ~800ms/iter -> ~50ms/iter at 32 cores).
      // Deterministic: gradient sums are keyed aggregates; the float
      // accumulation-order jitter this introduces is ~1e-15, absorbed
      // by the spec's 1e-9 tolerance and trainCertified's 2^-20 grid.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .drop(idCol)
    // Flatten to a primitive-typed cached RDD ONCE (r21): the iteration
    // loop is the connectedComponents RDD-loop shape — a fixed-point
    // whose per-round output is MODEL-sized, where Catalyst re-planning
    // (fresh 2-stage explode+shuffle job per iteration) is pure
    // overhead. Each iteration is now ONE map-only job: per-partition
    // (dim+1)-vector gradients collected in PARTITION-INDEX order (no
    // shuffle, no row explosion — the explode multiplied the pass by
    // tokens/doc at scale). Margins fold left-to-right exactly like the
    // old `aggregate` HOF and exp() is the same java.lang.Math.exp, so
    // per-row residuals are bit-identical; only the gradient's FLOAT
    // SUMMATION ORDER changes — the ~1e-15 class the spec's 1e-9
    // tolerance and trainCertified's 2^-20 grid absorb (same note as
    // the r13 hash-spread).
    // null/uncastable labels ride as NaN: the old Catalyst path's
    // null residual was skipped by sum() while the row still counted
    // in n — the NaN guard below reproduces exactly that (a bare
    // getDouble would NPE on null, r21 review find). A GENUINE NaN
    // label value is refused loudly instead (r21 ADVICE): the old
    // path visibly poisoned every weight to NaN, and silently
    // training past an out-of-contract label would hide the bug —
    // labelCol's contract is 0/1 (null = unlabeled, skipped).
    val featRdd = feats.select(col("__y"), col("__f")).rdd.map { r =>
      val f = r.getSeq[Int](1)
      val y = if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
      if (!r.isNullAt(0) && java.lang.Double.isNaN(y))
        throw new IllegalArgumentException(
          "quality-classifier label is NaN — labelCol must be 0/1 " +
            "(null labels are skipped; NaN is out of contract)")
      (y, f.toArray)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = featRdd.count().toDouble
    require(n > 0, "no trainable documents (all zero-token?)")
    val w = Array.fill(dim + 1)(0.0)
    var it = 0
    while (it < iters) {
      val wLocal = w.clone()
      // per-partition gradient slabs, merged on the driver in partition
      // order — (#partitions × (dim+1)) doubles of driver traffic, the
      // same bounded-collect contract as Lloyd / BPE / unigram EM
      val parts = featRdd.mapPartitions { rows =>
        val acc = new Array[Double](wLocal.length)
        rows.foreach { case (y, f) =>
          if (!java.lang.Double.isNaN(y)) { // null-label row: no gradient
            var m = 0.0
            var i = 0
            while (i < f.length) { m += wLocal(f(i)); i += 1 }
            val r = 1.0 / (1.0 + math.exp(-m)) - y
            i = 0
            while (i < f.length) { acc(f(i)) += r; i += 1 }
          }
        }
        Iterator.single(acc)
      }.collect() // ordered by partition index — deterministic merge
      val g = new Array[Double](w.length)
      parts.foreach { acc =>
        var i = 0
        while (i < g.length) { g(i) += acc(i); i += 1 }
      }
      var fi = 0
      while (fi < w.length) {
        if (g(fi) != 0.0) w(fi) -= lr * g(fi) / n
        fi += 1
      }
      if (gridRound) {
        var i = 0
        while (i < w.length) {
          val x = w(i) * 1048576.0 + 0.5
          val clearance = math.abs(x - math.rint(x))
          // threshold 1e-6 (in the SCALED domain, where the grid step
          // is 1.0): cross-engine accumulation jitter is ~1e-15 in w
          // units = ~1e-9 scaled, so the guard must sit well ABOVE
          // that or the divergence it exists to catch slips under it
          // (r13 review); 1e-6 gives 3 decades of margin while firing
          // spuriously with probability ~2e-6 per rounding
          require(clearance > 1e-6,
            s"trainCertified: weight $i pre-round value sits $clearance " +
              "from a 2^-20 rounding boundary — cross-engine rounding " +
              "could diverge; change dim/iters/lr or corpus")
          w(i) = math.floor(x) / 1048576.0
          i += 1
        }
      }
      it += 1
    }
    featRdd.unpersist(blocking = false)
    w
  }
}
