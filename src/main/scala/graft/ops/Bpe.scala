package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge learning — the
  * tokenizer-TRAINING view of the corpus, completing the tokenizer
  * family next to [[TextAnalysis.vocabulary]] (token ranks) and
  * [[TextAnalysis.subwordTokenCount]] (segmentation cost estimate).
  * Algorithm per Sennrich et al. 2016: start from characters plus an
  * end-of-word marker, repeatedly merge the most frequent adjacent
  * symbol pair (greedy left-to-right, non-overlapping within a word).
  *
  * Scale contract (the reason this shape is right at 100 TB): the
  * corpus-sized work happens EXACTLY ONCE — the word-frequency
  * aggregation ([[wordFrequency]], one shuffle on token). Every merge
  * iteration then operates on the DISTINCT-token table, whose size is
  * the corpus vocabulary (millions of rows at web scale, not
  * billions): one pair-count aggregate + a top-of-table row batch to
  * the driver + one map-only merge pass per ROUND, with
  * `localCheckpoint` cutting lineage per round exactly like
  * [[Similarity.refineCentroids]]'s Lloyd loop (superseded checkpoint
  * blocks freed as each round materializes). Driver traffic is a few
  * (left, right, count) rows per round — never the vocabulary — and
  * batched selection (`batch` > 1) collapses ~batch merges into each
  * round, the lever that takes a 30k-merge production vocab from 60k
  * driver round-trips to ~2k.
  *
  * The per-word merge pass is a fold (`aggregate` HOF) over the symbol
  * array — interpreted, but it runs over vocabulary rows, not corpus
  * rows, where expression interpretation cost is irrelevant (the same
  * adjudication as refineCentroids' k-row transform).
  */
object Bpe {

  val EndOfWord = "</w>"

  /** (token, cnt) word-frequency table — the one corpus-scale pass. */
  def wordFrequency(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Character symbolization with the end-of-word marker appended:
    * "low" → [l, o, w, </w>]. Codepoint-wise (split on the empty
    * pattern), empty fragments dropped. */
  def symbolize(token: Column): Column =
    concat(array_remove(split(token, ""), ""), array(lit(EndOfWord)))

  /** Adjacent-pair counts over a (syms, cnt) symbol table:
    * (left, right, cnt) summed across words. */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("lft"),
            element_at(col("syms"), i + 2).as("rgt")))).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum("cnt").as("cnt"))

  /** Greedy left-to-right non-overlapping merge of the adjacent pair
    * (l, r) within a symbol array — Sennrich's re.sub semantics:
    * [a a a] merging (a,a) → [aa a]. Implemented as the doubled-space
    * string-replace chain (join on ' ', double separators so plain
    * sequential `replace(' l  r ' → ' lr ')` can't bridge across an
    * already-consumed neighbor, collapse, split) — the IDENTICAL
    * algorithm the DuckDB oracle runs, and every step is a codegen'd
    * string builtin: an earlier `aggregate`-HOF fold formulation was
    * interpreted and O(|word|²) per merge (15s vs 2s on q_bpe_encode
    * at sf0.1). Sound because symbols never contain spaces (tokens are
    * whitespace-split). */
  def mergePair(syms: Column, l: String, r: String): Column = {
    val doubled = concat(lit(" "),
      replace(array_join(syms, " "), lit(" "), lit("  ")), lit(" "))
    val merged = replace(doubled, lit(s" $l  $r "), lit(s" $l$r "))
    val collapsed = replace(trim(merged), lit("  "), lit(" "))
    array_remove(split(collapsed, " "), "")
  }

  /** Apply learned merges to a symbol array in RANK ORDER — the encode
    * side of the tokenizer. Rank-order application replays the exact
    * state evolution of learning (merge k's pair elements exist only in
    * state k), which is the canonical Sennrich encode; subword-nmt's
    * min-rank-present iteration is an optimization of the same
    * computation. The fold chain is evaluated on vocabulary rows, not
    * corpus rows ([[segment]]). */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (l, r)) => mergePair(c, l, r) }

  /** Segment every DISTINCT token of the corpus with an already-learned
    * merge list: (token, cnt, subwords). The merge list is a local Seq
    * — by definition tokenizer-sized (one entry per merge), the same
    * bounded-driver-traffic contract as a centroid table. Corpus text
    * is touched once (word frequency); the merge folds run over the
    * distinct-token table. */
  def segment(df: DataFrame, textCol: String,
              merges: Seq[(String, String)]): DataFrame =
    wordFrequency(df, textCol)
      .withColumn("subwords", applyMerges(symbolize(col("token")), merges))

  /** Tokenize every document with an already-learned merge table —
    * the production encode path: appends a `subwords` array column
    * holding the canonical MIN-RANK Sennrich/HF segmentation of the
    * document's tokens, in order. Map-only at any scale: the merge
    * table is local (tokenizer-sized by definition — 10⁴–10⁵ entries
    * ship to every worker inside the codegen'd
    * [[graft.functions.BpeSegmentExpr]] kernel), so unlike
    * [[applyMerges]]' replay chain this handles real 30k-merge
    * tokenizers — a 30k-deep expression chain cannot even plan. On
    * learnable tables min-rank equals rank-order replay; on arbitrary
    * truncated/pruned tables they can differ (min-rank is the
    * subword-nmt / HF contract; divergence is spec-pinned). */
  def encodeDocs(df: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val ranks = new java.util.HashMap[String, Integer](2 * merges.size + 1)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      ranks.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    graft.functions.TempFunctions.withTempFunction(
      df.sparkSession, "graft_bpe_segment",
      exprs => graft.functions.BpeSegmentExpr(exprs(0), ranks, EndOfWord)) { fn =>
      df.withColumn("subwords",
        call_function(fn, TextAnalysis.tokens(col(textCol))))
    }
  }

  /** Inverse of [[encodeDocs]]/[[segment]]: a subword array back to
    * the whitespace-NORMALIZED text (tokens joined by single spaces).
    * Exact for ANY merge table — learned, truncated, or pruned —
    * because merges only ever concatenate adjacent symbols of one
    * word, so concatenating the subwords restores each word and the
    * end-of-word markers restore the boundaries. Map-only codegen'd
    * string builtins; the one caveat is inherited from Sennrich's
    * marker scheme itself: a corpus whose raw tokens contain the
    * literal marker string "&lt;/w&gt;" would alias it (the reference
    * implementation shares this ambiguity). */
  def decodeSubwords(subwords: Column): Column =
    trim(replace(array_join(subwords, ""), lit(EndOfWord), lit(" ")))

  /** Corpus subword frequency under an already-learned merge list —
    * the "what does the corpus look like to this tokenizer" view
    * (vocabulary coverage, compression ratio inputs). */
  def subwordFrequency(df: DataFrame, textCol: String,
                       merges: Seq[(String, String)]): DataFrame =
    segment(df, textCol, merges)
      .select(explode(col("subwords")).as("subword"), col("cnt"))
      .groupBy("subword").agg(sum("cnt").as("cnt"))

  /** Learn `numMerges` BPE merges from the corpus; returns the local
    * merge table (rank, lft, rgt, cnt) — by definition a small result
    * (one row per merge), like a centroid table. Ties break
    * lexicographically on (lft, rgt) so the learned tokenizer is
    * deterministic across runs and partitionings. Stops early when no
    * pair reaches `minCount`. */
  def learnBpe(df: DataFrame, textCol: String, numMerges: Int,
               minCount: Long = 2L, batch: Int = 1): DataFrame =
    learnBpeWithVocab(df, textCol, numMerges, minCount, batch)._1

  /** [[learnBpe]] plus the loop's FINAL words state — which is exactly
    * the corpus vocabulary segmented under the learned merges: (token,
    * syms, cnt). Training and encoding the training corpus share all
    * their work, so asking for both costs nothing beyond learning
    * (vs [[segment]], which re-reads the corpus — the right call only
    * for encoding a *different* corpus with an existing tokenizer). */
  def learnBpeWithVocab(df: DataFrame, textCol: String, numMerges: Int,
                        minCount: Long = 2L, batch: Int = 1): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    require(batch >= 1, "batch must be >= 1")
    val spark = df.sparkSession
    val sc = spark.sparkContext
    import spark.implicits._
    // Track the persistent-RDD ids each eager localCheckpoint creates so
    // the PREVIOUS round's blocks can be freed once the new round has
    // materialized from them — without this, an N-merge train leaves N
    // checkpointed copies of the vocab table pinned in executor storage
    // (harmless at 8 merges, a leak at a production 30k). The id diff is
    // taken around our own checkpoint call; nothing else in this loop
    // creates persistent RDDs.
    var prevCkptIds = Set.empty[Int]
    def checkpointAndRelease(d: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet
      val out = d.localCheckpoint() // eager: materialized before we free inputs
      val created = sc.getPersistentRDDs.keySet -- before
      prevCkptIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevCkptIds = created.toSet
      out
    }
    var words = checkpointAndRelease(
      wordFrequency(df, textCol)
        .select(col("token"), symbolize(col("token")).as("syms"), col("cnt")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      // Batched merge selection: ONE driver job fetches the top of the
      // pair table, then a greedy rank-order PREFIX of mutually
      // non-interacting pairs (no symbol shared with an accepted pair's
      // left, right, or merged form) is applied in a single map pass +
      // one checkpoint. Stopping at the first conflict — never skipping
      // past it — means the accepted set is exactly the sequential
      // schedule whenever counts are batch-stable; the two schedules can
      // differ only when a merge CREATES a pair that outranks a
      // later-accepted one (BpeSpec pins equality on non-interacting
      // corpora). batch=1 is bit-identical to classic sequential
      // Sennrich training. Driver rounds (jobs + checkpoints) drop from
      // numMerges to ~numMerges/batch — the wall-clock term at a
      // production 30k-merge vocab, since each round's cluster work is
      // a vocab-table aggregate that no longer amortizes its latency.
      val want = math.min(batch, numMerges - i)
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("lft"), asc("rgt"))
        .limit(want * 4 max 1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var stop = false
        var j = 0
        while (!stop && j < top.length && accepted.length < want) {
          val (l, r, c) =
            (top(j).getString(0), top(j).getString(1), top(j).getLong(2))
          if (c < minCount) stop = true
          else if (used(l) || used(r) || used(l + r)) stop = true
          else { accepted += ((l, r, c)); used += l; used += r; used += (l + r) }
          j += 1
        }
        accepted.foreach { case (l, r, c) => merges += ((i, l, r, c)); i += 1 }
        words = checkpointAndRelease(words.withColumn("syms",
          accepted.foldLeft(col("syms")) { case (s0, (l, r, _)) =>
            mergePair(s0, l, r)
          }))
      }
    }
    (merges.toSeq.toDF("rank", "lft", "rgt", "cnt"), words)
  }
}
