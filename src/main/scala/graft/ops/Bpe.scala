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
  * billions): one pair-count aggregate + one argmax row to the driver
  * + one map-only merge pass, with `localCheckpoint` cutting lineage
  * per round exactly like [[Similarity.refineCentroids]]'s Lloyd
  * loop. Driver traffic is ONE (left, right, count) row per merge —
  * never the vocabulary.
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
               minCount: Long = 2L): DataFrame =
    learnBpeWithVocab(df, textCol, numMerges, minCount)._1

  /** [[learnBpe]] plus the loop's FINAL words state — which is exactly
    * the corpus vocabulary segmented under the learned merges: (token,
    * syms, cnt). Training and encoding the training corpus share all
    * their work, so asking for both costs nothing beyond learning
    * (vs [[segment]], which re-reads the corpus — the right call only
    * for encoding a *different* corpus with an existing tokenizer). */
  def learnBpeWithVocab(df: DataFrame, textCol: String, numMerges: Int,
                        minCount: Long = 2L): (DataFrame, DataFrame) = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordFrequency(df, textCol)
      .select(col("token"), symbolize(col("token")).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("lft"), asc("rgt")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, l, r, c))
        words = words
          .withColumn("syms", mergePair(col("syms"), l, r))
          .localCheckpoint()
        i += 1
      }
    }
    (merges.toSeq.toDF("rank", "lft", "rgt", "cnt"), words)
  }
}
