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
    * [a a a] merging (a,a) → [aa a]. Fold state carries (out, pending
    * symbol); a pending `l` followed by `r` emits the fused symbol. */
  def mergePair(syms: Column, l: String, r: String): Column = {
    val fused = l + r
    def finishPend(out: Column, pend: Column): Column =
      when(pend.isNotNull, concat(out, array(pend))).otherwise(out)
    aggregate(
      syms,
      struct(lit(Array.empty[String]).as("out"),
        lit(null).cast("string").as("pend")),
      (st, x) => when(st.getField("pend") === lit(l) && x === lit(r),
        struct(concat(st.getField("out"), array(lit(fused))).as("out"),
          lit(null).cast("string").as("pend")))
        .otherwise(struct(
          finishPend(st.getField("out"), st.getField("pend")).as("out"),
          x.as("pend"))),
      st => finishPend(st.getField("out"), st.getField("pend")))
  }

  /** Learn `numMerges` BPE merges from the corpus; returns the local
    * merge table (rank, lft, rgt, cnt) — by definition a small result
    * (one row per merge), like a centroid table. Ties break
    * lexicographically on (lft, rgt) so the learned tokenizer is
    * deterministic across runs and partitionings. Stops early when no
    * pair reaches `minCount`. */
  def learnBpe(df: DataFrame, textCol: String, numMerges: Int,
               minCount: Long = 2L): DataFrame = {
    require(numMerges >= 1, "numMerges must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var words = wordFrequency(df, textCol)
      .select(symbolize(col("token")).as("syms"), col("cnt"))
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
    merges.toSeq.toDF("rank", "lft", "rgt", "cnt")
  }
}
