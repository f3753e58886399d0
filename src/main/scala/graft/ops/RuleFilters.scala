package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filters — the published heuristic
  * gates production corpora pass BEFORE any model-based scoring:
  * Gopher's document-level rules (Rae et al. 2021, Appendix A1.1,
  * the MassiveWeb filter reused by Chinchilla/LLaMA-class pipelines)
  * and C4's line/page rules (Raffel et al. 2020 §2.2). Every rule is
  * a map-only projection over the text column — no shuffle, no
  * state, streaming-safe, and the filter sits directly over the scan
  * so Parquet row-group pruning still applies upstream.
  */
object RuleFilters {

  /** Gopher document-level quality metrics + the composite keep
    * decision: (n_words, mean_word_len, alpha_frac, n_stop, keep).
    *
    *  - 50 <= n_words <= 100000        (word-count bounds)
    *  - 3 <= mean word length <= 10    (symbol soup / minified text)
    *  - >= 80% of words contain an alphabetic character
    *  - >= 2 distinct hits from the required-stopword list
    *    ("the be to of and that have with" — Gopher's own list)
    *
    * Thresholds are parameters so corpora with different length
    * regimes can re-gate; defaults are the paper's. All arithmetic is
    * integer until the two final divisions, so the metrics are
    * bit-identical across engines at any rounding. */
  def gopherMetrics(text: Column,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMwl: Double = 3.0, maxMwl: Double = 10.0,
                    minAlphaFrac: Double = 0.8,
                    minStopHits: Int = 2): Column = {
    // One codegen'd text pass for the four counts (the HOF
    // filter/aggregate/rlike formulation ran as interpreted lambdas
    // with a regex per token; RuleFiltersSpec pins kernel == HOF).
    val st = graft.functions.VectorExprs.gopherStats(lower(text))
    val n = st.getField("n_words")
    val sumLen = st.getField("sum_len")
    val nAlpha = st.getField("n_alpha")
    val nStop = st.getField("n_stop")
    val mwl = when(n > 0, sumLen.cast("double") / n).otherwise(lit(0.0))
    val alphaFrac = when(n > 0, nAlpha.cast("double") / n).otherwise(lit(0.0))
    val keep = n >= minWords && n <= maxWords &&
      mwl >= minMwl && mwl <= maxMwl &&
      alphaFrac >= minAlphaFrac && nStop >= minStopHits
    struct(n.as("n_words"), mwl.as("mean_word_len"),
      alphaFrac.as("alpha_frac"), nStop.as("n_stop"),
      keep.as("keep"))
  }

  /** Gopher-filtered corpus: rows whose metrics pass the composite
    * gate. Map-only filter directly over the scan. */
  def gopherFilter(df: DataFrame, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMwl: Double = 3.0, maxMwl: Double = 10.0,
                   minAlphaFrac: Double = 0.8,
                   minStopHits: Int = 2): DataFrame =
    df.filter(gopherMetrics(col(textCol), minWords, maxWords, minMwl,
      maxMwl, minAlphaFrac, minStopHits).getField("keep"))

  /** C4 line/page cleanup (Raffel et al. 2020 §2.2): keep lines that
    * end in terminal punctuation and do not mention javascript; then
    * gate the page on >= `minSentences` sentences in the kept text,
    * no "lorem ipsum", and no curly brace. Returns
    * (kept_text, n_lines, n_kept_lines, n_sentences, keep).
    * Terminal punctuation is the paper's set: . ! ? plus closing
    * quote after one. */
  def c4Metrics(text: Column, minSentences: Int = 5): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val keptLines = filter(lines, l =>
      trim(l).rlike("[.!?\"']$") && !lower(l).contains("javascript"))
    val keptText = array_join(keptLines, "\n")
    // sentence count = terminal-punctuation runs in the kept text
    val nSent = size(filter(split(keptText, "[.!?]+"),
      s => length(trim(s)) > 0))
    val keep = nSent >= minSentences &&
      !lower(text).contains("lorem ipsum") && !text.contains("{")
    struct(keptText.as("kept_text"), size(lines).cast("long").as("n_lines"),
      size(keptLines).cast("long").as("n_kept_lines"),
      nSent.cast("long").as("n_sentences"), keep.as("keep"))
  }

  /** C4-cleaned corpus: pages that survive the gate, with their text
    * replaced by the kept lines. Map-only. */
  def c4Filter(df: DataFrame, textCol: String,
               minSentences: Int = 5): DataFrame = {
    val m = c4Metrics(col(textCol), minSentences)
    df.withColumn("__c4", m)
      .filter(col("__c4.keep"))
      .withColumn(textCol, col("__c4.kept_text"))
      .drop("__c4")
  }

  /** One-pass pipeline FUNNEL: for ordered gates g₁..gₖ, the rows
    * surviving g₁∧…∧gᵢ for every stage i — the per-run audit artifact
    * a curation pipeline publishes ("input 10M → length 8.2M → lang
    * 7.9M → quality 6.1M"). ONE aggregation job over one scan: the
    * cumulative-AND flags are computed per row and summed as
    * conditional counts, so no stage is ever materialized and the
    * output is k+1 driver-bounded rows (stage, survivors,
    * dropped_here), stage 0 = "input". A gate evaluating to NULL
    * counts as a FAIL (the filter semantics a pipeline would see).
    * Gate ORDER matters, as it does in the pipeline: a row dropped at
    * stage i is not offered to stage i+1. */
  def funnelReport(df: DataFrame,
                   gates: Seq[(String, Column)]): DataFrame = {
    require(gates.nonEmpty, "at least one gate required")
    val names = gates.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate stage names: ${names.diff(names.distinct).distinct}")
    require(!names.contains("input"), "'input' is the reserved stage 0")
    val cum = gates.scanLeft(lit(true)) { case (acc, (_, g)) =>
      acc && coalesce(g, lit(false))
    } // cum(0)=true (input), cum(i)=g1∧…∧gi
    val counts = cum.zipWithIndex.map { case (c, i) =>
      // coalesce: a global sum over ZERO rows is null — the audit
      // artifact must say 0, not null (r18 review find)
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"__n$i")
    }
    val agg = df.agg(counts.head, counts.tail: _*)
    val stages = ("input" +: names).zipWithIndex.map { case (nm, i) =>
      struct(lit(nm).as("stage"), lit(i).cast("long").as("stage_idx"),
        col(s"__n$i").as("survivors"),
        (if (i == 0) lit(0L)
         else col(s"__n${i - 1}") - col(s"__n$i")).as("dropped_here"))
    }
    agg.select(explode(array(stages: _*)).as("__s"))
      .select(col("__s.stage"), col("__s.stage_idx"),
        col("__s.survivors"), col("__s.dropped_here"))
  }
}
