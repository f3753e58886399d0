package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing — the "concat then chunk" step every LLM training
  * pipeline runs between curation and the data loader: lay all documents
  * end-to-end in a deterministic order and cut the token stream into
  * fixed-budget training sequences.
  *
  * The assignment is pure arithmetic over the global token prefix sum:
  * a document whose tokens occupy stream positions [prev, prev+n) lands
  * in sequences floor(prev/B) .. floor((prev+n-1)/B). That makes the
  * whole operator [[graft.api.GlobalScan.prefixSum]] (one range shuffle,
  * one checkpoint, one map-only pass — no single-partition window) plus
  * a codegen'd select; no further shuffle at any scale, and the output
  * is reproducible bit-for-bit given the order key — which is exactly
  * what a resumable multi-epoch training run needs.
  *
  * Not in the reference (flox stops at grouped reductions/scans —
  * `flox/scan.py:101`); this is pipeline surface in the same sense as
  * [[Dedup]]/[[Selection]].
  */
object Packing {

  /** Per-document packed-sequence assignment.
    *
    * @param df       corpus
    * @param idCol    unique order key (stream order = ascending idCol)
    * @param tokenCol per-document token count (long-castable)
    * @param budget   tokens per packed sequence (> 0)
    * @return input columns + `n_tokens`, `first_seq`, `last_seq`,
    *         `n_seqs` (sequences this document spans; 0 for empty docs,
    *         whose first_seq/last_seq report the insertion point)
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
                    budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val cum = graft.api.GlobalScan.prefixSum(
      df.withColumn("n_tokens", coalesce(tokenCol.cast("long"), lit(0L))),
      Seq(col(idCol)), col("n_tokens"), "__cum")
    val prev = col("__cum") - col("n_tokens")
    val firstSeq = floor(prev / budget).cast("long")
    val lastSeq = greatest(firstSeq,
      floor((col("__cum") - 1) / budget).cast("long"))
    cum
      .withColumn("first_seq", firstSeq)
      .withColumn("last_seq", lastSeq)
      .withColumn("n_seqs",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("last_seq") - col("first_seq") + 1))
      .drop("__cum")
  }
}
