package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-level (substring) exact deduplication: find token n-gram spans
  * that recur across documents and scrub them from every document —
  * the "deduplicate the REPEATED PASSAGE, not the document" operator
  * of Lee et al. 2022 (Deduplicating Training Data Makes Language
  * Models Better), which doc-level exact dedup ([[Dedup.dropExact]])
  * and near-dup clustering ([[Dedup.nearDupGroups]]) cannot express:
  * boilerplate headers, license blocks and navigation chrome recur
  * across MILLIONS of otherwise-distinct pages.
  *
  * Granularity ladder in this library: document ([[Dedup.exactGroups]])
  * → passage ([[Dedup.passages]] + near-dup) → SPAN (this object, exact
  * token n-grams with positional removal).
  *
  * Scale contract (100 TB): every stage is linear in corpus token
  * count. The occurrence explode produces one row per token position —
  * the same row-count class as the shingle explode LSH already runs.
  * The duplicated-span set is discovered with one hash-partitioned
  * groupBy and is NEVER broadcast or collected (on a web-scale corpus
  * the boilerplate span set is itself huge): membership is a
  * shuffle left_semi join on the span hash, position coverage a
  * left_anti equi-join on (doc, position) — all equi-joins AQE can
  * re-plan under skew. Reassembly does hold one document's kept tokens
  * in a single aggregation buffer (same bound as the context-window
  * chunker — documents, not partitions, must fit in memory).
  *
  * Hash modes follow [[Dedup]]: xxhash64 production default, md5 for
  * cross-engine oracle parity.
  */
object Spans {

  private def spanHash(span: Column, useMd5: Boolean): Column =
    if (useMd5) md5(span) else hex(xxhash64(span))

  /** One row per k-token span occurrence: (idCol, pos, span_hash) with
    * pos the 0-based token offset. Documents shorter than k tokens
    * contribute no rows ([[TextAnalysis.shingles]] contract). */
  def spanOccurrences(df: DataFrame, textCol: String, idCol: String,
                      k: Int = 3, useMd5: Boolean = false): DataFrame =
    df.select(col(idCol),
        posexplode(TextAnalysis.shingles(col(textCol), k)).as(Seq("pos", "span")))
      .select(col(idCol), col("pos"),
        spanHash(col("span"), useMd5).as("span_hash"))

  /** Spans recurring in at least `minDocs` DISTINCT documents:
    * (span_hash, n_docs, n_total occurrences). One hash-partitioned
    * aggregate; map-side partial distinct keeps the shuffle narrow. */
  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
                      k: Int = 3, minDocs: Int = 2,
                      useMd5: Boolean = false): DataFrame =
    spanOccurrences(df, textCol, idCol, k, useMd5)
      .groupBy("span_hash")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_total"))
      .filter(col("n_docs") >= minDocs)

  /** Every document with all cross-document duplicated spans removed:
    * a token position survives iff NO duplicated span covers it; kept
    * tokens are rejoined with single spaces into `outCol`. Documents
    * whose every token is covered yield the empty string (they are
    * pure boilerplate). The original `df` columns are preserved. */
  def scrubSpans(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 3, minDocs: Int = 2, useMd5: Boolean = false,
                 outCol: String = "clean"): DataFrame = {
    val occ = spanOccurrences(df, textCol, idCol, k, useMd5)
    val dup = duplicatedSpans(df, textCol, idCol, k, minDocs, useMd5)
      .select("span_hash")
    // positions covered by some duplicated span; duplicates are
    // harmless to the anti join but distinct() keeps the build side
    // of the (doc, position) shuffle minimal
    val covered = occ.join(dup, Seq("span_hash"), "left_semi")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .distinct()
    val toks = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("tpos", "tok")))
    val kept = toks.join(covered, Seq(idCol, "tpos"), "left_anti")
    val reassembled = kept.groupBy(idCol).agg(
      array_join(
        transform(array_sort(collect_list(struct(col("tpos"), col("tok")))),
          x => x.getField("tok")), " ").as(outCol))
    df.join(reassembled, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
  }
}
