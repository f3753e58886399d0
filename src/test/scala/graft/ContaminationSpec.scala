package graft

import org.apache.spark.sql.functions._
import graft.ops.Contamination

class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  // corpus with planted k-gram overlap: docs 1,2 are the "benchmark";
  // doc 3 embeds a full 3-gram of doc 1 mid-sentence; doc 4 shares
  // only 2-gram fragments; doc 5 is disjoint; doc 6 too short for any
  // 3-gram; doc 7 empty
  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, "he said the quick brown fox was a myth"),
    (4L, "quick brown bear and lazy dog stories"),
    (5L, "completely unrelated text about databases"),
    (6L, "too short"),
    (7L, "")).toDF("id", "text")

  private def bench = corpus.filter($"id" <= 2)

  test("exact n-gram contamination: planted 3-gram inclusion found, " +
    "fragments and short/empty docs clean") {
    val ids = Contamination.contaminatedIds(corpus, bench, "text", "id", k = 3)
      .as[Long].collect().sorted.toSeq
    // 1,2 self-contaminate; 3 embeds "the quick brown" (and more);
    // 4 shares no full 3-gram; 6 has < 3 tokens; 7 empty
    assert(ids === Seq(1L, 2L, 3L))
    // k=8 default: only the benchmark docs self-contaminate (doc 1 has
    // 9 tokens, doc 2 has 8 — each contains its own 8-grams)
    val clean = Contamination.decontaminate(corpus, bench, "text", "id")
    assert(clean.select("id").as[Long].collect().sorted.toSeq ===
      Seq(3L, 4L, 5L, 6L, 7L))
    val clean3 = Contamination.decontaminate(corpus, bench, "text", "id", k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(clean3 === Seq(4L, 5L, 6L, 7L))
  }

  test("bloom prefilter has no false negatives and the two-phase " +
    "result equals the exact path — even at an fpp forcing false positives") {
    val exactIds = Contamination
      .contaminatedIds(corpus, bench, "text", "id", k = 3)
      .as[Long].collect().toSet
    // fpp 0.2 on a tiny filter: false positives plausible, results
    // must still match exactly because phase 2 verifies
    val bytes = Contamination.benchNgramBloom(bench, "text", k = 3, fpp = 0.2)
    val candIds = corpus
      .filter(Contamination.mightBeContaminated(col("text"), bytes, 3))
      .select("id").as[Long].collect().toSet
    assert(exactIds.subsetOf(candIds), "bloom dropped a true positive")
    val bloomIds = Contamination
      .contaminatedBloom(corpus, bench, "text", "id", k = 3, fpp = 0.2)
      .select("id").as[Long].collect().toSet
    assert(bloomIds === exactIds)
    val bloomClean = Contamination
      .decontaminateBloom(corpus, bench, "text", "id", k = 3, fpp = 0.2)
      .select("id").as[Long].collect().toSet
    assert(bloomClean === corpus.select("id").as[Long].collect().toSet -- exactIds)
  }

  test("bloom probe hash is bit-identical to the build side: every " +
    "benchmark doc's own shingles hit the bloom") {
    val bytes = Contamination.benchNgramBloom(bench, "text", k = 3)
    val hits = bench
      .filter(Contamination.mightBeContaminated(col("text"), bytes, 3))
      .count()
    assert(hits === bench.count())
  }

  test("sf0.001 documents: bloom two-phase equals exact at k=5") {
    val docsDf = sf("documents")
    val b = docsDf.filter($"doc_id" < 20)
    val exact = Contamination.contaminated(docsDf, b, "text", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val bloom = Contamination
      .contaminatedBloom(docsDf, b, "text", "doc_id", k = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(bloom === exact)
    assert(exact.nonEmpty) // benchmark self-contaminates at minimum
  }
}
