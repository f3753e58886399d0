package graft

import org.apache.spark.sql.functions._
import graft.ops.RuleFilters

/** Gopher (Rae 2021 A1.1) and C4 (Raffel 2020 §2.2) rule filters vs
  * hand-built documents that trip each rule individually. */
class RuleFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private def gopher(rows: Seq[(Long, String)],
                     minWords: Int = 3, minStopHits: Int = 1) =
    rows.toDF("id", "text")
      .select(col("id"), RuleFilters.gopherMetrics(col("text"),
        minWords = minWords, maxWords = 10, minMwl = 2.0, maxMwl = 6.0,
        minAlphaFrac = 0.5, minStopHits = minStopHits).as("m"))
      .select(col("id"), col("m.n_words"), col("m.mean_word_len"),
        col("m.alpha_frac"), col("m.n_stop"), col("m.keep"))
      .as[(Long, Long, Double, Double, Long, Boolean)]
      .collect().toSeq.sortBy(_._1)

  test("gopher metrics: each rule trips independently") {
    val got = gopher(Seq(
      (1L, "the cat sat on mats"),       // all rules pass
      (2L, "the cat"),                   // too few words
      (3L, "the aa bb cc dd ee ff gg hh ii jj kk"), // too many words (max 10)
      (4L, "the x y z a"),               // mean word length < 2
      (5L, "the 123 456 789 000"),       // alpha fraction 1/5 < 0.5
      (6L, "cat sat on mats here")))     // zero required stopwords
    assert(got.map(r => (r._1, r._6)) === Seq(
      (1L, true), (2L, false), (3L, false), (4L, false), (5L, false), (6L, false)))
    val d1 = got.head
    assert(d1._2 === 5L)
    assert(math.abs(d1._3 - 15.0 / 5) < 1e-12) // the+cat+sat+on+mats = 15 chars
    assert(d1._4 === 1.0 && d1._5 === 1L)
    // empty text: zero words, metrics zeroed, dropped by any floor
    val e = gopher(Seq((9L, "   ")))
    assert(e.head._2 === 0L && e.head._3 === 0.0 && !e.head._6)
  }

  test("gopherFilter keeps exactly the passing rows") {
    val df = Seq((1L, "the cat sat on mats"), (2L, "the cat")).toDF("id", "text")
    val kept = RuleFilters.gopherFilter(df, "text", minWords = 3,
      maxWords = 10, minMwl = 2.0, maxMwl = 6.0, minAlphaFrac = 0.5,
      minStopHits = 1).select("id").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }

  test("c4 metrics: line gate, javascript drop, sentence floor, page vetoes") {
    def c4(rows: Seq[(Long, String)], minSentences: Int = 2) =
      rows.toDF("id", "text")
        .select(col("id"), RuleFilters.c4Metrics(col("text"), minSentences).as("m"))
        .select(col("id"), col("m.kept_text"), col("m.n_lines"),
          col("m.n_kept_lines"), col("m.n_sentences"), col("m.keep"))
        .as[(Long, String, Long, Long, Long, Boolean)]
        .collect().toSeq.sortBy(_._1)
    val got = c4(Seq(
      (1L, "Good first line.\nNo terminal punct\nAnother fine one!\nIs it ok?"),
      (2L, "enable javascript to continue.\nOnly one real sentence here."),
      (3L, "Fine sentence one. And two!\nBut lorem ipsum poisons the page."),
      (4L, "Braces { inside } veto.\nEven with sentences. Like this one.")))
    val d1 = got.head
    assert(d1._2 === "Good first line.\nAnother fine one!\nIs it ok?")
    assert((d1._3, d1._4, d1._5, d1._6) === (4L, 3L, 3L, true))
    assert(got(1)._4 === 1L && got(1)._5 === 1L && !got(1)._6) // js line dropped, 1 < 2
    assert(!got(2)._6 && got(2)._5 >= 2)                        // lorem ipsum veto
    assert(!got(3)._6)                                          // curly-brace veto
    val kept = RuleFilters.c4Filter(
      Seq((1L, "One good line.\nbad\nTwo good lines!")).toDF("id", "text"),
      "text", minSentences = 2)
      .select("text").as[String].collect()
    assert(kept.toSeq === Seq("One good line.\nTwo good lines!"))
  }

  test("gopher kernel law: one-pass GopherStats == the HOF formulation") {
    // The codegen'd kernel must be bit-identical to the original
    // filter/aggregate/rlike/array_contains formulation on real corpus
    // text plus the whitespace/unicode edge cases.
    def hofStats(text: org.apache.spark.sql.Column) = {
      val toks = filter(graft.ops.TextAnalysis.tokens(text), t => length(t) > 0)
      val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      struct(
        size(toks).cast("long").as("n_words"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("sum_len"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
        stops.map(s => when(array_contains(toks, s), 1).otherwise(0))
          .reduce(_ + _).cast("long").as("n_stop"))
    }
    val edge = Seq("", "   ", "\tthe\n be  ofé café 世界 123 ...",
      "THE BE to OF", "have-with that.be", "á é").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val corpus = sf("documents").select(col("doc_id").as("id"), col("text"))
      .unionAll(edge.toDF("id", "text"))
    val diff = corpus
      .select(graft.functions.VectorExprs.gopherStats(lower(col("text"))).as("k"),
        hofStats(col("text")).as("h"))
      .filter(col("k.n_words") =!= col("h.n_words") ||
        col("k.sum_len") =!= col("h.sum_len") ||
        col("k.n_alpha") =!= col("h.n_alpha") ||
        col("k.n_stop") =!= col("h.n_stop"))
      .count()
    assert(diff === 0L)
  }

  test("funnelReport: cumulative AND equals sequential filters, null " +
    "gate fails the row, order matters, ONE aggregation job") {
    import graft.ops.RuleFilters
    import spark.implicits._
    val df = Seq(
      (1L, 10L, Some("en")), (2L, 100L, Some("en")),
      (3L, 100L, Some("zh")), (4L, 100L, None), (5L, 200L, Some("de"))
    ).toDF("id", "n", "lang")
    val gates = Seq(
      "len" -> (col("n") >= 50),
      "lang" -> col("lang").isin("en", "de")) // NULL lang → null gate
    val rep = RuleFilters.funnelReport(df, gates)
      .orderBy("stage_idx")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    // sequential-filter reference
    val s1 = df.filter(gates(0)._2)
    val s2 = s1.filter(gates(1)._2)
    assert(rep === Array(("input", 5L, 0L), ("len", s1.count(), 1L),
      ("lang", s2.count(), s1.count() - s2.count())))
    assert(rep(2)._2 === 2L) // row 4's NULL lang failed like a filter would
    // order matters: swapping gates changes per-stage drops but not
    // the final survivor count
    val swapped = RuleFilters.funnelReport(df, gates.reverse)
      .orderBy("stage_idx").collect()
    assert(swapped.last.getLong(2) === rep.last._2)
    assert(swapped(1).getLong(3) !== rep(1)._3)
    // duplicate stage names and the reserved 'input' refuse
    intercept[IllegalArgumentException] {
      RuleFilters.funnelReport(df, Seq("a" -> lit(true), "a" -> lit(true)))
    }
    intercept[IllegalArgumentException] {
      RuleFilters.funnelReport(df, Seq("input" -> lit(true)))
    }
    // one aggregation: no join, no window, single-partition exchange
    // only (the global-agg shape)
    val plan = RuleFilters.funnelReport(df, gates)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"))
    // an EMPTY input reports zeros, not nulls (r18 review find)
    val empty = RuleFilters.funnelReport(df.filter(col("n") < 0), gates)
      .orderBy("stage_idx").collect()
    assert(empty.map(_.getLong(2)).toSeq === Seq(0L, 0L, 0L))
    assert(empty.map(_.getLong(3)).toSeq === Seq(0L, 0L, 0L))
  }
}
