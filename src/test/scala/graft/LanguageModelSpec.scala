package graft

import org.apache.spark.sql.functions._
import graft.ops.LanguageModel

/** Bigram LM training + perplexity scoring vs a local reference
  * implementation of add-k bigram NLL. */
class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  // local reference: add-k bigram average NLL
  private def refScore(train: Seq[String], score: Seq[(Long, String)],
                       k: Double = 1.0): Seq[(Long, Long, Option[Double])] = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bigrams(s: String) = { val t = toks(s); t.zip(t.drop(1)).map(p => s"${p._1} ${p._2}") }
    val model = train.flatMap(bigrams).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val hist = model.toSeq.groupBy(_._1.split(" ")(0)).view.mapValues(_.map(_._2).sum).toMap
    val v = train.flatMap(toks).distinct.size
    score.map { case (id, text) =>
      val bs = bigrams(text)
      val nlls = bs.map { b =>
        val c = model.getOrElse(b, 0L)
        val h = hist.getOrElse(b.split(" ")(0), 0L)
        -(math.log(c + k) - math.log(h + k * v))
      }
      (id, bs.size.toLong, if (bs.isEmpty) None else Some(nlls.sum / nlls.size))
    }
  }

  private val train = Seq(
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log")

  test("scoreDocs: in-domain, out-of-domain, unseen-token, and degenerate docs") {
    val scoreSet = Seq(
      (1L, "the cat sat on the mat"),   // in-domain
      (2L, "the dog ate a fish"),       // recombined
      (3L, "zebra quantum flux"),       // fully unseen -> each bigram 1/V
      (4L, "single"),                   // 1 token -> 0 bigrams, null nll
      (5L, ""))                         // empty -> 0 bigrams, null nll
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val model = LanguageModel.trainBigram(trainDf, "text")
    val vocab = LanguageModel.vocabSize(trainDf, "text")
    val got = LanguageModel.scoreDocs(scoreSet.toDF("doc_id", "text"),
        model, vocab, "text", "doc_id")
      .orderBy("doc_id")
      .select(col("doc_id"), col("n_bigrams"), col("nll"))
      .as[(Long, Long, Option[Double])].collect().toSeq
    val want = refScore(train, scoreSet)
    got.zip(want).foreach { case ((gi, gn, gs), (wi, wn, ws)) =>
      assert(gi === wi && gn === wn)
      (gs, ws) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-12, s"doc $gi")
        case (a, b) => assert(a === b, s"doc $gi")
      }
    }
    // unseen-everything doc scores exactly ln(V) per bigram
    val v = train.flatMap(_.split("\\s+")).distinct.size
    assert(math.abs(got(2)._3.get - math.log(v)) < 1e-12)
  }

  test("perplexityFilter: thresholds on nll, drops zero-bigram docs") {
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val model = LanguageModel.trainBigram(trainDf, "text")
    val vocab = LanguageModel.vocabSize(trainDf, "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (3L, "zebra quantum flux"),
      (4L, "single")).toDF("doc_id", "text")
    val scores = LanguageModel.scoreDocs(docs, model, vocab, "text", "doc_id")
      .as[(Long, Long, Option[Double])].collect()
      .flatMap { case (id, _, s) => s.map(id -> _) }.toMap
    val cut = (scores(1L) + scores(3L)) / 2
    val kept = LanguageModel.perplexityFilter(docs, model, vocab,
      "text", "doc_id", cut).select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L)) // 3 over threshold, 4 has no evidence
  }

  test("scoreDocsLocal: bit-equal to the join path on every doc class; gate refuses oversized models") {
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val model = LanguageModel.trainBigram(trainDf, "text")
    val vocab = LanguageModel.vocabSize(trainDf, "text")
    val local = LanguageModel.localModel(model)
    val v = LanguageModel.vocabSizeLocal(trainDf, "text")
    // local map contents: bigram counts + history marginals, no collisions
    assert(local.get("the cat") === 2L && local.get("the") === 4L)
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog ate a fish"),
      (3L, "zebra quantum flux"), (4L, "single"), (5L, "")).toDF("doc_id", "text")
    val viaJoin = LanguageModel.scoreDocs(docs, model, vocab, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    val viaLocal = LanguageModel.scoreDocsLocal(docs, local, v, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Option[Double])].collect().toSeq
    assert(viaLocal === viaJoin) // bit-exact, including null nll rows
    // filter paths agree too
    val cut = viaJoin.find(_._1 == 1L).get._3.get + 1e-9
    val keptJoin = LanguageModel.perplexityFilter(docs, model, vocab,
      "text", "doc_id", cut).select("doc_id").as[Long].collect().sorted
    val keptLocal = LanguageModel.perplexityFilterLocal(docs, local, v,
      "text", "doc_id", cut).select("doc_id").as[Long].collect().sorted
    assert(keptLocal === keptJoin && keptJoin.contains(1L))
    // the size gate
    val e = intercept[IllegalArgumentException](
      LanguageModel.localModel(model, maxEntries = 2))
    assert(e.getMessage.contains("gate"))
  }

  test("collocations: PMI formula and min-count floor vs local reference") {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val corpus = Seq.fill(4)("new york is big") ++ Seq.fill(3)("big apple") ++
      Seq("york new", "is is is")
    val uni = corpus.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = uni.values.sum
    val bigr = corpus.flatMap { s => val w = toks(s); w.zip(w.drop(1)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = bigr.collect { case ((l, r), c) if c >= 2 =>
      (s"$l $r", c, math.log(c.toDouble * t / (uni(l).toDouble * uni(r))))
    }.toSeq.sortBy(_._1)
    val got = LanguageModel.collocations(
        corpus.map(Tuple1(_)).toDF("text"), "text", minCount = 2L)
      .orderBy("bigram").as[(String, Long, Double)].collect().toSeq
    assert(got.map(x => (x._1, x._2)) === want.map(x => (x._1, x._2)))
    got.zip(want).foreach { case ((b, _, g), (_, _, w)) =>
      assert(math.abs(g - w) < 1e-12, b) }
    // "new york" (always adjacent) outranks "is big" (common 'is')
    val pmi = got.map(x => x._1 -> x._3).toMap
    assert(pmi("new york") > pmi("is big"))
  }

  test("add-k constant k != 1 changes smoothing as specified") {
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val model = LanguageModel.trainBigram(trainDf, "text")
    val vocab = LanguageModel.vocabSize(trainDf, "text")
    val docs = Seq((1L, "the cat ate")).toDF("doc_id", "text")
    val got = LanguageModel.scoreDocs(docs, model, vocab, "text", "doc_id", k = 0.5)
      .select("nll").as[Option[Double]].collect()(0).get
    val want = refScore(train, Seq((1L, "the cat ate")), k = 0.5)(0)._3.get
    assert(math.abs(got - want) < 1e-12)
  }

  // local reference: interpolated KN bigram probability, continuation
  // add-one floor — mirrors LanguageModel.scoreDocsKneserNey's spec
  private def knRef(train: Seq[String], discount: Option[Double]) = {
    def toks(s: String) = s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def bigrams(s: String) = { val t = toks(s); t.zip(t.drop(1)) }
    val model = train.flatMap(bigrams).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val hcnt = model.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n1h = model.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1c = model.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val b = model.size.toLong
    val v = train.flatMap(toks).distinct.size.toLong
    val n1 = model.values.count(_ == 1L).toLong
    val n2 = model.values.count(_ == 2L).toLong
    val d = discount.getOrElse(
      if (n1 + 2 * n2 > 0) n1.toDouble / (n1 + 2 * n2) else 0.5)
    (l: String, r: String) => {
      val pc = (n1c.getOrElse(r, 0L) + 1.0) / (b + v)
      hcnt.get(l) match {
        case Some(h) =>
          (math.max(model.getOrElse((l, r), 0L) - d, 0.0) +
            d * n1h(l) * pc) / h
        case None => pc
      }
    }
  }

  test("kneser-ney: matches local reference on seen/unseen/OOV bigrams") {
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val model = LanguageModel.trainBigram(trainDf, "text")
    val vocab = LanguageModel.vocabSize(trainDf, "text")
    val p = knRef(train, None)
    val cases = Seq(
      (1L, "the cat sat"),        // seen bigrams
      (2L, "the dog ate a fish"), // recombined: seen histories, unseen pairs
      (3L, "zebra quantum flux"), // fully OOV -> pure continuation floor
      (4L, "mat the"))            // seen words, 'mat' history unseen
    val got = LanguageModel.scoreDocsKneserNey(
      cases.toDF("doc_id", "text"), model, vocab, "text", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "nll")
      .as[(Long, Long, Option[Double])].collect().toSeq
    cases.zip(got).foreach { case ((id, text), (gid, gn, gnll)) =>
      val ts = text.split(" ").toSeq
      val bs = ts.zip(ts.drop(1))
      assert(gid === id && gn === bs.size.toLong)
      val want = bs.map { case (l, r) => -math.log(p(l, r)) }.sum / bs.size
      assert(math.abs(gnll.get - want) < 1e-12, s"doc $id")
    }
  }

  test("kneser-ney: seen-history rows normalize to 1 over vocab + OOV mass") {
    // With continuation add-one, sum_w P(w|h) over the VOCAB is exactly
    // 1 for every seen history (the discount deficit equals the
    // restored continuation mass); OOV words add strictly positive
    // extra mass of 1/(B+V) each, never zero.
    val p = knRef(train, None)
    val vocabToks = train.flatMap(_.split(" ")).distinct
    for (h <- Seq("the", "cat", "on", "a")) {
      val s = vocabToks.map(w => p(h, w)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"history $h sums to $s")
    }
    assert(p("the", "zebra") > 0.0)
    // fixed-discount variant obeys the same law
    val pFix = knRef(train, Some(0.75))
    val s = vocabToks.map(w => pFix("the", w)).sum
    assert(math.abs(s - 1.0) < 1e-12)
    // engine agrees with the fixed-discount reference too
    val trainDf = train.map(Tuple1(_)).toDF("text")
    val got = LanguageModel.scoreDocsKneserNey(
      Seq((1L, "the cat")).toDF("doc_id", "text"),
      LanguageModel.trainBigram(trainDf, "text"),
      LanguageModel.vocabSize(trainDf, "text"),
      "text", "doc_id", discount = Some(0.75))
      .select("nll").as[Option[Double]].collect()(0).get
    assert(math.abs(got - (-math.log(pFix("the", "cat")))) < 1e-12)
  }
}
