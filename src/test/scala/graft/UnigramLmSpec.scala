package graft

import org.apache.spark.sql.functions._
import graft.ops.UnigramLm

/** Unigram-LM (SentencePiece-style) training vs a self-contained local
  * reference: same seeding, same EM forward-backward, same Viterbi. */
class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  // ---- local reference ----
  private def toks(s: String): Seq[String] =
    s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def cps(s: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      b += new String(Character.toChars(cp)); i += Character.charCount(cp)
    }
    b.result()
  }

  private def wordFreq(corpus: Seq[String]): Map[String, Long] =
    corpus.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refSeed(wf: Map[String, Long], maxLen: Int, maxSeed: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wf; chars = cps(w); s <- chars.indices;
         l <- 1 to math.min(maxLen, chars.length - s))
      counts(chars.slice(s, s + l).mkString) =
        counts.getOrElse(chars.slice(s, s + l).mkString, 0L) + c
    val singles = counts.filter { case (p, _) => cps(p).length == 1 }
    val multis = counts.filter { case (p, _) => cps(p).length > 1 }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(maxSeed)
    (singles ++ multis).toMap
  }

  private def refExpected(w: String, p: Map[String, Double], maxLen: Int): Map[String, Double] = {
    val chars = cps(w); val n = chars.length
    val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i;
         pr <- p.get(chars.slice(j, i).mkString))
      alpha(i) += alpha(j) * pr
    if (alpha(n) == 0.0) return Map.empty
    val beta = Array.fill(n + 1)(0.0); beta(n) = 1.0
    for (i <- n - 1 to 0 by -1; k <- (i + 1) to math.min(n, i + maxLen);
         pr <- p.get(chars.slice(i, k).mkString))
      beta(i) += pr * beta(k)
    val acc = scala.collection.mutable.Map.empty[String, Double]
    for (j <- 0 until n; k <- (j + 1) to math.min(n, j + maxLen)) {
      val piece = chars.slice(j, k).mkString
      p.get(piece).foreach { pr =>
        val c = alpha(j) * pr * beta(k) / alpha(n)
        if (c != 0.0) acc(piece) = acc.getOrElse(piece, 0.0) + c
      }
    }
    acc.toMap
  }

  private def refTrain(corpus: Seq[String], rounds: Int, maxLen: Int,
                       maxSeed: Int, keep: Int): Map[String, Double] = {
    val wf = wordFreq(corpus)
    val seed = refSeed(wf, maxLen, maxSeed)
    val total = seed.values.sum.toDouble
    var probs = seed.map { case (p, f) => p -> f / total }
    for (_ <- 1 to rounds) {
      val exp = scala.collection.mutable.Map.empty[String, Double]
      for ((w, c) <- wf; (piece, e) <- refExpected(w, probs, maxLen))
        exp(piece) = exp.getOrElse(piece, 0.0) + e * c
      val z = exp.values.sum
      probs = exp.map { case (p, c) => p -> c / z }.toMap
    }
    val singles = probs.filter { case (p, _) => cps(p).length == 1 }
    val multis = probs.filter { case (p, _) => cps(p).length > 1 }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(keep)
    val kept = singles.toSeq ++ multis
    val z = kept.map(_._2).sum
    kept.map { case (p, c) => p -> math.log(c / z) }.toMap
  }

  private def refViterbi(w: String, logp: Map[String, Double], maxLen: Int): Vector[String] = {
    val chars = cps(w); val n = chars.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    best(0) = 0.0
    for (i <- 1 to n; j <- math.max(0, i - maxLen) until i;
         lp <- logp.get(chars.slice(j, i).mkString))
      if (best(j) + lp > best(i)) { best(i) = best(j) + lp; back(i) = j }
    if (best(n) == Double.NegativeInfinity) chars
    else {
      var i = n; var acc = List.empty[String]
      while (i > 0) { acc = chars.slice(back(i), i).mkString :: acc; i = back(i) }
      acc.toVector
    }
  }

  private val corpus = Seq.fill(6)("the cat") ++ Seq.fill(4)("the mat 中文中文") ++
    Seq.fill(3)("catmat") ++ Seq("a 😀cat")

  test("train: EM piece probabilities match the local reference (multibyte seeds included)") {
    val got = UnigramLm.train(corpus.map(Tuple1(_)).toDF("text"),
      "text", numRounds = 3, maxPieceLen = 4, maxSeed = 64, keepPieces = 32).toMap
    val want = refTrain(corpus, rounds = 3, maxLen = 4, maxSeed = 64, keep = 32)
    assert(got.keySet === want.keySet)
    got.foreach { case (p, lp) =>
      assert(math.abs(lp - want(p)) < 1e-9, s"piece $p: $lp vs ${want(p)}") }
    // multibyte substrings seeded codepoint-wise
    assert(got.contains("中文") && got.contains("中"))
  }

  test("segmentDocs: Viterbi equals local DP; coverage fallback on foreign chars") {
    val model = UnigramLm.train(corpus.map(Tuple1(_)).toDF("text"),
      "text", numRounds = 2, maxPieceLen = 4, maxSeed = 64, keepPieces = 32)
    val logp = model.toMap
    val docs = Seq((1L, "the catmat 中文"), (2L, "cat ZZZ😀"), (3L, ""))
    val got = UnigramLm.segmentDocs(docs.toDF("doc_id", "text"), "text",
        model, maxPieceLen = 4)
      .select("doc_id", "subwords").orderBy("doc_id")
      .as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (id, text) =>
      val want = toks(text).flatMap(refViterbi(_, logp, 4))
      assert(got(id) === want, s"doc $id ($text)")
    }
    // token with chars outside the model: raw-codepoint fallback pieces
    assert(got(2L).containsSlice(Seq("z", "z", "z")))
    assert(got(3L).isEmpty)
  }

  test("probabilities are a distribution and EM does not decrease corpus likelihood") {
    val wf = wordFreq(corpus)
    def ll(p: Map[String, Double], maxLen: Int): Double = {
      // alpha(n) is the total segmentation probability of the word
      wf.map { case (w, c) =>
        val chars = cps(w); val n = chars.length
        val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
        for (i <- 1 to n; j <- math.max(0, i - maxLen) until i;
             pr <- p.get(chars.slice(j, i).mkString))
          alpha(i) += alpha(j) * pr
        c * math.log(alpha(n))
      }.sum
    }
    val seed = refSeed(wf, 4, 64)
    val t = seed.values.sum.toDouble
    var probs = seed.map { case (p, f) => p -> f / t }
    val lls = (1 to 4).map { _ =>
      val exp = scala.collection.mutable.Map.empty[String, Double]
      for ((w, c) <- wf; (piece, e) <- refExpected(w, probs, 4))
        exp(piece) = exp.getOrElse(piece, 0.0) + e * c
      val z = exp.values.sum
      probs = exp.map { case (p, c) => p -> c / z }.toMap
      ll(probs, 4)
    }
    lls.sliding(2).foreach { case Seq(a, b) => assert(b >= a - 1e-9, lls.toString) }
  }
}
