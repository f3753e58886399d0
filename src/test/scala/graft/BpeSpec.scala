package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE merge learning vs a self-contained local reference
  * implementation of Sennrich et al. 2016 (learn_bpe): character
  * symbolization + end-of-word marker, most-frequent adjacent pair,
  * greedy left-to-right non-overlapping merge, lexicographic (lft,
  * rgt) tie-break. The property law runs random corpora (multibyte and
  * supplementary chars included) through both. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- local reference: plain-Scala Sennrich BPE ----
  private def refSymbolize(tok: String): Vector[String] = {
    val cps = new scala.collection.mutable.ArrayBuffer[String]
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      cps += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    cps.toVector :+ Bpe.EndOfWord
  }

  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(corpus: Seq[String], numMerges: Int,
                       minCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (t, c) => refSymbolize(t) -> c }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        pairs((syms(j), syms(j + 1))) = pairs.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), c) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minCount) done = true
        else {
          merges += ((i, l, r, c))
          words = words.groupMapReduce { case (syms, _) => refMerge(syms, l, r) }(_._2)(_ + _)
          i += 1
        }
      }
    }
    merges.result()
  }

  private def learned(corpus: Seq[String], n: Int, minCount: Long = 2L) =
    Bpe.learnBpe(corpus.map(Tuple1(_)).toDF("text"), "text", n, minCount)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq

  test("symbolize: codepoint-wise with end-of-word marker (incl. supplementary chars)") {
    val got = Seq("low", "中文a", "a😀b", "x</w>").toDF("t")
      .select(Bpe.symbolize(col("t")).as("s")).as[Seq[String]].collect()
    assert(got(0) === Seq("l", "o", "w", "</w>"))
    assert(got(1) === Seq("中", "文", "a", "</w>"))
    assert(got(2) === Seq("a", "😀", "b", "</w>")) // 😀 is ONE symbol
    assert(got(3) === Seq("x", "<", "/", "w", ">", "</w>"))
  }

  test("mergePair: greedy left-to-right non-overlapping (Sennrich re.sub semantics)") {
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),
      (Seq("a", "a", "a", "a"), "a", "a", Seq("aa", "aa")),
      (Seq("x", "a", "b", "a", "b"), "a", "b", Seq("x", "ab", "ab")),
      (Seq("a"), "a", "a", Seq("a")),
      (Seq.empty[String], "a", "a", Seq.empty[String]))
    cases.foreach { case (in, l, r, want) =>
      val got = Seq(Tuple1(in)).toDF("syms")
        .select(Bpe.mergePair(col("syms"), l, r).as("o")).as[Seq[String]].collect()(0)
      assert(got === want, s"merge [$in] ($l,$r)")
    }
  }

  test("learnBpe: Sennrich toy corpus pinned (low/lower/newest/widest)") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val got = learned(corpus, 6)
    assert(got === Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "est", "</w>", 9L),
      (3, "l", "o", 7L), (4, "lo", "w", 7L), (5, "e", "w", 6L)))
  }

  test("learnBpe: minCount early stop") {
    // every word unique -> all pair counts are 1 -> no merge at minCount=2
    assert(learned(Seq("abc", "def", "ghi"), 5).isEmpty)
    // minCount=1 learns merges from singleton pairs deterministically
    val got = learned(Seq("ab"), 3, minCount = 1L)
    assert(got.map(m => (m._2, m._3)) === Seq(("a", "b"), ("ab", "</w>")))
  }

  test("segment: rank-order replay of learned merges equals local reference") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = refLearn(corpus, 6).map(m => (m._2, m._3))
    val got = Bpe.segment(corpus.map(Tuple1(_)).toDF("text"), "text", merges)
      .orderBy("token").as[(String, Long, Seq[String])].collect().toSeq
    val want = corpus.groupBy(identity).toSeq.map { case (t, g) =>
      (t, g.size.toLong,
        merges.foldLeft(refSymbolize(t)) { case (s, (l, r)) => refMerge(s, l, r) }.toSeq)
    }.sortBy(_._1)
    assert(got === want)
  }

  test("learnBpeWithVocab: final loop state equals segment() with the learned merges") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.map(Tuple1(_)).toDF("text")
    val (mergesDf, vocab) = Bpe.learnBpeWithVocab(df, "text", 6)
    val merges = mergesDf.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val viaState = vocab.select("token", "cnt", "syms")
      .orderBy("token").as[(String, Long, Seq[String])].collect().toSeq
    val viaSegment = Bpe.segment(df, "text", merges)
      .select("token", "cnt", "subwords")
      .orderBy("token").as[(String, Long, Seq[String])].collect().toSeq
    assert(viaState === viaSegment)
  }

  test("subwordFrequency: explode x word-frequency weighting") {
    val corpus = Seq("ab ab", "ab cd")
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val got = Bpe.subwordFrequency(corpus.map(Tuple1(_)).toDF("text"), "text", merges)
      .orderBy("subword").as[(String, Long)].collect().toSeq
    // ab x3 -> ab</w> x3; cd x1 -> [c, d, </w>]
    assert(got === Seq(("</w>", 1L), ("ab</w>", 3L), ("c", 1L), ("d", 1L)))
  }

  // local reference: canonical min-rank apply_bpe (subword-nmt / HF)
  private def refEncode(tok: String, merges: Seq[(String, String)]): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = refSymbolize(tok)
    var go = true
    while (go) {
      val present = syms.zip(syms.drop(1)).filter(rank.contains)
      if (present.isEmpty) go = false
      else syms = refMerge(syms, present.minBy(rank)._1, present.minBy(rank)._2)
    }
    syms
  }

  private def encodedDocs(docs: Seq[(Long, String)], merges: Seq[(String, String)]) =
    Bpe.encodeDocs(docs.toDF("doc_id", "text"), "text", merges)
      .select("doc_id", "subwords").orderBy("doc_id")
      .as[(Long, Seq[String])].collect().toSeq

  test("encodeDocs: min-rank kernel equals local apply_bpe reference; learned tables agree with replay") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "中", "😀"))
    } yield cs.mkString
    val doc = for { n <- Gen.choose(0, 8); ws <- Gen.listOfN(n, word) } yield ws.mkString(" ")
    val corpusGen = for { n <- Gen.choose(1, 25); ds <- Gen.listOfN(n, doc) } yield ds
    (0 until 6).foreach { i =>
      val corpus = corpusGen(Gen.Parameters.default, Seed(9090L + i)).get
      val merges = refLearn(corpus, 6, minCount = 1L).map(m => (m._2, m._3))
      val docs = corpus.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      val got = encodedDocs(docs, merges)
      docs.foreach { case (id, text) =>
        val wantMinRank = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .toVector.flatMap(refEncode(_, merges))
        val wantReplay = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .toVector.flatMap(t =>
            merges.foldLeft(refSymbolize(t)) { case (s, (l, r)) => refMerge(s, l, r) })
        assert(got.find(_._1 == id).get._2 === wantMinRank, s"seed=${9090 + i} doc=$text")
        // on LEARNED tables min-rank and rank-order replay coincide
        assert(wantMinRank === wantReplay, s"seed=${9090 + i} doc=$text")
      }
    }
  }

  test("encodeDocs: min-rank diverges from replay on unlearnable tables, by design") {
    // (x, ab) before (a, b) cannot be learned: "ab" does not exist at
    // state 0. min-rank revisits rank 0 after rank 1 creates "ab";
    // replay has already passed it.
    val merges = Seq(("x", "ab"), ("a", "b"))
    val got = encodedDocs(Seq((1L, "xab")), merges)(0)._2
    assert(got === Seq("xab", "</w>")) // the subword-nmt/HF answer
    val replay = merges.foldLeft(refSymbolize("xab")) {
      case (s, (l, r)) => refMerge(s, l, r)
    }
    assert(replay === Vector("x", "ab", "</w>")) // replay stops short
  }

  test("decodeSubwords inverts encodeDocs for ANY merge table " +
    "(round-trip law: decode(encode(text)) == normalized tokens)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.functions.{array_join, col}
    val word = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "中", "😀"))
    } yield cs.mkString
    val doc = for { n <- Gen.choose(0, 8); ws <- Gen.listOfN(n, word) } yield ws.mkString("  ")
    val corpusGen = for { n <- Gen.choose(1, 20); ds <- Gen.listOfN(n, doc) } yield ds
    val corpus = corpusGen(Gen.Parameters.default, Seed(777L)).get
    val docs = corpus.zipWithIndex.map { case (t, j) => (j.toLong, t) }
    val learned = refLearn(corpus, 6, minCount = 1L).map(m => (m._2, m._3))
    // learned, truncated, UNLEARNABLE, and empty tables — decode is
    // table-independent (merges only concatenate within a word)
    val tables = Seq(learned, learned.take(2),
      Seq(("x", "ab"), ("a", "b")), Nil)
    tables.foreach { merges =>
      val out = Bpe.encodeDocs(docs.toDF("doc_id", "text"), "text", merges)
        .select(col("doc_id"),
          Bpe.decodeSubwords(col("subwords")).as("decoded"),
          array_join(graft.ops.TextAnalysis.tokens(col("text")), " ").as("want"))
        .collect()
      out.foreach { r =>
        assert(r.getString(1) === r.getString(2),
          s"doc ${r.getLong(0)} table=${merges.take(3)}")
      }
    }
  }

  test("property law: learnBpe equals local Sennrich reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val alpha = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "d"),
      1 -> Gen.oneOf("中", "😀", "<"))
    val word = for {
      n <- Gen.choose(1, 6); cs <- Gen.listOfN(n, alpha)
    } yield cs.mkString
    val doc = for {
      n <- Gen.choose(0, 8); ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    val corpusGen = for {
      n <- Gen.choose(1, 30); ds <- Gen.listOfN(n, doc)
    } yield ds
    (0 until 8).foreach { i =>
      val corpus = corpusGen(Gen.Parameters.default, Seed(4242L + i)).get
      val want = refLearn(corpus, 6)
      val got = learned(corpus, 6)
      assert(got === want, s"seed=${4242 + i} corpus=$corpus")
    }
  }

  private def learnedBatched(corpus: Seq[String], n: Int, batch: Int,
                             minCount: Long = 2L) =
    Bpe.learnBpe(corpus.map(Tuple1(_)).toDF("text"), "text", n, minCount, batch)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq

  test("batched law: batched selection equals sequential when batches don't interact") {
    // top pairs (a,b):20 (c,d):18 (e,f):16 are symbol-disjoint (incl.
    // their merged forms), so one batch=3 round must produce exactly the
    // sequential schedule
    val corpus = Seq.fill(10)("abab") ++ Seq.fill(9)("cdcd") ++ Seq.fill(8)("efef")
    val want = learned(corpus, 6)
    Seq(2, 3, 8).foreach { b =>
      assert(learnedBatched(corpus, 6, b) === want, s"batch=$b")
    }
  }

  test("batched law: first conflict stops the batch (never skips), preserving the sequential schedule") {
    // every adjacent candidate chains through a shared symbol
    // ((a,b),(b,c),(c,</w>)) so each round accepts exactly one merge —
    // batched must still equal sequential, one round per merge
    val corpus = Seq.fill(10)("abc")
    Seq(2, 4).foreach { b =>
      assert(learnedBatched(corpus, 5, b, minCount = 1L) ===
        learned(corpus, 5, minCount = 1L), s"batch=$b")
    }
  }

  test("batched law: sequential property corpora stay exact under batching whenever schedules coincide") {
    // the disjoint-pairs corpus mixed with the Sennrich toy corpus:
    // batch rounds interleave multi-accept rounds (disjoint letter
    // pairs) with conflict-stopped rounds — batched must equal
    // sequential end-to-end because every conflict stops the batch
    // rather than skipping past it
    val corpus = Seq.fill(10)("abab") ++ Seq.fill(9)("cdcd") ++
      Seq.fill(5)("low") ++ Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    Seq(2, 3, 6).foreach { b =>
      assert(learnedBatched(corpus, 10, b) === learned(corpus, 10), s"batch=$b")
    }
  }

  test("superseded checkpoint blocks are freed as merge rounds advance") {
    val sc = spark.sparkContext
    val corpus = Seq.fill(10)("abab") ++ Seq.fill(9)("cdcd") ++ Seq.fill(8)("efef")
    val before = sc.getPersistentRDDs.keySet
    val (merges, vocab) = Bpe.learnBpeWithVocab(
      corpus.map(Tuple1(_)).toDF("text"), "text", 6, minCount = 2L)
    assert(merges.count() === 6)
    // only the FINAL words checkpoint may remain pinned (it backs the
    // returned vocab); every earlier round's blocks must be gone
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1, s"expected <=1 live checkpoint, got ${leaked.size}")
    vocab.unpersist()
  }
}
