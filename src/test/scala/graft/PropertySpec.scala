package graft

import graft.api.GroupByReduce
import graft.aggs.ReduceOptions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests mirroring the reference's hypothesis laws
  * (tests/test_properties.py:93-178): for random labeled data with NaN
  * and null contamination, every reduction must equal a straight Scala
  * reimplementation of the NumPy kernel semantics — null = missing
  * (skipped everywhere), NaN propagates in plain funcs and is skipped
  * by nan* funcs. Generators are sampled with fixed seeds (the offline
  * dependency set has no scalatest/scalacheck bridge) — deterministic
  * yet adversarial inputs.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Sample `gen` at `n` fixed seeds. */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val genValue: Gen[Option[Double]] = Gen.frequency(
    6 -> Gen.chooseNum(-50.0, 50.0).map(v => Some(math.rint(v * 4) / 4)),
    1 -> Gen.const(Some(Double.NaN)),
    1 -> Gen.const(None))

  private val genData: Gen[List[(Int, Option[Double])]] =
    Gen.listOfN(24, Gen.zip(Gen.choose(0, 3), genValue))
      .suchThat(_.nonEmpty)

  // ---- NumPy-semantics oracles over one group's values --------------
  private def valid(xs: Seq[Option[Double]]): Seq[Double] =
    xs.flatten.filterNot(_.isNaN)
  private def present(xs: Seq[Option[Double]]): Seq[Double] = xs.flatten
  private def anyNaN(xs: Seq[Option[Double]]): Boolean =
    xs.flatten.exists(_.isNaN)

  private val oracles: Map[String, Seq[Option[Double]] => Any] = Map(
    "count" -> (xs => valid(xs).size.toLong),
    "sum" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else present(xs).sum),
    "nansum" -> (xs => valid(xs).sum),
    "mean" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN
      else present(xs).sum / present(xs).size),
    "nanmean" -> (xs =>
      if (valid(xs).isEmpty) Double.NaN
      else valid(xs).sum / valid(xs).size),
    "min" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else present(xs).min),
    "nanmin" -> (xs => if (valid(xs).isEmpty) Double.NaN else valid(xs).min),
    "max" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else present(xs).max),
    "nanmax" -> (xs => if (valid(xs).isEmpty) Double.NaN else valid(xs).max),
    "nanvar" -> (xs => {
      val v = valid(xs)
      // flox _var_finalize IEEE semantics: n == ddof -> 0/0 = NaN,
      // n < ddof -> NaN (never SQL null) — flox/aggregations.py:460-469
      if (v.size < 2) Double.NaN
      else {
        val m = v.sum / v.size
        v.map(x => (x - m) * (x - m)).sum / (v.size - 1)
      }
    }),
    "skew" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else popSkewKurt(present(xs), skew = true)),
    "nanskew" -> (xs => popSkewKurt(valid(xs), skew = true)),
    "kurt" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else popSkewKurt(present(xs), skew = false)),
    "nankurt" -> (xs => popSkewKurt(valid(xs), skew = false)),
    // bounded top-k (k = ReduceOptions default 5): top-5 valid values desc
    "topk" -> (xs => valid(xs).sorted.reverse.take(5)))

  /** Population skewness / excess kurtosis via the naive two-pass
    * formula (the oracle for Spark's stable central-moment aggregates);
    * zero variance and empty both -> null — Spark 4's own edge answers
    * (probed: single-value and constant groups return SQL null, not
    * the 0/0 NaN scipy would give). */
  private def popSkewKurt(v: Seq[Double], skew: Boolean): Any =
    if (v.isEmpty) null
    else {
      val n = v.size
      val m = v.sum / n
      val m2 = v.map(x => (x - m) * (x - m)).sum / n
      if (m2 == 0) null
      else if (skew) (v.map(x => math.pow(x - m, 3)).sum / n) / math.pow(m2, 1.5)
      else (v.map(x => math.pow(x - m, 4)).sum / n) / (m2 * m2) - 3
    }

  private def close(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x, y) => x == y
  }

  test("grouped reductions equal the NumPy-semantics oracle on random data (law 1)") {
    samples(genData, 8).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .repartition(3)
      val expected = data.groupBy(_._1).view.mapValues(g => g.map(_._2)).toMap
      oracles.foreach { case (func, oracle) =>
        val got = GroupByReduce(df, Seq("by"), "v", func, "r",
          ReduceOptions(idxCol = Some("idx")))
          .collect().map(r => r.getInt(0) -> r.get(1)).toMap
        assert(got.keySet === expected.keySet, s"group set for $func")
        expected.foreach { case (k, xs) =>
          val want = oracle(xs)
          assert(close(got(k), want),
            s"$func group $k: got ${got(k)}, oracle $want, values $xs")
        }
      }
    }
  }

  test("order-dependent reductions equal the index-aware oracle (law 1b)") {
    // absolute oracles for the ExtremumBy/min_by family — the reversal
    // identities below are only RELATIVE laws and would not catch e.g.
    // null values entering the argmin struct ordering (nulls-first!)
    def some(o: Option[Double]): Any = o match {
      case Some(x) => x
      case None    => null
    }
    def valid(g: Seq[(Long, Option[Double])]) =
      g.filter(_._2.exists(!_.isNaN))
    def firstNaN(g: Seq[(Long, Option[Double])]): Option[Long] =
      g.find(_._2.exists(_.isNaN)).map(_._1)
    val ordOracles: Map[String, Seq[(Long, Option[Double])] => Any] = Map(
      "first" -> (g => some(g.head._2)),
      "last" -> (g => some(g.last._2)),
      "nanfirst" -> (g => some(valid(g).headOption.flatMap(_._2))),
      "nanlast" -> (g => some(valid(g).lastOption.flatMap(_._2))),
      // NumPy: any NaN -> index of the first NaN; else first extremum
      // among PRESENT values (null = missing, never an extremum)
      "argmin" -> (g => firstNaN(g).getOrElse[Any] {
        val p = g.filter(_._2.isDefined)
        if (p.isEmpty) null else p.minBy(_._2.get)._1
      }),
      "argmax" -> (g => firstNaN(g).getOrElse[Any] {
        val p = g.filter(_._2.isDefined)
        if (p.isEmpty) null else p.maxBy(_._2.get)._1
      }),
      "nanargmin" -> (g => {
        val p = valid(g); if (p.isEmpty) null else p.minBy(_._2.get)._1
      }),
      "nanargmax" -> (g => {
        val p = valid(g); if (p.isEmpty) null else p.maxBy(_._2.get)._1
      }))
    samples(genData, 8).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .repartition(3)
      val grouped: Map[Int, Seq[(Long, Option[Double])]] =
        data.zipWithIndex.groupBy(_._1._1).view
          .mapValues(_.map { case ((_, v), i) => (i.toLong, v) }).toMap
      ordOracles.foreach { case (func, oracle) =>
        val got = GroupByReduce(df, Seq("by"), "v", func, "r",
          ReduceOptions(idxCol = Some("idx")))
          .collect().map(r => r.getInt(0) -> r.get(1)).toMap
        grouped.foreach { case (k, g) =>
          val want = oracle(g)
          assert(close(got(k), want),
            s"$func group $k: got ${got(k)}, oracle $want, pairs $g")
        }
      }
    }
  }

  test("weighted mean/var equal the pair-skipping oracle on random data") {
    import org.apache.spark.sql.functions.col
    samples(genData, 5).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v, (i % 5 + 1).toDouble) }
        .toDF("idx", "by", "v", "w")
        .repartition(3)
      val got = GroupByReduce.weighted(df, Seq("by"), "v", "w",
        Seq(("wmean", "m"), ("wvar", "s")))
        .collect().map(r => r.getInt(0) -> (r.get(1), r.get(2))).toMap
      data.zipWithIndex.groupBy(_._1._1).foreach { case (k, rows) =>
        val pairs = rows.collect {
          case ((_, Some(v)), i) if !v.isNaN => (v, (i % 5 + 1).toDouble)
        }
        val (wantM, wantV): (Any, Any) =
          if (pairs.isEmpty) (null, null)
          else {
            val wt = pairs.map(_._2).sum
            val m = pairs.map(p => p._1 * p._2).sum / wt
            (m, pairs.map(p => p._1 * p._1 * p._2).sum / wt - m * m)
          }
        assert(close(got(k)._1, wantM), s"wmean group $k: got ${got(k)._1}, want $wantM")
        assert(close(got(k)._2, wantV), s"wvar group $k: got ${got(k)._2}, want $wantV")
      }
    }
  }

  test("ffill/bfill reversal duality (tests/test_properties.py:268-300)") {
    import org.apache.spark.sql.functions.col
    // bfill == reverse . ffill . reverse: running ffill over the negated
    // index IS the reversed-order forward fill
    samples(genData, 5).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .withColumn("ridx", -col("idx"))
        .repartition(3)
      for ((fwd, rev) <- Seq(("bfill", "ffill"), ("ffill", "bfill"))) {
        val direct = api.GroupByScan(df, Seq("by"), "v", fwd, "idx", "r")
          .select("idx", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
        val reversed = api.GroupByScan(df, Seq("by"), "v", rev, "ridx", "r")
          .select("idx", "r").collect().map(r => r.getLong(0) -> r.get(1)).toMap
        direct.foreach { case (k, v) =>
          assert(close(v, reversed(k)), s"$fwd(idx) vs $rev(ridx) at $k")
        }
      }
    }
  }

  test("first/last reversal identities incl. nan mates (tests/test_properties.py:301-333)") {
    import org.apache.spark.sql.functions.col
    samples(genData, 5).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .withColumn("ridx", -col("idx"))
        .repartition(3)
      for ((a, b) <- Seq(("first", "last"), ("last", "first"),
                         ("nanfirst", "nanlast"), ("nanlast", "nanfirst"))) {
        val fwd = GroupByReduce(df, Seq("by"), "v", a, "r",
          ReduceOptions(idxCol = Some("idx")))
          .collect().map(r => r.getInt(0) -> r.get(1)).toMap
        val rev = GroupByReduce(df, Seq("by"), "v", b, "r",
          ReduceOptions(idxCol = Some("ridx")))
          .collect().map(r => r.getInt(0) -> r.get(1)).toMap
        assert(fwd.keySet === rev.keySet)
        fwd.foreach { case (k, v) =>
          assert(close(v, rev(k)), s"$a(idx) vs $b(ridx) group $k")
        }
      }
    }
  }

  test("dtype preservation laws (tests/test_properties.py:348-367)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = Seq(
      (1L, 0, "2024-01-02 03:04:05.123456", 1.5, true),
      (2L, 0, "2024-02-02 13:14:15.654321", 2.25, false),
      (3L, 1, "2024-03-02 23:24:25.999999", 7.75, true))
      .toDF("idx", "by", "tss", "secs", "b")
      .withColumn("t", col("tss").cast("timestamp"))
      .withColumn("dur", make_dt_interval(lit(0), lit(0), lit(0),
        col("secs").cast("decimal(18,6)")))
    // temporal values: interpolating funcs restore the temporal dtype
    val ts = GroupByReduce.multi(df, Seq("by"), Seq(
      ("t", "min", "a"), ("t", "max", "b2"), ("t", "first", "c"),
      ("t", "mean", "d"), ("t", "median", "e")),
      ReduceOptions(idxCol = Some("idx")))
    Seq("a", "b2", "c", "d", "e").foreach(n =>
      assert(ts.schema(n).dataType === TimestampType, s"timestamp col $n"))
    // durations: every numeric func restores the interval dtype (sum of
    // durations is meaningful) EXCEPT var, whose result is in squared
    // units and stays numeric
    val du = GroupByReduce.multi(df, Seq("by"), Seq(
      ("dur", "sum", "a"), ("dur", "mean", "b2"), ("dur", "median", "c"),
      ("dur", "min", "d"), ("dur", "var", "e")))
    Seq("a", "b2", "c", "d").foreach(n =>
      assert(du.schema(n).dataType.isInstanceOf[DayTimeIntervalType],
        s"duration col $n"))
    assert(du.schema("e").dataType === DoubleType, "duration var stays numeric")
    // sub-second precision survives the duration round-trip (the micros
    // view, not a whole-seconds cast): mean of one group is its value
    val one = GroupByReduce(df.filter(col("by") === 1), Seq("by"), "dur", "mean", "m")
      .select((col("m").cast("decimal(18,6)") * 1000000L).cast("long")).head().getLong(0)
    assert(one === 7750000L, "7.75s survives as 7_750_000 micros")
    // bools: int promotion for arithmetic, native bool for logic/order
    val bo = GroupByReduce.multi(df, Seq("by"), Seq(
      ("b", "sum", "a"), ("b", "mean", "b2"), ("b", "any", "c"), ("b", "min", "d")))
    assert(bo.schema("a").dataType === LongType)
    assert(bo.schema("b2").dataType === DoubleType)
    assert(bo.schema("c").dataType === BooleanType)
    assert(bo.schema("d").dataType === BooleanType)
  }

  test("chunk/repetition kernels equal composed formulations on random text") {
    // random whitespace-adversarial text: words, runs of every \s char,
    // empties, case noise
    val genTok: Gen[String] = Gen.frequency(
      5 -> Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString),
      2 -> Gen.oneOf("the", "Spam", "a"),
      1 -> Gen.const(""))
    val genSep: Gen[String] = Gen.frequency(
      5 -> Gen.const(" "), 2 -> Gen.const("\t"), 1 -> Gen.const("\n"),
      1 -> Gen.const("  "), 1 -> Gen.const(" \t "))
    val genText: Gen[String] = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, genTok)
      seps <- Gen.listOfN(n + 1, genSep)
    } yield (seps.head +: toks.zip(seps.tail).flatMap(p => Seq(p._1, p._2))).mkString
    val texts = samples(genText, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("doc_id", "text")
    for ((sz, st) <- Seq((4, 2), (5, 5), (7, 3))) {
      val got = graft.ops.TextAnalysis.chunks(df, "text", "doc_id", sz, st)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val want = {
        import org.apache.spark.sql.functions._
        val toks = split(trim(lower(col("text"))), "\\s+")
        val n = when(length(trim(col("text"))) === 0, lit(0))
          .otherwise(size(toks)).cast("long")
        val nc = when(n === 0, lit(0L)).otherwise(
          floor((greatest(n - sz, lit(0L)) + (st - 1)) / st).cast("long") + 1)
        df.select(col("doc_id"), toks.as("t"), nc.as("nc"))
          .filter(col("nc") > 0)
          .select(col("doc_id"), col("t"),
            explode(sequence(lit(0L), col("nc") - 1)).as("ci"))
          .select(col("doc_id"), col("ci"),
            size(slice(col("t"), (col("ci") * st + 1).cast("int"), lit(sz)))
              .cast("long"),
            array_join(slice(col("t"), (col("ci") * st + 1).cast("int"),
              lit(sz)), " "))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      }
      assert(got === want, s"size=$sz stride=$st")
    }
    val gotR = graft.ops.TextAnalysis.repetitionSignals(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val wantR = graft.ops.TextAnalysis.repetitionSignalsComposed(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(gotR === wantR)
  }

  test("asof duality: forward on negated ts equals backward, and vice versa") {
    val genTs = Gen.chooseNum(-200L, 200L)
    for (seed <- 0 until 3) {
      val lts = samples(Gen.listOfN(25, genTs), 21 + seed).head.zipWithIndex
        .map { case (t, i) => (i % 3L, i.toLong, t) }
      // distinct right ts per key: the asof tie contract (pre-aggregated)
      val rts = samples(Gen.listOfN(25, genTs), 31 + seed).head.zipWithIndex
        .map { case (t, i) => (i % 3L, t, t.toDouble) }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val left = lts.toDF("k", "id", "ts")
      val right = rts.toDF("k", "rts", "v")
      val fwd = graft.ops.Events.asofJoin(left, right, Seq("k"), "ts", "rts",
        Seq("v"), direction = "forward")
        .select("id", "asof_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      import org.apache.spark.sql.functions.col
      val backNeg = graft.ops.Events.asofJoin(
        left.withColumn("ts", -col("ts")),
        right.withColumn("rts", -col("rts")),
        Seq("k"), "ts", "rts", Seq("v"), direction = "backward")
        .select("id", "asof_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(fwd === backNeg, s"seed=$seed")
    }
  }

  test("rangeJoin equals brute-force filter join on random data (incl. negatives)") {
    val genTs = Gen.chooseNum(-500L, 500L)
    val genRows = Gen.listOfN(40, genTs)
    for (seed <- 0 until 4) {
      val lts = samples(genRows, 1 + seed).head.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val rts = samples(genRows, 11 + seed).head.zipWithIndex
        .map { case (t, i) => (i.toLong + 1000, t) }
      val (lo, hi) = if (seed % 2 == 0) (-73L, 0L) else (-50L, 31L)
      val left = lts.toDF("lid", "ts")
      val right = rts.toDF("rid", "rts")
      val got = graft.ops.Events.rangeJoin(left, right, "ts", "rts",
        lo, hi, payload = Seq("rid"))
        .select("lid", "rj_rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (li, lt) <- lts; (ri, rt) <- rts
        if rt >= lt + lo && rt <= lt + hi
      } yield (li, ri)).toSet
      assert(got === want, s"seed=$seed window=[$lo,$hi]")
    }
  }

  test("deletion-neighborhood blocking is lossless for random <=d edits") {
    val alpha = Gen.oneOf('a', 'b', 'c')
    val genStr = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
    def randomEdit(s: String, seedIdx: Int): String = {
      val r = new scala.util.Random(seedIdx)
      val op = r.nextInt(3)
      if (s.isEmpty) return s + "a"
      val i = r.nextInt(s.length)
      op match {
        case 0 => s.substring(0, i) + s.substring(i + 1)              // delete
        case 1 => s.substring(0, i) + ('a' + r.nextInt(3)).toChar + s.substring(i + 1) // substitute
        case _ => s.substring(0, i) + ('a' + r.nextInt(3)).toChar + s.substring(i)     // insert
      }
    }
    for (d <- Seq(1, 2)) {
      val pairs = samples(genStr, 40).zipWithIndex.map { case (s, i) =>
        val t = (1 to d).foldLeft(s)((cur, k) => randomEdit(cur, i * 10 + k))
        (s, t)
      }
      def hood(s: String) =
        graft.functions.TextKernels.deletionNeighborhood(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), d)
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSet
      pairs.foreach { case (s, t) =>
        // lev(s, t) <= d by construction; the blocking key sets must meet
        assert(hood(s).intersect(hood(t)).nonEmpty, s"($s, $t) d=$d")
      }
    }
  }

  test("span scrub equals brute-force local oracle on random boilerplate corpora") {
    // small vocab so k-gram collisions across docs are common; the law
    // covers sub-k docs, empty docs, overlapping spans and full coverage
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val genDoc: Gen[String] = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    val genCorpus: Gen[List[String]] = Gen.listOfN(18, genDoc)
    def localScrub(docs: Seq[(Long, String)], k: Int, minDocs: Int): Map[Long, String] = {
      val toks = docs.map { case (id, t) =>
        id -> t.trim.toLowerCase.split("\\s+").toSeq }.toMap
      val occ = toks.toSeq.flatMap { case (id, w) =>
        if (w.length >= k)
          w.sliding(k).zipWithIndex.map { case (s, i) => (id, i, s.mkString(" ")) }.toSeq
        else Seq.empty }
      val dup = occ.groupBy(_._3)
        .filter(_._2.map(_._1).distinct.size >= minDocs).keySet
      docs.map { case (id, _) =>
        val w = toks(id)
        val covered = occ.filter(o => o._1 == id && dup(o._3))
          .flatMap(o => o._2 until o._2 + k).toSet
        id -> w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
          .mkString(" ")
      }.toMap
    }
    for (k <- Seq(2, 3); corpus <- samples(genCorpus, 3)) {
      val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = ops.Spans.scrubSpans(docs.toDF("doc_id", "text"), "text",
          "doc_id", k = k).select("doc_id", "clean")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = localScrub(docs, k, 2)
      assert(got === want, s"k=$k corpus=$docs")
    }
  }

  test("scan/reduce duality: last of cumsum equals nansum (law 3/4)") {
    samples(genData, 5).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .repartition(3)
      val scanLast = api.GroupByScan(df, Seq("by"), "v", "nancumsum", "idx", "cs")
        .groupBy("by")
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.col("cs"),
          org.apache.spark.sql.functions.col("idx")).as("last_cs"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val reduced = GroupByReduce(df, Seq("by"), "v", "nansum", "r")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      reduced.foreach { case (k, v) =>
        assert(close(scanLast(k), v), s"group $k: cumsum last ${scanLast(k)} vs nansum $v")
      }
    }
  }

  test("pii counts are order-independent (redaction order is not)") {
    import org.apache.spark.sql.functions.col
    // counts run on the ORIGINAL text (Pii class doc), so permuting
    // the category order must not change any n_<cat> — only `redacted`
    // may differ. Texts cover every default category incl. the widened
    // forms (quoted-local email, (area) and +1 phones, compressed v6).
    val texts = Seq(
      "a@b.co and \"q 1\"@h.example.org, +1 415-555-0134, (628) 555-0042",
      "ssn 123-45-6789 ip 10.0.3.17 v6 fe80::1 and 2001:db8::8a2e:370:7334",
      "card 4111 1111 1111 1111, 206.555.0100, full 1:2:3:4:5:6:7:8 end",
      "no pii here at all",
      "trail 2001:db8:: and +1.415.555.2671 and 0:0:0:0:0:0:0:1")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def countsUnder(cats: Seq[ops.Pii.Category]): Map[(Long, String), Long] =
      ops.Pii.scrub(df, "text", cats).collect().flatMap { r =>
        cats.map(c => (r.getAs[Long]("doc_id"), c.name) ->
          r.getAs[Long](s"n_${c.name}"))
      }.toMap
    val fwd = countsUnder(ops.Pii.defaults)
    val rev = countsUnder(ops.Pii.defaults.reverse)
    assert(fwd === rev)
    // and the totals agree with the per-category sum on both orders
    val tot = ops.Pii.scrub(df, "text").select(col("doc_id"), col("n_pii"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.indices.foreach { i =>
      val s = ops.Pii.defaults.map(c => fwd((i.toLong, c.name))).sum
      assert(tot(i.toLong) === s, s"doc $i")
    }
  }

  test("bloom two-phase contamination equals the exact path on random " +
    "corpora at every fpp — the no-false-negative law, adversarially") {
    import org.apache.spark.sql.functions.col
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val doc = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(14, doc)
    samples(Gen.zip(corpusGen, Gen.oneOf(0.3, 0.05, 0.001),
      Gen.choose(2, 4)), 6).foreach { case (texts, fpp, k) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val bench = df.filter(col("id") < 4)
      val exact = ops.Contamination
        .contaminatedIds(df, bench, "text", "id", k)
        .as[Long].collect().toSet
      val bloom = ops.Contamination
        .contaminatedBloom(df, bench, "text", "id", k, fpp)
        .select("id").as[Long].collect().toSet
      assert(bloom === exact, s"k=$k fpp=$fpp texts=$texts")
    }
  }

  test("boilerplate scrub postcondition on random corpora: no surviving " +
    "window is corpus-frequent, and unique windows all survive") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    samples(Gen.zip(Gen.listOfN(10, doc), Gen.choose(2, 3)), 6)
      .foreach { case (texts, minCount) =>
        val w = 2
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        // local replay of the frequency rule
        def windows(t: String): Seq[String] =
          t.toLowerCase.split("\\s+").toSeq.grouped(w).map(_.mkString(" ")).toSeq
        val freq = texts.flatMap(windows).groupBy(identity)
          .view.mapValues(_.size).toMap
        val out = ops.Dedup.scrubFrequentPassages(df, "text", "doc_id",
          window = w, minCount = minCount)
          .select("doc_id", "clean").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        texts.zipWithIndex.foreach { case (t, i) =>
          val kept = windows(t).filter(freq(_) < minCount)
          assert(out(i.toLong) === kept.mkString(" "),
            s"doc $i of $texts minCount=$minCount")
        }
      }
  }

  test("hamming band join equals the all-pairs scan on random 64-bit " +
    "signatures at every maxHamming — the pigeonhole completeness law") {
    import org.apache.spark.sql.functions.col
    // clustered signatures: base points + few-bit perturbations, so
    // pairs actually exist at small distances
    val base = Gen.choose(Long.MinValue, Long.MaxValue)
    val sigs = Gen.listOfN(5, base).flatMap { bs =>
      Gen.listOfN(20, Gen.zip(Gen.oneOf(bs), Gen.choose(0, 5),
        Gen.choose(0L, Long.MaxValue)))
        .map(_.map { case (b, nb, rnd) =>
          (0 until nb).foldLeft(b)((acc, i) =>
            acc ^ (1L << (((rnd >> (i * 6)) & 63).toInt)))
        })
    }
    samples(Gen.zip(sigs, Gen.choose(1, 7)), 5).foreach { case (hs, mh) =>
      val df = hs.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("__id", "__sig")
      val got = ops.Dedup.hammingNearDupPairs(df, sigBits = 64, maxHamming = mh)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (a, ia) <- hs.zipWithIndex; (b, ib) <- hs.zipWithIndex
        if ia < ib && java.lang.Long.bitCount(a ^ b) <= mh
      } yield (ia.toLong, ib.toLong)).toSet
      assert(got === brute, s"maxHamming=$mh")
      assert(brute.nonEmpty || hs.distinct.size == hs.size)
    }
  }

  test("pii fused kernels equal the regexp_extract_all / regexp_replace " +
    "fold formulations bit-for-bit") {
    import org.apache.spark.sql.functions.{col, lit, regexp_replace}
    val texts = Seq(
      "a@b.co and \"q 1\"@h.example.org, +1 415-555-0134, (628) 555-0042",
      "ssn 123-45-6789 ip 10.0.3.17 v6 fe80::1 and 2001:db8::8a2e:370:7334",
      "card 4111 1111 1111 1111, 206.555.0100, full 1:2:3:4:5:6:7:8 end",
      "edge: a@b.co.a@b.co overlapping 123-45-678910.0.0.1 dense",
      "", "   ", "no pii here at all")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val cats = ops.Pii.defaults
    // counts law: fused vector == per-category reference formulation
    val fused = df.select(col("doc_id") +: ops.Pii.counts(col("text")): _*)
      .collect().map(r => r.getLong(0) ->
        cats.indices.map(i => r.getLong(i + 1))).toMap
    val ref = df.select(col("doc_id") +:
        cats.map(c => ops.Pii.count(col("text"), c)): _*)
      .collect().map(r => r.getLong(0) ->
        cats.indices.map(i => r.getLong(i + 1))).toMap
    assert(fused === ref)
    // redact law: fused chain == the chained regexp_replace fold
    val both = df.select(col("doc_id"),
        ops.Pii.redact(col("text")).as("k"),
        cats.foldLeft(col("text"))((c, cat) =>
          regexp_replace(c, lit(cat.re), lit(cat.token))).as("f"))
      .collect()
    both.foreach(r => assert(r.getString(1) === r.getString(2),
      s"doc ${r.getLong(0)}"))
  }

  test("scrubSparse equals scrub on ANY corpus: the mayContainPii gate " +
    "is a necessary condition, never a filter (r12 missing #3)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(17)
    val pieces = Seq(
      "a@b.co", "\"q 1\"@h.example.org", "+1 415-555-0134", "(628) 555-0042",
      "123-45-6789", "10.0.3.17", "fe80::1", "2001:db8::8a2e:370:7334",
      "4111 1111 1111 1111", "206.555.0100", "1:2:3:4:5:6:7:8",
      "plain words only", "no pii", "x", "", "  ", "colon: but clean",
      "digit 7 alone", "7 and 9 two digits but no pattern", "at @ alone")
    val texts: Seq[(Long, String)] = (0 until 120).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(5))(pieces(rnd.nextInt(pieces.size)))
        .mkString(" "))
    } :+ (120L, null.asInstanceOf[String]) // NULL text must null-propagate
    val df = texts.toDF("doc_id", "text")
    val full = ops.Pii.scrub(df, "text").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    val sparse = ops.Pii.scrubSparse(df, "text").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    assert(sparse.keySet === full.keySet)
    full.foreach { case (id, row) =>
      assert(sparse(id) === row, s"doc $id: ${texts(id.toInt)._2}")
    }
    // and the null row really is the null-count shape, on both paths
    assert(full(120L).forall(_ == null), full(120L).toString)
    // the byte-scan prefilter kernel equals its Column reference
    // formulation (contains/rlike) on the same corpus + unicode edges
    val uni = texts.filter(_._2 != null) ++ Seq(
      (200L, "héllo wörld"), (201L, "ümlauts ünd"), (202L, "数字七 8 and 9"),
      (203L, "@"), (204L, ":"), (205L, "7"), (206L, "77"))
    val udf2 = uni.toDF("doc_id", "text")
    val kb = udf2.select(col("doc_id"),
        ops.Pii.mayContainPii(col("text")).as("k"),
        ops.Pii.mayContainPiiRef(col("text")).as("r"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    kb.foreach { case (id, k, r) => assert(k === r, s"doc $id") }
    // malformed UTF-8 (r14): piiRedact is match-gated, so a no-match
    // row returns its raw input bytes on BOTH paths — the law holds
    // bit-for-bit on invalid sequences too (the String round-trip
    // would substitute U+FFFD). string↔binary casts reinterpret bytes
    // without validation, so the comparison sees the actual bytes.
    val bad = Seq(
      300L -> Array[Byte]('n', 'o', 0xFF.toByte, 0xFE.toByte, 'p'),
      301L -> Array[Byte](0xC3.toByte, ' ', 'c', 'l', 'e', 'a', 'n'),
      302L -> Array[Byte]('a', '@', 0x80.toByte, 'b', '.', 'c'))
    val bdf = bad.toDF("doc_id", "b")
      .select(col("doc_id"), col("b").cast("string").as("text"))
    def redBytes(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"), col("redacted").cast("binary").as("rb"),
        col("n_pii"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](1)).toSeq, r.getLong(2))).toMap
    val sb = redBytes(ops.Pii.scrubSparse(bdf, "text"))
    assert(sb === redBytes(ops.Pii.scrub(bdf, "text")))
    // and the no-signal malformed rows really kept their raw bytes
    assert(sb(300L)._1 === bad(0)._2.toSeq)
    assert(sb(301L)._1 === bad(1)._2.toSeq)
  }

  // numeric-tolerant compare across the type coercions the option
  // grid induces (count LongType promoted to double by a double fill)
  private def numClose(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Number, y: Number) =>
      val (dx, dy) = (x.doubleValue(), y.doubleValue())
      (dx.isNaN && dy.isNaN) || dx == dy ||
        math.abs(dx - dy) <= 1e-9 * math.max(1.0, math.max(math.abs(dx), math.abs(dy)))
    case (x, y) => x == y
  }

  test("GroupByReduce option grid: func x min_count x fill_value x " +
    "expected_groups x binned keys equal the decision-table oracle " +
    "(flox/core.py:1026-1038; r13 #7)") {
    import org.apache.spark.sql.functions.{col, lit}

    val funcs = Seq("count", "sum", "nansum", "mean", "nanmean",
      "nanmin", "max", "nanvar")
    val breaks = Seq(0.0, 2.0, 4.0, 6.0, 8.0)
    // JVM replica of Binning.binIndex(closedRight): (lo, hi] buckets,
    // out-of-range -> None (the dropped null label)
    def binOf(v: Double): Option[Int] =
      breaks.sliding(2).zipWithIndex
        .collectFirst { case (Seq(lo, hi), i) if v > lo && v <= hi => i }

    val genRow: Gen[(Double, Option[Double])] =
      Gen.zip(Gen.chooseNum(-1.0, 9.0).map(v => math.rint(v * 8) / 8), genValue)
    val genRows: Gen[List[(Double, Option[Double])]] =
      Gen.listOfN(40, genRow).suchThat(_.nonEmpty)

    // decision-table oracle: base result, min_count mask (effective
    // min_count = 1 when fill + expected are both declared), fill on
    // masked groups, domain reindex with coalesce-to-fill
    def gridOracle(func: String, groups: Map[Int, Seq[Option[Double]]],
                   mc: Int, fill: Option[Double],
                   domain: Option[Seq[Int]]): Map[Int, Any] = {
      val eff = if (mc == 0 && fill.isDefined && domain.isDefined) 1 else mc
      def resultFor(xs: Seq[Option[Double]]): Any = {
        val base = oracles(func)(xs)
        val vc = valid(xs).size
        if (eff > 0 && vc < eff) fill.map(Double.box).orNull else base
      }
      domain match {
        case Some(d) => d.map { k =>
          val r = groups.get(k).map(resultFor).orNull
          k -> (if (r == null) fill.map(Double.box).orNull else r)
        }.toMap
        case None => groups.view.mapValues(resultFor).toMap
      }
    }

    // the grid must actually EXERCISE the decision table: count cells
    // where the mask/fill/reindex branches fire and assert non-zero
    var maskedCells = 0
    var reindexFilled = 0
    samples(genRows, 2).foreach { rows =>
      // key mode A: a plain int label; key mode B: Binning.binIndex
      // over the double key (out-of-range -> dropped null label)
      val labeled = rows.map { case (rk, v) =>
        (rk, ((rk * 7).toInt % 4 + 4) % 4, v)
      }
      val df = labeled.toDF("rawk", "label", "v").repartition(3)
      val modes: Seq[(String, org.apache.spark.sql.DataFrame,
        Map[Int, Seq[Option[Double]]])] = Seq(
        ("label", df,
          labeled.groupBy(_._2).view.mapValues(_.map(_._3)).toMap),
        ("binned", df.withColumn("bin",
          graft.keys.Binning.binIndex(col("rawk"), breaks)),
          labeled.flatMap { case (rk, _, v) => binOf(rk).map(_ -> v) }
            .groupBy(_._1).view.mapValues(_.map(_._2)).toMap))
      for {
        (keyName, data, groups) <- modes
        mc <- Seq(0, 2, 7)
        fill <- Seq(None, Some(-999.25))
        domSeq <- Seq(None, Some(Seq(0, 1, 2, 3)), Some(Seq(0, 2, 5)))
      } {
        val effMc = if (mc == 0 && fill.isDefined && domSeq.isDefined) 1 else mc
        maskedCells += groups.values.count(xs =>
          effMc > 0 && valid(xs).size < effMc)
        reindexFilled += domSeq.map(_.count(k => !groups.contains(k)))
          .getOrElse(0)
        val by = if (keyName == "binned") "bin" else "label"
        val opts = ReduceOptions(minCount = mc,
          fillValue = fill.map(lit(_)),
          expectedGroups = domSeq.map(_.toDF(by)))
        val out = GroupByReduce.multi(data, Seq(by),
          funcs.map(f => ("v", f, s"r_$f")), opts)
          .collect().map(r => r.getInt(0) ->
            funcs.indices.map(i => r.get(i + 1))).toMap
        funcs.zipWithIndex.foreach { case (func, fi) =>
          val want = gridOracle(func, groups, mc, fill, domSeq)
          assert(out.keySet === want.keySet,
            s"group set: $keyName mc=$mc fill=$fill dom=$domSeq $func")
          want.foreach { case (k, w) =>
            assert(numClose(out(k)(fi), w),
              s"$func($keyName) mc=$mc fill=$fill dom=$domSeq group $k: " +
                s"got ${out(k)(fi)}, oracle $w, values ${groups.get(k)}")
          }
        }
      }
    }
    assert(maskedCells > 0, "grid never hit the min_count mask branch")
    assert(reindexFilled > 0, "grid never hit the empty-domain-group branch")
  }

  test("approx-quantile tier honors the GK rank guarantee: returned " +
    "value is a data value whose rank is within eps*n of the target, " +
    "and at accuracy >= n the sketch is rank-exact") {
    import org.apache.spark.sql.functions.lit
    val rnd = new scala.util.Random(90210)
    // 3 groups x 4000 values with heavy ties and outliers
    val rows = (0 until 3).flatMap { k =>
      (0 until 4000).map { _ =>
        val v = rnd.nextInt(12) match {
          case 0 => rnd.nextInt(5).toDouble        // hot ties
          case 11 => 1e6 + rnd.nextInt(1000)       // outlier tail
          case _ => rnd.nextDouble() * 100
        }
        (k, v)
      }
    }
    val df = rows.toDF("k", "v").repartition(5)
    val sorted = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toVector).toMap
    for {
      acc <- Seq(100, 1000, 10000)
      q <- Seq(0.1, 0.5, 0.95)
    } {
      val got = GroupByReduce(df, Seq("k"), "v", "quantile", "r",
        ReduceOptions(q = Seq(q), approxQuantile = true,
          approxAccuracy = acc))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      sorted.foreach { case (k, s) =>
        val n = s.size
        val v = got(k)
        // GK returns an actual input value...
        assert(s.contains(v), s"acc=$acc q=$q group $k: $v not a data value")
        // ...whose rank window is within eps*n (+1 discretization) of
        // the target rank: compare against the value's full tie run
        val target = q * n
        val loRank = s.indexWhere(_ == v) + 1
        val hiRank = s.lastIndexWhere(_ == v) + 1
        val slack = n.toDouble / acc + 1
        assert(target >= loRank - slack && target <= hiRank + slack,
          s"acc=$acc q=$q group $k: value $v ranks [$loRank,$hiRank], " +
            s"target $target, slack $slack")
        // accuracy >= n: the sketch holds every value -> rank-exact
        if (acc >= n) {
          val exactRank = math.ceil(q * n).toLong.max(1)
          assert(loRank <= exactRank && exactRank <= hiRank + 1,
            s"acc=$acc q=$q group $k: exact-regime rank $exactRank " +
              s"outside [$loRank,${hiRank + 1}]")
        }
      }
    }
  }

  test("single-group reduction equals the global (keyless) reduction " +
    "(tests/test_properties.py:93-130)") {
    import org.apache.spark.sql.functions.lit
    samples(genData, 4).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((_, v), i) => (i.toLong, v) }
        .toDF("idx", "v")
        .withColumn("k", lit(7))
        .repartition(3)
      val funcs = oracles.keys.toSeq.filterNot(_ == "topk") :+ "topk"
      val opts = ReduceOptions(idxCol = Some("idx"))
      val one = GroupByReduce.multi(df, Seq("k"),
        funcs.map(f => ("v", f, s"r_$f")), opts).collect()
      assert(one.length === 1)
      val global = GroupByReduce.multi(df, Seq.empty,
        funcs.map(f => ("v", f, s"r_$f")), opts).collect()
      assert(global.length === 1)
      funcs.zipWithIndex.foreach { case (f, i) =>
        val (a, b) = (one.head.get(i + 1), global.head.get(i))
        (a, b) match {
          case (x: Seq[_], y: Seq[_]) => assert(x === y, s"$f")
          case _ => assert(numClose(a, b),
            s"$f: single-group $a vs global $b")
        }
      }
    }
  }

  // ---- r19 totality/idempotence fuzz over the web/ingest surface ----

  test("fuzz: WARC/gz parsers are TOTAL on random bytes — quarantine " +
    "rows, never exceptions; record payload bytes are conserved " +
    "within the input") {
    val genBytes: Gen[Array[Byte]] = Gen.frequency(
      3 -> Gen.listOfN(400, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray),
      // adversarial: real markers buried in noise
      2 -> Gen.listOfN(6, Gen.oneOf(
        "WARC/1.0\r\nContent-Length: 12\r\n\r\n".getBytes("UTF-8"),
        "WARC/".getBytes("UTF-8"),
        Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0),
        "HTTP/1.1 200 OK\r\n\r\nbody".getBytes("UTF-8"),
        Array.fill(37)(0x41.toByte))).map(_.flatten.toArray),
      // near-valid: a good record with random corruption
      2 -> Gen.zip(Gen.choose(0, 200), Gen.chooseNum(-128, 127))
        .map { case (at, b) =>
          val good = graft.sources.Warc.fixtureWarc()
          val bad = good.clone(); bad(at % good.length) = b.toByte; bad
        })
    samples(genBytes, 60).zipWithIndex.foreach { case (bytes, i) =>
      // must not throw, whatever the bytes
      val recs = graft.sources.Warc.parseRecords(s"fz$i", bytes)
      recs.foreach { r =>
        assert(r.payload.length <= bytes.length,
          s"seed $i: payload larger than input")
      }
      val gz = graft.sources.Warc.parseGzMembers(s"fz$i", bytes)
      assert(gz != null)
      // and the split scan agrees with the parser on record counts
      val splits = graft.sources.Warc.scanGzSplits(s"fz$i", bytes, 64L)
      assert(splits.map(_.nRecords).sum === gz.length,
        s"seed $i: sidecar record count must equal the member parse")
    }
  }

  test("fuzz: containerMeta is TOTAL on random bytes; canonicalUrl is " +
    "IDEMPOTENT and hostOf-stable on generated URL shapes") {
    val genJunk: Gen[Array[Byte]] = Gen.frequency(
      3 -> Gen.listOfN(120, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray),
      1 -> Gen.choose(0, 60).map(n =>
        graft.ops.Multimodal.fixtureMp4(9, 9, 7L).take(n)),
      1 -> Gen.choose(0, 24).map(n =>
        graft.ops.Multimodal.fixtureWebpLossy(5, 5).take(n)))
    samples(genJunk, 80).foreach { b =>
      assert(graft.ops.Multimodal.containerMeta(1L, b) != null)
    }
    // URL generator: random assemblies of the parts canonicalization
    // manipulates — schemes, userinfo, www-runs, dots, ports, params,
    // fragments, IPv6, percent-encoding
    val genUrl: Gen[String] = for {
      scheme <- Gen.oneOf("https", "HTTP", "http", "HTTPS")
      user <- Gen.oneOf("", "u@", "a:b@", "x%40y@")
      www <- Gen.oneOf("", "www.", "WWW.www.", "w.")
      host <- Gen.oneOf("Ex.COM", "a.b.co.uk", "x", "[2001:db8::1]",
        "e.com.", "192.168.0.1", "xn--bcher-kva.de")
      port <- Gen.oneOf("", ":443", ":80", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/p//", "/p/q/", "/%2Fz")
      qs <- Gen.oneOf("", "?", "?b=2&a=1", "?utm_source=x",
        "?a=1&&b=", "?UTM_X=1&z=@q")
      frag <- Gen.oneOf("", "#f", "#a?b=1")
    } yield s"$scheme://$user$www$host$port$path$qs$frag"
    val urls = samples(genUrl, 300).distinct
    import graft.ops.Web
    import org.apache.spark.sql.functions.col
    val df = urls.toDF("u").select(
      col("u"),
      Web.canonicalUrl(col("u")).as("c1"),
      Web.canonicalUrl(Web.canonicalUrl(col("u"))).as("c2"),
      Web.hostOf(col("u")).as("h1"))
      .withColumn("h2", Web.hostOf(col("c1")))
    df.collect().foreach { r =>
      assert(r.getString(2) === r.getString(1),
        s"canonicalUrl not idempotent on '${r.getString(0)}': " +
          s"'${r.getString(1)}' -> '${r.getString(2)}'")
      assert(r.getString(4) === r.getString(3),
        s"hostOf must be canonicalization-stable on '${r.getString(0)}': " +
          s"'${r.getString(3)}' vs '${r.getString(4)}'")
    }
    // the compiled registeredDomainOfUrl kernel (the edge-grain form
    // edgesFromDocuments rides, r20 codegen fix) ≡ the column
    // composition registeredDomain(hostOf(·)), bit for bit, on the
    // same adversarial URL shapes — plus null propagation
    val eq = (urls :+ (null: String)).toDF("u").select(
      col("u"),
      Web.registeredDomainOfUrl(col("u")).as("k"),
      Web.registeredDomain(Web.hostOf(col("u"))).as("c"))
    eq.collect().foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"registeredDomainOfUrl kernel diverged on '${r.getString(0)}': " +
          s"kernel '${r.getString(1)}' vs chain '${r.getString(2)}'")
    }
  }

  test("fuzz: HTML extractors are TOTAL on random markup and every " +
    "emitted outlink/anchor href is absolute http(s); robots parsing " +
    "is total on random directive soup") {
    import graft.ops.Web
    import org.apache.spark.sql.functions.col
    val genHtml: Gen[String] = for {
      n <- Gen.choose(1, 12)
      parts <- Gen.listOfN(n, Gen.oneOf(
        Gen.oneOf("<a href=", "<a data-href=", "</a>", "<base href=",
          "<p>", "</p>", "<script>", "</script>", "href", "=\"", "'",
          ">text<", "<!-- c -->", "<a", ">", "&amp;", "#f", "//h.com/x",
          "mailto:a@b", "https://q.org/z", "/root", "rel/p", "./d",
          "\u0000", "\n", "  "),
        Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString)))
    } yield parts.mkString
    val genBase = Gen.oneOf("https://p.com/a/b", "http://x.org",
      "not-a-url", "", "https://u@h.net/d/")
    val rows = samples(Gen.zip(genBase, genHtml), 120).distinct
    val df = rows.toDF("base", "html")
    val links = df.select(
        org.apache.spark.sql.functions.explode(
          Web.extractOutlinks(col("html"), col("base"))).as("l"))
      .collect().map(_.getString(0))
    links.foreach(l => assert(l.toLowerCase.matches("^https?://.*") ||
      l.startsWith("://") || l.contains("://"),
      s"outlink must carry a scheme separator: '$l'"))
    val anchors = df.select(
        org.apache.spark.sql.functions.explode(
          Web.extractAnchors(col("html"), col("base"))).as("a"))
      .collect()
    anchors.foreach { r =>
      val a = r.getStruct(0)
      assert(a.getString(0) != null, "anchor href is non-null by filter")
      assert(a.getString(1) != null, "anchor text is never null")
    }
    // robots: random directive soup parses without throwing, and the
    // delay output is always numeric and non-negative
    val genRobots: Gen[String] = Gen.listOfN(10, Gen.oneOf(
      "User-agent: *", "User-agent: bot", "user-AGENT : x",
      "Disallow: /a", "Allow:", "Crawl-delay: 3", "Crawl-delay: -2",
      "Crawl-delay: x", "Sitemap: https://s/x.xml", "Sitemap: rel",
      "# comment", "garbage line", ":", "Disallow : /b", ""))
      .map(_.mkString("\n"))
    val robots = samples(Gen.zip(Gen.const("h.com"), genRobots), 40)
      .distinct.toDF("host", "txt")
    val rules = Web.parseRobotsTxt(robots, "host", "txt", "bot").collect()
    rules.foreach(r => assert(r.getString(1).nonEmpty,
      "empty rule paths never surface"))
    val delays = Web.parseCrawlDelays(robots, "host", "txt", "bot")
      .collect()
    delays.foreach(r => assert(r.getDouble(1) >= 0))
    val maps = Web.parseSitemaps(robots, "host", "txt").collect()
    maps.foreach(r => assert(r.getString(1).contains("://")))
  }

  test("fuzz: robotsPathMatch equals an INDEPENDENT translation " +
    "(Pattern.quote segments around '*', trailing '$' anchor) on " +
    "random metachar-heavy prefixes × paths — the per-rule kernel " +
    "cannot drift from RFC 9309 semantics (r20)") {
    import org.apache.spark.unsafe.types.UTF8String
    // reference built a DIFFERENT way: split on '*' (keeping empty
    // segments), quote each literal segment whole, rejoin with '.*'.
    // DOTALL + \z give the RFC-intent semantics the glob walk
    // implements ('*' spans any octet incl. line terminators; '$'
    // anchors the TRUE end — java's bare '$' also matches before a
    // trailing newline, an artifact robots semantics never wanted)
    def reference(path: String, prefix: String): Boolean = {
      val hasEnd = prefix.endsWith("$")
      val body =
        if (hasEnd) prefix.substring(0, prefix.length - 1) else prefix
      val segs = body.split("\\*", -1)
      val pat = "^" + segs.map(s =>
        if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
        .mkString(".*") + (if (hasEnd) "\\z" else "")
      java.util.regex.Pattern.compile(pat,
        java.util.regex.Pattern.DOTALL).matcher(path).find()
    }
    val genPiece = Gen.oneOf("/fish", "*", ".", "$", "(", ")", "[", "]",
      "{", "}", "+", "?", "^", "|", "\\", "/a.b", "*.php", "%2F", "é")
    val genPrefix = Gen.choose(1, 6)
      .flatMap(n => Gen.listOfN(n, genPiece).map(_.mkString))
    val genPath = Gen.oneOf("/fish", "/fishheads/x", "/a.b/k", "/aXb/",
      "/x.php", "/x.php?y=1", "/", "/%2Fz", "/éé/p", "/*literal*",
      "/a(b)c", "/a|b", "/a\\b",
      // end-anchor/overlap shapes for the greedy glob walk: suffix
      // occurrences that overlap middle-segment placements, repeated
      // segments, and long same-char runs (the regex-backtracking
      // shape the glob tier exists to neutralize)
      "/aab", "/axbyb", "/fishfish", "/aaaaaaaaaaaaaaaaaaab",
      "/.php.php", "/x.phpx.php",
      // raw line terminators (crawler junk): '*' must span them and
      // '$' must anchor the true end, not the pre-newline position
      "/a\n", "/a\nxb", "/fish\r\n/fish")
    samples(Gen.zip(genPath, genPrefix), 400).distinct.foreach {
      case (path, prefix) =>
        val got = graft.functions.WebKernels.robotsPathMatch(
          UTF8String.fromString(path), UTF8String.fromString(prefix))
        val want = reference(path, prefix)
        assert(got === want,
          s"kernel diverged on path='$path' prefix='$prefix'")
    }
  }
}
