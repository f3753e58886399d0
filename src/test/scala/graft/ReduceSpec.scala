package graft

import graft.api.GroupByReduce
import graft.aggs.ReduceOptions
import org.apache.spark.sql.DataFrame

/** Reduction semantics against the reference's canonical fixture
  * (FIXTURES.md §1: labels [0,0,2,2,2,1,1,2,2,1,1,0], reference
  * tests/test_core.py:56-59) and hand-computed NumPy-semantics oracles.
  */
class ReduceSpec extends SparkTestBase {
  import spark.implicits._

  // canonical fixture: idx, label, value (values 1..12 for easy oracles)
  private val labels = Seq(0, 0, 2, 2, 2, 1, 1, 2, 2, 1, 1, 0)
  private def fixture: DataFrame =
    labels.zipWithIndex.map { case (l, i) => (i.toLong, l, (i + 1).toDouble) }
      .toDF("idx", "by", "v")

  // same fixture with NaNs at positions 0..4 (values for label 0,2 heads)
  private def nanFixture: DataFrame =
    labels.zipWithIndex.map { case (l, i) =>
      (i.toLong, l, if (i < 5) Double.NaN else (i + 1).toDouble)
    }.toDF("idx", "by", "v")

  private def result(df: DataFrame, func: String,
                     opts: ReduceOptions = ReduceOptions(idxCol = Some("idx"))): Map[Int, Any] =
    GroupByReduce(df, Seq("by"), "v", func, "r", opts)
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap

  test("driver entry point returns rows (smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("count/sum/mean/min/max on canonical fixture") {
    // groups: 0 -> {1,2,12}, 1 -> {6,7,10,11}, 2 -> {3,4,5,8,9}
    assert(result(fixture, "count") === Map(0 -> 3L, 1 -> 4L, 2 -> 5L))
    assert(result(fixture, "sum") === Map(0 -> 15.0, 1 -> 34.0, 2 -> 29.0))
    assert(result(fixture, "mean") === Map(0 -> 5.0, 1 -> 8.5, 2 -> 5.8))
    assert(result(fixture, "min") === Map(0 -> 1.0, 1 -> 6.0, 2 -> 3.0))
    assert(result(fixture, "max") === Map(0 -> 12.0, 1 -> 11.0, 2 -> 9.0))
  }

  test("prod matches per-group product") {
    assert(result(fixture, "prod") === Map(0 -> 24.0, 1 -> 4620.0, 2 -> 4320.0))
  }

  test("nunique skips null and NaN; approx_nunique tracks exact") {
    // duplicated values across groups; a NaN and a null must not count
    val df = Seq(
      (0L, 0, Some(1.0)), (1L, 0, Some(1.0)), (2L, 0, Some(2.0)),
      (3L, 0, Some(Double.NaN)), (4L, 0, None),
      (5L, 1, Some(7.0)), (6L, 1, Some(7.0))
    ).toDF("idx", "by", "v")
    assert(result(df, "nunique") === Map(0 -> 2L, 1 -> 1L))
    val approx = result(df, "approx_nunique")
    // HLL++ is exact in its sparse regime at these cardinalities
    assert(approx === Map(0 -> 2L, 1 -> 1L))
  }

  test("var/std ddof variants") {
    val v1 = result(fixture, "var")
    assert(math.abs(v1(0).asInstanceOf[Double] - 37.0) < 1e-9) // var([1,2,12], ddof=1)
    val v0 = result(fixture, "var", ReduceOptions(ddof = 0))
    assert(math.abs(v0(0).asInstanceOf[Double] - 74.0 / 3) < 1e-9)
    val v2 = result(fixture, "var", ReduceOptions(ddof = 2))
    assert(math.abs(v2(0).asInstanceOf[Double] - 74.0) < 1e-9) // ss=74, n-2=1
  }

  test("argmin/argmax return index of FIRST extremum") {
    val d = Seq((0L, 1, 5.0), (1L, 1, 1.0), (2L, 1, 1.0), (3L, 1, 9.0), (4L, 1, 9.0))
      .toDF("idx", "by", "v")
    assert(result(d, "argmin") === Map(1 -> 1L))
    assert(result(d, "argmax") === Map(1 -> 3L))
  }

  test("first/last by element order") {
    assert(result(fixture, "first") === Map(0 -> 1.0, 1 -> 6.0, 2 -> 3.0))
    assert(result(fixture, "last") === Map(0 -> 12.0, 1 -> 11.0, 2 -> 9.0))
  }

  test("NaN propagation (plain) vs skipping (nan*)") {
    val f = nanFixture // NaN at idx 0..4: label0 {NaN,NaN,12}, label2 {NaN,NaN,NaN,8,9}
    val sums = result(f, "sum")
    assert(sums(0).asInstanceOf[Double].isNaN && sums(2).asInstanceOf[Double].isNaN)
    assert(sums(1) === 34.0) // label 1 untouched
    assert(result(f, "nansum") === Map(0 -> 12.0, 1 -> 34.0, 2 -> 17.0))
    val mins = result(f, "min")
    assert(mins(0).asInstanceOf[Double].isNaN)
    assert(result(f, "nanmin") === Map(0 -> 12.0, 1 -> 6.0, 2 -> 8.0))
    // count counts non-NaN only
    assert(result(f, "count") === Map(0 -> 1L, 1 -> 4L, 2 -> 2L))
    // NumPy: argmin with NaN -> first NaN position (label 1 has no NaN:
    // its min 6.0 sits at idx 5)
    assert(result(f, "argmin") === Map(0 -> 0L, 1 -> 5L, 2 -> 2L))
    assert(result(f, "nanargmin") === Map(0 -> 11L, 1 -> 5L, 2 -> 7L))
    assert(result(f, "nanfirst") === Map(0 -> 12.0, 1 -> 6.0, 2 -> 8.0))
  }

  test("median/quantile exact linear interpolation") {
    val q = result(fixture, "median")
    assert(q(2) === 5.0) // median of {3,4,5,8,9}
    assert(q(1) === 8.5) // median of {6,7,10,11} -> interpolated
    val p = result(fixture, "quantile", ReduceOptions(q = Seq(0.25), idxCol = Some("idx")))
    assert(p(1) === 6.75) // numpy quantile([6,7,10,11], .25)
  }

  test("approxQuantile option: sketch within tolerance of exact percentile") {
    val exact = result(fixture, "quantile",
      ReduceOptions(q = Seq(0.5), idxCol = Some("idx")))
    val approx = result(fixture, "quantile",
      ReduceOptions(q = Seq(0.5), approxQuantile = true, idxCol = Some("idx")))
    exact.foreach { case (k, v) =>
      // the sketch returns an actual element near the rank, not the
      // interpolated value — allow one inter-element gap of slack
      assert(math.abs(approx(k).asInstanceOf[Double] - v.asInstanceOf[Double]) <= 2.5,
        s"group $k: exact $v approx ${approx(k)}")
    }
    val am = result(fixture, "median",
      ReduceOptions(approxQuantile = true, idxCol = Some("idx")))
    assert(am.values.forall(_ != null))
  }

  test("mode picks smallest value on tie") {
    val d = Seq((1, 3.0), (1, 3.0), (1, 1.0), (1, 1.0), (1, 2.0))
      .toDF("by", "v")
    val m = GroupByReduce.mode(d, Seq("by"), "v", "m").collect()
    assert(m.head.getDouble(1) === 1.0)
  }

  test("result invariant to partitioning (reference law 2)") {
    // float compare with tolerance, like the reference's assert_equal
    // (tests/__init__.py:81-141, rtol 1e-15): summation order across
    // partitions legally perturbs the last ulp
    def close(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Double, y: Double) => x == y || math.abs(x - y) <= 1e-12 * math.max(math.abs(x), math.abs(y))
      case (x, y) => x == y
    }
    val funcs = Seq("sum", "mean", "var", "count", "min", "max", "median")
    val base = funcs.map(f => result(fixture, f))
    for (n <- Seq(1, 3, 7)) {
      val rep = fixture.repartition(n)
      val got = funcs.map(f => result(rep, f))
      base.zip(got).zipWithIndex.foreach { case ((b, g), i) =>
        assert(b.keySet === g.keySet, s"keys changed for ${funcs(i)} at partitioning $n")
        b.foreach { case (k, v) =>
          assert(close(v, g(k)), s"${funcs(i)} group $k: $v vs ${g(k)} at partitioning $n")
        }
      }
    }
  }

  test("single-group reduce equals plain reduce (reference law 1)") {
    val one = fixture.withColumn("by", org.apache.spark.sql.functions.lit(1))
    assert(result(one, "sum") === Map(1 -> 78.0))
    assert(result(one, "mean") === Map(1 -> 6.5))
  }

  test("null labels are dropped") {
    val d = Seq((Some(1), 2.0), (None, 5.0), (Some(1), 3.0))
      .toDF("by", "v")
    val r = GroupByReduce(d, Seq("by"), "v", "sum", "r").collect()
    assert(r.length === 1 && r.head.getDouble(1) === 5.0)
  }

  test("min_count masks sparse groups") {
    val r = result(fixture, "nansum",
      ReduceOptions(minCount = 4, idxCol = Some("idx")))
    assert(r(0) === null && r(1) === 34.0 && r(2) === 29.0)
  }

  test("min_count x fill_value decision table (flox core.py:1026-1038)") {
    import org.apache.spark.sql.functions.lit
    // masked groups take the USER fill_value when provided
    val filled = result(fixture, "nansum",
      ReduceOptions(minCount = 4, fillValue = Some(lit(-1.0)), idxCol = Some("idx")))
    assert(filled(0) === -1.0 && filled(1) === 34.0)
    // fill_value + expected_groups without explicit min_count: an
    // all-NaN group reads as fill, NOT as nansum's empty-sum 0
    val allNan = Seq((1, Double.NaN), (1, Double.NaN), (2, 5.0)).toDF("by", "v")
    val domain = keys.ExpectedGroups.of(spark, "by", Seq(1, 2, 3))
    val r = GroupByReduce(allNan, Seq("by"), "v", "nansum", "s",
      ReduceOptions(expectedGroups = Some(domain), fillValue = Some(lit(-9.0))))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r === Map(1 -> -9.0, 2 -> 5.0, 3 -> -9.0))
  }

  test("timestamp values: native min/max/first/last, viewed mean/median restore dtype") {
    import java.sql.Timestamp
    val ts = (h: Int) => Timestamp.valueOf(f"2020-01-01 $h%02d:00:00")
    val d = Seq((0L, 1, ts(0)), (1L, 1, ts(4)), (2L, 1, ts(11)))
      .toDF("idx", "by", "t")
    val r = GroupByReduce.multi(d, Seq("by"), Seq(
      ("t", "min", "tmin"), ("t", "max", "tmax"),
      ("t", "first", "tfirst"), ("t", "last", "tlast"),
      ("t", "mean", "tmean"), ("t", "median", "tmed")),
      ReduceOptions(idxCol = Some("idx"))).collect().head
    assert(r.getTimestamp(1) === ts(0) && r.getTimestamp(2) === ts(11))
    assert(r.getTimestamp(3) === ts(0) && r.getTimestamp(4) === ts(11))
    assert(r.getTimestamp(5) === ts(5)) // mean of 0h,4h,11h
    assert(r.getTimestamp(6) === ts(4)) // median = middle element
  }

  test("duration (timedelta) values: native min/max, viewed sum/mean restore interval") {
    import java.time.Duration
    val d = Seq((1, Duration.ofMinutes(1)), (1, Duration.ofMinutes(2)),
      (1, Duration.ofMinutes(9)))
      .toDF("by", "dur")
    val r = GroupByReduce.multi(d, Seq("by"), Seq(
      ("dur", "min", "dmin"), ("dur", "max", "dmax"),
      ("dur", "sum", "dsum"), ("dur", "mean", "dmean")))
      .collect().head
    assert(r.getAs[Duration]("dmin") === Duration.ofMinutes(1))
    assert(r.getAs[Duration]("dmax") === Duration.ofMinutes(9))
    assert(r.getAs[Duration]("dsum") === Duration.ofMinutes(12))
    assert(r.getAs[Duration]("dmean") === Duration.ofMinutes(4))
  }

  test("bool values: sum/mean promote to int, min/max stay bool (flox core.py:916-917)") {
    val d = Seq((1, true), (1, false), (1, true), (2, false))
      .toDF("by", "b")
    val r = GroupByReduce.multi(d, Seq("by"), Seq(
      ("b", "sum", "n_true"), ("b", "mean", "frac"),
      ("b", "min", "bmin"), ("b", "max", "bmax")))
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r(1).getLong(1) === 2L && r(1).getDouble(2) === 2.0 / 3)
    assert(r(1).getBoolean(3) === false && r(1).getBoolean(4) === true)
    assert(r(2).getLong(1) === 0L && r(2).getBoolean(4) === false)
  }

  test("datetime binning digitizes on the int64 view") {
    import java.sql.Timestamp
    val d = Seq(Timestamp.valueOf("1995-06-01 00:00:00"),
      Timestamp.valueOf("1997-06-01 00:00:00"),
      Timestamp.valueOf("1994-01-01 00:00:00")) // out of range -> null
      .map(Tuple1(_)).toDF("t")
    val bins = d.select(keys.Binning.datetimeBinIndex(
      org.apache.spark.sql.functions.col("t"),
      Seq("1995-01-01", "1997-01-01", "1999-01-01")).as("bin"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(bins.toSeq === Seq(0, 1, null))
  }

  test("nanall/nanany skip NaN before the boolean cast") {
    // NaN is truthy for the plain variants (NumPy), but nan* must skip:
    // nanany({NaN, 0}) = false, nanall({NaN, 1}) = true
    val d = Seq((1, Double.NaN), (1, 0.0), (2, Double.NaN), (2, 1.0))
      .toDF("by", "v")
    assert(result(d, "any", ReduceOptions()) === Map(1 -> true, 2 -> true))
    assert(result(d, "nanany", ReduceOptions()) === Map(1 -> false, 2 -> true))
    assert(result(d, "nanall", ReduceOptions()) === Map(1 -> false, 2 -> true))
  }

  test("expected_groups join streams the aggregated side (high-cardinality safe)") {
    // groupBy on a high-cardinality key: the aggregated side must NOT be
    // broadcast (data-dependent size) and must NOT fall back to a
    // nested-loop join. Assert the plan is an equi-join and carries no
    // broadcast of the aggregate subtree.
    val big = (1 to 5000).map(i => (i % 1000, 1.0)).toDF("by", "v")
    val domain = keys.ExpectedGroups.of(spark, "by", (0 until 1000): Seq[Int])
    val df = GroupByReduce(big, Seq("by"), "v", "count", "n",
      ReduceOptions(expectedGroups = Some(domain), fillValue = Some(
        org.apache.spark.sql.functions.lit(0L))))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(df.count() === 1000)
  }

  test("pre-partitioning by group keys removes the aggregation shuffle") {
    import org.apache.spark.sql.functions.lit
    val d = (1 to 1000).map(i => (i % 7, i.toDouble)).toDF("by", "v")
    val pre = api.Partitioning.byGroups(d, Seq("by"), Some(4))
    val agg = GroupByReduce(pre, Seq("by"), "v", "sum", "s",
      ReduceOptions(sort = false))
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(agg.queryExecution.executedPlan.toString).size
    // only the explicit repartition — the agg reuses its layout
    assert(exchanges === 1, agg.queryExecution.executedPlan.toString)
    assert(agg.collect().map(_.getDouble(1)).sum === (1 to 1000).sum.toDouble)
    // scans reuse it too: window exchange elided
    val scan = api.GroupByScan(pre.withColumn("idx", lit(0L))
      .withColumn("idx", org.apache.spark.sql.functions.col("v")),
      Seq("by"), "v", "cumsum", "idx", "cs")
    val scanEx = "Exchange hashpartitioning".r
      .findAllIn(scan.queryExecution.executedPlan.toString).size
    assert(scanEx === 1, scan.queryExecution.executedPlan.toString)
  }

  test("weighted quantile vector q: array elements bit-equal the " +
    "scalar calls (the unweighted vector-q surface symmetry)") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 90).map { i =>
      (i % 3, ((i * 2654435761L) % 40).toDouble, 1 + (i * 7) % 4)
    }
    val df = rows.toDF("k", "v", "w").repartition(4)
    val qs = Seq(0.1, 0.5, 0.9)
    val vec = GroupByReduce.weighted(df, Seq("k"), "v", "w",
        Seq(("wquantile", "r")), graft.aggs.ReduceOptions(q = qs))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    qs.zipWithIndex.foreach { case (q, i) =>
      val scalar = GroupByReduce.weighted(df, Seq("k"), "v", "w",
          Seq(("wquantile", "r")), graft.aggs.ReduceOptions(q = Seq(q)))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      scalar.foreach { case (k, want) =>
        assert(java.lang.Double.doubleToRawLongBits(vec(k)(i)) ===
          java.lang.Double.doubleToRawLongBits(want), s"k=$k q=$q")
      }
    }
  }

  test("weighted quantile equals the unweighted quantile of the expanded multiset") {
    import org.apache.spark.sql.functions.col
    // frequency-weight contract: wquantile(v, w) over rows == quantile
    // over each row repeated w times. Random-ish values with duplicate
    // runs and weights 0-4 (0 = skipped pair) across 3 groups and 5
    // input partitions; null value and NaN rows must be pair-skipped.
    val rows = (0 until 120).map { i =>
      val w = (i * 7) % 5 // includes 0 weights
      val v: Option[Double] =
        if (i % 17 == 0) None
        else if (i % 23 == 0) Some(Double.NaN)
        else Some(((i * 2654435761L) % 50).toDouble)
      (i % 3, v, w)
    }
    val df = rows.toDF("k", "v", "w").repartition(5)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val got = GroupByReduce.weighted(df, Seq("k"), "v", "w",
        Seq(("wquantile", "r")), ReduceOptions(q = Seq(q)))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // oracle: expand w copies, drop invalid pairs, unweighted quantile
      val expanded = rows.collect {
        case (k, Some(v), w) if !v.isNaN && w >= 1 => (k, v, w)
      }.flatMap { case (k, v, w) => Seq.fill(w)((k, v)) }
      val want = expanded.groupBy(_._1).map { case (k, g) =>
        val s = g.map(_._2).sorted
        val t = (s.size - 1) * q
        val lo = t.toInt
        val frac = t - lo
        k -> (s(lo) * (1 - frac) + s(math.min(lo + 1, s.size - 1)) * frac)
      }
      assert(got.keySet === want.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-9, s"q=$q group $k: $v vs ${want(k)}")
      }
    }
  }

  test("weighted var/std numerical stability: |mean| >> sd matches the " +
    "mean-shifted local reference, fractional weights and pair skips " +
    "included (the raw-moment form kept zero digits here)") {
    import org.apache.spark.sql.functions.col
    // mean ~1e8, sd ~1: Σwv² ~ W·1e16 has ulp ~2, so the pre-r16
    // Σwv²/Σw − mean² expression retained NOTHING of a ~1 variance;
    // the WeightedVarAgg Welford/Chan path must. Fractional weights +
    // null/NaN pair skips keep the full mask in play.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 600).map { i =>
      val v: Option[Double] =
        if (i % 29 == 0) None
        else if (i % 31 == 0) Some(Double.NaN)
        else Some(1.0e8 + (rnd.nextInt(2000) - 1000) / 500.0)
      (i % 2, v, 0.5 + (i % 4))  // weights 0.5, 1.5, 2.5, 3.5
    }
    val df = rows.toDF("k", "v", "w").repartition(7)
    val got = GroupByReduce.weighted(df, Seq("k"), "v", "w",
      Seq(("wvar", "wv"), ("wstd", "ws")))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val valid = g.collect { case (_, Some(v), w) if !v.isNaN => (v, w) }
      val wt = valid.map(_._2).sum
      val m = valid.map { case (v, w) => v * w }.sum / wt
      val wv = valid.map { case (v, w) => w * (v - m) * (v - m) }.sum / wt
      // 1e-6 relative: the local reference's own naive mean at 1e8
      // scale carries ~1e-9 noise, so demanding 1e-9 compares two
      // stable algorithms' rounding orders; the defect this law
      // guards against is ~1e3 RELATIVE (zero digits retained)
      def rel(a: Double, b: Double) = math.abs(a - b) / math.abs(b)
      assert(rel(got(k)._1, wv) < 1e-6, s"group $k wvar: ${got(k)._1} vs $wv")
      assert(rel(got(k)._2, math.sqrt(wv)) < 1e-6, s"group $k wstd")
      assert(got(k)._1 > 0.3 && got(k)._1 < 4.0,
        "sanity: true variance is O(1), not O(ulp(1e16))")
    }
    // degenerate semantics preserved: all-skipped group null;
    // zero-total-weight group NaN; single pair 0
    val edge = Seq((0, Some(Double.NaN), 1.0), (0, None, 2.0),
      (1, Some(5.0), 0.0), (2, Some(7.0), 3.0))
      .toDF("k", "v", "w")
    val e = GroupByReduce.weighted(edge, Seq("k"), "v", "w",
      Seq(("wvar", "wv")))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(e(0) === None, "all-skipped group")
    assert(e(1).exists(_.asInstanceOf[Double].isNaN), "zero total weight")
    assert(e(2) === Some(0.0), "single pair")
  }

  test("WeightedVarAgg merge hardening (r17 review): zero-weight " +
    "partials merge as identity and zero-total-weight groups stay NaN " +
    "across every partition layout — the Chan merge's wt==0 branch") {
    import org.apache.spark.sql.functions.col
    // group 0: real data + zero-weight rows that can land alone in a
    // partition (an all-zero-weight PARTIAL whose mean is never
    // initialized must not poison the merge); group 1: zero total
    // weight WITH rows -> NaN, whatever the partial split
    val rows = Seq((0, 1.0, 0.0), (0, 5.0, 2.0), (0, 9.0, 3.0),
      (0, 7.0, 0.0), (1, 4.0, 0.0), (1, 6.0, 0.0))
    // wvar(group 0) = (2(5-7.4)^2 + 3(9-7.4)^2)/5 = 3.84
    for (p <- Seq(1, 2, 3, 6)) {
      val m = GroupByReduce.weighted(
          rows.toDF("k", "v", "w").repartition(p, col("k") + col("v")),
          Seq("k"), "v", "w", Seq(("wvar", "r")))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(math.abs(m(0) - 3.84) < 1e-12, s"p=$p: ${m(0)}")
      assert(m(1).isNaN, s"p=$p zero-total-weight group")
    }
  }

  test("weightedQuantileDistributed is BIT-equal to the buffered " +
    "weighted CDF walk: ties, fractional/zero weights, NaN/null pairs, " +
    "+-Inf values, all-invalid group yields null") {
    import org.apache.spark.sql.functions.col
    val rows = (0 until 200).map { i =>
      val w: Option[Double] =
        if (i % 19 == 0) None
        else if (i % 29 == 0) Some(Double.NaN)
        else Some((i * 7 % 5) + (if (i % 4 == 0) 0.7 else 0.0)) // 0.7 truncates to 0
      val v: Option[Double] =
        if (i % 17 == 0) None
        else if (i % 23 == 0) Some(Double.NaN)
        else if (i % 31 == 0) Some(Double.PositiveInfinity)
        else Some(((i * 2654435761L) % 40).toDouble)
      (i % 4, v, w)
    } :+ ((9, Option.empty[Double], Option(2.0))) // all-invalid group 9
    val df = rows.toDF("k", "v", "w").repartition(5)
    for (q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val buf = GroupByReduce.weighted(df, Seq("k"), "v", "w",
        Seq(("wquantile", "r")), ReduceOptions(q = Seq(q)))
        .collect().map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
      val dist = GroupByReduce.weightedQuantileDistributed(
        df, Seq("k"), "v", "w", Seq(q), "r")
        .collect().map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
      assert(dist.keySet === buf.keySet, s"q=$q")
      buf.foreach { case (k, want) =>
        val got = dist(k)
        val ok = (want == null && got == null) ||
          (want != null && got != null &&
            java.lang.Double.doubleToRawLongBits(want.doubleValue()) ===
              java.lang.Double.doubleToRawLongBits(got.doubleValue()))
        assert(ok, s"q=$q group $k: dist=$got buf=$want")
      }
      assert(buf(9) == null) // the all-invalid group answered null
    }
    // VECTOR q symmetry (r17): one call with every q rides the one
    // compression + prefix sum and each array element is BIT-equal to
    // the scalar call — the surface now mirrors the buffered and
    // unweighted-distributed tiers
    val vqs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val vec = GroupByReduce.weightedQuantileDistributed(
        df, Seq("k"), "v", "w", vqs, "r")
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Any](1))).toMap
    vqs.zipWithIndex.foreach { case (q, i) =>
      val scalar = GroupByReduce.weightedQuantileDistributed(
          df, Seq("k"), "v", "w", Seq(q), "r")
        .collect().map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))).toMap
      scalar.foreach { case (k, want) =>
        val got = Option(vec(k)).map(_(i)).orNull
        val ok = (want == null && got == null) ||
          (want != null && got != null &&
            java.lang.Double.doubleToRawLongBits(want.doubleValue()) ===
              java.lang.Double.doubleToRawLongBits(
                got.asInstanceOf[Double]))
        assert(ok, s"vector q=$q group $k: vec=$got scalar=$want")
      }
    }
    // null group keys: both drop them by default, both keep them when off
    val nk = Seq((Option.empty[Int], Some(3.0), Some(2.0)),
      (Some(1), Some(5.0), Some(1.0)), (Option.empty[Int], Some(7.0), Some(1.0)))
      .toDF("k", "v", "w")
    val keepBuf = GroupByReduce.weighted(nk, Seq("k"), "v", "w",
      Seq(("wquantile", "r")),
      ReduceOptions(q = Seq(0.5), dropNullKeys = false))
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getDouble(1)).toMap
    val keepDist = GroupByReduce.weightedQuantileDistributed(
      nk, Seq("k"), "v", "w", Seq(0.5), "r", dropNullKeys = false)
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getDouble(1)).toMap
    assert(keepDist === keepBuf && keepDist.keySet === Set(-1, 1))
    assert(GroupByReduce.weightedQuantileDistributed(
      nk, Seq("k"), "v", "w", Seq(0.5), "r").collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("quantileDistributed is BIT-equal to the buffered exact path: " +
    "many groups, vector q, nulls skipped, all-null group yields null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ev = sf("events")
    // scalar q over many groups
    val buf = GroupByReduce(ev, Seq("user_id"), "value", "quantile", "p",
      ReduceOptions(q = Seq(0.37))).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dist = GroupByReduce.quantileDistributed(ev, Seq("user_id"),
      "value", Seq(0.37), "p").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dist.keySet === buf.keySet)
    dist.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ===
        java.lang.Double.doubleToRawLongBits(buf(k)), s"group $k")
    }
    // vector q
    val bufV = GroupByReduce(ev, Seq("user_id"), "value", "quantile", "qs",
      ReduceOptions(q = Seq(0.0, 0.5, 0.9, 1.0))).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val distV = GroupByReduce.quantileDistributed(ev, Seq("user_id"),
      "value", Seq(0.0, 0.5, 0.9, 1.0), "qs").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(distV === bufV)
    // nulls skipped; all-null group present with null result
    val d = Seq((1, Some(2.0)), (1, None), (1, Some(4.0)),
      (2, None), (2, None)).toDF("k", "value")
    val rows = GroupByReduce.quantileDistributed(d, Seq("k"),
      "value", Seq(0.5), "m").collect()
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(rows(1) === Some(3.0))
    assert(rows(2) === None)
    // NaN propagation parity (r16): a group with ANY NaN is NaN on
    // BOTH tiers (buffered guardNaN == distributed __qn > __qnf), at
    // every q — the quantileAuto auto-contract on NaN data
    val nanD = Seq((1, 1.0), (1, 2.0), (1, Double.NaN), (1, 3.0),
      (2, 5.0), (2, 6.0)).toDF("k", "value")
    for (q <- Seq(0.0, 0.5, 1.0)) {
      val b = GroupByReduce(nanD, Seq("k"), "value", "quantile", "m",
        ReduceOptions(q = Seq(q))).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val dd = GroupByReduce.quantileDistributed(nanD, Seq("k"),
        "value", Seq(q), "m").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(b(1).isNaN && dd(1).isNaN, s"q=$q NaN group")
      assert(java.lang.Double.doubleToRawLongBits(b(2)) ===
        java.lang.Double.doubleToRawLongBits(dd(2)), s"q=$q clean group")
    }
    // NULL-keyed group (r12 ADVICE): with dropNullKeys=true (default,
    // flox null-label-drop parity) both paths exclude it; with it off
    // the internal joins must be null-safe (<=>) or the group's ranked
    // rows vanish and it reports null despite having data.
    val dn = Seq((Some(1), 2.0), (Some(1), 4.0),
      (None, 10.0), (None, 20.0), (None, 30.0)).toDF("k", "value")
    val distDrop = GroupByReduce.quantileDistributed(dn, Seq("k"),
      "value", Seq(0.5), "m").collect()
      .map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    assert(distDrop === Map(Some(1) -> Some(3.0)))
    val bufN = GroupByReduce(dn, Seq("k"), "value", "quantile", "m",
      ReduceOptions(q = Seq(0.5), dropNullKeys = false)).collect()
      .map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    val distN = GroupByReduce.quantileDistributed(dn, Seq("k"),
      "value", Seq(0.5), "m", dropNullKeys = false).collect()
      .map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    assert(distN === bufN)
    assert(distN(None) === Some(20.0))
  }

  test("nanQuantileAllNaN flag (r13 missing #4): all-NaN group yields " +
    "NaN (NumPy), all-null stays NULL, mixed NaN+null yields NaN; " +
    "scalar/vector/approx shapes; default unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (0, Some(Double.NaN)), (0, Some(Double.NaN)), // all NaN
      (1, None), (1, None), // all null
      (2, Some(Double.NaN)), (2, None), // NaN + null mix
      (3, Some(2.0)), (3, Some(4.0)), (3, Some(Double.NaN)) // ordinary
    ).toDF("k", "value")
    def run(func: String, o: graft.aggs.ReduceOptions) =
      GroupByReduce(d, Seq("k"), "value", func, "r", o).collect()
        .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    def isNaN(x: Option[Any]) =
      x.exists(v => v.asInstanceOf[Double].isNaN)
    // default: NULL for every no-valid-value group (today's certified
    // behavior)
    val off = run("nanquantile", ReduceOptions(q = Seq(0.5)))
    assert(off(0) === None && off(1) === None && off(2) === None)
    assert(off(3) === Some(3.0))
    // flag on: NaN where a non-null value existed, NULL where none did
    val on = run("nanquantile",
      ReduceOptions(q = Seq(0.5), nanQuantileAllNaN = true))
    assert(isNaN(on(0)), on(0).toString)
    assert(on(1) === None)
    assert(isNaN(on(2)), on(2).toString)
    assert(on(3) === Some(3.0))
    // nanmedian mirrors nanquantile
    val med = run("nanmedian", ReduceOptions(nanQuantileAllNaN = true))
    assert(isNaN(med(0)) && med(1).isEmpty && isNaN(med(2)))
    assert(med(3) === Some(3.0))
    // vector q: whole-array NaN fill vs the default array-of-nulls
    def runV(o: graft.aggs.ReduceOptions) =
      GroupByReduce(d, Seq("k"), "value", "nanquantile", "r", o).collect()
        .map(r => r.getInt(0) ->
          Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[Any]]))
        .toMap
    val vOn = runV(ReduceOptions(q = Seq(0.25, 0.75),
      nanQuantileAllNaN = true))
    assert(vOn(0).exists(_.forall(x => x.asInstanceOf[Double].isNaN)))
    assert(vOn(1).forall(_.forall(_ == null)) || vOn(1).isEmpty)
    assert(vOn(3).exists(_.forall(x => !x.asInstanceOf[Double].isNaN)))
    // approx path: same flag semantics (empty sketch → NaN/NULL split)
    val aOn = run("nanquantile", ReduceOptions(q = Seq(0.5),
      approxQuantile = true, nanQuantileAllNaN = true))
    assert(isNaN(aOn(0)) && aOn(1).isEmpty && isNaN(aOn(2)))
    val aVOn = runV(ReduceOptions(q = Seq(0.25, 0.75),
      approxQuantile = true, nanQuantileAllNaN = true))
    assert(aVOn(0).exists(_.forall(x => x.asInstanceOf[Double].isNaN)))
  }

  test("quantileDistributed fuzz (r14 sketch-bracket plan): duplicates, " +
    "NaN/±Inf, constants, nulls, tiny and mega groups — bit-equal to " +
    "the sorted-buffer reference; the raise_error net never fires") {
    import spark.implicits._
    // local reference: np.quantile semantics — any NaN in the group
    // PROPAGATES (the r16 fix aligning the distributed tier with the
    // buffered guardNaN; the old sort-order reference returned finite
    // values below the NaN tail, masking the quantileAuto divergence);
    // otherwise Spark/NumPy total order (-0<0), the identical
    // lo*(1-frac)+hi*frac algebra with the frac==0 guard
    def ref(values: Seq[Double], q: Double): Option[Double] = {
      if (values.isEmpty) None
      else if (values.exists(_.isNaN)) Some(Double.NaN)
      else {
        val arr = values.sortWith(java.lang.Double.compare(_, _) < 0)
        val n = arr.length
        val target = (n - 1).toDouble * q
        val lo = math.floor(target).toInt
        val frac = target - math.floor(target)
        val lov = arr(lo)
        val hiv = arr(math.min(lo + 1, n - 1))
        Some(if (frac == 0.0) lov else lov * (1.0 - frac) + hiv * frac)
      }
    }
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.77, 0.9, 1.0)
    val rnd = new scala.util.Random(42)
    // trial 0: one mega group (stresses the bracket + interior rank);
    // later trials: many small groups incl. sizes straddling the GK
    // exact/compressed boundary (~1/(2eps)) via accuracy=500
    // (..., 100) = the accuracy FLOOR: widest brackets, fattest
    // interior sliver — the regime where a too-tight rank slack would
    // fire the raise_error net (r14 advice: slack widened to 2εn+2)
    val trials = Seq((1, 60000, 10000), (5, 4000, 500),
      (23, 900, 500), (40, 40, 10000), (7, 3000, 100))
    for (((nGroups, maxSize, acc), trial) <- trials.zipWithIndex) {
      val rows = scala.collection.mutable.ArrayBuffer[(Int, Option[Double])]()
      for (gid <- 0 until nGroups) {
        val size = if (gid == 0 && trial == 3) 0 else 1 + rnd.nextInt(maxSize)
        val style = (gid + trial) % 5
        var j = 0
        while (j < size) {
          val x = style match {
            case 0 => rnd.nextInt(5).toDouble // heavy duplicate runs
            case 1 => rnd.nextDouble() * 1000.0 // continuous
            case 2 => 7.25 // constant group
            case 3 => if (rnd.nextInt(7) == 0) Double.NaN
              else rnd.nextGaussian()
            case 4 => rnd.nextInt(20) match {
              case 0 => Double.PositiveInfinity
              case 1 => Double.NegativeInfinity
              case _ => rnd.nextInt(9).toDouble
            }
          }
          rows += ((gid, if (rnd.nextInt(15) == 0) None else Some(x)))
          j += 1
        }
        if (size == 0) { rows += ((gid, None)); rows += ((gid, None)) }
      }
      val df = rows.toSeq.toDF("k", "value").repartition(7)
      val got = api.GroupByReduce.quantileDistributed(df, Seq("k"),
          "value", qs, "qs", accuracy = acc)
        .collect()
        .map(r => r.getInt(0) -> Option(r.get(1))
          .map(_.asInstanceOf[scala.collection.Seq[Any]])).toMap
      val byGroup = rows.groupBy(_._1)
        .map { case (k, vs) => k -> vs.flatMap(_._2).toSeq }
      assert(got.keySet === byGroup.keySet, s"trial $trial group set")
      byGroup.foreach { case (k, vs) =>
        qs.zipWithIndex.foreach { case (q, i) =>
          val want = ref(vs, q)
          val have = got(k).map(_(i))
          (want, have) match {
            case (None, None) => () // whole array null
            case (None, Some(null)) => () // vector q: null ELEMENTS
            case (Some(w), Some(g: java.lang.Double)) =>
              assert(bits(w) === bits(g),
                s"trial $trial group $k q=$q: want $w got $g")
            case other => fail(s"trial $trial group $k q=$q: $other")
          }
        }
      }
    }
  }

  test("expected_groups left join + fill") {
    val domain = keys.ExpectedGroups.of(spark, "by", Seq(0, 1, 2, 3))
    val r = GroupByReduce(fixture, Seq("by"), "v", "count", "n",
      ReduceOptions(expectedGroups = Some(domain),
        fillValue = Some(org.apache.spark.sql.functions.lit(0L))))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(r === Map(0 -> 3L, 1 -> 4L, 2 -> 5L, 3 -> 0L))
  }
}
