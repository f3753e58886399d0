package graft

import graft.api.Dispatch
import org.apache.spark.sql.functions._

/** Auto tier dispatch (`_choose_method` parity, flox/core.py:685-709):
  * the decision functions are pure and asserted on planted stats at
  * the DEFAULT thresholds; the auto entry points are asserted on three
  * planted inputs (mega-group, hot-key, uniform) with scaled
  * thresholds, and must return values identical to the tier they
  * picked — `auto` may change a plan, never a result. */
class DispatchSpec extends SparkTestBase {
  import spark.implicits._

  test("decision functions at default thresholds: mega-group, hot-key, " +
    "uniform stats pick the documented tiers") {
    val mega = Dispatch.KeyStats(rows = 60000000L, sampledRows = 600000L,
      groupsEst = 3L, maxGroupRowsEst = 20000000L, maxGroupShare = 0.34)
    val uniform = Dispatch.KeyStats(rows = 60000000L, sampledRows = 600000L,
      groupsEst = 400000L, maxGroupRowsEst = 2000L, maxGroupShare = 0.00001)
    val hot = Dispatch.KeyStats(rows = 10000000L, sampledRows = 100000L,
      groupsEst = 90000L, maxGroupRowsEst = 3000000L, maxGroupShare = 0.30)

    assert(Dispatch.chooseQuantileTier(mega) === Dispatch.DistributedTier)
    assert(Dispatch.chooseQuantileTier(uniform) === Dispatch.Buffered)
    assert(Dispatch.chooseScanTier(mega) === Dispatch.CarryTier)
    assert(Dispatch.chooseScanTier(uniform) === Dispatch.WindowTier)
    assert(Dispatch.chooseEventsTier(hot) === Dispatch.Skewed)
    assert(Dispatch.chooseEventsTier(uniform) === Dispatch.Plain)
    // hot-key data is also mega-group data for scans/quantiles when
    // the hot key is big enough — the forks are independent
    assert(Dispatch.chooseQuantileTier(hot) === Dispatch.Buffered)
  }

  test("keyStats: exact small-input path and sampled estimates") {
    // exact path (below the 100k sampled-rows floor)
    val small = (0 until 1000).map(i => (s"k${i % 10}", i)).toDF("k", "v")
    val st = Dispatch.keyStats(small, Seq("k"))
    assert(st.rows === 1000L)
    assert(st.sampledRows === 1000L) // measured exactly
    assert(st.groupsEst === 10L)
    assert(st.maxGroupRowsEst === 100L)
    assert(math.abs(st.maxGroupShare - 0.1) < 1e-9)

    // sampled path: 200k rows, 40% on one key, fraction 0.5
    val big = (0 until 200000).map { i =>
      (if (i % 5 < 2) "hot" else s"k${i % 1000}", i)
    }.toDF("k", "v")
    val stB = Dispatch.keyStats(big, Seq("k"), fraction = 0.5)
    assert(stB.rows === 200000L)
    assert(stB.sampledRows < 200000L, "sampling should have engaged")
    assert(stB.maxGroupShare > 0.3 && stB.maxGroupShare < 0.5,
      s"hot share estimate off: ${stB.maxGroupShare}")
    assert(stB.maxGroupRowsEst > 48000L && stB.maxGroupRowsEst < 112000L,
      s"max group estimate off: ${stB.maxGroupRowsEst}")
  }

  test("quantileAuto / scanAuto on a planted mega-group input " +
    "(threshold scaled): distributed tier picked, values identical " +
    "to the buffered/window tier") {
    val df = (0 until 30000).map { i =>
      (s"g${i % 3}", i, ((i * 7919) % 1000).toDouble,
        if (i % 11 == 0) None else Some(((i * 131) % 500).toDouble))
    }.toDF("g", "id", "v", "vn")

    val auto = Dispatch.quantileAuto(df, Seq("g"), "v", Seq(0.25, 0.9),
      as = "q", megaGroupRows = 5000)
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    val buffered = api.GroupByReduce(df, Seq("g"), "v", "quantile", "q",
      graft.aggs.ReduceOptions(q = Seq(0.25, 0.9)))
      .orderBy("g").collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    assert(auto.toSeq === buffered.toSeq)

    // uniform input at the same threshold stays buffered (same values
    // trivially — the point is it RUNS the buffered plan: no
    // localCheckpoint jobs fire; asserted via the decision function
    // on its own stats)
    val uni = (0 until 30000).map(i => (s"g${i % 5000}", i,
      (i % 100).toDouble)).toDF("g", "id", "v")
    assert(Dispatch.chooseQuantileTier(
      Dispatch.keyStats(uni, Seq("g")), megaGroupRows = 5000) ===
      Dispatch.Buffered)

    val autoScan = Dispatch.scanAuto(df, Seq("g"), "vn", "ffill", "id",
      as = "f", megaGroupRows = 5000)
      .orderBy("g", "id").select("g", "id", "f").collect().map(_.toSeq)
    val windowScan = api.GroupByScan(df, Seq("g"), "vn", "ffill", "id", "f")
      .orderBy("g", "id").select("g", "id", "f").collect().map(_.toSeq)
    assert(autoScan.toSeq === windowScan.toSeq)

    // a func with no carry fold stays on the window tier at ANY size
    val autoCumsum = Dispatch.scanAuto(df, Seq("g"), "v", "cumsum", "id",
      as = "c", megaGroupRows = 5000)
      .orderBy("g", "id").select("g", "id", "c").collect().map(_.toSeq)
    val windowCumsum = api.GroupByScan(df, Seq("g"), "v", "cumsum", "id", "c")
      .orderBy("g", "id").select("g", "id", "c").collect().map(_.toSeq)
    assert(autoCumsum.toSeq === windowCumsum.toSeq)
  }

  test("weightedQuantileAuto: distributed tier on mega-group input " +
    "equals the buffered CDF walk; escalation refuses options the " +
    "distributed tier does not implement") {
    val df = (0 until 30000).map { i =>
      (s"g${i % 3}", ((i * 7919) % 1000).toDouble, 1L + (i % 5))
    }.toDF("g", "v", "w")
    val auto = Dispatch.weightedQuantileAuto(df, Seq("g"), "v", "w", 0.3,
        as = "wq", megaGroupRows = 5000)
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    val buffered = api.GroupByReduce.weighted(df, Seq("g"), "v", "w",
        Seq(("wquantile", "wq")), graft.aggs.ReduceOptions(q = Seq(0.3)))
      .orderBy("g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(auto.toSeq === buffered.toSeq)

    // silent-semantics-drop guard: escalation with expectedGroups /
    // fillValue / minCount set must fail loudly, not return a frame
    // missing its declared machinery
    val dom = Seq("g0", "g1", "g2", "g9").toDF("g")
    val e = intercept[IllegalArgumentException] {
      Dispatch.quantileAuto(df.withColumnRenamed("v", "value"),
        Seq("g"), "value", Seq(0.5), megaGroupRows = 5000,
        opts = graft.aggs.ReduceOptions(
          expectedGroups = Some(dom),
          fillValue = Some(org.apache.spark.sql.functions.lit(0.0))))
    }
    assert(e.getMessage.contains("does not implement"))
  }

  test("events auto on a planted hot-key input: skewed tier picked, " +
    "values identical to plain; uniform input stays plain") {
    val events = (0 until 20000).map { i =>
      val k = if (i % 10 < 3) "hot" else s"u${i % 500}"
      (k, i.toLong * 7L % 86400L, i.toLong, (i % 97).toDouble)
    }.toDF("k", "ts", "tie", "v")

    val st = Dispatch.keyStats(events, Seq("k"))
    assert(Dispatch.chooseEventsTier(st) === Dispatch.Skewed)

    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k", "ts", "tie")
        .select("k", "ts", "tie", "roll_n", "roll_sum")
        .collect().map(_.toSeq)
    assert(canon(Dispatch.rollingAggAuto(events, "k", "ts", "v", span = 600))
      === canon(graft.ops.Events.rollingAgg(events, "k", "ts", "v", 600)))

    def canonS(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k", "ts", "tie").select("k", "ts", "tie", "session_id")
        .collect().map(_.toSeq)
    assert(canonS(Dispatch.sessionizeAuto(events, "k", "ts", "tie",
        gap = 50, span = Some(600)))
      === canonS(graft.ops.Events.sessionize(events, "k", "ts", "tie", 50)))
    // derived span (ts-range/1024, floored at gap): same values
    assert(canonS(Dispatch.sessionizeAuto(events, "k", "ts", "tie",
        gap = 50))
      === canonS(graft.ops.Events.sessionize(events, "k", "ts", "tie", 50)))
    assert(Dispatch.deriveSpan(events, "ts", atLeast = 50) >= 50)

    val uniform = (0 until 20000).map { i =>
      (s"u${i % 2000}", i.toLong, i.toLong, 1.0)
    }.toDF("k", "ts", "tie", "v")
    assert(Dispatch.chooseEventsTier(
      Dispatch.keyStats(uniform, Seq("k"))) === Dispatch.Plain)

    // as-of: hot right side escalates; values equal either way
    val clicks = (0 until 2000).map(i => (s"u${i % 7}", i.toLong * 10))
      .toDF("k", "lts")
    val hist = (0 until 20000).map { i =>
      val k = if (i % 10 < 4) "u1" else s"u${i % 7}"
      (k, i.toLong, (i % 13).toDouble)
    }.toDF("k", "rts", "rv")
    def canonA(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k", "lts").select("k", "lts", "a_rv")
        .collect().map(_.toSeq)
    assert(Dispatch.chooseEventsTier(
      Dispatch.keyStats(hist, Seq("k"))) === Dispatch.Skewed)
    assert(canonA(Dispatch.asofJoinAuto(clicks, hist, Seq("k"),
        "lts", "rts", Seq("rv"), span = Some(500), prefix = "a_"))
      === canonA(graft.ops.Events.asofJoin(clicks, hist, Seq("k"),
        "lts", "rts", Seq("rv"), prefix = "a_")))
    // derived span: same values
    assert(canonA(Dispatch.asofJoinAuto(clicks, hist, Seq("k"),
        "lts", "rts", Seq("rv"), prefix = "a_"))
      === canonA(graft.ops.Events.asofJoin(clicks, hist, Seq("k"),
        "lts", "rts", Seq("rv"), prefix = "a_")))
  }
}
