package graft

import graft.api.{GroupByReduce, GroupByScan}
import graft.aggs.ReduceOptions
import graft.keys.{Binning, ExpectedGroups}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core flox-surface queries (SURVEY.md §2.1/§2.2/§2.3) + their DuckDB
  * oracle SQL. Every reduction/scan/key-machinery operator gets one
  * hash-checked entry. Column names are aliased identically on both
  * sides; float aggregates are rounded on both sides so cross-engine
  * summation-order noise can't break the driver's hash compare.
  */
object CoreQueries {

  private def li(s: SparkSession, dir: String) = Tables(s, dir, "lineitem")
  /** Single-split-scan parallelism fix — see [[Tables.spread]]. */
  private def spreadBy(s: SparkSession, df: DataFrame, key: String): DataFrame =
    Tables.spread(s, df, key)
  private def ev(s: SparkSession, dir: String) = Tables(s, dir, "events")
  private def ord(s: SparkSession, dir: String) = Tables(s, dir, "orders")

  /** Deterministic NaN injection for nan*-variant tests: the raw tables
    * contain no NaN, so both engines derive the same NaN positions. */
  private def withNan(df: DataFrame): DataFrame =
    df.withColumn("v", when(col("event_id") % 97 === 0, lit(Double.NaN))
      .otherwise(col("value")))
  private val sqlNan =
    "SELECT *, CASE WHEN event_id % 97 = 0 THEN 'NaN'::DOUBLE ELSE value END AS v FROM events"

  /** Deterministic null injection (missing values). */
  private def withNull(df: DataFrame): DataFrame =
    df.withColumn("v", when(col("event_id") % 13 === 0, lit(null))
      .otherwise(col("value")))
  private val sqlNull =
    "SELECT *, CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS v FROM events"

  private def r(c: String, n: Int): Column = round(col(c), n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- §2.1 basic reductions (lineitem by l_returnflag)
    "q_count" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_quantity", "count", "n_vals")),

    // exact distinct-cardinality reduction (the HLL sketch twin
    // `approx_nunique` is the 100 TB path; exact is the certified one).
    // The two-distinct-agg Expand plan was A/B'd (r14) against a
    // split two-agg + broadcast-join and a manual two-level
    // distinct-then-count: all three converge at ~0.60s warm at sf0.1
    // (expand 0.61-0.67, split 0.58-0.65, twolevel 0.59-0.62 over 4
    // warm reps) — the r13-verdict floor adjudication holds: the cost
    // is job/stage floor, not the Expand row duplication, so the
    // single-pass Expand shape (one scan, no join) stays.
    "q_nunique" -> ((s, d) =>
      GroupByReduce.multi(li(s, d), Seq("l_returnflag"), Seq(
        ("l_orderkey", "nunique", "n_orders"),
        ("l_suppkey", "nunique", "n_supps")))),

    // reductions over a Partitioning.byGroups-aligned layout (the
    // rechunk_for_blockwise residue, flox/rechunk.py:158-223): same
    // values as the unpartitioned plan — certifies the pre-partitioned
    // path end-to-end (its one-Exchange plan shape is pinned in
    // ReduceSpec)
    "q_partitioned_agg" -> ((s, d) =>
      GroupByReduce.multi(
        graft.api.Partitioning.byGroups(li(s, d), Seq("l_returnflag")),
        Seq("l_returnflag"), Seq(
          ("l_quantity", "sum", "sum_qty"),
          ("l_quantity", "mean", "avg_qty"),
          ("l_orderkey", "nunique", "n_orders")))
        .withColumn("sum_qty", r("sum_qty", 2))
        .withColumn("avg_qty", r("avg_qty", 4))),

    // reductions + join over the PERSISTENT bucketed layout
    // (api.Layout — the cross-JOB blockwise analog,
    // flox/rechunk.py:158-223): both fact tables are written bucketed
    // on the join key, read back through the catalog, joined and
    // aggregated. Results must equal the plain join+agg over the raw
    // parquet (the oracle) — the layout is a physical property only.
    // The plan laws (one file per bucket on disk; zero
    // ShuffleExchangeExec AND zero SortExec on the join+agg tree) are
    // pinned in LayoutSpec where broadcast is disabled; here the query
    // certifies values under default confs. The write runs eagerly at
    // plan-build time (the connected-components convention).
    "q_bucketed_agg" -> ((s, d) => {
      import graft.api.Layout
      val tag = java.lang.Integer.toHexString(d.hashCode).replace("-", "m")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_layout_$tag"
      val liT = s"graft_bl_li_$tag"; val ordT = s"graft_bl_ord_$tag"
      Layout.writeBucketed(
        li(s, d).select("l_orderkey", "l_quantity", "l_extendedprice"),
        liT, Seq("l_orderkey"), 8, Seq("l_orderkey"), Some(s"$root/li"))
      Layout.writeBucketed(
        ord(s, d).select("o_orderkey", "o_orderpriority"),
        ordT, Seq("o_orderkey"), 8, Seq("o_orderkey"), Some(s"$root/ord"))
      Layout.table(s, ordT)
        .join(Layout.table(s, liT),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_items"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("o_orderpriority")
    }),

    "q_sum" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_quantity", "sum", "sum_qty")
        .withColumn("sum_qty", r("sum_qty", 2))),

    "q_mean" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_quantity", "mean", "avg_qty")
        .withColumn("avg_qty", r("avg_qty", 4))),

    "q_min_max" -> ((s, d) =>
      GroupByReduce.multi(li(s, d), Seq("l_returnflag"), Seq(
        ("l_quantity", "min", "min_qty"),
        ("l_quantity", "max", "max_qty"),
        ("l_extendedprice", "min", "min_price"),
        ("l_extendedprice", "max", "max_price")))),

    "q_var_std" -> ((s, d) =>
      GroupByReduce.multi(li(s, d), Seq("l_returnflag"), Seq(
        ("l_quantity", "var", "var1"),
        ("l_quantity", "std", "std1")))
        .withColumn("var1", r("var1", 4)).withColumn("std1", r("std1", 4))),

    "q_var_pop" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_quantity", "var", "var0",
        ReduceOptions(ddof = 0)).withColumn("var0", r("var0", 4))),

    // Grouped by l_orderkey so degenerate groups exist in the data:
    // 1-row (n < ddof -> NaN), 2-row (n == ddof -> 0/0 = NaN, or +inf
    // when the two values differ), and 3+-row (normal) — certifying the
    // reference's `_var_finalize` IEEE branches (flox/aggregations.py:
    // 460-469), not just the happy path.
    "q_var_ddof2" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_orderkey"), "l_quantity", "var", "var2",
        ReduceOptions(ddof = 2)).withColumn("var2", r("var2", 4))),

    "q_prod" -> ((s, d) =>
      GroupByReduce(
        li(s, d).withColumn("disc_mult", lit(1.0) + col("l_discount")),
        Seq("l_orderkey"), "disc_mult", "prod", "prod_disc")
        .withColumn("prod_disc", r("prod_disc", 6))),

    // weighted reductions (beyond-reference; xarray .weighted() parity):
    // wmean/wvar over a NaN-contaminated value with integer weights —
    // pairs with a missing side are skipped on both engines
    "q_weighted" -> ((s, d) =>
      GroupByReduce.weighted(
        withNan(ev(s, d)).withColumn("w", col("event_id") % 7 + 1),
        Seq("user_id"), "v", "w", Seq(
          ("wcount", "wn"),
          ("wsum", "wsum"),
          ("wmean", "wmean"),
          ("wvar", "wvar"),
          ("wstd", "wstd")))
        .withColumn("wsum", r("wsum", 2))
        .withColumn("wmean", r("wmean", 4))
        .withColumn("wvar", r("wvar", 2))
        .withColumn("wstd", r("wstd", 4))),

    // higher moments (beyond-reference): population skewness + excess
    // kurtosis; DuckDB's skewness/kurtosis are the SAMPLE-adjusted
    // statistics, so the oracle derives the population forms from raw
    // moments instead — the half-up floor rounding absorbs the raw-vs-
    // central-moment float noise
    "q_skew_kurt" -> ((s, d) =>
      GroupByReduce.multi(ev(s, d), Seq("user_id"), Seq(
        ("value", "skew", "skw"),
        ("value", "kurt", "krt")))
        .withColumn("skw", floor(col("skw") * 10000 + 0.5) / 10000)
        .withColumn("krt", floor(col("krt") * 10000 + 0.5) / 10000)),

    // beyond-reference BINARY reductions (flox's model is unary-value;
    // covariance/correlation need a value PAIR). Spark's builtins carry
    // the same chunk/combine/finalize algebra — co-moment merge is the
    // bivariate Chan formula our var Aggregator implements — and join
    // the same one-shuffle grouped plan.
    "q_corr" -> ((s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg(round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("cov_p"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("r_qp"))
        .orderBy("l_returnflag")),

    "q_any_all" -> ((s, d) =>
      GroupByReduce.multi(
        li(s, d).withColumn("big", col("l_quantity") > 25),
        Seq("l_returnflag"), Seq(
          ("big", "any", "any_big"),
          ("big", "all", "all_big")))),

    "q_median" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_extendedprice", "median", "med_price")
        .withColumn("med_price", r("med_price", 4))),

    "q_quantile" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_extendedprice", "quantile", "p90",
        ReduceOptions(q = Seq(0.9))).withColumn("p90", r("p90", 4))),

    // the SAME exact quantile via the mega-group-safe two-stage
    // distributed plan (range-partitioned rank + bracket pick) —
    // bit-equal to the buffered path by the shared interpolation
    // algebra, certified against the same oracle
    "q_quantile_dist" -> ((s, d) =>
      GroupByReduce.quantileDistributed(li(s, d), Seq("l_returnflag"),
        "l_extendedprice", Seq(0.9), "p90")
        .withColumn("p90", r("p90", 4))),

    // vector q -> array column (the reference's "new output dim",
    // flox/aggregations.py:688-710), unpacked to named columns — ONE pass.
    "q_quantile_multi" -> ((s, d) =>
      GroupByReduce(li(s, d), Seq("l_returnflag"), "l_extendedprice", "quantile", "qs",
        ReduceOptions(q = Seq(0.25, 0.5, 0.75)))
        .select(col("l_returnflag"),
          round(element_at(col("qs"), 1), 4).as("q25"),
          round(element_at(col("qs"), 2), 4).as("q50"),
          round(element_at(col("qs"), 3), 4).as("q75"))
        .orderBy("l_returnflag")),

    "q_mode" -> ((s, d) =>
      GroupByReduce.mode(li(s, d), Seq("l_returnflag"), "l_quantity", "mode_qty")),

    // ---------------- approx-quantile SCALE path certified: the
    // mergeable percentile_approx sketch (map-side combinable — the
    // 100 TB answer to exact percentile's one-task-per-group buffering).
    // At this group size (n << accuracy) the GK sketch's rank error
    // ε·n < 1, so the result is EXACTLY the element at rank ceil(q·n) —
    // which is DuckDB's quantile_disc. No rounding needed: both engines
    // return verbatim data elements.
    "q_quantile_approx" -> ((s, d) =>
      GroupByReduce.multi(ev(s, d), Seq("user_id"), Seq(
        ("value", "quantile", "p90a"),
        ("value", "median", "meda")),
        ReduceOptions(q = Seq(0.9), approxQuantile = true))),

    // NaN-skipping + vector-q approx quantiles in one pass
    "q_nanquantile_approx" -> ((s, d) =>
      GroupByReduce.multi(withNan(ev(s, d)), Seq("user_id"), Seq(
        ("v", "nanquantile", "qs"),
        ("v", "nanmedian", "nmeda")),
        ReduceOptions(q = Seq(0.25, 0.9), approxQuantile = true))
        .select(col("user_id"),
          element_at(col("qs"), 1).as("nq25"),
          element_at(col("qs"), 2).as("nq90"),
          col("nmeda"))
        .orderBy("user_id")),

    // ---------------- §2.3 multi-key grouping
    "q_multikey" -> ((s, d) =>
      GroupByReduce.multi(li(s, d), Seq("l_returnflag", "l_linestatus"), Seq(
        ("l_quantity", "sum", "sum_qty"),
        ("l_extendedprice", "mean", "avg_price"),
        ("l_quantity", "count", "n")))
        .withColumn("sum_qty", r("sum_qty", 2))
        .withColumn("avg_price", r("avg_price", 4))),

    // ---------------- §2.3 partial-axis reduction: reduce over time
    // only, keeping (user, type) as output dims — in the long-form
    // model the retained dims are simply extra groupBy keys
    // (flox/factorize.py:24-39 offset machinery collapses to this)
    "q_partial_axis" -> ((s, d) =>
      GroupByReduce.multi(ev(s, d), Seq("user_id", "event_type"), Seq(
        ("value", "mean", "vmean"),
        ("value", "count", "n")))
        // floor(x*1e4+0.5): engine round() implementations disagree on
        // exact .xxxx5 (Spark decimal half-up, DuckDB binary half-even)
        .withColumn("vmean", floor(col("vmean") * 10000 + 0.5) / 10000)),

    // ---------------- §2.5/order-dependent (events; idx = event_id)
    "q_first_last_arg" -> ((s, d) =>
      GroupByReduce.multi(ev(s, d), Seq("user_id"), Seq(
        ("value", "first", "first_val"),
        ("value", "last", "last_val"),
        ("value", "argmin", "argmin_id"),
        ("value", "argmax", "argmax_id")),
        ReduceOptions(idxCol = Some("event_id")))),

    // ---------------- NaN-skipping vs NaN-propagating variants
    "q_nan_aggs" -> ((s, d) => {
      // integer-grid stabilization: aggregate v·10⁶ floored to an
      // INTEGRAL double (NaN flows through floor unchanged) so every
      // sum is exact and order-independent across partitionings AND
      // engines, then scale back in the projection — the same
      // boundary-flip class as q_custom_agg, surfaced by the sf0.1
      // probe on nmean's 4-dp round. NaN-skip semantics untouched.
      // NB Spark's floor() yields BIGINT (NaN would cast to 0!) — keep
      // the NaN lane explicit and cast the integral result back
      val e = withNan(ev(s, d))
        .withColumn("v", when(isnan(col("v")), col("v"))
          .otherwise(floor(col("v") * 1e6 + 0.5).cast("double")))
      GroupByReduce.multi(e, Seq("user_id"), Seq(
        ("v", "count", "n_valid"),
        ("v", "nansum", "nsum"),
        ("v", "nanmean", "nmean"),
        ("v", "nanmin", "nmin"),
        ("v", "nanmax", "nmax"),
        ("v", "sum", "sum_prop")))
        .withColumn("nsum", round(col("nsum") / 1e6, 2))
        .withColumn("nmean", round(col("nmean") / 1e6, 4))
        .withColumn("nmin", round(col("nmin") / 1e6, 6))
        .withColumn("nmax", round(col("nmax") / 1e6, 6))
        // NaN-propagating sum: encode NaN as null for hash-stable compare
        .withColumn("sum_prop",
          when(!isnan(col("sum_prop")), round(col("sum_prop") / 1e6, 2)))
    }),

    // Integer-dtype fill parity (flox/xrdtypes.py:175-185): nansum /
    // nanprod over an INT column keep BIGINT schema — the identity
    // fills are integer literals and prod is the exact int64 product,
    // so no silent promotion to double. l_orderkey groups are 1-7 rows
    // with nulls injected on even part keys, so all-null groups (fill
    // 0 / fill 1) and short products (exact, no overflow) both occur.
    "q_nan_aggs_int" -> ((s, d) =>
      GroupByReduce.multi(
        li(s, d).withColumn("x",
          when(col("l_partkey") % 2 === 0, lit(null)).otherwise(col("l_linenumber"))),
        Seq("l_orderkey"), Seq(
          ("x", "nansum", "nsum"),
          ("x", "nanprod", "nprod")))),

    // weighted quantiles (frequency-weight semantics: integer weights =
    // repeat counts, type-7 interpolation over the expanded multiset —
    // the oracle literally expands with unnest(generate_series))
    // vector q (r15): wquantile with q = [0.25, 0.75] returns an
    // array — the unweighted quantile's vector-q surface symmetry —
    // flattened here so the oracle stays plain columns
    "q_weighted_quantile" -> ((s, d) =>
      GroupByReduce.weighted(
        spreadBy(s, withNan(ev(s, d)).withColumn("w", col("event_id") % 7 + 1),
          "user_id"),
        Seq("user_id"), "v", "w", Seq(
          ("wmedian", "wmed"),
          ("wquantile", "wqv")), ReduceOptions(q = Seq(0.25, 0.75)))
        .withColumn("wmed", r("wmed", 4))
        .withColumn("wq25", round(element_at(col("wqv"), 1), 4))
        .withColumn("wq75", round(element_at(col("wqv"), 2), 4))
        .drop("wqv")),

    // the unbounded-group-size weighted tier: duplicate-run
    // compression + distributed weight prefix sum, no per-group
    // buffer anywhere (ReduceSpec pins BIT-equality with the
    // buffered CDF walk and per-scalar symmetry of the r17 vector-q
    // surface; this row certifies both cross-engine: one vector call
    // answers both quantiles)
    "q_weighted_quantile_dist" -> ((s, d) =>
      GroupByReduce.weightedQuantileDistributed(
        withNan(ev(s, d)).withColumn("w", col("event_id") % 7 + 1),
        Seq("user_id"), "v", "w", Seq(0.25, 0.75), "wqv")
        .withColumn("wq25", round(element_at(col("wqv"), 1), 4))
        .withColumn("wq75", round(element_at(col("wqv"), 2), 4))
        .drop("wqv")),

    "q_nanvar_std" -> ((s, d) => {
      val e = withNan(ev(s, d))
      GroupByReduce.multi(e, Seq("user_id"), Seq(
        ("v", "nanvar", "nvar"),
        ("v", "nanstd", "nstd")))
        .withColumn("nvar", r("nvar", 4)).withColumn("nstd", r("nstd", 4))
    }),

    "q_nan_order" -> ((s, d) => {
      val e = withNan(ev(s, d))
      GroupByReduce.multi(e, Seq("user_id"), Seq(
        ("v", "nanfirst", "nfirst"),
        ("v", "nanlast", "nlast"),
        ("v", "nanargmin", "nargmin"),
        ("v", "nanargmax", "nargmax")),
        ReduceOptions(idxCol = Some("event_id")))
    }),

    // nanall/nanany: NaN skipped BEFORE the boolean cast (plain
    // variants keep NumPy truthiness where NaN is true); the 0/1
    // indicator is built with an explicit NaN branch — Spark's floor()
    // returns LONG and would silently destroy the NaN
    "q_nan_bool" -> ((s, d) =>
      GroupByReduce.multi(
        withNan(ev(s, d)).withColumn("x",
          when(isnan(col("v")), col("v"))
            .otherwise(when(col("v") > 250, lit(1.0)).otherwise(lit(0.0)))),
        Seq("user_id"), Seq(
          ("x", "any", "pany"),
          ("x", "all", "pall"),
          ("x", "nanany", "nany"),
          ("x", "nanall", "nall")))),

    // nanprod over a bounded multiplier (raw values overflow a 67-element
    // product); NaN positions skipped, matching numpy nanprod
    "q_nanprod" -> ((s, d) =>
      GroupByReduce(
        withNan(ev(s, d)).withColumn("m", lit(1.0) + col("v") / 10000),
        Seq("user_id"), "m", "nanprod", "nprod")
        .withColumn("nprod", r("nprod", 6))),

    // nanmedian + scalar nanquantile in ONE pass (shared shuffle)
    "q_nan_quantiles" -> ((s, d) =>
      GroupByReduce.multi(withNan(ev(s, d)), Seq("user_id"), Seq(
        ("v", "nanmedian", "nmed"),
        ("v", "nanquantile", "np90")),
        ReduceOptions(q = Seq(0.9)))
        .withColumn("nmed", r("nmed", 4))
        .withColumn("np90", r("np90", 4))),

    // ReduceOptions.nanQuantileAllNaN (r13 missing #4): NumPy parity
    // for all-NaN groups — group 0 is ALL NaN (→ NaN, where the
    // default returns NULL), group 1 is all NULL (→ NULL on both
    // settings: masked elements are invisible to NumPy), groups 2-4
    // are ordinary. Certifies the flag end-to-end cross-engine.
    "q_nanquantile_allnan" -> ((s, d) => {
      val base = ev(s, d)
        .withColumn("g", col("user_id") % 5)
        .withColumn("v2",
          when(col("g") === 0, lit(Double.NaN))
            .when(col("g") === 1, lit(null).cast("double"))
            .otherwise(col("value")))
      GroupByReduce(base, Seq("g"), "v2", "nanquantile", "nq",
        ReduceOptions(q = Seq(0.5), nanQuantileAllNaN = true))
        .withColumn("nq", r("nq", 4))
    }),

    // nanmode: NaN-skipping grouped mode over a discretized value
    // (floor(v/50) gives ~10 buckets per group so ties are real);
    // smallest-value tie-break as in scipy.stats.mode
    "q_nanmode" -> ((s, d) =>
      GroupByReduce.mode(
        withNan(ev(s, d)).withColumn("fv",
          when(!isnan(col("v")), floor(col("v") / 50))),
        Seq("user_id"), "fv", "nmode")),

    // §2.5 TYPED custom Aggregation with a multi-field buffer: the
    // registerTyped path certified end-to-end. WelfordVar carries a
    // (count, mean, M2) state through Catalyst's partial/merge/final
    // aggregation — the reference's 3-tuple _var_combine algebra
    // (flox/aggregations.py:392-451) — and must reproduce q_var_ddof2's
    // answers from the var_pop identity on the oracle side.
    "q_custom_agg_typed" -> ((s, d) => {
      graft.aggs.CustomAggregations.registerTyped("welford_var_ddof2",
        new graft.aggs.CustomAggregations.WelfordVar(2))(
        org.apache.spark.sql.Encoders.scalaDouble)
      GroupByReduce(ev(s, d), Seq("user_id"), "value", "welford_var_ddof2", "var2")
        .withColumn("var2", r("var2", 4))
    }),

    // §2.5 custom Aggregation registered by name and certified against
    // the oracle (reference custom-agg test: tests/test_core.py:1510-1548)
    "q_custom_agg" -> ((s, d) => {
      // chunk adds floor(value²·10² + 0.5) (2-decimal grid): INTEGRAL terms keep the
      // double sum exact (≪ 2^53) and therefore order-independent
      // across partitionings AND engines — the rounding-boundary flip
      // the sf0.1 probe surfaced (round-2dp of an order-drifted float
      // sum) cannot occur. The registry algebra (identity/chunk/
      // combine) is what this certifies; the kernel math is a demo.
      graft.aggs.CustomAggregations.register("sum_of_squares",
        new graft.aggs.CustomAggregations.SimpleAggregation {
          def identity = 0.0
          def chunk(state: Double, value: Double) =
            state + math.floor(value * value * 1e2 + 0.5)
          def combine(a: Double, b: Double) = a + b
        })
      // one exact-integer / 100 division, NO round() — a float round of
      // an S/10^k quotient can land exactly on a .5 boundary where the
      // engines' rounding algorithms disagree even on identical input
      GroupByReduce(ev(s, d), Seq("user_id"), "value", "sum_of_squares", "ss")
        .withColumn("ss", col("ss") / 100.0)
    }),

    // ---------------- §2.3 binning
    "q_bins" -> ((s, d) => {
      val breaks = Seq(1.0, 10.0, 25.0, 40.0, 50.0)
      val b = li(s, d)
        .withColumn("bin", Binning.binIndex(col("l_quantity"), breaks))
        .withColumn("bin_label", Binning.binLabel(col("l_quantity"), breaks))
      GroupByReduce.multi(b, Seq("bin", "bin_label"), Seq(
        ("l_extendedprice", "sum", "sum_price"),
        ("l_extendedprice", "count", "n")))
        .withColumn("sum_price", r("sum_price", 2))
    }),

    // ---------------- bins AS expected_groups: the declared break set
    // IS the output domain, so the empty (25.0, 25.5] bin materializes
    // with fill 0 instead of silently dropping (flox core.py:616-636 +
    // reindex.py:160-216 — what resampling users rely on for missing
    // periods)
    "q_bins_expected" -> ((s, d) => {
      val breaks = Seq(1.0, 10.0, 25.0, 25.5, 40.0, 50.0)
      val domain = ExpectedGroups.fromBreaks(s, breaks)
      val b = li(s, d)
        .withColumn("bin", Binning.binIndex(col("l_quantity"), breaks))
        .withColumn("bin_label", Binning.binLabel(col("l_quantity"), breaks))
      GroupByReduce.multi(b, Seq("bin", "bin_label"), Seq(
        ("l_extendedprice", "count", "n"),
        ("l_extendedprice", "sum", "sum_price")),
        ReduceOptions(expectedGroups = Some(domain), fillValue = Some(lit(0))))
        .withColumn("sum_price", r("sum_price", 2))
    }),

    // ---------------- duration (timedelta64 analog) values: event
    // inter-arrival gaps as DayTimeIntervalType, reduced through the
    // micros view + interval restore (DtypeView); min/max run natively
    // on the interval. Output in micros so both engines compare exactly.
    "q_duration_aggs" -> ((s, d) => {
      // gaps from MICRO-precision event times (DuckDB's epoch_us view
      // of the same column, whatever the parquet physical encoding —
      // see Tables.tsMicros)
      val gapUs = expr(
        "tsu - lag(tsu) over (partition by user_id order by tsu, event_id)")
      val toUs: Column => Column =
        c => (c.cast("decimal(26,6)") * 1000000L).cast("long")
      val ev0 = ev(s, d)
      val e = ev0.withColumn("tsu", Tables.tsMicros(ev0)).withColumn("dur",
        make_dt_interval(lit(0), lit(0), lit(0),
          (gapUs.cast("decimal(26,0)") / lit(1000000L).cast("decimal(7,0)"))
            .cast("decimal(18,6)")))
      GroupByReduce.multi(e, Seq("user_id"), Seq(
        ("dur", "sum", "dsum"),
        ("dur", "mean", "dmean"),
        ("dur", "median", "dmed"),
        ("dur", "min", "dmin"),
        ("dur", "max", "dmax")))
        .select(col("user_id"),
          toUs(col("dsum")).as("dsum"), toUs(col("dmean")).as("dmean"),
          toUs(col("dmed")).as("dmed"), toUs(col("dmin")).as("dmin"),
          toUs(col("dmax")).as("dmax"))
        .orderBy("user_id")
    }),

    // ---------------- datetime values: native min/max/first/last,
    // int64-view + restore for mean/median (flox core.py:985-1001,1205-1217)
    "q_datetime_aggs" -> ((s, d) =>
      GroupByReduce.multi(ord(s, d), Seq("o_orderpriority"), Seq(
        ("o_orderdate", "min", "dmin"),
        ("o_orderdate", "max", "dmax"),
        ("o_orderdate", "first", "dfirst"),
        ("o_orderdate", "last", "dlast"),
        ("o_orderdate", "mean", "dmean"),
        ("o_orderdate", "median", "dmed")),
        ReduceOptions(idxCol = Some("o_orderkey")))),

    // ---------------- datetime binning (int64-view digitize,
    // flox/factorize.py:78-82)
    "q_datetime_bins" -> ((s, d) => {
      val breaks = Seq("1995-01-01", "1997-01-01", "1999-01-01",
        "2001-01-01", "2003-01-01")
      val b = li(s, d)
        .withColumn("bin", Binning.datetimeBinIndex(col("l_shipdate"), breaks))
        .withColumn("bin_label", Binning.datetimeBinLabel(col("l_shipdate"), breaks))
      GroupByReduce.multi(b, Seq("bin", "bin_label"), Seq(
        ("l_extendedprice", "sum", "sum_price"),
        ("l_extendedprice", "count", "n")))
        .withColumn("sum_price", r("sum_price", 2))
    }),

    // ---------------- datetime bins AS expected_groups: the declared
    // calendar periods ARE the output domain, so the empty trailing
    // period materializes with fill 0 — resampling-with-missing-periods,
    // flox's bread-and-butter xarray case (core.py:616-636 +
    // factorize.py:78-82, tests/test_xarray.py resampling-missing-groups)
    "q_datetime_bins_expected" -> ((s, d) => {
      val breaks = Seq("1992-01-01", "1994-01-01", "1996-01-01",
        "1998-01-01", "2000-01-01", "2002-01-01")
      val domain = ExpectedGroups.fromDatetimeBreaks(s, breaks)
      val b = ord(s, d)
        .withColumn("bin", Binning.datetimeBinIndex(col("o_orderdate"), breaks))
        .withColumn("bin_label", Binning.datetimeBinLabel(col("o_orderdate"), breaks))
      GroupByReduce.multi(b, Seq("bin", "bin_label"), Seq(
        ("o_totalprice", "count", "n"),
        ("o_totalprice", "sum", "sum_price")),
        ReduceOptions(expectedGroups = Some(domain), fillValue = Some(lit(0))))
        .withColumn("sum_price", r("sum_price", 2))
    }),

    // ---------------- uniform binning, O(1) arithmetic path — the scale
    // route for high-cardinality bins (no O(#bins) when-chain in the plan)
    "q_bins_uniform" -> ((s, d) => {
      val b = li(s, d)
        .withColumn("bin", Binning.uniform(col("l_quantity"), 0.0, 50.0, 5))
      GroupByReduce.multi(b, Seq("bin"), Seq(
        ("l_extendedprice", "sum", "sum_price"),
        ("l_extendedprice", "count", "n")))
        .withColumn("sum_price", r("sum_price", 2))
    }),

    // ---------------- string VALUES (flox supports unicode value arrays
    // for count/first/last, aggregations.py:75-76; min/max are the
    // orderable-dtype counterparts): the struct-ordered first/last and
    // native min/max are type-generic — certified here on a string column
    "q_string_aggs" -> ((s, d) =>
      GroupByReduce.multi(ord(s, d), Seq("o_orderpriority"), Seq(
        ("o_orderstatus", "count", "n"),
        ("o_orderstatus", "first", "sfirst"),
        ("o_orderstatus", "last", "slast"),
        ("o_orderstatus", "min", "smin"),
        ("o_orderstatus", "max", "smax")),
        ReduceOptions(idxCol = Some("o_orderkey")))),

    // ---------------- calendar resampling — flox's bread-and-butter
    // xarray case (daily buckets from the event stream; event time
    // viewed at micros via Tables.tsMicros regardless of encoding)
    "q_resample" -> ((s, d) =>
      GroupByReduce.multi(
        { val e = ev(s, d)
          e.withColumn("day",
            date_trunc("DAY", timestamp_micros(Tables.tsMicros(e)))
              .cast("timestamp_ntz")) },
        Seq("day"), Seq(
          ("value", "mean", "vmean"),
          ("value", "count", "n"),
          ("value", "max", "vmax")))
        .withColumn("vmean", r("vmean", 4))),

    // ---------------- bool values: int promotion for sum/mean
    // (flox core.py:916-917), native bool for min/max/any/all
    "q_bool_aggs" -> ((s, d) =>
      GroupByReduce.multi(
        ev(s, d).withColumn("b", col("value") > 250),
        Seq("user_id"), Seq(
          ("b", "sum", "n_true"),
          ("b", "mean", "frac_true"),
          ("b", "min", "bmin"),
          ("b", "max", "bmax"),
          ("b", "any", "bany"),
          ("b", "all", "ball")))
        .withColumn("frac_true", r("frac_true", 4))),

    // ---------------- §2.3 expected_groups + fill_value
    "q_expected_fill" -> ((s, d) => {
      val domain = ExpectedGroups.of(s, "o_orderpriority",
        Seq("0-MISSING", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      GroupByReduce(ord(s, d), Seq("o_orderpriority"), "o_totalprice", "count", "n",
        ReduceOptions(expectedGroups = Some(domain), fillValue = Some(lit(0L))))
    }),

    // ---------------- §1.3 dense multi-key grid (with an absent combo)
    "q_dense_grid" -> ((s, d) => {
      val l = li(s, d)
      val domain = ExpectedGroups.grid(Seq(
        ExpectedGroups.of(s, "l_returnflag", Seq("A", "N", "R", "X")),
        ExpectedGroups.of(s, "l_linestatus", Seq("F", "O"))))
      GroupByReduce(l, Seq("l_returnflag", "l_linestatus"), "l_quantity", "count", "n",
        ReduceOptions(expectedGroups = Some(domain), fillValue = Some(lit(0L))))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---------------- min_count masking
    "q_min_count" -> ((s, d) => {
      val e = withNull(ev(s, d))
      GroupByReduce.multi(e, Seq("user_id"), Seq(
        ("v", "count", "n_valid"),
        ("v", "nansum", "masked_sum")),
        ReduceOptions(minCount = 62))
        .withColumn("masked_sum", r("masked_sum", 2))
    }),

    // ---------------- §2.2 grouped scans
    "q_cumsum" -> ((s, d) =>
      GroupByScan(ev(s, d), Seq("user_id"), "value", "cumsum", "event_id", "csum")
        .select(col("event_id"), col("user_id"), r("csum", 4).as("csum"))
        .orderBy("event_id")),

    "q_nancumsum" -> ((s, d) =>
      GroupByScan(spreadBy(s, withNan(ev(s, d)), "user_id"),
        Seq("user_id"), "v", "nancumsum", "event_id", "ncsum")
        .select(col("event_id"), col("user_id"), r("ncsum", 4).as("ncsum"))),

    // Built-in running extrema (beyond-reference; np.maximum/minimum
    // .accumulate semantics — NaN poisons the running value once seen,
    // nancum* skip it). Both engines order NaN greatest, so plain
    // cummax propagates identically; cummin carries an explicit
    // bool_or(isnan) guard on BOTH sides.
    "q_cum_extrema" -> ((s, d) => {
      val e = spreadBy(s, withNan(ev(s, d)), "user_id")
      val c1 = GroupByScan(e, Seq("user_id"), "v", "cummax", "event_id", "cmax")
      val c2 = GroupByScan(c1, Seq("user_id"), "v", "cummin", "event_id", "cmin")
      val c3 = GroupByScan(c2, Seq("user_id"), "v", "nancummax", "event_id", "ncmax")
      GroupByScan(c3, Seq("user_id"), "v", "nancummin", "event_id", "ncmin")
        // NaN-carrying doubles hash-compare fine, but encode the plain
        // variants' NaN via the same when() both engines agree on
        .select(col("event_id"), col("user_id"),
          col("cmax"), col("cmin"), col("ncmax"), col("ncmin"))
    }),

    // the unbounded-group-size cum-extrema tier (boundary-carry fold —
    // exact values, bit-identical to the WINDOW TIER by GlobalScanSpec
    // law): np.maximum/minimum.accumulate semantics, same as
    // q_cum_extrema — NaN poisons the running min too (the r15
    // advice-high fix: the old fold let a later finite value replace
    // NaN, diverging from GroupByScan under scanAuto), hence the same
    // bool_or(isnan) CASE on the oracle side
    "q_cum_extrema_dist" -> ((s, d) => {
      val e = withNan(ev(s, d))
      val c1 = graft.api.GlobalScan.groupedCumMax(e, Seq("user_id"),
        Seq(col("event_id")), "v", "cmax")
      graft.api.GlobalScan.groupedCumMin(c1, Seq("user_id"),
          Seq(col("event_id")), "v", "cmin")
        .select(col("event_id"), col("user_id"), col("cmax"), col("cmin"))
        .orderBy("event_id")
    }),

    // Bounded top-k values per group (beyond-reference): O(k) heap per
    // group at every stage — the scale-safe form of
    // slice(sort_array(collect_list(v))), whose buffer is the group
    // exploded to (user_id, rk, v) rows: the hash compare needs scalar
    // columns, and rank rows are deterministic under value ties (equal
    // values emit equal v at each rank either way)
    "q_topk" -> ((s, d) =>
      GroupByReduce(ev(s, d), Seq("user_id"), "value", "topk", "tk",
        ReduceOptions(topK = 5))
        .select(col("user_id"), posexplode(col("tk")))
        .select(col("user_id"), (col("pos") + 1).cast("long").as("rk"),
          col("col").as("v"))
        .orderBy("user_id", "rk")),

    // §2.5 custom Scan registrations (flox/aggregations.py:715-737):
    // cummax = running max; cumfrac = running share of the group total,
    // exercising the finalize(run, whole) hook — both in one window pass
    "q_custom_scan" -> ((s, d) => {
      import graft.aggs.CustomScans
      CustomScans.register("cumfrac", CustomScans.ScanSpec(
        v => sum(v), finish = Some((run, whole) => run / whole)))
      val base = GroupByScan(spreadBy(s, ev(s, d), "user_id"),
        Seq("user_id"), "value", "cummax", "event_id", "cmax")
      GroupByScan(base, Seq("user_id"), "value", "cumfrac", "event_id", "cfrac")
        .select(col("event_id"), col("user_id"), col("cmax"),
          r("cfrac", 6).as("cfrac"))
    }),

    // the same REGISTRY route at unbounded group size (r14 verdict #4):
    // the registered cummax's declared associative fold runs through
    // GlobalScan's boundary-carry tier — flox's generic scan_binary_op
    // (flox/aggregations.py:792-846) — instead of one task per group.
    // Same window SQL as the cummax half of q_custom_scan by design.
    "q_custom_scan_dist" -> ((s, d) =>
      graft.api.GlobalScan.groupedCustomScan(
        ev(s, d).select("event_id", "user_id", "value"),
        Seq("user_id"), Seq(col("event_id")), "value", "cmax", "cummax")
        .orderBy("event_id")),

    // cumcount at unbounded group size (r16, closing the r15 refusal):
    // a null-identity count fold + DECLARED segment combine (its state
    // domain is a count, not a value) + the null→0 output finalize
    // matching `count` over an empty frame — flox's generic binary_op
    // covers counting scans (flox/aggregations.py:792-846); the
    // integer monoid makes the carry tier exactly the window tier.
    "q_cumcount_dist" -> ((s, d) =>
      graft.api.GlobalScan.groupedCustomScan(withNull(ev(s, d)),
        Seq("user_id"), Seq(col("event_id")), "v", "cnt", "cumcount")
        .select(col("event_id"), col("user_id"), col("cnt"))
        .orderBy("event_id")),

    // the AUTO-DISPATCH surface certified end-to-end cross-engine
    // (r16; previously spec-only): ONE sampled KeyStats pass over the
    // keying drives reduceAuto (exact median — the buffered tier at
    // this scale) and scanAuto (ffill — the window tier), the flox
    // compute-chunk-metadata-once amortization (flox/cache.py:1-12)
    // through the public stats parameter. The oracle is tier-blind by
    // the auto contract: whatever tier dispatch picks, values equal
    // the plain formulations.
    "q_auto_dispatch" -> ((s, d) => {
      val e = withNull(ev(s, d))
      val st = graft.api.Dispatch.keyStats(e, Seq("user_id"))
      val med = graft.api.Dispatch.reduceAuto(e, Seq("user_id"), "value",
        "median", "med", stats = Some(st))
      val filled = graft.api.Dispatch.scanAuto(e, Seq("user_id"), "v",
        "ffill", "event_id", "filled", stats = Some(st))
      filled.join(med, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("filled"),
          r("med", 4).as("med"))
        .orderBy("event_id")
    }),

    // finish scans on the carry tier (r16, closing the r15 refusal):
    // running-fraction-of-total needs the whole-group operand, which
    // the carry tier now computes as a mergeable hash aggregation of
    // the same agg, null-safe-equi-joined back (one row per group —
    // AQE broadcasts it). The fold is an EXACT integer sum (addExact),
    // so run and whole are bit-identical to the window tier and the
    // finishing division is deterministic cross-engine.
    "q_cumfrac_dist" -> ((s, d) => {
      import graft.aggs.CustomScans
      CustomScans.register("cumfrac_i", CustomScans.ScanSpec(
        agg = v => sum(v),
        finish = Some((run, whole) => run.cast("double") / whole),
        fold = Some((st, v) =>
          if (v == null) st
          else if (st == null) v
          else java.lang.Long.valueOf(Math.addExact(
            st.asInstanceOf[Long], v.asInstanceOf[Long]))),
        combine = Some((a, b) =>
          if (a == null) b else if (b == null) a
          else java.lang.Long.valueOf(Math.addExact(
            a.asInstanceOf[Long], b.asInstanceOf[Long])))))
      val e = ev(s, d).withColumn("iv",
        pmod(col("event_id"), lit(997)).cast("long"))
      graft.api.GlobalScan.groupedCustomScan(e, Seq("user_id"),
          Seq(col("event_id")), "iv", "cfrac", "cumfrac_i")
        .select(col("event_id"), col("user_id"),
          r("cfrac", 6).as("cfrac"))
        .orderBy("event_id")
    }),

    // complex-dtype reductions over the struct(re, im) convention
    // (reference surface: NumPy complex reduce, tests/strategies.py:
    // 83-99; r14 verdict missing #4). re takes a deterministic NaN
    // sprinkle so plain-vs-nan* variants split: csum_re propagates
    // NaN, the nan* family skips the whole complex value. re is
    // DYADIC (floor(v·128)/128): exact in double, so cross-engine
    // sums are bit-identical and round() can't land on a boundary
    // (raw doubles hit one at sf0.01 — mean_re 50.6787 vs 50.6788).
    "q_complex_aggs" -> ((s, d) => {
      import graft.aggs.ComplexAggs._
      val z = ev(s, d).withColumn("z", struct(
        when(col("event_id") % 97 === 0, lit(Double.NaN))
          .otherwise(floor(col("value") * 128) / 128).as("re"),
        ((col("event_id") % 7) - 3).cast("double").as("im")))
      z.groupBy("user_id").agg(
          ccount(col("z")).as("n"),
          round(csum(col("z")).getField("re"), 2).as("csum_re"),
          round(nancsum(col("z")).getField("re"), 2).as("sum_re"),
          round(nancsum(col("z")).getField("im"), 2).as("sum_im"),
          round(nancmean(col("z")).getField("re"), 4).as("mean_re"),
          round(nancmean(col("z")).getField("im"), 4).as("mean_im"),
          round(nancvar(col("z"), 1), 4).as("cvar"),
          round(nancstd(col("z"), 2), 4).as("cstd2"),
          cfirst(col("z"), col("event_id")).getField("im").as("first_im"),
          nanclast(col("z"), col("event_id")).getField("re").as("last_re"),
          nancmin(col("z")).getField("re").as("min_re"),
          nancmin(col("z")).getField("im").as("min_im"),
          nancmax(col("z")).getField("re").as("max_re"),
          nancmax(col("z")).getField("im").as("max_im"),
          cargmin(col("z"), col("event_id")).as("argmin_id"),
          cargmax(col("z"), col("event_id")).as("argmax_id"))
        .orderBy("user_id")
    }),

    // §2.5 callable-per-group escape hatch (flox/core.py:363-366):
    // an arbitrary Scala function per group — here sum of the top-3
    // values (order-insensitive, so deterministic under shuffle)
    "q_per_group" -> ((s, d) =>
      GroupByReduce.perGroupDouble(ev(s, d), Seq("user_id"), "value", "top3_sum") {
        it => it.toArray.sorted.takeRight(3).sum
      }.withColumn("top3_sum", r("top3_sum", 2))),

    "q_ffill" -> ((s, d) =>
      GroupByScan(withNull(ev(s, d)), Seq("user_id"), "v", "ffill", "event_id", "filled")
        .select(col("event_id"), col("user_id"), col("filled"))
        .orderBy("event_id")),

    "q_bfill" -> ((s, d) =>
      GroupByScan(withNull(ev(s, d)), Seq("user_id"), "v", "bfill", "event_id", "filled")
        .select(col("event_id"), col("user_id"), col("filled"))
        .orderBy("event_id")),

    // the unbounded-group-size scan tier (GlobalScan.groupedFfill:
    // range partition + boundary-carry stitching — a corpus-spanning
    // group spreads over the cluster instead of one window task);
    // same oracle SQL as q_ffill, certifying tier equivalence
    // cross-engine
    "q_ffill_dist" -> ((s, d) =>
      graft.api.GlobalScan.groupedFfill(withNull(ev(s, d)),
        Seq("user_id"), Seq(col("event_id")), "v", "filled")
        .select(col("event_id"), col("user_id"), col("filled"))
        .orderBy("event_id")),

    // bfill mate of q_ffill_dist: the same boundary-carry machinery
    // over the reversed order (the reversal duality PropertySpec pins
    // for the window tier, applied at the partitioning level)
    "q_bfill_dist" -> ((s, d) =>
      graft.api.GlobalScan.groupedBfill(withNull(ev(s, d)),
        Seq("user_id"), Seq(col("event_id")), "v", "filled")
        .select(col("event_id"), col("user_id"), col("filled"))
        .orderBy("event_id")),

    // distributed cumsum (GlobalScan.groupedPrefixSum) certified
    // cross-engine on a LONG value — integer addition is associative
    // bit-for-bit, so the boundary-carry tier is exact where a float
    // cumsum's summation order would diverge; null = 0 (leading-null
    // runs emit 0, hence the coalesce on the oracle side)
    "q_cumsum_dist" -> ((s, d) => {
      val e = ev(s, d).withColumn("iv",
        when(pmod(col("event_id"), lit(7)) =!= 0,
          pmod(col("event_id"), lit(1000))))
      graft.api.GlobalScan.groupedPrefixSum(e, Seq("user_id"),
        Seq(col("event_id")), col("iv"), "csum")
        .select(col("event_id"), col("user_id"), col("csum"))
        .orderBy("event_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_count" ->
      "SELECT l_returnflag, count(l_quantity) AS n_vals FROM lineitem GROUP BY 1 ORDER BY 1",

    "q_nunique" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_partitioned_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
         round(avg(l_quantity), 4) AS avg_qty,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_bucketed_agg" ->
      """SELECT o_orderpriority, round(sum(l_quantity), 2) AS sum_qty,
         count(*)::BIGINT AS n_items, max(l_extendedprice) AS max_price
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",

    "q_sum" ->
      "SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty FROM lineitem GROUP BY 1 ORDER BY 1",

    "q_mean" ->
      "SELECT l_returnflag, round(avg(l_quantity), 4) AS avg_qty FROM lineitem GROUP BY 1 ORDER BY 1",

    "q_min_max" ->
      """SELECT l_returnflag, min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_var_std" ->
      """SELECT l_returnflag, round(var_samp(l_quantity), 4) AS var1,
         round(stddev_samp(l_quantity), 4) AS std1
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_var_pop" ->
      "SELECT l_returnflag, round(var_pop(l_quantity), 4) AS var0 FROM lineitem GROUP BY 1 ORDER BY 1",

    "q_var_ddof2" ->
      """SELECT l_orderkey,
         round(CASE WHEN count(l_quantity) > 2
           THEN var_pop(l_quantity) * count(l_quantity) / (count(l_quantity) - 2)
           WHEN count(l_quantity) = 2 AND var_pop(l_quantity) > 0
           THEN 'Infinity'::DOUBLE
           ELSE 'NaN'::DOUBLE END, 4) AS var2
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_prod" ->
      """SELECT l_orderkey, round(product(1.0 + l_discount), 6) AS prod_disc
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // wvar/wstd mirror: var_pop over the unnest-EXPANDED multiset
    // (integer frequency weights), DuckDB's own STABLE central-moment
    // accumulation — an INDEPENDENT stable implementation, never the
    // raw-moment Σwv²/Σw − mean² tree the Spark side abandoned in r16
    // (certifying the unstable tree against itself was the complex-var
    // lesson); wn/wsum/wmean stay exact sums.
    "q_weighted" ->
      s"""WITH p AS (SELECT user_id,
             CASE WHEN NOT isnan(v) THEN v END AS v,
             CASE WHEN NOT isnan(v) THEN (event_id % 7 + 1)::DOUBLE END AS w
           FROM ($sqlNan)),
         x AS (SELECT user_id, v FROM (
           SELECT user_id, v, unnest(range(1, w::BIGINT + 1)) FROM p
           WHERE v IS NOT NULL))
         SELECT p.user_id, sum(p.w) AS wn,
           round(sum(p.v*p.w), 2) AS wsum,
           round(sum(p.v*p.w) / sum(p.w), 4) AS wmean,
           round(any_value(e.wv), 2) AS wvar,
           round(sqrt(any_value(e.wv)), 4) AS wstd
         FROM p LEFT JOIN
           (SELECT user_id, var_pop(v) AS wv FROM x GROUP BY 1) e
           USING (user_id)
         GROUP BY 1 ORDER BY 1""",

    "q_skew_kurt" ->
      """SELECT user_id,
         floor((m3 / pow(m2, 1.5)) * 10000 + 0.5) / 10000 AS skw,
         floor((m4 / (m2 * m2) - 3) * 10000 + 0.5) / 10000 AS krt
         FROM (SELECT user_id,
           avg(value*value) - avg(value)*avg(value) AS m2,
           avg(value*value*value) - 3*avg(value)*avg(value*value)
             + 2*pow(avg(value), 3) AS m3,
           avg(value*value*value*value) - 4*avg(value)*avg(value*value*value)
             + 6*avg(value)*avg(value)*avg(value*value)
             - 3*pow(avg(value), 4) AS m4
           FROM events GROUP BY 1)
         ORDER BY user_id""",

    "q_corr" ->
      """SELECT l_returnflag,
         round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_s,
         round(covar_pop(l_quantity, l_extendedprice), 4) AS cov_p,
         round(corr(l_quantity, l_extendedprice), 6) AS r_qp
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_any_all" ->
      """SELECT l_returnflag, bool_or(l_quantity > 25) AS any_big,
         bool_and(l_quantity > 25) AS all_big
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_median" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_quantile" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_quantile_dist" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_quantile_multi" ->
      """SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
         round(quantile_cont(l_extendedprice, 0.5), 4) AS q50,
         round(quantile_cont(l_extendedprice, 0.75), 4) AS q75
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "q_mode" ->
      """SELECT l_returnflag, min(l_quantity) AS mode_qty FROM (
           SELECT l_returnflag, l_quantity, count(*) AS c FROM lineitem GROUP BY 1, 2
           QUALIFY c = max(c) OVER (PARTITION BY l_returnflag)
         ) GROUP BY 1 ORDER BY 1""",

    // percentile_approx in its exact regime (n << accuracy) returns the
    // element at rank ceil(q*n) — DuckDB's quantile_disc, verified
    // element-for-element across all groups and q in {.25,.5,.9,.99}
    "q_quantile_approx" ->
      """SELECT user_id, quantile_disc(value, 0.9) AS p90a,
         quantile_disc(value, 0.5) AS meda
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_nanquantile_approx" ->
      s"""SELECT user_id,
         quantile_disc(CASE WHEN NOT isnan(v) THEN v END, 0.25) AS nq25,
         quantile_disc(CASE WHEN NOT isnan(v) THEN v END, 0.9) AS nq90,
         quantile_disc(CASE WHEN NOT isnan(v) THEN v END, 0.5) AS nmeda
         FROM ($sqlNan) GROUP BY user_id ORDER BY user_id""",

    "q_custom_agg_typed" ->
      """SELECT user_id,
         round(CASE WHEN count(value) > 2
           THEN var_pop(value) * count(value) / (count(value) - 2) END, 4) AS var2
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_bins_expected" ->
      """SELECT d.bin, d.bin_label, coalesce(a.n, 0) AS n,
         round(coalesce(a.sum_price, 0), 2) AS sum_price
         FROM (VALUES (0, '(1.0, 10.0]'), (1, '(10.0, 25.0]'),
                      (2, '(25.0, 25.5]'), (3, '(25.5, 40.0]'),
                      (4, '(40.0, 50.0]')) d(bin, bin_label)
         LEFT JOIN (
           SELECT CASE WHEN l_quantity > 1    AND l_quantity <= 10   THEN 0
                       WHEN l_quantity > 10   AND l_quantity <= 25   THEN 1
                       WHEN l_quantity > 25   AND l_quantity <= 25.5 THEN 2
                       WHEN l_quantity > 25.5 AND l_quantity <= 40   THEN 3
                       WHEN l_quantity > 40   AND l_quantity <= 50   THEN 4 END AS bin,
                  count(l_extendedprice) AS n, sum(l_extendedprice) AS sum_price
           FROM lineitem GROUP BY 1) a USING (bin)
         ORDER BY 1""",

    "q_duration_aggs" ->
      """WITH g AS (SELECT user_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dur_us
           FROM events)
         SELECT user_id, sum(dur_us)::BIGINT AS dsum,
           floor(avg(dur_us))::BIGINT AS dmean,
           floor(quantile_cont(dur_us, 0.5))::BIGINT AS dmed,
           min(dur_us) AS dmin, max(dur_us) AS dmax
         FROM g GROUP BY 1 ORDER BY 1""",

    "q_multikey" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
         round(avg(l_extendedprice), 4) AS avg_price, count(l_quantity) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_partial_axis" ->
      """SELECT user_id, event_type,
         floor(avg(value) * 10000 + 0.5) / 10000 AS vmean,
         count(value) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_first_last_arg" ->
      """SELECT user_id, arg_min(value, event_id) AS first_val,
         arg_max(value, event_id) AS last_val,
         min(CASE WHEN value = mn THEN event_id END) AS argmin_id,
         min(CASE WHEN value = mx THEN event_id END) AS argmax_id
         FROM (SELECT *, min(value) OVER (PARTITION BY user_id) AS mn,
                      max(value) OVER (PARTITION BY user_id) AS mx FROM events) t
         GROUP BY user_id ORDER BY user_id""",

    "q_nan_aggs" ->
      s"""SELECT user_id, count(CASE WHEN NOT isnan(v) THEN v END) AS n_valid,
         round(coalesce(sum(CASE WHEN NOT isnan(v) THEN v END), 0.0)
           / 1000000.0, 2) AS nsum,
         round(avg(CASE WHEN NOT isnan(v) THEN v END) / 1000000.0, 4) AS nmean,
         round(min(CASE WHEN NOT isnan(v) THEN v END) / 1000000.0, 6) AS nmin,
         round(max(CASE WHEN NOT isnan(v) THEN v END) / 1000000.0, 6) AS nmax,
         CASE WHEN NOT isnan(sum(v))
           THEN round(sum(v) / 1000000.0, 2) END AS sum_prop
         FROM (SELECT * EXCLUDE (v), floor(v * 1000000 + 0.5) AS v
               FROM ($sqlNan)) GROUP BY user_id ORDER BY user_id""",

    "q_nan_aggs_int" ->
      """SELECT l_orderkey,
         CAST(coalesce(sum(x), 0) AS BIGINT) AS nsum,
         CAST(coalesce(product(x), 1) AS BIGINT) AS nprod
         FROM (SELECT l_orderkey,
                 CASE WHEN l_partkey % 2 = 0 THEN NULL ELSE l_linenumber END AS x
               FROM lineitem) GROUP BY 1 ORDER BY 1""",

    // Grouped over ALL user_ids (LEFT JOIN back to the distinct-key
    // set), not just those with a valid (v, w) pair: a group whose
    // every value is NaN must still emit a row with NULL quantiles,
    // matching GroupByReduce.weighted (the other weighted-agg oracles'
    // convention).
    "q_weighted_quantile" ->
      s"""WITH e AS (SELECT user_id, v FROM
           (SELECT user_id, v, unnest(generate_series(1, w))
            FROM (SELECT user_id,
                    CASE WHEN NOT isnan(v) THEN v END AS v,
                    CASE WHEN NOT isnan(v) THEN event_id % 7 + 1 END AS w
                  FROM ($sqlNan))
            WHERE v IS NOT NULL AND w >= 1)),
         u AS (SELECT DISTINCT user_id FROM ($sqlNan))
         SELECT u.user_id,
           round(quantile_cont(e.v, 0.5), 4) AS wmed,
           round(quantile_cont(e.v, 0.25), 4) AS wq25,
           round(quantile_cont(e.v, 0.75), 4) AS wq75
         FROM u LEFT JOIN e USING (user_id)
         GROUP BY 1 ORDER BY 1""",

    "q_weighted_quantile_dist" ->
      s"""WITH e AS (SELECT user_id, v FROM
           (SELECT user_id, v, unnest(generate_series(1, w))
            FROM (SELECT user_id,
                    CASE WHEN NOT isnan(v) THEN v END AS v,
                    CASE WHEN NOT isnan(v) THEN event_id % 7 + 1 END AS w
                  FROM ($sqlNan))
            WHERE v IS NOT NULL AND w >= 1)),
         u AS (SELECT DISTINCT user_id FROM ($sqlNan))
         SELECT u.user_id,
           round(quantile_cont(e.v, 0.25), 4) AS wq25,
           round(quantile_cont(e.v, 0.75), 4) AS wq75
         FROM u LEFT JOIN e USING (user_id)
         GROUP BY 1 ORDER BY 1""",

    "q_nanvar_std" ->
      s"""SELECT user_id,
         round(CASE WHEN count(x) > 1 THEN var_samp(x) ELSE 'NaN'::DOUBLE END, 4) AS nvar,
         round(CASE WHEN count(x) > 1 THEN stddev_samp(x) ELSE 'NaN'::DOUBLE END, 4) AS nstd
         FROM (SELECT user_id, CASE WHEN NOT isnan(v) THEN v END AS x FROM ($sqlNan))
         GROUP BY user_id ORDER BY user_id""",

    "q_nan_order" ->
      s"""SELECT user_id, arg_min(v, event_id) AS nfirst, arg_max(v, event_id) AS nlast,
         min(CASE WHEN v = mn THEN event_id END) AS nargmin,
         min(CASE WHEN v = mx THEN event_id END) AS nargmax
         FROM (SELECT *, min(v) OVER (PARTITION BY user_id) AS mn,
                      max(v) OVER (PARTITION BY user_id) AS mx
               FROM ($sqlNan) WHERE NOT isnan(v)) t
         GROUP BY user_id ORDER BY user_id""",

    "q_nan_bool" ->
      s"""SELECT user_id,
         bool_or(CASE WHEN isnan(x) THEN TRUE ELSE x <> 0 END) AS pany,
         bool_and(CASE WHEN isnan(x) THEN TRUE ELSE x <> 0 END) AS pall,
         bool_or(CASE WHEN NOT isnan(x) THEN x <> 0 END) AS nany,
         bool_and(CASE WHEN NOT isnan(x) THEN x <> 0 END) AS nall
         FROM (SELECT user_id,
           CASE WHEN isnan(v) THEN v WHEN v > 250 THEN 1.0 ELSE 0.0 END AS x
           FROM ($sqlNan))
         GROUP BY user_id ORDER BY user_id""",

    "q_nanprod" ->
      s"""SELECT user_id,
         round(product(CASE WHEN NOT isnan(v) THEN 1.0 + v / 10000 END), 6) AS nprod
         FROM ($sqlNan) GROUP BY user_id ORDER BY user_id""",

    "q_nan_quantiles" ->
      s"""SELECT user_id,
         round(quantile_cont(CASE WHEN NOT isnan(v) THEN v END, 0.5), 4) AS nmed,
         round(quantile_cont(CASE WHEN NOT isnan(v) THEN v END, 0.9), 4) AS np90
         FROM ($sqlNan) GROUP BY user_id ORDER BY user_id""",

    "q_nanquantile_allnan" ->
      """SELECT g,
         round(CASE WHEN count(CASE WHEN v2 IS NOT NULL AND NOT isnan(v2)
                                    THEN 1 END) = 0
                     AND count(v2) > 0 THEN 'NaN'::DOUBLE
               ELSE quantile_cont(CASE WHEN NOT isnan(v2) THEN v2 END, 0.5)
               END, 4) AS nq
         FROM (SELECT user_id % 5 AS g,
                      CASE WHEN user_id % 5 = 0 THEN 'NaN'::DOUBLE
                           WHEN user_id % 5 = 1 THEN NULL
                           ELSE value END AS v2
               FROM events) GROUP BY g ORDER BY g""",

    "q_nanmode" ->
      s"""SELECT user_id, min(fv) AS nmode FROM (
           SELECT user_id, floor(v / 50)::BIGINT AS fv, count(*) AS c
           FROM ($sqlNan) WHERE NOT isnan(v) GROUP BY 1, 2
           QUALIFY c = max(c) OVER (PARTITION BY user_id)
         ) GROUP BY 1 ORDER BY 1""",

    "q_custom_agg" ->
      """SELECT user_id,
         sum(floor(value * value * 100 + 0.5)) / 100.0 AS ss
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_bins" ->
      """SELECT bin, bin_label, round(sum(l_extendedprice), 2) AS sum_price,
         count(l_extendedprice) AS n
         FROM (SELECT *,
           CASE WHEN l_quantity > 1  AND l_quantity <= 10 THEN 0
                WHEN l_quantity > 10 AND l_quantity <= 25 THEN 1
                WHEN l_quantity > 25 AND l_quantity <= 40 THEN 2
                WHEN l_quantity > 40 AND l_quantity <= 50 THEN 3 END AS bin,
           CASE WHEN l_quantity > 1  AND l_quantity <= 10 THEN '(1.0, 10.0]'
                WHEN l_quantity > 10 AND l_quantity <= 25 THEN '(10.0, 25.0]'
                WHEN l_quantity > 25 AND l_quantity <= 40 THEN '(25.0, 40.0]'
                WHEN l_quantity > 40 AND l_quantity <= 50 THEN '(40.0, 50.0]' END AS bin_label
           FROM lineitem) WHERE bin IS NOT NULL GROUP BY 1, 2 ORDER BY 1""",

    "q_datetime_aggs" ->
      """SELECT o_orderpriority, min(o_orderdate) AS dmin, max(o_orderdate) AS dmax,
         arg_min(o_orderdate, o_orderkey) AS dfirst,
         arg_max(o_orderdate, o_orderkey) AS dlast,
         make_timestamp(floor(avg(epoch_us(o_orderdate)))::BIGINT) AS dmean,
         make_timestamp(floor(quantile_cont(epoch_us(o_orderdate), 0.5))::BIGINT) AS dmed
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_datetime_bins" ->
      """SELECT bin, bin_label, round(sum(l_extendedprice), 2) AS sum_price,
         count(l_extendedprice) AS n
         FROM (SELECT *,
           CASE WHEN l_shipdate > TIMESTAMP '1995-01-01' AND l_shipdate <= TIMESTAMP '1997-01-01' THEN 0
                WHEN l_shipdate > TIMESTAMP '1997-01-01' AND l_shipdate <= TIMESTAMP '1999-01-01' THEN 1
                WHEN l_shipdate > TIMESTAMP '1999-01-01' AND l_shipdate <= TIMESTAMP '2001-01-01' THEN 2
                WHEN l_shipdate > TIMESTAMP '2001-01-01' AND l_shipdate <= TIMESTAMP '2003-01-01' THEN 3 END AS bin,
           CASE WHEN l_shipdate > TIMESTAMP '1995-01-01' AND l_shipdate <= TIMESTAMP '1997-01-01' THEN '(1995-01-01, 1997-01-01]'
                WHEN l_shipdate > TIMESTAMP '1997-01-01' AND l_shipdate <= TIMESTAMP '1999-01-01' THEN '(1997-01-01, 1999-01-01]'
                WHEN l_shipdate > TIMESTAMP '1999-01-01' AND l_shipdate <= TIMESTAMP '2001-01-01' THEN '(1999-01-01, 2001-01-01]'
                WHEN l_shipdate > TIMESTAMP '2001-01-01' AND l_shipdate <= TIMESTAMP '2003-01-01' THEN '(2001-01-01, 2003-01-01]' END AS bin_label
           FROM lineitem) WHERE bin IS NOT NULL GROUP BY 1, 2 ORDER BY 1""",

    "q_datetime_bins_expected" ->
      """SELECT d.bin, d.bin_label, coalesce(a.n, 0) AS n,
         round(coalesce(a.sum_price, 0), 2) AS sum_price
         FROM (VALUES (0, '(1992-01-01, 1994-01-01]'),
                      (1, '(1994-01-01, 1996-01-01]'),
                      (2, '(1996-01-01, 1998-01-01]'),
                      (3, '(1998-01-01, 2000-01-01]'),
                      (4, '(2000-01-01, 2002-01-01]')) d(bin, bin_label)
         LEFT JOIN (
           SELECT CASE WHEN o_orderdate > TIMESTAMP '1992-01-01' AND o_orderdate <= TIMESTAMP '1994-01-01' THEN 0
                       WHEN o_orderdate > TIMESTAMP '1994-01-01' AND o_orderdate <= TIMESTAMP '1996-01-01' THEN 1
                       WHEN o_orderdate > TIMESTAMP '1996-01-01' AND o_orderdate <= TIMESTAMP '1998-01-01' THEN 2
                       WHEN o_orderdate > TIMESTAMP '1998-01-01' AND o_orderdate <= TIMESTAMP '2000-01-01' THEN 3
                       WHEN o_orderdate > TIMESTAMP '2000-01-01' AND o_orderdate <= TIMESTAMP '2002-01-01' THEN 4 END AS bin,
                  count(o_totalprice) AS n, sum(o_totalprice) AS sum_price
           FROM orders GROUP BY 1) a USING (bin)
         ORDER BY 1""",

    "q_bins_uniform" ->
      """SELECT bin, round(sum(l_extendedprice), 2) AS sum_price,
         count(l_extendedprice) AS n
         FROM (SELECT *, CASE WHEN l_quantity > 0 AND l_quantity <= 50
           THEN least(greatest(ceil((l_quantity - 0) / 10.0)::INT - 1, 0), 4)
           END AS bin FROM lineitem)
         WHERE bin IS NOT NULL GROUP BY 1 ORDER BY 1""",

    "q_string_aggs" ->
      """SELECT o_orderpriority, count(o_orderstatus) AS n,
         arg_min(o_orderstatus, o_orderkey) AS sfirst,
         arg_max(o_orderstatus, o_orderkey) AS slast,
         min(o_orderstatus) AS smin, max(o_orderstatus) AS smax
         FROM orders GROUP BY 1 ORDER BY 1""",

    "q_resample" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         round(avg(value), 4) AS vmean, count(value) AS n, max(value) AS vmax
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_bool_aggs" ->
      """SELECT user_id, sum(CASE WHEN value > 250 THEN 1 ELSE 0 END)::BIGINT AS n_true,
         round(avg(CASE WHEN value > 250 THEN 1 ELSE 0 END), 4) AS frac_true,
         min(value > 250) AS bmin, max(value > 250) AS bmax,
         bool_or(value > 250) AS bany, bool_and(value > 250) AS ball
         FROM events GROUP BY 1 ORDER BY 1""",

    "q_expected_fill" ->
      """SELECT d.o_orderpriority, coalesce(a.n, 0) AS n
         FROM (VALUES ('0-MISSING'), ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'),
                      ('4-NOT SPECIFIED'), ('5-LOW')) d(o_orderpriority)
         LEFT JOIN (SELECT o_orderpriority, count(o_totalprice) AS n
                    FROM orders GROUP BY 1) a USING (o_orderpriority)
         ORDER BY 1""",

    "q_dense_grid" ->
      """SELECT f.l_returnflag, s.l_linestatus, coalesce(a.n, 0) AS n
         FROM (VALUES ('A'), ('N'), ('R'), ('X')) f(l_returnflag)
         CROSS JOIN (VALUES ('F'), ('O')) s(l_linestatus)
         LEFT JOIN (SELECT l_returnflag, l_linestatus, count(l_quantity) AS n
                    FROM lineitem GROUP BY 1, 2) a
         USING (l_returnflag, l_linestatus)
         ORDER BY 1, 2""",

    // min_count masks EVERY requested reduction, count included
    // (flox/core.py:426-459 applies the mask to all results)
    "q_min_count" ->
      s"""SELECT user_id, CASE WHEN count(v) >= 62 THEN count(v) END AS n_valid,
         CASE WHEN count(v) >= 62 THEN round(coalesce(sum(v), 0.0), 2) END AS masked_sum
         FROM ($sqlNull) GROUP BY user_id ORDER BY user_id""",

    "q_cumsum" ->
      """SELECT event_id, user_id,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS csum
         FROM events ORDER BY event_id""",

    "q_nancumsum" ->
      s"""SELECT event_id, user_id,
         round(coalesce(sum(CASE WHEN NOT isnan(v) THEN v END)
           OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 4) AS ncsum
         FROM ($sqlNan) ORDER BY event_id""",

    "q_cum_extrema" ->
      s"""SELECT event_id, user_id,
         max(v) OVER w AS cmax,
         CASE WHEN bool_or(isnan(v)) OVER w THEN 'NaN'::DOUBLE
              ELSE min(v) OVER w END AS cmin,
         max(CASE WHEN NOT isnan(v) THEN v END) OVER w AS ncmax,
         min(CASE WHEN NOT isnan(v) THEN v END) OVER w AS ncmin
         FROM ($sqlNan)
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_cum_extrema_dist" ->
      s"""SELECT event_id, user_id,
         max(v) OVER w AS cmax,
         CASE WHEN bool_or(isnan(v)) OVER w THEN 'NaN'::DOUBLE
              ELSE min(v) OVER w END AS cmin
         FROM ($sqlNan)
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_topk" ->
      """SELECT user_id, rk, v FROM (
           SELECT user_id, value AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rk
           FROM events)
         WHERE rk <= 5 ORDER BY user_id, rk""",

    "q_custom_scan" ->
      """SELECT event_id, user_id,
         max(value) OVER w AS cmax,
         round((sum(value) OVER w) / (sum(value) OVER (PARTITION BY user_id)), 6) AS cfrac
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_custom_scan_dist" ->
      """SELECT event_id, user_id, value,
         max(value) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cmax
         FROM events ORDER BY event_id""",

    "q_auto_dispatch" ->
      s"""SELECT event_id, user_id,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
         round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id), 4)
           AS med
         FROM ($sqlNull) ORDER BY event_id""",

    "q_cumcount_dist" ->
      s"""SELECT event_id, user_id,
         count(v) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt
         FROM ($sqlNull) ORDER BY event_id""",

    "q_cumfrac_dist" ->
      """SELECT event_id, user_id,
         round(((sum(iv) OVER w)::DOUBLE) /
               ((sum(iv) OVER (PARTITION BY user_id))::DOUBLE), 6) AS cfrac
         FROM (SELECT *, (event_id % 997)::BIGINT AS iv FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_complex_aggs" ->
      """WITH z AS (
           SELECT user_id, event_id,
             CASE WHEN event_id % 97 = 0 THEN 'NaN'::DOUBLE
                  ELSE floor(value * 128) / 128 END AS re,
             ((event_id % 7) - 3)::DOUBLE AS im
           FROM events),
         a AS (
           SELECT user_id,
             count(*) FILTER (WHERE NOT (isnan(re) OR isnan(im)))::BIGINT AS n,
             sum(re) AS sraw,
             sum(re) FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS sre,
             sum(im) FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS sim,
             var_pop(re)
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS vpr,
             var_pop(im)
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS vpi,
             min_by(im, event_id) AS first_im,
             max_by(re, event_id)
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS last_re,
             min({'re': re, 'im': im})
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS mn,
             max({'re': re, 'im': im})
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS mx,
             min({'re': re, 'im': im, 'o': event_id})
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS amn,
             max({'re': re, 'im': im, 'no': -event_id})
               FILTER (WHERE NOT (isnan(re) OR isnan(im))) AS amx
           FROM z GROUP BY 1)
         SELECT user_id, n,
           round(sraw, 2) AS csum_re,
           round(coalesce(sre, 0), 2) AS sum_re,
           round(coalesce(sim, 0), 2) AS sum_im,
           CASE WHEN n > 0 THEN round(sre / n, 4) END AS mean_re,
           CASE WHEN n > 0 THEN round(sim / n, 4) END AS mean_im,
           CASE WHEN n > 1 THEN
             round(n * (vpr + vpi) / (n - 1), 4)
           END AS cvar,
           CASE WHEN n > 2 THEN
             round(sqrt(n * (vpr + vpi) / (n - 2)), 4)
           END AS cstd2,
           first_im, last_re,
           (mn).re AS min_re, (mn).im AS min_im,
           (mx).re AS max_re, (mx).im AS max_im,
           (amn).o AS argmin_id, -((amx).no) AS argmax_id
         FROM a ORDER BY 1""",

    "q_per_group" ->
      """SELECT user_id, round(sum(value), 2) AS top3_sum FROM (
           SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rk
           FROM events)
         WHERE rk <= 3 GROUP BY 1 ORDER BY 1""",

    "q_ffill" ->
      s"""SELECT event_id, user_id,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM ($sqlNull) ORDER BY event_id""",

    "q_ffill_dist" ->
      s"""SELECT event_id, user_id,
         last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         FROM ($sqlNull) ORDER BY event_id""",

    "q_bfill" ->
      s"""SELECT event_id, user_id,
         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS filled
         FROM ($sqlNull) ORDER BY event_id""",

    "q_bfill_dist" ->
      s"""SELECT event_id, user_id,
         first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS filled
         FROM ($sqlNull) ORDER BY event_id""",

    "q_cumsum_dist" ->
      """SELECT event_id, user_id,
         coalesce(CAST(sum(CASE WHEN event_id % 7 <> 0 THEN event_id % 1000 END)
           OVER (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS csum
         FROM events ORDER BY event_id""")
}
