package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators Spark lacks as built-ins, composed from
  * keyed windows so they keep Catalyst's planning (per the
  * compose-first custom-operator policy): as-of join and gap
  * sessionization. Both run as ONE hash Exchange on the key plus an
  * in-partition sort — the scale shape for billions of events across
  * millions of keys, with no range-condition join (which Spark would
  * plan as a broadcast-nested-loop or an exploding theta join).
  */
object Events {

  /** As-of join: for every left row, the payload of the LATEST right
    * row with the same key and `rightTs <= leftTs` (backward-inclusive,
    * DuckDB/pandas `ASOF JOIN` semantics); null payload when no right
    * row precedes. `direction` extends to pandas merge_asof parity:
    * "forward" matches the EARLIEST right row with `rightTs >= leftTs`,
    * "nearest" the right row with the smallest |rightTs - leftTs|
    * (ties -> the backward match; requires a numeric ts column).
    *
    * Plan: tag + union the two inputs, one window per key ordered by
    * (ts, tag) — right rows sort before left rows at equal ts, so
    * `last(payload, ignoreNulls)` over the running frame IS the as-of
    * match, carried to each left row in a single pass (forward = the
    * mirrored frame in the SAME window pass; nearest = both carries +
    * one comparison). One shuffle on the key; neither side is
    * broadcast, neither side range-joins. Right rows should be unique
    * per (key, ts) — pre-aggregate ties upstream or the carried match
    * is tie-ambiguous (same contract as DuckDB ASOF JOIN).
    *
    * Left rows with null `leftTs` sort first and match nothing
    * backward, by design.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               prefix: String = "asof_",
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(payload.nonEmpty, "payload must be non-empty")
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown direction '$direction'")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"),
        struct(col(rightTs).as("__rts") +: payload.map(col): _*).as("__p"),
        lit(0).as("__tag")): _*)
    val l2 = left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
    // at equal ts the right row must be VISIBLE to the left row in both
    // directions: tag asc puts right first for the trailing frame; the
    // leading frame starts at currentRow, and rows_between frames are
    // ROW-based, so the equal-ts right row (sorted just before) needs
    // tag desc for forward — run forward as last() over a REVERSED
    // mirror ordering instead, expressed as first() with tag desc
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdOrd = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").desc)
    val fwd = fwdOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    // pandas merge_asof `tolerance`: a candidate only counts when its
    // ts distance is within the bound. Nulling the carried candidate
    // POST-window is exactly candidate-level filtering: backward's
    // carry is the unique latest-at-or-before row (too old -> no other
    // candidate exists), mirrored for forward; nearest filters each
    // side before the distance choice.
    def tolOk(m: Column, backSide: Boolean): Column = tolerance match {
      case None => m
      case Some(t) =>
        val d = if (backSide) col("__ts") - m.getField("__rts")
                else m.getField("__rts") - col("__ts")
        when(d <= t, m)
    }
    val matched = direction match {
      case "backward" =>
        unioned.withColumn("__m",
          tolOk(last(col("__p"), ignoreNulls = true).over(back), backSide = true))
      case "forward" =>
        unioned.withColumn("__m",
          tolOk(first(col("__p"), ignoreNulls = true).over(fwd), backSide = false))
      case "nearest" =>
        unioned
          .withColumn("__mb",
            tolOk(last(col("__p"), ignoreNulls = true).over(back), backSide = true))
          .withColumn("__mf",
            tolOk(first(col("__p"), ignoreNulls = true).over(fwd), backSide = false))
          .withColumn("__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when(col("__ts") - col("__mb.__rts") <=
                col("__mf.__rts") - col("__ts"), col("__mb"))
              .otherwise(col("__mf")))
    }
    matched
      .filter(col("__tag") === 1)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__m.$p").as(prefix + p)): _*)
  }

  /** Trailing range-frame rolling aggregate per key: for every row, the
    * count/sum/mean of `valueCol` over rows of the same key with
    * `tsCol` in `[ts - span, ts]` (RANGE frame, so timestamp peers are
    * included identically in any engine — no tie ambiguity). One hash
    * Exchange on the key + one in-partition sort. `valueCol` should be
    * integral: the windowed sum is then exact and order-independent
    * (a float sum would hash differently per frame-evaluation order —
    * DuckDB computes window sums over a segment tree, Spark
    * sequentially); the mean is one final IEEE division.
    */
  def rollingAgg(df: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String, span: Long): DataFrame = {
    require(span >= 0, "span must be >= 0")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol).asc)
      .rangeBetween(-span, 0)
    df.withColumn("roll_n", count(col(valueCol)).over(w))
      .withColumn("roll_sum", sum(col(valueCol)).over(w))
      .withColumn("roll_mean",
        col("roll_sum").cast("double") / col("roll_n"))
  }

  /** [[rollingAgg]] for the DOUBLE-DIGIT-fraction hot-key regime — the
    * escalation path the r13 skew probe left documented. The plain
    * operator's one Exchange partitions by key alone, so a key holding
    * 30% of a 100 TB corpus sorts 30 TB on one task. This variant
    * decomposes the trailing range frame by span-width TIME BLOCKS
    * (`b = floor(ts/span)`): a row's window `[ts-span, ts]` provably
    * spans at most its own block and the previous one (the cut
    * `ts-span` always lands in block b-1), so
    *
    *   result = prefix-in-own-block ⊕ suffix-of-previous-block-at-cut
    *
    * Term 1 is a RANGE window over partition (key, block). Term 2
    * plants one tagged cut row per DISTINCT (key, ts) into partition
    * (key, block(ts-span)) and reads "aggregate of data rows with
    * ts >= cut" off ONE descending RANGE window (cut rows carry null
    * values, so they never contaminate the aggregate; RANGE peers make
    * ties at the cut inclusive, matching the plain frame's closed
    * lower bound). The terms recombine with a null-safe add keyed on
    * (key, ts). Every partition is bounded by the hot key's rows per
    * span of TIME, not its corpus share — a key must concentrate its
    * entire volume inside one span window before any task sees it all,
    * and then the plain frame would buffer the same rows. Cost: ~5
    * exchanges vs the plain operator's 1, all keyed by (key, block) or
    * (key, ts) — the price of skew immunity; use [[rollingAgg]] below
    * double-digit key concentration. Output is bit-identical
    * (EventsSpec law) for integral `tsCol`/`valueCol`; null `tsCol`
    * rows are undefined in both variants (the range frame itself has
    * no null-ts contract). */
  def rollingAggSkewed(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, span: Long): DataFrame = {
    require(span >= 1, "span must be >= 1 (rollingAgg covers span=0)")
    def idiv(a: Column, b: Long): Column = call_function("div", a, lit(b))
    def floorDiv(x: Column): Column = {
      val xl = x.cast("long")
      when(xl >= 0, idiv(xl, span)).otherwise(-idiv(-xl + (span - 1), span))
    }
    val vType = df.schema(valueCol).dataType
    val tType = df.schema(tsCol).dataType
    // term 1: same-block prefix, partition (key, block)
    val w1 = Window.partitionBy(col(keyCol), floorDiv(col(tsCol)))
      .orderBy(col(tsCol).asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val t1 = df.withColumn("__n1", count(col(valueCol)).over(w1))
      .withColumn("__s1", sum(col(valueCol)).over(w1))
    // term 2: previous-block suffix at the cut, one row per distinct
    // (key, ts); data rows tag 0 under their own block, cut rows tag 1
    // under block(ts-span) carrying the original ts for the join back
    val data = df.select(col(keyCol).as("__k"),
      floorDiv(col(tsCol)).as("__b"), col(tsCol).as("__t"),
      col(valueCol).as("__v"), lit(null).cast(tType).as("__qts"))
    val cuts = df.select(col(keyCol), col(tsCol)).distinct()
      .select(col(keyCol).as("__k"),
        floorDiv(col(tsCol) - span).as("__b"),
        (col(tsCol) - span).as("__t"),
        lit(null).cast(vType).as("__v"), col(tsCol).as("__qts"))
    val w2 = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val t2 = data.unionByName(cuts)
      .withColumn("__n2", count(col("__v")).over(w2))
      .withColumn("__s2", sum(col("__v")).over(w2))
      .filter(col("__qts").isNotNull)
      .select(col("__k"), col("__qts"), col("__n2"), col("__s2"))
    t1.join(t2, t1(keyCol) <=> t2("__k") && t1(tsCol) === t2("__qts"))
      .withColumn("roll_n", col("__n1") + col("__n2"))
      .withColumn("roll_sum",
        coalesce(col("__s1") + col("__s2"), col("__s1"), col("__s2")))
      .withColumn("roll_mean",
        col("roll_sum").cast("double") / col("roll_n"))
      .drop("__n1", "__s1", "__k", "__qts", "__n2", "__s2")
  }

  /** Interval (range) join WITHOUT an equi-key requirement: every left
    * row is paired with the right rows whose `rightTs` falls in
    * `[leftTs + lower, leftTs + upper]` (inclusive ends, same integer
    * units as the ts columns), optionally also matching on equi `keys`.
    *
    * Spark plans a bare range predicate as a broadcast-nested-loop or
    * cartesian join — O(|L|·|R|) at any scale. This is the bucketed
    * form: both sides are assigned time buckets of width
    * `max(upper - lower, 1)`; a left row's window spans at most two
    * consecutive buckets (window length == bucket width), so the left
    * side explodes ≤2× into (bucket) rows, the join becomes an
    * EQUI-join on (keys…, bucket), and the exact range predicate
    * filters the candidates. Each matching pair meets exactly once
    * (the right row's bucket is unique), so no dedup step. Shuffle is
    * keyed by time bucket (+ keys): uniform event streams spread
    * evenly; a pathological hot bucket is AQE skew-join territory, the
    * same answer as any skewed equi-join.
    *
    * Right columns are carried as `prefix + name` (the `payload` list),
    * left columns pass through unchanged.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                leftTs: String, rightTs: String,
                lower: Long, upper: Long,
                payload: Seq[String], keys: Seq[String] = Nil,
                prefix: String = "rj_"): DataFrame = {
    require(upper >= lower, "upper must be >= lower")
    require(payload.nonEmpty, "payload must be non-empty")
    val w = math.max(upper - lower, 1L)
    // INTEGRAL floor division: Column./ is IEEE double division, which
    // is lossy above 2^53 — nanosecond epochs (~1.7e18) would round
    // bucket boundaries and silently drop boundary pairs. `div`
    // truncates toward zero, so negatives take the mirrored ceiling.
    def idiv(a: Column, b: Long): Column = call_function("div", a, lit(b))
    def floorDiv(x: Column): Column = {
      val xl = x.cast("long")
      when(xl >= 0, idiv(xl, w)).otherwise(-idiv(-xl + (w - 1), w))
    }
    val b0 = floorDiv(col(leftTs) + lower)
    val b1 = floorDiv(col(leftTs) + upper)
    val lExp = left
      .withColumn("__bucket", explode(sequence(b0, b1)))
    val rB = right.select(
      (keys.map(col) :+ floorDiv(col(rightTs)).as("__bucket") :+
        col(rightTs).as("__rts") :+
        struct(payload.map(col): _*).as("__p")): _*)
    lExp.join(rB, keys :+ "__bucket")
      .filter(col("__rts") >= col(leftTs) + lower &&
        col("__rts") <= col(leftTs) + upper)
      .select(left.columns.map(col) ++
        payload.map(p => col(s"__p.$p").as(prefix + p)): _*)
  }

  /** Gap sessionization: 1-based `session_id` per key, incremented
    * whenever the gap to the previous event (by `tsCol`, ties broken by
    * `tieCol`) exceeds `gap` (same units as `tsCol`). Two window
    * expressions over the SAME (key, ts, tie) spec — Catalyst plans one
    * Exchange + one sort; the lag flag and its running sum share the
    * pass. The batch twin of Structured Streaming's session windows.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, gap: Long): DataFrame = {
    require(gap >= 0, "gap must be >= 0")
    val ord = Window.partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__brk",
        when(col(tsCol) - lag(col(tsCol), 1).over(ord) > gap, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(run) + 1)
      .drop("__brk")
  }
}
