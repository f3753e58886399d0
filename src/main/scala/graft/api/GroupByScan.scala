package graft.api

import graft.aggs.{CustomScans, ReduceExprs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Spark-native `groupby_scan` (reference: flox/scan.py:101-315).
  *
  * flox's distributed scans need a Blelloch parallel-prefix pass over
  * chunks with explicit carry state (flox/dask.py:576-663,
  * flox/aggregations.py:792-846). On Spark the whole mechanism collapses
  * into a window frame: `WindowExec` hash-partitions by key, sorts by the
  * element index within partitions, and streams the running frame — the
  * cross-partition carry is handled by the shuffle. One shuffle total,
  * no state kept on the driver, scales with #distinct keys × rows.
  *
  * Missing-value convention: both null and NaN count as "missing" for
  * ffill/bfill (flox fills NaN; our long-form NA is null — SURVEY.md §7.4.2).
  *
  * Scale boundary: the window puts each group on ONE task — right for
  * flox-style many-modest-groups data, a wall when a group spans the
  * corpus. The escalation tiers live in [[GlobalScan]] (groupedFfill/
  * Bfill/CumMax/CumMin/NanCumMax/NanCumMin/PrefixSum/CustomScan,
  * boundary-carry, bit-equal laws); [[Dispatch.scanAuto]] picks per
  * data.
  */
object GroupByScan {

  def apply(df: DataFrame, by: Seq[String], value: String, func: String,
            order: String, as: String = "result"): DataFrame = {
    val keys = by.map(col)
    val fwd = Window.partitionBy(keys: _*).orderBy(col(order).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(keys: _*).orderBy(col(order).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(value)
    val fp = df.schema(value).dataType match {
      case DoubleType | FloatType => true
      case _                      => false
    }
    def missing = if (fp) when(v.isNotNull && !isnan(v), v) else v

    val expr: Column = func match {
      // running sum, NaN propagates once seen (NumPy cumsum)
      case "cumsum" => sum(v).over(fwd)
      // NaN treated as 0 contribution (NumPy nancumsum)
      case "nancumsum" => coalesce(sum(if (fp) ReduceExprs.nanToNull(v) else v).over(fwd), lit(0.0))
      // forward-fill: last valid value at or before this row
      case "ffill" => last(missing, ignoreNulls = true).over(fwd)
      // backward-fill: first valid value at or after this row
      case "bfill" => first(missing, ignoreNulls = true).over(bwd)
      // running extrema (beyond-reference; np.maximum/minimum.accumulate
      // semantics: NaN poisons the running value once seen — Spark's max
      // already orders NaN greatest so it sticks, min needs the explicit
      // guard; nulls are missing and skipped, as in cumsum)
      case "cummax" => max(v).over(fwd)
      case "cummin" =>
        if (fp) when(bool_or(isnan(v)).over(fwd), lit(Double.NaN))
          .otherwise(min(v).over(fwd))
        else min(v).over(fwd)
      // NaN-skipping running extrema (np.fmax/fmin.accumulate): null
      // until the first valid value
      case "nancummax" => max(missing).over(fwd)
      case "nancummin" => min(missing).over(fwd)
      // user-registered custom scans (§2.5; flox/aggregations.py:715-737)
      case other => CustomScans.lookup(other) match {
        case Some(spec) =>
          val frame = if (spec.reverse) bwd else fwd
          val run = spec.agg(v).over(frame)
          spec.finish match {
            case Some(fin) =>
              val whole = Window.partitionBy(keys: _*)
                .orderBy(col(order).asc)
                .rowsBetween(Window.unboundedPreceding,
                  Window.unboundedFollowing)
              fin(run, spec.agg(v).over(whole))
            case None => run
          }
        case None => throw new IllegalArgumentException(
          s"unknown scan '$other' (cumsum|nancumsum|ffill|bfill|" +
            "cummax|cummin|nancummax|nancummin or " +
            "a graft.aggs.CustomScans registration)")
      }
    }
    df.withColumn(as, expr)
  }
}
