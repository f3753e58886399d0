package graft.aggs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, DayTimeIntervalType, DecimalType, TimestampNTZType, TimestampType}

/** Value-dtype machinery: datetime/bool inputs viewed as integers for
  * numeric reductions, with the original dtype restored on the result
  * (reference: flox/core.py:916-917 bool→int promotion,
  * flox/core.py:985-1001 datetime64→int64 view,
  * flox/core.py:1205-1217 dtype restore).
  *
  * Mapping onto Spark:
  *  - order-preserving funcs (min/max/first/last and nan* variants)
  *    run NATIVELY on timestamps/dates/booleans — Spark's orderable
  *    types make the reference's view→restore round-trip unnecessary;
  *  - interpolating funcs (mean/median/quantile) view timestamps as
  *    epoch micros (dates as epoch days), reduce numerically, and
  *    restore the temporal type with floor-to-unit — matching the
  *    reference's int64 view + astype restore;
  *  - count/any/all/arg* never need the view (flox `requires_numeric`);
  *  - sum/prod/var/std on temporals stay NUMERIC (micros/days): the
  *    reference mechanically casts these back, yielding wrap-around
  *    timestamps; Spark would throw on the overflow instead, so we
  *    keep the honest numeric result and document the divergence;
  *  - booleans promote to int for arithmetic funcs (sum counts trues,
  *    mean = true-fraction), run natively for any/all/min/max/first/
  *    last (restore-to-bool is a no-op when the input never left bool).
  */
object DtypeView {

  private val orderPreserving = Set(
    "min", "max", "nanmin", "nanmax",
    "first", "last", "nanfirst", "nanlast")

  /** flox `requires_numeric` is false for these (core.py:985-992). */
  private val nonNumeric = Set(
    "count", "any", "all", "nanany", "nanall",
    "argmin", "argmax", "nanargmin", "nanargmax")

  /** Funcs whose numeric result is restored to the temporal dtype. */
  private val restoring = Set(
    "mean", "nanmean", "median", "nanmedian", "quantile", "nanquantile")

  /** (viewed value column, restore fn applied to the aggregate result). */
  def apply(df: DataFrame, value: String, func: String,
            q: Seq[Double]): (Column, Column => Column) = {
    val v = col(value)
    def needsView = !orderPreserving(func) && !nonNumeric(func)
    df.schema(value).dataType match {
      case TimestampType if needsView =>
        (unix_micros(v),
          restoreWith(func, q, c => timestamp_micros(floor(c).cast("long"))))
      case TimestampNTZType if needsView =>
        // parquet TIMESTAMP(isAdjustedToUTC=false) loads as NTZ; the
        // session timezone is pinned to UTC (build.sbt javaOptions), so
        // the cast round-trip is the identity wall-clock mapping
        (unix_micros(v.cast(TimestampType)),
          restoreWith(func, q,
            c => timestamp_micros(floor(c).cast("long")).cast(TimestampNTZType)))
      case DateType if needsView =>
        (unix_date(v),
          restoreWith(func, q, c => date_from_unix_date(floor(c).cast("int"))))
      case BooleanType if needsView =>
        (v.cast("int"), identity)
      case it: DayTimeIntervalType if needsView =>
        // timedelta64 analog (flox treats 'm' dtypes the same as 'M'):
        // view as INTEGRAL MICROS — the decimal cast keeps the
        // sub-second digits a plain long cast (whole seconds) would
        // drop, and integral micros keep double summation EXACT below
        // 2^53 (the same reason flox views timedelta64 as int64 in its
        // native unit). Unlike timestamps, SUM of durations is
        // meaningful, so every numeric func restores the interval type;
        // the restore floors at micro precision through decimal
        // division (no double rounding at the micro boundary).
        ((v.cast(DecimalType(26, 6)) * lit(1000000L)).cast("double"),
          restoreAlways(func, q, c => make_dt_interval(
            lit(0), lit(0), lit(0),
            (floor(c).cast(DecimalType(26, 0)) /
              lit(1000000L).cast(DecimalType(7, 0)))
              .cast(DecimalType(18, 6))).cast(it)))
      case _ => (v, identity)
    }
  }

  private def restoreWith(func: String, q: Seq[Double],
                          restore: Column => Column): Column => Column =
    if (!restoring(func)) identity
    else if (func.endsWith("quantile") && q.size > 1)
      c => transform(c, restore) // vector q: restore each array element
    else restore

  /** Interval restore: every numeric func except var (whose result is
    * in squared units — kept numeric) gets the duration type back. */
  private def restoreAlways(func: String, q: Seq[Double],
                            restore: Column => Column): Column => Column =
    if (Set("var", "nanvar")(func)) identity
    else if (func.endsWith("quantile") && q.size > 1) c => transform(c, restore)
    else restore
}
