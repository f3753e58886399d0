package graft.keys

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Expected-groups domain construction (reference: flox/core.py:616-682,
  * reindex flox/reindex.py:160-216; dense multi-key grid
  * flox/core.py:1196-1202).
  *
  * flox reshapes multi-`by` results onto a dense cartesian grid of the
  * group domains. At 100 TB the grid is only safe when its cardinality is
  * bounded by DECLARED domains (group counts, not data size) — so the
  * grid here is built from small literal domains / distinct() of
  * dimension-sized inputs and used on the broadcast side of a left join.
  * Sparse (non-grid) output stays the default (SURVEY.md §7.4.5).
  */
object ExpectedGroups {

  /** Domain from literal values, one column — typed overloads, so the
    * element type is pinned at compile time instead of sniffed from the
    * erased runtime head. */
  def of(spark: SparkSession, name: String, values: Seq[String])(
      implicit d: DummyImplicit): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }

  def of(spark: SparkSession, name: String, values: Seq[Int])(
      implicit d1: DummyImplicit, d2: DummyImplicit): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }

  def of(spark: SparkSession, name: String, values: Seq[Long])(
      implicit d1: DummyImplicit, d2: DummyImplicit,
      d3: DummyImplicit): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }

  def of(spark: SparkSession, name: String, values: Seq[Double])(
      implicit d1: DummyImplicit, d2: DummyImplicit, d3: DummyImplicit,
      d4: DummyImplicit): DataFrame = {
    import spark.implicits._
    values.toDF(name)
  }

  /** Dense cartesian grid of several single-column domains
    * (the multi-key `grp_shape` grid, flox/core.py:1196-1202). */
  def grid(domains: Seq[DataFrame]): DataFrame =
    domains.reduceLeft(_.crossJoin(_))

  /** Observed domain of a key column (for grid-building when the domain
    * is not declared). Distinct of a key column — one shuffle over
    * bounded-cardinality data. */
  def observed(df: DataFrame, key: String): DataFrame =
    df.select(col(key)).distinct()

  /** Bins AS expected groups (flox: a pd.IntervalIndex passed to
    * `expected_groups` IS the declared output domain, core.py:616-636 +
    * reindex.py:160-216): the full (bin index, interval label) domain
    * of a break set, so EMPTY bins materialize with fill_value instead
    * of silently dropping. Pair with `Binning.binIndex`/`binLabel` on
    * the data side and pass the result as `ReduceOptions.expectedGroups`.
    */
  def fromBreaks(spark: SparkSession, breaks: Seq[Double],
                 closedRight: Boolean = true,
                 binCol: String = "bin",
                 labelCol: String = "bin_label"): DataFrame = {
    import spark.implicits._
    require(breaks.size >= 2, "need at least 2 break points")
    breaks.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      (i, if (closedRight) s"($lo, $hi]" else s"[$lo, $hi)")
    }.toSeq.toDF(binCol, labelCol)
  }

  /** Datetime bins AS expected groups (flox: a datetime IntervalIndex
    * passed to `expected_groups` declares the output domain end-to-end,
    * core.py:616-636 + factorize.py:78-82 — the resampling-with-missing-
    * periods case). ISO break strings and labels match
    * `Binning.datetimeBinIndex` / `datetimeBinLabel` exactly, so an
    * empty calendar period materializes with fill_value instead of
    * silently dropping. */
  def fromDatetimeBreaks(spark: SparkSession, isoBreaks: Seq[String],
                         closedRight: Boolean = true,
                         binCol: String = "bin",
                         labelCol: String = "bin_label"): DataFrame = {
    import spark.implicits._
    require(isoBreaks.size >= 2, "need at least 2 break points")
    isoBreaks.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      (i, if (closedRight) s"($lo, $hi]" else s"[$lo, $hi)")
    }.toSeq.toDF(binCol, labelCol)
  }
}
