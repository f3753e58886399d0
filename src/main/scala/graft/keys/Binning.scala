package graft.keys

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interval binning of group labels (reference: flox/factorize.py:55-82 —
  * pd.IntervalIndex / np.digitize semantics; API flag `isbin`,
  * flox/core.py:745,919-933).
  *
  * `closedRight = true` matches the pandas default: bin i is
  * (breaks(i), breaks(i+1)]. Out-of-range values map to null — i.e. a
  * dropped label, exactly the reference's code −1 → excluded
  * (flox/factorize.py:36-37).
  *
  * Compiles to a chain of `when` predicates — pure codegen'd expressions
  * that Catalyst folds; no UDF, so parquet min/max pruning and whole-stage
  * codegen are preserved at scale. For uniform-width bins prefer
  * `uniform(...)` which emits O(1) arithmetic instead of O(#bins) whens.
  */
object Binning {

  /** Bin index (0-based) for arbitrary monotonically-increasing breaks. */
  def binIndex(v: Column, breaks: Seq[Double],
               closedRight: Boolean = true): Column = {
    require(breaks.size >= 2, "need at least 2 break points")
    val conds = breaks.sliding(2).zipWithIndex.map { case (Seq(lo, hi), i) =>
      val in =
        if (closedRight) v > lit(lo) && v <= lit(hi)
        else v >= lit(lo) && v < lit(hi)
      (in, lit(i))
    }.toSeq
    conds.foldRight(lit(null).cast("int")) { case ((c, i), acc) =>
      when(c, i).otherwise(acc)
    }
  }

  /** Human-readable interval label, e.g. "(1.0, 10.0]". */
  def binLabel(v: Column, breaks: Seq[Double],
               closedRight: Boolean = true): Column = {
    val labels = breaks.sliding(2).map { case Seq(lo, hi) =>
      if (closedRight) s"($lo, $hi]" else s"[$lo, $hi)"
    }.toSeq
    val idx = binIndex(v, breaks, closedRight)
    element_at(lit(labels.toArray), idx + 1)
  }

  /** Datetime binning: timestamps bucketed by ISO break points
    * ("yyyy-MM-dd" or "yyyy-MM-ddTHH:mm:ss"), via the reference's
    * int64-view trick (flox/factorize.py:78-82: datetime bins digitize
    * on the int64 view). Epoch micros stay exact in the double compare
    * (< 2^53 until year ~2255). */
  def datetimeBinIndex(v: Column, isoBreaks: Seq[String],
                       closedRight: Boolean = true): Column =
    binIndex(unix_micros(v.cast("timestamp")),
      isoBreaks.map(isoMicros(_).toDouble), closedRight)

  /** Interval label over the ISO break strings, e.g.
    * "(1995-01-01, 1997-01-01]". */
  def datetimeBinLabel(v: Column, isoBreaks: Seq[String],
                       closedRight: Boolean = true): Column = {
    val labels = isoBreaks.sliding(2).map { case Seq(lo, hi) =>
      if (closedRight) s"($lo, $hi]" else s"[$lo, $hi)"
    }.toSeq
    element_at(lit(labels.toArray), datetimeBinIndex(v, isoBreaks, closedRight) + 1)
  }

  private def isoMicros(s: String): Long = {
    import java.time.{LocalDate, LocalDateTime, ZoneOffset}
    val ldt =
      try LocalDateTime.parse(s)
      catch { case _: java.time.format.DateTimeParseException =>
        LocalDate.parse(s).atStartOfDay }
    ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }

  /** O(1)-arithmetic uniform binning (lo, hi, n equal-width buckets),
    * the scale path for high-cardinality binning. */
  def uniform(v: Column, lo: Double, hi: Double, n: Int,
              closedRight: Boolean = true): Column = {
    val width = (hi - lo) / n
    val raw =
      if (closedRight) ceil((v - lit(lo)) / lit(width)).cast("int") - 1
      else floor((v - lit(lo)) / lit(width)).cast("int")
    val inRange =
      if (closedRight) v > lit(lo) && v <= lit(hi)
      else v >= lit(lo) && v < lit(hi)
    when(inRange, greatest(least(raw, lit(n - 1)), lit(0)))
  }
}
