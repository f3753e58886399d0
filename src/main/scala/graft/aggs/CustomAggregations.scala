package graft.aggs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregation extension point — the Spark-native analog of
  * flox's custom `Aggregation(name, chunk, combine, finalize, fill_value)`
  * (reference: flox/aggregations.py:161-301, exercised at
  * tests/test_core.py:1510-1548).
  *
  * flox's contract decomposes as chunk (per-block partial state) /
  * combine (merge partials) / finalize (evaluate). Spark's
  * `Aggregator[IN, BUF, OUT]` is the same algebra: `reduce` = chunk,
  * `merge` = combine, `finish` = finalize, `zero` = fill/identity.
  * Registered aggregations participate in Catalyst's partial
  * aggregation (map-side combine before the shuffle) automatically.
  *
  * Register once, then use the name anywhere `GroupByReduce` accepts a
  * built-in func name:
  * {{{
  *   CustomAggregations.register("sum_of_squares", new SumOfSquares)
  *   GroupByReduce(df, Seq("k"), "v", "sum_of_squares")
  * }}}
  */
object CustomAggregations {

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, Column => Column]

  /** Register a numeric Aggregator under a reduction name (values cast
    * to double, the common flox case). */
  def register[BUF](name: String, agg: Aggregator[Double, BUF, Double]): Unit = {
    val fn = udaf(agg)
    registry.put(name, (v: Column) => fn(v.cast("double")))
  }

  /** Register a fully generic Aggregator — arbitrary input/buffer/output
    * types, matching the reference's dtype-generic custom `Aggregation`
    * (flox/aggregations.py:161-301). The value column must already have
    * the Aggregator's input type (no implicit cast). */
  def registerTyped[IN, BUF, OUT](name: String, agg: Aggregator[IN, BUF, OUT])(
      implicit enc: Encoder[IN]): Unit = {
    val fn = udaf(agg, enc)
    registry.put(name, (v: Column) => fn(v))
  }

  /** Register a plain expression-builder (for aggregations expressible
    * as column expressions — cheaper than an Aggregator, stays in
    * whole-stage codegen). */
  def registerExpr(name: String, build: Column => Column): Unit =
    registry.put(name, build)

  def lookup(name: String): Option[Column => Column] = registry.get(name)

  def isRegistered(name: String): Boolean = registry.contains(name)

  /** Flagship multi-field-buffer Aggregator for the `registerTyped`
    * path: arbitrary-ddof variance over a (count, mean, M2) state with
    * the numerically-stable Welford update and Chan parallel merge —
    * the same 3-tuple combine algebra as the reference's `_var_combine`
    * (flox/aggregations.py:392-451). Null inputs are skipped by the
    * udaf machinery; an under-populated group (n <= ddof) finishes NaN
    * (the reference's degenerate-variance answer).
    */
  class WelfordVar(ddof: Int) extends Aggregator[Double, (Long, Double, Double), Double] {
    override def zero: (Long, Double, Double) = (0L, 0.0, 0.0)
    // chunk: fold one value into (n, mean, M2)
    override def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) = {
      val (n0, mean0, m20) = b
      val n = n0 + 1
      val d1 = x - mean0
      val mean = mean0 + d1 / n
      (n, mean, m20 + d1 * (x - mean))
    }
    // combine: Chan et al. parallel merge of two partial states
    override def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) = {
      val (na, ma, m2a) = a
      val (nb, mb, m2b) = b
      if (na == 0) b
      else if (nb == 0) a
      else {
        val n = na + nb
        val d = mb - ma
        (n, ma + d * nb / n, m2a + m2b + d * d * na * nb / n)
      }
    }
    // finalize: M2 / (n - ddof)
    override def finish(r: (Long, Double, Double)): Double =
      if (r._1 > ddof) r._3 / (r._1 - ddof) else Double.NaN
    override def bufferEncoder: Encoder[(Long, Double, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Base class with the flox-shaped vocabulary spelled out. */
  abstract class SimpleAggregation extends Aggregator[Double, Double, Double] {
    /** identity / fill value (flox `fill_value`) */
    def identity: Double
    /** fold one value into the partial state (flox `chunk`) */
    def chunk(state: Double, value: Double): Double
    /** merge two partial states (flox `combine`) */
    def combine(a: Double, b: Double): Double
    /** evaluate the final state (flox `finalize`) */
    def finalizeState(state: Double): Double = state

    final override def zero: Double = identity
    final override def reduce(b: Double, a: Double): Double = chunk(b, a)
    final override def merge(a: Double, b: Double): Double = combine(a, b)
    final override def finish(r: Double): Double = finalizeState(r)
    final override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    final override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
