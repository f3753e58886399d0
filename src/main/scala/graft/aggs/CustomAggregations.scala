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
