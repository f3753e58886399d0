package graft

import graft.api.GroupByReduce
import graft.aggs.CustomAggregations
import org.apache.spark.sql.functions._

/** The §2.5 extensibility surface: user aggregations registered by name
  * (mirrors reference custom-Aggregation test tests/test_core.py:1510-1548). */
class CustomAggSpec extends SparkTestBase {
  import spark.implicits._

  test("custom Aggregator participates in GroupByReduce by name") {
    CustomAggregations.register("sum_of_squares",
      new CustomAggregations.SimpleAggregation {
        def identity = 0.0
        def chunk(state: Double, value: Double) = state + value * value
        def combine(a: Double, b: Double) = a + b
      })
    val d = Seq((1, 1.0), (1, 2.0), (2, 3.0)).toDF("by", "v")
    val r = GroupByReduce(d, Seq("by"), "v", "sum_of_squares", "ss")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r === Map(1 -> 5.0, 2 -> 9.0))
  }

  test("custom expression aggregation (codegen path)") {
    CustomAggregations.registerExpr("range_width", v => max(v) - min(v))
    val d = Seq((1, 1.0), (1, 7.5), (2, 3.0)).toDF("by", "v")
    val r = GroupByReduce(d, Seq("by"), "v", "range_width", "w")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r === Map(1 -> 6.5, 2 -> 0.0))
  }

  test("generic typed Aggregator: string-valued custom reduction") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    // longest string, ties broken lexicographically smallest — a
    // reduction no numeric cast could express
    CustomAggregations.registerTyped("longest", new Aggregator[String, String, String] {
      def zero: String = ""
      private def pick(a: String, b: String): String =
        if (a.length != b.length) { if (a.length > b.length) a else b }
        else if (a <= b) a else b
      def reduce(buf: String, in: String): String =
        if (in == null) buf else pick(buf, in)
      def merge(a: String, b: String): String = pick(a, b)
      def finish(r: String): String = r
      def bufferEncoder: Encoder[String] = Encoders.STRING
      def outputEncoder: Encoder[String] = Encoders.STRING
    })
    val d = Seq((1, "aa"), (1, "bbb"), (1, "abc"), (2, "z")).toDF("by", "s")
    val r = GroupByReduce(d, Seq("by"), "s", "longest", "l")
      .collect().map(x => x.getInt(0) -> x.getString(1)).toMap
    assert(r === Map(1 -> "abc", 2 -> "z"))
  }

  test("perGroupDouble: callable escape hatch matches manual computation") {
    val d = (1 to 40).map(i => (i % 4, i.toDouble)).toDF("by", "v")
    val r = GroupByReduce.perGroupDouble(d.repartition(7), Seq("by"), "v", "med") {
      it =>
        val a = it.toArray.sorted
        (a((a.length - 1) / 2) + a(a.length / 2)) / 2 // median
    }.collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    val expect = (1 to 40).groupBy(_ % 4).view.mapValues { xs =>
      val a = xs.map(_.toDouble).sorted
      (a((a.length - 1) / 2) + a(a.length / 2)) / 2
    }.toMap
    assert(r === expect)
  }

  test("custom agg merges across partitions (chunk/combine algebra)") {
    CustomAggregations.register("sum_sq_p",
      new CustomAggregations.SimpleAggregation {
        def identity = 0.0
        def chunk(state: Double, value: Double) = state + value * value
        def combine(a: Double, b: Double) = a + b
      })
    val d = (1 to 100).map(i => (i % 3, i.toDouble)).toDF("by", "v").repartition(13)
    val r = GroupByReduce(d, Seq("by"), "v", "sum_sq_p", "ss")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    val expect = (1 to 100).groupBy(_ % 3).view.mapValues(_.map(i => i.toDouble * i).sum).toMap
    assert(r === expect)
  }
}
