package graft

import graft.streaming.StreamingGroupBy
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming grouped reductions: windowed agg over a MemoryStream must
  * equal the same reduction run in batch. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("windowed streaming reduce equals batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "k", "v")

    val agg = StreamingGroupBy.windowedReduce(df, "ts", Seq("k"),
      Seq(("v", "sum", "s"), ("v", "count", "n"), ("v", "mean", "m")),
      windowDuration = "5 minutes", watermarkDelay = "0 seconds")

    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try {
      input.addData(
        (ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(2), "b", 10.0),
        (ts(6), "a", 5.0), (ts(7), "b", 20.0))
      q.processAllAvailable()
      val got = spark.table("stream_out")
        .select(col("window.start").cast("long").as("w"), col("k"), col("s"), col("n"), col("m"))
        .orderBy("w", "k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      assert(got.toSeq === Seq(
        (0L, "a", 3.0, 2L, 1.5), (0L, "b", 10.0, 1L, 10.0),
        (300L, "a", 5.0, 1L, 5.0), (300L, "b", 20.0, 1L, 20.0)))
    } finally q.stop()
  }

  test("non-streamable funcs rejected with clear error") {
    val df = Seq((ts(0), "a", 1.0)).toDF("ts", "k", "v")
    val e = intercept[IllegalArgumentException] {
      StreamingGroupBy.windowedReduce(df, "ts", Seq("k"),
        Seq(("v", "median", "m")), "5 minutes")
    }
    assert(e.getMessage.contains("median"))
  }
}
