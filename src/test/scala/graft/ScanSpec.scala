package graft

import graft.api.GroupByScan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan laws from the reference property suite
  * (tests/test_properties.py:222-287). */
class ScanSpec extends SparkTestBase {
  import spark.implicits._

  private def fixture: DataFrame =
    Seq((0L, 0, Some(1.0)), (1L, 1, Some(2.0)), (2L, 0, None),
      (3L, 1, Some(4.0)), (4L, 0, Some(5.0)), (5L, 1, None),
      (6L, 0, None), (7L, 1, Some(8.0)))
      .toDF("idx", "by", "v")

  private def vals(df: DataFrame, c: String): Seq[(Long, Option[Double])] =
    df.orderBy("idx").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex(c))).map(_.asInstanceOf[Double]))).toSeq

  test("cumsum equals per-group sequential loop (law 3)") {
    val d = Seq((0L, 0, 1.0), (1L, 0, 2.0), (2L, 1, 10.0), (3L, 0, 3.0), (4L, 1, 20.0))
      .toDF("idx", "by", "v")
    val r = vals(GroupByScan(d, Seq("by"), "v", "cumsum", "idx", "cs"), "cs")
    assert(r === Seq((0L, Some(1.0)), (1L, Some(3.0)), (2L, Some(10.0)),
      (3L, Some(6.0)), (4L, Some(30.0))))
  }

  test("ffill carries last valid; leading missing stays missing") {
    val r = vals(GroupByScan(fixture, Seq("by"), "v", "ffill", "idx", "f"), "f")
    assert(r === Seq((0L, Some(1.0)), (1L, Some(2.0)), (2L, Some(1.0)),
      (3L, Some(4.0)), (4L, Some(5.0)), (5L, Some(4.0)), (6L, Some(5.0)), (7L, Some(8.0))))
  }

  test("ffill(reverse) == reverse(bfill) (law 4)") {
    val n = fixture.count()
    val reversed = fixture.withColumn("idx", lit(n) - col("idx"))
    val a = GroupByScan(reversed, Seq("by"), "v", "ffill", "idx", "x")
      .withColumn("idx", lit(n) - col("idx"))
    val b = GroupByScan(fixture, Seq("by"), "v", "bfill", "idx", "x")
    assert(vals(a, "x") === vals(b, "x"))
  }

  test("nancumsum treats NaN as zero contribution") {
    val d = Seq((0L, 0, 1.0), (1L, 0, Double.NaN), (2L, 0, 2.0)).toDF("idx", "by", "v")
    val r = vals(GroupByScan(d, Seq("by"), "v", "nancumsum", "idx", "cs"), "cs")
    assert(r === Seq((0L, Some(1.0)), (1L, Some(1.0)), (2L, Some(3.0))))
    // plain cumsum propagates
    val p = vals(GroupByScan(d, Seq("by"), "v", "cumsum", "idx", "cs"), "cs")
    assert(p(1)._2.get.isNaN && p(2)._2.get.isNaN)
  }

  test("custom scans: cummax forward, reversed scan, finalize(run, whole)") {
    import graft.aggs.CustomScans
    CustomScans.register("cummax_t", CustomScans.ScanSpec(v => max(v)))
    CustomScans.register("revmax_t", CustomScans.ScanSpec(v => max(v), reverse = true))
    CustomScans.register("cumfrac_t", CustomScans.ScanSpec(
      v => sum(v), finish = Some((run, whole) => run / whole)))
    val d = Seq((0L, 0, 3.0), (1L, 0, 1.0), (2L, 0, 4.0), (3L, 0, 2.0))
      .toDF("idx", "by", "v")
    val cm = vals(GroupByScan(d, Seq("by"), "v", "cummax_t", "idx", "r"), "r")
    assert(cm.map(_._2.get) === Seq(3.0, 3.0, 4.0, 4.0))
    val rm = vals(GroupByScan(d, Seq("by"), "v", "revmax_t", "idx", "r"), "r")
    assert(rm.map(_._2.get) === Seq(4.0, 4.0, 4.0, 2.0))
    val cf = vals(GroupByScan(d, Seq("by"), "v", "cumfrac_t", "idx", "r"), "r")
    assert(cf.map(_._2.get) === Seq(0.3, 0.4, 0.8, 1.0))
  }

  test("pre-registered scans: cummin/cumprod/cumcount") {
    val d = Seq((0L, 0, 3.0), (1L, 0, 1.0), (2L, 0, 4.0), (3L, 0, 2.0))
      .toDF("idx", "by", "v")
    assert(vals(GroupByScan(d, Seq("by"), "v", "cummin", "idx", "r"), "r")
      .map(_._2.get) === Seq(3.0, 1.0, 1.0, 1.0))
    assert(vals(GroupByScan(d, Seq("by"), "v", "cumprod", "idx", "r"), "r")
      .map(_._2.get) === Seq(3.0, 3.0, 12.0, 24.0))
    val cc = GroupByScan(d, Seq("by"), "v", "cumcount", "idx", "r")
      .orderBy("idx").collect().map(_.getLong(3))
    assert(cc.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("scan result invariant to partitioning") {
    val base = vals(GroupByScan(fixture, Seq("by"), "v", "ffill", "idx", "f"), "f")
    for (n <- Seq(1, 3, 5)) {
      val got = vals(GroupByScan(fixture.repartition(n), Seq("by"), "v", "ffill", "idx", "f"), "f")
      assert(got === base)
    }
  }
}
