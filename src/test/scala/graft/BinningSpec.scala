package graft

import graft.keys.Binning
import org.apache.spark.sql.functions._

class BinningSpec extends SparkTestBase {
  import spark.implicits._

  private val breaks = Seq(0.0, 10.0, 20.0, 30.0)

  test("closed-right intervals match pandas IntervalIndex semantics") {
    val d = Seq(0.0, 0.1, 10.0, 10.1, 30.0, 30.1, -5.0).toDF("v")
    val r = d.select(col("v"), Binning.binIndex(col("v"), breaks).as("b"))
      .collect().map(x => x.getDouble(0) -> Option(x.get(1))).toMap
    // (0,10], (10,20], (20,30]; 0.0 excluded (left-open), 30.0 included
    assert(r(0.0) === None && r(0.1) === Some(0) && r(10.0) === Some(0))
    assert(r(10.1) === Some(1) && r(30.0) === Some(2))
    assert(r(30.1) === None && r(-5.0) === None)
  }

  test("closed-left intervals") {
    val d = Seq(0.0, 10.0, 29.9, 30.0).toDF("v")
    val r = d.select(col("v"), Binning.binIndex(col("v"), breaks, closedRight = false).as("b"))
      .collect().map(x => x.getDouble(0) -> Option(x.get(1))).toMap
    assert(r(0.0) === Some(0) && r(10.0) === Some(1))
    assert(r(29.9) === Some(2) && r(30.0) === None)
  }

  test("uniform binning agrees with binIndex on uniform breaks") {
    val d = (0 to 300).map(_ / 10.0).toDF("v")
    val diff = d.select(
      Binning.binIndex(col("v"), breaks).as("a"),
      Binning.uniform(col("v"), 0.0, 30.0, 3).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff === 0L)
  }

  test("bin labels render intervals") {
    val d = Seq(5.0).toDF("v")
    val l = d.select(Binning.binLabel(col("v"), breaks).as("l")).head().getString(0)
    assert(l === "(0.0, 10.0]")
  }
}
