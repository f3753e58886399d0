package graft

import graft.api.GroupByReduce
import graft.aggs.ReduceOptions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests mirroring the reference's hypothesis laws
  * (tests/test_properties.py:93-178): for random labeled data with NaN
  * and null contamination, every reduction must equal a straight Scala
  * reimplementation of the NumPy kernel semantics — null = missing
  * (skipped everywhere), NaN propagates in plain funcs and is skipped
  * by nan* funcs. Generators are sampled with fixed seeds (the offline
  * dependency set has no scalatest/scalacheck bridge) — deterministic
  * yet adversarial inputs.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Sample `gen` at `n` fixed seeds. */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val genValue: Gen[Option[Double]] = Gen.frequency(
    6 -> Gen.chooseNum(-50.0, 50.0).map(v => Some(math.rint(v * 4) / 4)),
    1 -> Gen.const(Some(Double.NaN)),
    1 -> Gen.const(None))

  private val genData: Gen[List[(Int, Option[Double])]] =
    Gen.listOfN(24, Gen.zip(Gen.choose(0, 3), genValue))
      .suchThat(_.nonEmpty)

  // ---- NumPy-semantics oracles over one group's values --------------
  private def valid(xs: Seq[Option[Double]]): Seq[Double] =
    xs.flatten.filterNot(_.isNaN)
  private def present(xs: Seq[Option[Double]]): Seq[Double] = xs.flatten
  private def anyNaN(xs: Seq[Option[Double]]): Boolean =
    xs.flatten.exists(_.isNaN)

  private val oracles: Map[String, Seq[Option[Double]] => Any] = Map(
    "count" -> (xs => valid(xs).size.toLong),
    "sum" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else present(xs).sum),
    "nansum" -> (xs => valid(xs).sum),
    "mean" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN
      else present(xs).sum / present(xs).size),
    "nanmean" -> (xs =>
      if (valid(xs).isEmpty) Double.NaN
      else valid(xs).sum / valid(xs).size),
    "min" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else present(xs).min),
    "nanmin" -> (xs => if (valid(xs).isEmpty) Double.NaN else valid(xs).min),
    "max" -> (xs =>
      if (present(xs).isEmpty) null
      else if (anyNaN(xs)) Double.NaN else present(xs).max),
    "nanmax" -> (xs => if (valid(xs).isEmpty) Double.NaN else valid(xs).max),
    "nanvar" -> (xs => {
      val v = valid(xs)
      if (v.size < 2) null
      else {
        val m = v.sum / v.size
        v.map(x => (x - m) * (x - m)).sum / (v.size - 1)
      }
    }))

  private def close(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x, y) => x == y
  }

  test("grouped reductions equal the NumPy-semantics oracle on random data (law 1)") {
    samples(genData, 8).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .repartition(3)
      val expected = data.groupBy(_._1).view.mapValues(g => g.map(_._2)).toMap
      oracles.foreach { case (func, oracle) =>
        val got = GroupByReduce(df, Seq("by"), "v", func, "r",
          ReduceOptions(idxCol = Some("idx")))
          .collect().map(r => r.getInt(0) -> r.get(1)).toMap
        assert(got.keySet === expected.keySet, s"group set for $func")
        expected.foreach { case (k, xs) =>
          val want = oracle(xs)
          assert(close(got(k), want),
            s"$func group $k: got ${got(k)}, oracle $want, values $xs")
        }
      }
    }
  }

  test("scan/reduce duality: last of cumsum equals nansum (law 3/4)") {
    samples(genData, 5).foreach { data =>
      val df = data.zipWithIndex
        .map { case ((by, v), i) => (i.toLong, by, v) }
        .toDF("idx", "by", "v")
        .repartition(3)
      val scanLast = api.GroupByScan(df, Seq("by"), "v", "nancumsum", "idx", "cs")
        .groupBy("by")
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.col("cs"),
          org.apache.spark.sql.functions.col("idx")).as("last_cs"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val reduced = GroupByReduce(df, Seq("by"), "v", "nansum", "r")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      reduced.foreach { case (k, v) =>
        assert(close(scanLast(k), v), s"group $k: cumsum last ${scanLast(k)} vs nansum $v")
      }
    }
  }
}
