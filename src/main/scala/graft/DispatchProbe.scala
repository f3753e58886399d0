package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost and correctness probe for [[graft.api.Dispatch]] at the 60M
  * reference point: how much does the sampled stats pass cost next to
  * the operator it steers, and does it pick the right tier on the two
  * planted regimes (3 mega-groups; 400k uniform groups)?
  *
  * Usage: runMain graft.DispatchProbe [rows]
  */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    val mega = spark.range(n).select(
      (col("id") % 3).cast("string").as("g"),
      (pmod(xxhash64(col("id")), lit(100000)) / lit(100.0)).as("v"))
      .localCheckpoint()
    val uniform = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(n / 150)).cast("string").as("g"),
      (pmod(xxhash64(col("id"), lit(1)), lit(100000)) / lit(100.0)).as("v"))
      .localCheckpoint()

    val stMega = time("keyStats mega (3 groups)") {
      api.Dispatch.keyStats(mega, Seq("g"))
    }
    println(s"[probe] mega stats: $stMega -> " +
      api.Dispatch.chooseQuantileTier(stMega).name)
    require(api.Dispatch.chooseQuantileTier(stMega) ==
      api.Dispatch.DistributedTier, "mega input must escalate")

    val stUni = time("keyStats uniform (400k groups)") {
      api.Dispatch.keyStats(uniform, Seq("g"))
    }
    println(s"[probe] uniform stats: $stUni -> " +
      api.Dispatch.chooseQuantileTier(stUni).name)
    require(api.Dispatch.chooseQuantileTier(stUni) ==
      api.Dispatch.Buffered, "uniform input must stay buffered")

    // r16 stats reuse: with a precomputed KeyStats the auto entry
    // point's own cost is pure plan construction — a pipeline running
    // N operators over one keying pays keyStats ONCE and saves
    // (N−1) × the stats pass measured above (the flox memoized
    // chunk-metadata amortization, flox/cache.py:1-12)
    time("reduceAuto uniform, stats supplied (steer only)") {
      api.Dispatch.reduceAuto(uniform, Seq("g"), "v", "median",
        stats = Some(stUni))
    }
    time("quantileAuto uniform, stats supplied (steer only)") {
      api.Dispatch.quantileAuto(uniform, Seq("g"), "v", Seq(0.5),
        stats = Some(stUni))
    }

    // the operator the pass steers, for scale: one auto quantile run
    // on each regime (mega routes to the bracket search, uniform to
    // the buffered sort)
    time("quantileAuto mega (distributed)") {
      api.Dispatch.quantileAuto(mega, Seq("g"), "v", Seq(0.5))
        .write.format("noop").mode("overwrite").save()
    }
    time("quantileAuto uniform (buffered)") {
      api.Dispatch.quantileAuto(uniform, Seq("g"), "v", Seq(0.5))
        .write.format("noop").mode("overwrite").save()
    }

    // events: the SkewProbe regime (30% of rows on one key) at n/6 —
    // the dispatcher must route rolling to the span-block tier (the
    // 11x winner at this shape) and a uniform stream to the plain
    // window, with the derived span
    val nEv = n / 6
    val skewed = spark.range(nEv).select(
      when(pmod(col("id"), lit(10)) < 3, lit("hot"))
        .otherwise(pmod(xxhash64(col("id")), lit(200000)).cast("string"))
        .as("k"),
      pmod(xxhash64(col("id"), lit(7)), lit(nEv / 4)).as("ts"),
      (pmod(xxhash64(col("id"), lit(9)), lit(1000)) / lit(10.0)).as("v"))
      .localCheckpoint()
    val stEv = time("keyStats skewed events") {
      api.Dispatch.keyStats(skewed, Seq("k"))
    }
    println(s"[probe] skewed-events stats: $stEv -> " +
      api.Dispatch.chooseEventsTier(stEv).name)
    require(api.Dispatch.chooseEventsTier(stEv) == api.Dispatch.Skewed,
      "30%-hot-key events must escalate")
    time("rollingAggAuto skewed (block tier)") {
      api.Dispatch.rollingAggAuto(skewed, "k", "ts", "v",
          span = api.Dispatch.deriveSpan(skewed, "ts"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
