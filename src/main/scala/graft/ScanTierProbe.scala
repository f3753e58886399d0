package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the §2.2 scan tiers at the DESIGN reference
  * point: 60M rows / 3 mega-groups, local[32] — the regime where the
  * window formulation puts ~20M sorted rows on ONE task per group and
  * the GlobalScan boundary-carry tiers spread each group across the
  * cluster. Runs ffill and cum-extrema through both tiers on identical
  * data and cross-checks the results with an order-insensitive
  * xxhash64 checksum (bit-equality at full scale, not a sample).
  *
  * Usage: runMain graft.ScanTierProbe [rows] [ops]
  *   ops: comma list of ffill,cummax,cumsum (default all)
  */
object ScanTierProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000000L
    val ops = if (args.length > 1) args(1).split(",").toSet
      else Set("ffill", "cummax", "cumsum")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 3 mega-groups; ~20% nulls so ffill has real gaps to carry
    val df = spark.range(n).select(
        (col("id") % 3).cast("string").as("g"),
        col("id").as("ord"),
        when(pmod(col("id"), lit(5)) =!= 0,
          (pmod(xxhash64(col("id")), lit(100000)) / lit(100.0)))
          .as("v"))
      .localCheckpoint()

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }
    // order-insensitive checksum over (g, ord, result): bit-level
    // cross-tier equality without a 60M-row join (decimal sum — a
    // long sum of 60M hashes overflows under ANSI)
    def checksum(d: org.apache.spark.sql.DataFrame, out: String): String =
      d.select(xxhash64(col("g"), col("ord"), col(out))
          .cast("decimal(38,0)").as("h"))
        .agg(sum(col("h"))).head().get(0).toString

    if (ops("ffill")) {
      val w = time("ffill window tier") {
        checksum(api.GroupByScan(df, Seq("g"), "v", "ffill", "ord", "f"), "f")
      }
      val t = time("ffill carry tier") {
        checksum(api.GlobalScan.groupedFfill(
          df, Seq("g"), Seq(col("ord")), "v", "f"), "f")
      }
      println(s"[probe] ffill checksums window=$w carry=$t " +
        (if (w == t) "MATCH" else "MISMATCH"))
      require(w == t, "ffill tier mismatch")
    }
    if (ops("cumsum")) {
      // integer cumsum — the regime where the carry tier is exact
      // (long addition is associative bit-for-bit; null = 0 matches
      // the window sum's ignore-nulls with a coalesce)
      val di = df.withColumn("iv", (col("v") * 100).cast("long"))
      val w = time("cumsum window tier") {
        checksum(di.withColumn("c",
          coalesce(
            sum(col("iv")).over(org.apache.spark.sql.expressions.Window
              .partitionBy("g").orderBy("ord")
              .rowsBetween(Long.MinValue, 0)), lit(0L))), "c")
      }
      val t = time("cumsum carry tier") {
        checksum(api.GlobalScan.groupedPrefixSum(
          di, Seq("g"), Seq(col("ord")), col("iv"), "c"), "c")
      }
      println(s"[probe] cumsum checksums window=$w carry=$t " +
        (if (w == t) "MATCH" else "MISMATCH"))
      require(w == t, "cumsum tier mismatch")
    }
    if (ops("cummax")) {
      val w = time("cummax window tier") {
        checksum(api.GroupByScan(df, Seq("g"), "v", "cummax", "ord", "m"), "m")
      }
      val t = time("cummax carry tier") {
        checksum(api.GlobalScan.groupedCumMax(
          df, Seq("g"), Seq(col("ord")), "v", "m"), "m")
      }
      println(s"[probe] cummax checksums window=$w carry=$t " +
        (if (w == t) "MATCH" else "MISMATCH"))
      require(w == t, "cummax tier mismatch")
    }
    spark.stop()
  }
}
