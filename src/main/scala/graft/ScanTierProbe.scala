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
  *   ops: comma list of ffill,cummax,cumsum,cummin,cumcount,cumfrac
  *   (default all; the r16 trio covers the NaN-poisoning min fix and
  *   the newly closed cumcount / finish-scan carry refusals)
  */
object ScanTierProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000000L
    val ops = if (args.length > 1) args(1).split(",").toSet
      else Set("ffill", "cummax", "cumsum", "cummin", "cumcount", "cumfrac")
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
    if (ops("cummin")) {
      // NaN-POISONING running min at full scale (the r15 advice-high
      // fix): sparse NaNs (1 per ~10k rows) poison each group's tail in
      // np.minimum.accumulate semantics; the old Double.compare fold
      // let finite values replace them, so this checksum is exactly the
      // cross-tier law the r15 spec oracle missed, at 60M.
      val dn = df.withColumn("vn",
        when(pmod(col("ord"), lit(9999)) === 0, lit(Double.NaN))
          .otherwise(col("v")))
      val w = time("cummin(NaN) window tier") {
        checksum(api.GroupByScan(dn, Seq("g"), "vn", "cummin", "ord", "m"), "m")
      }
      val t = time("cummin(NaN) carry tier") {
        checksum(api.GlobalScan.groupedCumMin(
          dn, Seq("g"), Seq(col("ord")), "vn", "m"), "m")
      }
      println(s"[probe] cummin checksums window=$w carry=$t " +
        (if (w == t) "MATCH" else "MISMATCH"))
      require(w == t, "cummin tier mismatch")
    }
    if (ops("cumcount")) {
      // r16: the closed cumcount refusal — count fold + declared
      // combine + null→0 finalize through the registry carry tier
      val w = time("cumcount window tier") {
        checksum(api.GroupByScan(df, Seq("g"), "v", "cumcount", "ord", "c"), "c")
      }
      val t = time("cumcount carry tier") {
        checksum(api.GlobalScan.groupedCustomScan(
          df, Seq("g"), Seq(col("ord")), "v", "c", "cumcount"), "c")
      }
      println(s"[probe] cumcount checksums window=$w carry=$t " +
        (if (w == t) "MATCH" else "MISMATCH"))
      require(w == t, "cumcount tier mismatch")
    }
    if (ops("cumfrac")) {
      // r16: the closed FINISH-scan refusal — running fraction of the
      // group total; exact integer fold carried, whole-group operand
      // hash-aggregated and joined back null-safely
      aggs.CustomScans.register("cumfrac_probe", aggs.CustomScans.ScanSpec(
        agg = c => sum(c),
        finish = Some((run, whole) => run.cast("double") / whole),
        fold = Some((st, v) =>
          if (v == null) st
          else if (st == null) v
          else java.lang.Long.valueOf(Math.addExact(
            st.asInstanceOf[Long], v.asInstanceOf[Long]))),
        combine = Some((a, b) =>
          if (a == null) b else if (b == null) a
          else java.lang.Long.valueOf(Math.addExact(
            a.asInstanceOf[Long], b.asInstanceOf[Long])))))
      val di = df.withColumn("iv", (col("v") * 100).cast("long"))
      val w = time("cumfrac window tier") {
        checksum(api.GroupByScan(di, Seq("g"), "iv", "cumfrac_probe",
          "ord", "c"), "c")
      }
      val t = time("cumfrac carry tier") {
        checksum(api.GlobalScan.groupedCustomScan(
          di, Seq("g"), Seq(col("ord")), "iv", "c", "cumfrac_probe"), "c")
      }
      println(s"[probe] cumfrac checksums window=$w carry=$t " +
        (if (w == t) "MATCH" else "MISMATCH"))
      require(w == t, "cumfrac tier mismatch")
    }
    spark.stop()
  }
}
