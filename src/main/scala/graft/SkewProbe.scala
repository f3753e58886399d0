package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew probe (r12 verdict #7): at the 100× derived scale,
  * plant ONE hot key holding 1% of all rows and measure the guarded
  * operators against their unskewed twins on the same data volume.
  *
  *  - documents: 1% of docs share IDENTICAL text → every minhash band
  *    of those docs lands in one bucket (5k docs → 12.5M candidate
  *    pairs per band unguarded). Measures Dedup.nearDupPairs wall +
  *    the bucket sizes the maxBucket guard prunes.
  *  - events: 1% of rows forced onto one user_id → one window
  *    partition holds 100k rows. Measures Events.sessionize and the
  *    backward as-of join.
  *
  * Usage: runMain graft.SkewProbe <sfDir> <scratchDir> <factor>
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0); val scratch = args(1)
    val factor = args(2).toInt
    val section = if (args.length > 3) args(3) else "all"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val off = 1000000000L

    def stack(src: DataFrame)(perturb: (DataFrame, Int) => DataFrame) =
      (0 until factor).map(i => perturb(src, i)).reduce(_ unionAll _)

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[skew] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s, rows=$n")
    }

    // ---- documents: plain 100x vs 1%-hot-text 100x
    if (section == "all" || section == "docs") {
    val docs = Tables(spark, srcDir, "documents").select("doc_id", "text")
    def docCopy(df: DataFrame, i: Int) =
      df.withColumn("doc_id", col("doc_id") + lit(i * off))
        .withColumn("text",
          if (i == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", "$1_c" + i))
    val hotText = (1 to 30).map(j => s"hot$j").mkString(" ")
    for ((label, plant) <- Seq(("plain", false), ("hot1pct", true))) {
      val out = {
        val base = stack(docs)(docCopy)
        if (plant)
          base.withColumn("text",
            when(col("doc_id") % 100 === 0, lit(hotText))
              .otherwise(col("text")))
        else base
      }
      out.write.mode("overwrite").parquet(s"$scratch/docs_$label.parquet")
    }
    for (label <- Seq("plain", "hot1pct")) {
      val d = spark.read.parquet(s"$scratch/docs_$label.parquet")
      val nDocs = d.count()
      // bucket profile: size of the biggest band bucket + rows in
      // buckets over the guard threshold (what the guard prunes)
      val sig = graft.ops.Dedup.lshCandidates(
        d, "text", "doc_id", numHashes = 4, bandSize = 1, k = 3,
        useMd5 = false, maxBucket = 1000)
      timed(s"near_dup_pairs[$label] docs=$nDocs") {
        graft.ops.Dedup.nearDupPairs(d, "text", "doc_id",
          threshold = 0.8, numHashes = 4, bandSize = 1, k = 3).count()
      }
      timed(s"lsh_candidates[$label]") { sig.count() }
    }
    // guard accounting on the hot set: bucket sizes over threshold,
    // and the A/B the guard prevents (maxBucket=MaxValue lets the hot
    // bucket's quadratic candidate join actually run)
    {
      val d = spark.read.parquet(s"$scratch/docs_hot1pct.parquet")
      val hotN = d.filter(col("doc_id") % 100 === 0).count()
      println(s"[skew] planted hot docs: $hotN (identical text, " +
        "all 4 bands collide -> unguarded candidate pairs would be " +
        s"${hotN.toLong * (hotN - 1) / 2} per band)")
      timed("lsh_candidates[hot1pct GUARD OFF]") {
        graft.ops.Dedup.lshCandidates(d, "text", "doc_id",
          numHashes = 4, bandSize = 1, k = 3, useMd5 = false,
          maxBucket = Int.MaxValue).count()
      }
    }
    }

    // ---- events: plain 100x vs 1%-hot-user 100x
    if (section == "all" || section == "events") {
    val ev0 = Tables(spark, srcDir, "events")
    val evu = ev0.withColumn("tsu", Tables.tsMicros(ev0))
      .select("event_id", "user_id", "tsu", "event_type", "value")
    def evCopy(df: DataFrame, i: Int) =
      df.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off))
    for ((label, plant) <- Seq(("plain", false), ("hot1pct", true))) {
      val base = stack(evu)(evCopy)
      val out =
        if (plant) base.withColumn("user_id",
          when(col("event_id") % 100 === 0, lit(42L))
            .otherwise(col("user_id")))
        else base
      out.write.mode("overwrite").parquet(s"$scratch/events_$label.parquet")
    }
    for (label <- Seq("plain", "hot1pct")) {
      val e = spark.read.parquet(s"$scratch/events_$label.parquet")
      val n = e.count()
      // aggregate OVER the produced columns: a bare count() would let
      // Catalyst prune the window/join work entirely (the r2 bench
      // harness lesson) and time only parquet row-count metadata
      timed(s"sessionize[$label] events=$n") {
        graft.ops.Events.sessionize(e, "user_id", "tsu", "event_id",
          gap = 600L * 1000000L)
          .agg(sum(col("session_id"))).collect()
        n
      }
      timed(s"asof[$label]") {
        val clicks = e.filter(col("event_type") === "click")
          .select("user_id", "event_id", "tsu")
        val errors = e.filter(col("event_type") === "error")
          .groupBy("user_id", "tsu").agg(max("value").as("eval"))
          .withColumnRenamed("tsu", "etsu")
        val j = graft.ops.Events.asofJoin(clicks, errors, Seq("user_id"),
          "tsu", "etsu", Seq("etsu", "eval"), prefix = "err_")
        // modular sum: a raw sum of epoch-micros over 2M rows
        // overflows int64 under ANSI mode. ONE execution: the row
        // count comes off the same aggregate (a second j.count()
        // would re-run the join and double the timed wall)
        j.agg(count(lit(1)), count(col("err_eval")),
          sum(col("err_etsu") % 1000000L))
          .collect()(0).getLong(0)
      }
    }
    }

    // ---- the DOUBLE-DIGIT regime (r14) — 30% of all rows on one
    // user, the concentration where per-key windows DO cliff and the
    // *Skewed time-block decompositions are the declared answer. Same
    // data volume both labels; each operator pair timed on both sets.
    if (section == "all" || section == "rolling") {
    val ev0 = Tables(spark, srcDir, "events")
    val evu = ev0.withColumn("tsu", Tables.tsMicros(ev0))
      .select("event_id", "user_id", "tsu", "event_type", "value")
    def evCopy(df: DataFrame, i: Int) =
      df.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off))
    for ((label, plant) <- Seq(("plain", false), ("hot30pct", true))) {
      val base = stack(evu)(evCopy)
        .withColumn("v", floor(col("value")).cast("long"))
      val out =
        if (plant) base.withColumn("user_id",
          when(col("event_id") % 10 < 3, lit(42L))
            .otherwise(col("user_id")))
        else base
      out.write.mode("overwrite").parquet(s"$scratch/roll_$label.parquet")
    }
    val day = 86400000000L
    def asofOf(variant: String)(e: DataFrame): DataFrame = {
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "event_id", "tsu")
      val errors = e.filter(col("event_type") === "error")
        .groupBy("user_id", "tsu").agg(max("value").as("eval"))
        .withColumnRenamed("tsu", "etsu")
      if (variant == "plain")
        graft.ops.Events.asofJoin(clicks, errors, Seq("user_id"),
          "tsu", "etsu", Seq("etsu", "eval"), prefix = "err_")
      else
        graft.ops.Events.asofJoinSkewed(clicks, errors, Seq("user_id"),
          "tsu", "etsu", Seq("etsu", "eval"), span = day, prefix = "err_")
    }
    for (label <- Seq("plain", "hot30pct");
         (op, f) <- Seq[(String, DataFrame => DataFrame)](
           ("rollingAgg", d => graft.ops.Events.rollingAgg(
             d, "user_id", "tsu", "v", span = day)
             .agg(sum(col("roll_n")), sum(col("roll_sum") % 1000000L))),
           ("rollingAggSkewed", d => graft.ops.Events.rollingAggSkewed(
             d, "user_id", "tsu", "v", span = day)
             .agg(sum(col("roll_n")), sum(col("roll_sum") % 1000000L))),
           ("sessionize", d => graft.ops.Events.sessionize(
             d, "user_id", "tsu", "event_id", gap = 600L * 1000000L)
             .agg(sum(col("session_id")))),
           ("sessionizeSkewed", d => graft.ops.Events.sessionizeSkewed(
             d, "user_id", "tsu", "event_id", gap = 600L * 1000000L,
             span = day).agg(sum(col("session_id")))),
           ("asofJoin", asofOf("plain")(_)
             .agg(count(col("err_eval")), sum(col("err_etsu") % 1000000L))),
           ("asofJoinSkewed", asofOf("skewed")(_)
             .agg(count(col("err_eval")), sum(col("err_etsu") % 1000000L))))) {
      val e = spark.read.parquet(s"$scratch/roll_$label.parquet")
      val n = e.count()
      timed(s"$op[$label] events=$n") {
        // each f aggregates over the produced columns (anti-pruning;
        // modular sums stay ANSI int64 safe); one execution
        f(e).collect()
        n
      }
    }
    }
    spark.stop()
  }
}
