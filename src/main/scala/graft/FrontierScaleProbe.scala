package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pricing frontierPlan's designed scale story (r19 verdict #7): the
  * per-domain rank is `GlobalScan.groupedRowNumber` — range-partitioned
  * with boundary-only bookkeeping — NOT a `Window.partitionBy(domain)`,
  * because budgets are VARIABLE per domain (a bounded heap needs one
  * constant k) and a mega-domain must never sort on one task. This
  * probe makes the trade measurable: one registered domain holds 30%
  * of a 10M-row frontier, budgets vary per domain, and the SAME
  * schedule is computed through frontierPlan and through the window
  * control — wall-clock AND max single-task time (the straggler
  * number the window form cannot bound).
  *
  * Usage: runMain graft.FrontierScaleProbe [nRows]
  *
  * Measured (local[32], 2026-08-16, 10M rows, mega domain 30%):
  * frontierPlan 18.8 s wall / 5.6 s max task; window control 14.5 s
  * wall / 9.7 s max task. HONEST adjudication (the capPerDomain-heap
  * pattern): the window WINS local wall-clock ~1.3× — Tungsten's
  * radix sort is cheap when 3M rows fit one task's memory — but its
  * max task is 1.72× the range-partitioned one's because the
  * mega-domain's whole sort runs on ONE task, and that number grows
  * linearly with the domain while frontierPlan's grows with the
  * range-partition size. At 10^8-row domains
  * (blogspot-as-one-registered-domain) the window's single task
  * spills and straggles while the range partitions scale with the
  * cluster — the distribution property is what a SCHEDULE exists
  * for. Same output rows either way (asserted).
  */
object FrontierScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val d = te.taskInfo.duration
        maxTaskMs.updateAndGet(m => math.max(m, d))
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def time[A](label: String)(body: => A): (A, Double, Double) = {
      maxTaskMs.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously (the bus is private API);
      // a short settle keeps the max-task read honest on a probe box
      Thread.sleep(500)
      val mt = maxTaskMs.get() / 1e3
      println(f"[probe] $label%-48s $s%7.1f s  (max task $mt%6.1f s)")
      (r, s, mt)
    }

    // 30% of rows on ONE registered domain, the rest spread over
    // ~100k domains — the blogspot shape a cap/schedule exists for
    val urls = spark.range(n).select(
      col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) < 3, lit("https://mega-news.com/p/"))
        .otherwise(concat(lit("https://h"),
          pmod(xxhash64(col("id")), lit(100000)).cast("string"),
          lit("-news.com/p/"))).as("u0"),
      pmod(xxhash64(col("id"), lit(3)), lit(1000000)).as("score"))
      .select(col("doc_id"),
        concat(col("u0"), col("doc_id").cast("string")).as("url"),
        col("score"))
      .localCheckpoint()
    // VARIABLE budgets (what rules out a constant-k heap): the mega
    // domain gets 100k, every other domain 1..50 by hash
    val budgets = urls
      .select(graft.ops.Web.registeredDomainOfUrl(col("url"))
        .as("domain")).distinct()
      .select(col("domain"),
        when(col("domain") === "mega-news.com", lit(100000L))
          .otherwise(pmod(xxhash64(col("domain")), lit(50L)) + 1L)
          .as("budget"))
      .localCheckpoint()
    val delays = Seq(("mega-news.com", 0.5)).toDF("host", "crawl_delay")

    // checksum over (domain, doc_id, rank): a bare COUNT is
    // tautologically equal (any rank permutation keeps min(budget, n)
    // rows per domain — r20 review find); the hash pins that the two
    // forms keep the SAME rows at the SAME ranks
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      // rank is long on the frontierPlan side, int from row_number —
      // cast before hashing (xxhash64 is type-sensitive). bit_xor,
      // not sum: a 2.6M-row sum of 64-bit hashes overflows Long under
      // ANSI mode, and xor is order-free over the distinct rows
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(domain, doc_id, cast(rank as bigint)))"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val ((nf, cf), tf, mf) = time(s"[$n] frontierPlan (groupedRowNumber)") {
      checksum(graft.ops.Web.frontierPlan(urls, "url", "score", "doc_id",
        budgets, delays))
    }
    val ((nw, cw), tw, mw) =
      time(s"[$n] window control (partitionBy domain)") {
        import org.apache.spark.sql.expressions.Window
        val withDom = urls.withColumn("domain",
          graft.ops.Web.registeredDomainOfUrl(col("url")))
        checksum(withDom.join(budgets, "domain")
          .withColumn("rank",
            row_number().over(Window.partitionBy("domain")
              .orderBy(col("score").desc, col("doc_id").asc)))
          .filter(col("rank") <= col("budget")))
      }
    assert(nf == nw && cf == cw,
      s"schedules disagree: $nf/$cf vs $nw/$cw")
    println(f"[probe] [$n] rows both=$nf; wall ${tw / tf}%.2fx, " +
      f"max-task ${mw / mf}%.2fx vs the window control")
    spark.stop()
  }
}
