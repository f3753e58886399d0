package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the quantile tiers at the DESIGN r12
  * reference point: 60M rows / 3 mega-groups, local[32]. Compares
  * the unweighted tiers (buffered / sketch-bracket distributed / GK
  * approx) and, when selected, the weighted tiers (buffered CDF walk
  * vs run-compressed distributed prefix sum) on identical data, and
  * asserts the distributed tiers' values bit-match their buffered
  * paths.
  *
  * Usage: runMain graft.QdistProbe [rows] [tiers]
  *   tiers: comma list of buf,dist,gk,wbuf,wdist
  *          (default buf,dist,gk; the DESIGN r14 weighted numbers
  *          come from `SPARK_DRIVER_MEM=48g ... 60000000 wbuf,wdist`
  *          — wbuf at that scale needs the whole 48 GB heap)
  */
object QdistProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000000L
    val tiers = if (args.length > 1) args(1).split(",").toSet
      else Set("buf", "dist", "gk")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NOTE: local-mode driver heap is the forked run JVM's -Xmx,
      // which build.sbt sets from SPARK_DRIVER_MEM (sbt -J flags only
      // raise sbt's own JVM — r14 cont., found when the weighted 60M
      // point OOM'd under a misdirected -J-Xmx48g). Launch with
      // `SPARK_DRIVER_MEM=48g sbt "runMain ..."` for the 60M point;
      // the buffered tiers' single-task buffers are the binding
      // constraint (weighted buffered needs all 48g there).
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
          val si = sc.stageInfo
          val secs = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield (a - b) / 1e3).getOrElse(-1.0)
          val m = si.taskMetrics
          println(f"[stage] ${si.stageId}%4d ${secs}%7.1f s " +
            f"tasks=${si.numTasks}%4d " +
            f"in=${m.inputMetrics.recordsRead}%11d " +
            f"sr=${m.shuffleReadMetrics.recordsRead}%11d " +
            f"sw=${m.shuffleWriteMetrics.recordsWritten}%11d " +
            si.name.take(60))
          println("    details: " + si.details.linesIterator
            .filter(l => l.contains("graft") || l.contains("GlobalScan"))
            .take(2).mkString(" <- "))
        }
      })
    import spark.implicits._
    // 3 mega-groups, deterministic mixed-distribution values
    val df = spark.range(n).select(
      (col("id") % 3).as("k"),
      (pmod(hash(col("id")), lit(1000000)).cast("double") / 1000.0 +
        when(col("id") % 1000 === 0, 500.0).otherwise(0.0)).as("value"))
      .localCheckpoint() // pin input out of the timed region
    val qs = Seq(0.25, 0.5, 0.9)
    def timed(label: String)(body: => Array[org.apache.spark.sql.Row])
      : Array[org.apache.spark.sql.Row] = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[qdist] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val buf = if (!tiers("buf")) Array.empty[org.apache.spark.sql.Row]
    else timed("buffered in-task sort (bounded-group tier)") {
      api.GroupByReduce(df, Seq("k"), "value", "quantile", "qs",
        graft.aggs.ReduceOptions(q = qs)).collect()
    }
    val dist = if (!tiers("dist")) Array.empty[org.apache.spark.sql.Row]
    else timed("sketch-bracket distributed (unbounded tier, r14)") {
      api.GroupByReduce.quantileDistributed(df, Seq("k"), "value", qs,
        "qs").collect()
    }
    if (tiers("gk")) timed("GK sketch approx (approximate tier)") {
      api.GroupByReduce(df, Seq("k"), "value", "quantile", "qs",
        graft.aggs.ReduceOptions(q = qs, approxQuantile = true)).collect()
    }
    // weighted tiers (r14 cont.): same data with frequency weights
    // 1..7 — buffered collect_list CDF walk vs the run-compressed
    // distributed prefix-sum pick
    val wdf = df.withColumn("w", pmod(hash(col("value")), lit(7)) + 1)
    val wbuf = if (!tiers("wbuf")) Array.empty[org.apache.spark.sql.Row]
    else timed("weighted buffered CDF walk (bounded-group tier)") {
      api.GroupByReduce.weighted(wdf, Seq("k"), "value", "w",
        Seq(("wquantile", "r")),
        graft.aggs.ReduceOptions(q = Seq(0.9))).collect()
    }
    val wdist = if (!tiers("wdist")) Array.empty[org.apache.spark.sql.Row]
    else timed("weighted distributed prefix-sum pick (unbounded tier)") {
      api.GroupByReduce.weightedQuantileDistributed(
        wdf, Seq("k"), "value", "w", Seq(0.9), "r").collect()
    }
    if (tiers("wbuf") && tiers("wdist")) {
      val bm = wbuf.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val dm = wdist.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      require(bm.keySet == dm.keySet)
      bm.foreach { case (k, b) =>
        require(java.lang.Double.doubleToRawLongBits(b) ==
          java.lang.Double.doubleToRawLongBits(dm(k)), s"group $k: $b vs ${dm(k)}")
      }
      println(s"[qdist] weighted distributed tier bit-matches buffered at $n rows")
    }
    if (tiers("buf") && tiers("dist")) {
      val bm = buf.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val dm = dist.map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      require(bm.keySet == dm.keySet)
      bm.foreach { case (k, vs) =>
        vs.zip(dm(k)).foreach { case (b, d) =>
          require(java.lang.Double.doubleToRawLongBits(b) ==
            java.lang.Double.doubleToRawLongBits(d), s"group $k: $b vs $d")
        }
      }
      println("[qdist] distributed tier bit-matches buffered at 60M rows")
    }
    spark.stop()
  }
}
