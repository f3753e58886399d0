package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the persistent bucketed layout
  * ([[graft.api.Layout]]) at the DESIGN reference point: a 60M-row
  * fact table joined+aggregated against a 6M-row fact table on a 3M-
  * cardinality key, local[32]. Measures the economics the layout
  * claims: pay the layout shuffle ONCE at write time, then every later
  * join/agg on the bucket key reads co-partitioned files and plans
  * zero Exchange (asserted on the plan tree, not assumed). The
  * shuffled baseline reads the same data as plain parquet and pays
  * both exchanges per query.
  *
  * Usage: runMain graft.LayoutProbe [rows]
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val buckets = cpus.toInt
    val root = java.nio.file.Files
      .createTempDirectory("graft_layout_probe").toString

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // 60M-row fact A, 6M-row fact B, 3M-cardinality join key
    val keys = n / 20
    val a = spark.range(n).select(
      pmod(xxhash64(col("id")), lit(keys)).as("k"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / lit(10.0)).as("va"))
    val b = spark.range(n / 10).select(
      pmod(xxhash64(col("id"), lit(2)), lit(keys)).as("k"),
      (pmod(xxhash64(col("id"), lit(3)), lit(1000)) / lit(10.0)).as("vb"))

    time("write plain parquet (a+b)") {
      a.write.mode("overwrite").parquet(s"$root/plain_a")
      b.write.mode("overwrite").parquet(s"$root/plain_b")
    }
    time("write bucketed layout (a+b)") {
      api.Layout.writeBucketed(a, "layoutprobe_a", Seq("k"), buckets,
        Seq("k"), Some(s"$root/bucketed_a"))
      api.Layout.writeBucketed(b, "layoutprobe_b", Seq("k"), buckets,
        Seq("k"), Some(s"$root/bucketed_b"))
    }

    // the measured operator: join + per-key agg on the bucket key
    def joinAggCore(l: org.apache.spark.sql.DataFrame,
                    r: org.apache.spark.sql.DataFrame) =
      l.join(r, Seq("k"))
        .groupBy("k").agg(sum(col("va") * col("vb")).as("s"))
    // scalar summarizer so the probe materializes one row per run (its
    // own Exchange SinglePartition carries #partitions partial rows —
    // the declared scalar-agg shape, not part of the measured operator)
    def joinAgg(l: org.apache.spark.sql.DataFrame,
                r: org.apache.spark.sql.DataFrame) =
      joinAggCore(l, r)
        .agg(count(lit(1)).as("groups"), sum(when(col("s") > 0, 1)).as("pos"))

    val pa = spark.read.parquet(s"$root/plain_a")
    val pb = spark.read.parquet(s"$root/plain_b")
    val ba = api.Layout.table(spark, "layoutprobe_a")
    val bb = api.Layout.table(spark, "layoutprobe_b")

    val bucketedPlan = joinAggCore(ba, bb)
    require(api.Layout.shuffleExchanges(bucketedPlan) == 0,
      "bucketed join+agg planned an exchange:\n" +
        bucketedPlan.queryExecution.executedPlan)
    require(api.Layout.sortExecs(bucketedPlan) == 0,
      "bucketed join+agg planned a sort:\n" +
        bucketedPlan.queryExecution.executedPlan)

    // warm both inputs through the page cache once
    pa.agg(count(lit(1))).head(); pb.agg(count(lit(1))).head()
    ba.agg(count(lit(1))).head(); bb.agg(count(lit(1))).head()

    var shuffled: org.apache.spark.sql.Row = null
    var layout: org.apache.spark.sql.Row = null
    for (rep <- 1 to 2) {
      shuffled = time(s"join+agg shuffled (rep $rep)") {
        joinAgg(pa, pb).head()
      }
      layout = time(s"join+agg bucketed (rep $rep)") {
        joinAgg(ba, bb).head()
      }
    }
    println(s"[probe] results shuffled=$shuffled bucketed=$layout " +
      (if (shuffled == layout) "MATCH" else "MISMATCH"))
    require(shuffled == layout, "layout changed results")
    spark.stop()
  }
}
