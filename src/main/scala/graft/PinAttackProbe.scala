package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B attack on the two weak-marked pins (r14 verdict #2, carried
  * from r13 #5): q_tfidf (3.7× at pin) and q_nunique (6.3× at pin).
  * Times every candidate plan shape warm at SPARK_GRAFT_SF_DIR so the
  * DESIGN adjudication rests on fresh numbers, not r14 memory.
  * Temporary diagnostic, not part of the library surface.
  *
  * Usage: runMain graft.PinAttackProbe [reps]
  */
object PinAttackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      // one untimed warm rep, then `reps` timed
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pin] $label%-24s min=${ts.min}%6.3f s  " +
        ts.map(t => f"$t%5.3f").mkString(" "))
    }

    val docs = Tables.spread(spark,
      Tables(spark, sfDir, "documents"), "doc_id")
    val li = Tables(spark, sfDir, "lineitem")

    // ---- q_tfidf variants --------------------------------------------
    val nonEmpty = docs.filter(length(trim(col("text"))) > 0)
    def tf = nonEmpty
      .select(col("doc_id"), explode(ops.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    def dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    def nDocs = nonEmpty.agg(count(lit(1)).as("__n"))

    def scored(dfq: DataFrame) = tf.join(dfq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", (col("tf") * col("__n")) / col("df"))

    // v0: the r14 window row_number form, kept INLINE so the A/B stays
    // reproducible after production moved to the agg-heap (r15)
    time("tfidf v0 window") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
      scored(dfreq)
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 3)
    }
    // prod: whatever tfidfTopTerms currently ships (r15: agg-heap)
    time("tfidf prod") {
      ops.TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 3)
    }
    // v1: per-doc heap via sort_array+slice (no window sort)
    def aggForm(dfq: DataFrame) = scored(dfq)
      .groupBy("doc_id")
      .agg(slice(sort_array(collect_list(struct(
        (-col("tfidf")).as("nt"), col("term").as("term"),
        col("tf").as("tf"), col("df").as("df")))), 1, 3).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), col("col.term").as("term"),
        col("col.tf").as("tf"), col("col.df").as("df"),
        (-col("col.nt")).as("tfidf"), (col("pos") + 1).cast("long").as("rank"))
    time("tfidf v1 agg-heap") { aggForm(dfreq) }
    // v2: window form with an explicit broadcast of dfreq
    time("tfidf v2 bcast-join") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
      scored(broadcast(dfreq))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 3)
    }
    // v3: agg form + broadcast dfreq
    time("tfidf v3 agg+bcast") { aggForm(broadcast(dfreq)) }

    // ---- q_nunique variants ------------------------------------------
    // v0: production (two-distinct-agg Expand plan)
    time("nunique v0 expand") {
      api.GroupByReduce.multi(li, Seq("l_returnflag"), Seq(
        ("l_orderkey", "nunique", "n_orders"),
        ("l_suppkey", "nunique", "n_supps")))
    }
    // v1: split two single-distinct aggs + join
    time("nunique v1 split-join") {
      val a = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val b = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supps"))
      a.join(b, Seq("l_returnflag")).orderBy("l_returnflag")
    }
    // v2: manual two-level (distinct pre-agg then count) per column
    time("nunique v2 twolevel") {
      val a = li.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_orders"))
      val b = li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_supps"))
      a.join(b, Seq("l_returnflag")).orderBy("l_returnflag")
    }
    spark.stop()
  }
}
