package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-trigger cost of the streaming incremental-dedup index lookup at
  * a corpus-scale key set: the JOIN formulation
  * (StreamingDedup.dropNearDupsAgainstIndex — nBands stream-static
  * joins whose static side is the full distinct band-key set) vs the
  * BLOOM formulation (dropNearDupsAgainstIndexBloom — the key set
  * compressed into a plan-constant filter, map-only membership tests).
  * The r16 advice being priced: at billions of keys every trigger of
  * the join path pays multi-GB static-side work, while the bloom path
  * pays it ONCE at build. Survivor sets are compared (bloom ⊆ join —
  * false positives only over-drop).
  *
  * Usage: runMain graft.StreamBloomProbe [corpusRows] [batchRows] [triggers]
  */
object StreamBloomProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nBatch = if (args.length > 1) args(1).toInt else 20000
    val triggers = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def tok(id: org.apache.spark.sql.Column, i: Int) =
      concat(lit("t"), pmod(xxhash64(id, lit(i)), lit(50000)))
    def textOf(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 12).map(i => tok(id, i)): _*)
    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
    def time[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-40s $s%7.2f s")
      (r, s)
    }
    val (idx, _) = time("index build (shared one-time)") {
      graft.ops.Dedup.bandIndex(corpus, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    println(s"[probe] distinct band keys = " +
      idx.select("band_key").distinct().count())

    // one batch per trigger, every 100th doc a corpus near-copy
    def batchRows(t: Int): Seq[(Long, String)] = {
      val base = nCorpus * (t + 2)
      spark.range(nBatch)
        .select((col("id") + base).as("doc_id"),
          when(pmod(col("id"), lit(100)) === 0,
            textOf(pmod(xxhash64(col("id"), lit(t)), lit(nCorpus))))
            .otherwise(textOf(col("id") + base + nCorpus)).as("text"))
        .as[(Long, String)].collect().toSeq
    }
    val batches = (0 until triggers).map(batchRows)

    def drive(label: String,
              mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Set[Long], Seq[Double]) = {
      val input = MemoryStream[(Long, String)]
      val q = mk(input.toDF().toDF("doc_id", "text"))
        .writeStream.outputMode("append")
        .format("memory").queryName(label).start()
      try {
        val times = batches.zipWithIndex.map { case (b, i) =>
          input.addData(b: _*)
          time(s"$label trigger $i")(q.processAllAvailable())._2
        }
        (spark.table(label).select("doc_id")
          .collect().map(_.getLong(0)).toSet, times)
      } finally q.stop()
    }

    val (joinSurv, joinTimes) = drive("via_join", s =>
      graft.streaming.StreamingDedup.dropNearDupsAgainstIndex(
        s, idx, "text", numHashes = 4, bandSize = 1, k = 3))
    val (bloom, buildS) = time("bloom build (one-time)") {
      graft.ops.Dedup.bandKeyBloom(idx,
        numHashes = 4, bandSize = 1, k = 3, fpp = 0.001)
    }
    println(f"[probe] bloom bytes = ${bloom.bytes.length / 1048576.0}%.1f MiB " +
      s"over ${bloom.numKeys} keys")
    val (bloomSurv, bloomTimes) = drive("via_bloom", s =>
      graft.streaming.StreamingDedup.dropNearDupsAgainstIndexBloom(
        s, bloom, "text", numHashes = 4, bandSize = 1, k = 3))

    // steady-state per-trigger: drop the first trigger (plan warmup)
    def steady(ts: Seq[Double]) = ts.drop(1).sum / math.max(ts.length - 1, 1)
    println(f"[probe] per-trigger steady state: join=${steady(joinTimes)}%.2f s " +
      f"bloom=${steady(bloomTimes)}%.2f s " +
      f"(bloom one-time build $buildS%.1f s amortizes in " +
      f"${math.ceil(buildS / math.max(steady(joinTimes) - steady(bloomTimes), 1e-9)).toLong} triggers)")
    // no false negatives: anything the exact join dropped, the bloom
    // dropped too ⇔ bloom survivors ⊆ join survivors
    require(bloomSurv.subsetOf(joinSurv),
      s"bloom kept join-path drops: ${(bloomSurv -- joinSurv).take(5)}")
    println(s"[probe] survivors join=${joinSurv.size} bloom=${bloomSurv.size} " +
      s"(over-dropped by bloom FPs: ${(joinSurv -- bloomSurv).size})")
    spark.stop()
  }
}
