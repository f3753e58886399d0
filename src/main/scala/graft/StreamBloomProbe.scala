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

    // ---- DELTA MERGE (r17 missing #3): refresh the streaming bloom at
    // day-scale cost — delta bloom at the original geometry + bit-OR
    // merge — vs the corpus-scale rebuild it replaces. Byte-identity
    // proves the merged filter IS the rebuild.
    val survivors = spark.range(nBatch / 10)
      .select((col("id") + nCorpus * 100).as("doc_id"),
        textOf(col("id") + nCorpus * 101).as("text"))
    val (deltaIdx, _) = time("delta index build (day-scale)") {
      graft.ops.Dedup.bandIndexDelta(survivors, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    val (merged, mergeS) = time("delta bloom + merge (day-scale)") {
      graft.ops.Dedup.mergeKeyBlooms(bloom,
        graft.ops.Dedup.bandKeyBloomDelta(deltaIdx, sizedLike = bloom))
    }
    val (rebuiltU, rebuildS) = time("full rebuild over index UNION delta") {
      graft.ops.Dedup.bandKeyBloomDelta(
        idx.unionByName(deltaIdx.select(idx.columns.map(col): _*)),
        sizedLike = bloom)
    }
    require(java.util.Arrays.equals(merged.bytes, rebuiltU.bytes),
      "merged bloom != same-geometry rebuild")
    println(f"[probe] bloom refresh: merge=$mergeS%.2f s vs " +
      f"rebuild=$rebuildS%.2f s per admission cycle (bytes identical)")

    // ---- DELIVERY COST at corpus-scale filter size (r17 review #3).
    // Plan-constant delivery re-serializes the filter into every
    // trigger's task binary — nBands deserialized copies in one plan:
    // MEASURED at a 171 MiB (100M-key) sizing × 4 bands the task
    // serialization OOM'd an 8g driver outright (executor threads died
    // in ObjectInputStream.readArray before any row moved), which is
    // why bloomKeyFilter dispatches to the torrent-broadcast handle
    // above spark.graft.dedup.bloomBroadcastBytes (16 MiB default) and
    // shares ONE broadcast across the operator's bands. Here: both
    // deliveries priced at a survivable 34 MiB sizing, then the
    // broadcast path alone at the 171 MiB sizing the literal could not
    // carry.
    val (mid, _) = time("mid bloom build (sized for 20M keys)") {
      graft.ops.Dedup.bandKeyBloom(idx, numHashes = 4, bandSize = 1,
        k = 3, fpp = 0.001, sizeForKeys = Some(20000000L))
    }
    println(f"[probe] mid bloom bytes = ${mid.bytes.length / 1048576.0}%.1f MiB")
    spark.conf.set("spark.graft.dedup.bloomBroadcastBytes",
      Long.MaxValue.toString) // force plan-constant delivery
    val (litSurv, litTimes) = drive("mid_literal", s =>
      graft.streaming.StreamingDedup.dropNearDupsAgainstIndexBloom(
        s, mid, "text", numHashes = 4, bandSize = 1, k = 3))
    spark.conf.set("spark.graft.dedup.bloomBroadcastBytes", "0") // force broadcast
    val (bcSurv, bcTimes) = drive("mid_broadcast", s =>
      graft.streaming.StreamingDedup.dropNearDupsAgainstIndexBloom(
        s, mid, "text", numHashes = 4, bandSize = 1, k = 3))
    require(litSurv == bcSurv,
      "plan-constant and broadcast deliveries diverged")
    println(f"[probe] 34MiB-filter per-trigger steady state: " +
      f"plan-constant=${steady(litTimes)}%.2f s " +
      f"broadcast-handle=${steady(bcTimes)}%.2f s " +
      f"(first trigger: lit=${litTimes.head}%.2f s bc=${bcTimes.head}%.2f s)")
    val (big, _) = time("oversized bloom build (sized for 100M keys)") {
      graft.ops.Dedup.bandKeyBloom(idx, numHashes = 4, bandSize = 1,
        k = 3, fpp = 0.001, sizeForKeys = Some(100000000L))
    }
    println(f"[probe] oversized bloom bytes = ${big.bytes.length / 1048576.0}%.1f MiB")
    val (bigSurv, bigTimes) = drive("big_broadcast", s =>
      graft.streaming.StreamingDedup.dropNearDupsAgainstIndexBloom(
        s, big, "text", numHashes = 4, bandSize = 1, k = 3))
    spark.conf.unset("spark.graft.dedup.bloomBroadcastBytes")
    // same keys, more bits ⇒ fewer false positives ⇒ the big filter
    // can only keep MORE (never lose a true drop)
    require(bcSurv.subsetOf(bigSurv),
      "the bigger-geometry filter dropped a row the smaller kept")
    println(f"[probe] 171MiB-filter broadcast-handle per-trigger " +
      f"steady state: ${steady(bigTimes)}%.2f s " +
      f"(plan-constant at this size: OOM at task serialization — see " +
      "comment above)")
    spark.stop()
  }
}
