package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end RESTARTABILITY at the 100× probe scale (r13 verdict
  * lead item): compose JSONL ingest → the certified curation chain
  * (Gopher rule gate → pinned quality classifier → DSIR resampling)
  * → [[graft.ops.Selection.writeShards]]; KILL the job mid-write;
  * prove [[graft.ops.Selection.verifyShards]] rejects the partial
  * output; rerun and prove the recovered `_MANIFEST.json` is
  * BYTE-IDENTICAL to an uninterrupted run's. Then repeat the claim
  * for the post-commit failure mode (a shard file lost after the
  * manifest landed).
  *
  * The kill is a real one: the write runs on its own thread inside a
  * Spark job group with `interruptOnCancel`, and the prober cancels
  * the group the moment the overwrite has destroyed the previous
  * committed state (observed as `_MANIFEST.json` disappearing) — the
  * worst possible moment, after the old output is gone and before
  * the new one is committed. Every stage of the chain is
  * deterministic for a fixed input (seeded Gumbel in DSIR, pinned
  * classifier weights, content-keyed shard assignment), which is the
  * property that makes kill-and-rerun converge.
  *
  * Usage: runMain graft.RestartProbe <scratchDir> [files] [linesPerFile]
  * Defaults: 8 files × 62500 lines = 500k docs (the SkewProbe 100×
  * document scale), 2% planted-malformed to exercise quarantine.
  */
object RestartProbe {
  private val filler = Array("alpha", "beta", "gamma", "delta", "data",
    "word", "unit", "item", "the", "of", "grid", "node", "pack", "form")

  /** Deterministic doc text: ~58 words, Gopher-passing shape (mwl in
    * band, all-alpha, stopwords present) except every 7th doc, which
    * is too short and must fail the minWords gate; even docs lean
    * "slow", odd docs lean "fast" so the classifier splits the
    * corpus nontrivially. */
  private[graft] def docText(id: Long): String = {
    val sb = new StringBuilder(360)
    val n = if (id % 7 == 3) 12 else 48
    var i = 0
    while (i < n) {
      sb.append(filler(((id + i * 31) % filler.length).toInt)).append(' ')
      i += 1
    }
    val (a, b) = if (id % 2 == 0) ("slow", "fast") else ("fast", "slow")
    var j = 0
    while (j < 8) { sb.append(a).append(' '); j += 1 }
    sb.append(b).append(' ').append(b)
    sb.toString
  }

  private[graft] def genCorpus(dir: java.nio.file.Path, files: Int,
                        linesPerFile: Int): Long = {
    java.nio.file.Files.createDirectories(dir)
    var planted = 0L
    for (f <- 0 until files) {
      val sb = new StringBuilder(linesPerFile * 360)
      var i = 0
      while (i < linesPerFile) {
        val id = f.toLong * linesPerFile + i
        if (id % 50 == 37) { // 2% malformed → quarantine
          sb.append(s"not json at all $id\n"); planted += 1
        } else {
          sb.append(s"""{"doc_id": $id, "text": "${docText(id)}", """)
          sb.append(s""""lang": "en", "source": "s${id % 7}"}\n""")
        }
        i += 1
      }
      java.nio.file.Files.writeString(dir.resolve(s"part$f.jsonl"),
        sb.toString)
    }
    planted
  }

  def main(args: Array[String]): Unit = {
    val scratch = java.nio.file.Paths.get(args(0))
    val files = if (args.length > 1) args(1).toInt else 8
    val linesPerFile = if (args.length > 2) args(2).toInt else 62500
    val jsonlDir = scratch.resolve("jsonl")
    val planted = genCorpus(jsonlDir, files, linesPerFile)
    val total = files.toLong * linesPerFile
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = scratch.resolve("shards").toString
    val manifestFile = scratch.resolve("shards").resolve("_MANIFEST.json")

    // The full curation chain, recomputed FROM THE SOURCE FILES on
    // every call — a restart re-derives everything, nothing is
    // carried in memory across "process" boundaries.
    var quarantined = -1L
    def curated(): DataFrame = {
      val r = graft.sources.Ingest.readJsonl(spark, jsonlDir.toString)
      if (quarantined < 0) quarantined = r.quarantine.count()
      val gated = graft.ops.RuleFilters.gopherFilter(r.docs, "text",
        minWords = 50, maxWords = 100000, minMwl = 3.0, maxMwl = 4.5,
        minAlphaFrac = 0.8, minStopHits = 1)
      graft.ops.QualityClassifier.filterByQuality(gated,
        PipelineQueries.qcWeights, PipelineQueries.qcDim, "text",
        cut = 0.0)
    }
    val nQuality = curated().count()
    val k = (nQuality * 3 / 5).toInt
    require(k > 1000, s"probe corpus too small after curation: $nQuality")
    def pipeline(): DataFrame = {
      val quality = curated()
      val picked = graft.ops.Dsir.resample(quality,
        quality.filter(col("lang") === "en"), "text", "doc_id",
        dim = 512, k = k, seed = 7)
      quality.join(picked.select("doc_id", "logw"), Seq("doc_id"))
        .select(col("doc_id"), col("text"), col("logw"))
    }
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[restart] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    println(s"[restart] lines=$total quarantined=$quarantined " +
      s"(planted=$planted) quality=$nQuality resample_k=$k")

    // ---- 1. uninterrupted run: the golden manifest ----------------
    timed("uninterrupted ingest→curate→writeShards") {
      graft.ops.Selection.writeShards(pipeline(), "text", "doc_id", 16, out)
    }
    graft.ops.Selection.verifyShards(spark, out)
    val golden = java.nio.file.Files.readString(manifestFile)

    // ---- 2. kill mid-write ----------------------------------------
    @volatile var killErr: Throwable = null
    val writer = new Thread(() => {
      spark.sparkContext.setJobGroup("restart-probe-kill",
        "writeShards under fire", interruptOnCancel = true)
      try graft.ops.Selection.writeShards(pipeline(), "text", "doc_id",
        16, out)
      catch { case e: Throwable => killErr = e }
    })
    writer.start()
    // wait for the overwrite to destroy the committed state (the
    // manifest vanishes at job start), then cancel mid-write — the
    // window where a crash loses BOTH the old and the new output
    val deadline = System.nanoTime() + 600L * 1000000000L
    while (writer.isAlive && java.nio.file.Files.exists(manifestFile)) {
      require(System.nanoTime() < deadline, "overwrite never started")
      Thread.sleep(2)
    }
    Thread.sleep(200) // let write tasks get files in flight
    spark.sparkContext.cancelJobGroup("restart-probe-kill")
    writer.join()
    require(killErr != null,
      "cancel did not interrupt the write (job finished too fast — " +
        "raise linesPerFile)")
    println(s"[restart] killed mid-write: ${killErr.getClass.getSimpleName}")
    val rejected =
      try { graft.ops.Selection.verifyShards(spark, out); None }
      catch { case e: Throwable => Some(e.getMessage.takeWhile(_ != '\n')) }
    require(rejected.isDefined,
      "verifyShards ACCEPTED the killed partial output")
    println(s"[restart] partial output rejected: ${rejected.get}")

    // ---- 3. blind rerun (the restart) -----------------------------
    timed("restart rerun") {
      graft.ops.Selection.writeShards(pipeline(), "text", "doc_id", 16, out)
    }
    graft.ops.Selection.verifyShards(spark, out)
    val recovered = java.nio.file.Files.readString(manifestFile)
    require(recovered == golden,
      "recovered manifest differs from the uninterrupted run's")
    println("[restart] rerun manifest is byte-identical to golden")

    // ---- 4. post-commit loss: a shard file vanishes ---------------
    val victim = {
      val walk = java.nio.file.Files.walk(scratch.resolve("shards"))
      try walk
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.toString.contains("shard="))
        .findFirst().orElseThrow()
      finally walk.close()
    }
    java.nio.file.Files.delete(victim)
    val lostCaught =
      try { graft.ops.Selection.verifyShards(spark, out); None }
      catch { case e: Throwable => Some(e.getMessage.takeWhile(_ != '\n')) }
    require(lostCaught.isDefined,
      "verifyShards ACCEPTED output with a lost shard file")
    println(s"[restart] lost shard file caught: ${lostCaught.get}")
    timed("recovery rerun") {
      graft.ops.Selection.writeShards(pipeline(), "text", "doc_id", 16, out)
    }
    graft.ops.Selection.verifyShards(spark, out)
    require(java.nio.file.Files.readString(manifestFile) == golden,
      "post-loss recovery manifest differs from golden")
    println("[restart] post-loss recovery manifest byte-identical; " +
      "restartability holds end-to-end at probe scale")
    spark.stop()
  }
}
