package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** STREAMING restartability at the 100× probe scale: the streaming
  * mirror of [[RestartProbe]], attacking the exactly-once contract of
  * [[graft.ops.Selection.writeShardsStream]] at the protocol level.
  *
  * The pipeline is the production shape: `readStream.text` over the
  * 8-shard / 500k-line JSONL corpus (2 files per trigger → 4 epochs)
  * → quarantine split → Gopher gate → pinned quality classifier →
  * per-epoch manifested shard sink. Two crash states are injected
  * exactly where Structured Streaming's recovery protocol
  * distinguishes them, by removing the checkpoint's `commits/<id>`
  * entry (a crash AFTER the offsets WAL wrote but BEFORE the batch
  * committed — precisely what a restart replays):
  *
  *  - crash AFTER the sink committed the epoch: replay must be a
  *    NO-OP (the epoch gate verifies the manifest against the files;
  *    file names carrying task UUIDs prove nothing was rewritten);
  *  - crash MID-EPOCH (manifest missing, a shard file truncated):
  *    replay must REWRITE the epoch whole and converge to a manifest
  *    byte-identical to the uninterrupted run's.
  *
  * Usage: runMain graft.StreamRestartProbe <scratchDir> [files] [linesPerFile]
  */
object StreamRestartProbe {
  def main(args: Array[String]): Unit = {
    val scratch = java.nio.file.Paths.get(args(0))
    val files = if (args.length > 1) args(1).toInt else 8
    val linesPerFile = if (args.length > 2) args(2).toInt else 62500
    val jsonlDir = scratch.resolve("jsonl")
    val planted = RestartProbe.genCorpus(jsonlDir, files, linesPerFile)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = scratch.resolve("epochs").toString
    val ckpt = scratch.resolve("ckpt").toString

    def startQuery() = {
      val r = graft.sources.Ingest.readJsonlStream(spark,
        jsonlDir.toString, graft.sources.Ingest.documentsSchema,
        Map("maxFilesPerTrigger" -> "2"))
      val gated = graft.ops.RuleFilters.gopherFilter(r.docs, "text",
        minWords = 50, maxWords = 100000, minMwl = 3.0, maxMwl = 4.5,
        minAlphaFrac = 0.8, minStopHits = 1)
      val curated = graft.ops.QualityClassifier.filterByQuality(gated,
        PipelineQueries.qcWeights, PipelineQueries.qcDim, "text",
        cut = 0.0)
      graft.ops.Selection.writeShardsStream(
        curated.select("doc_id", "text"), "text", "doc_id", 8, out, ckpt)
    }
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[srestart] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def epochFiles(e: Long): Set[String] = {
      val b = scala.collection.mutable.Set[String]()
      val walk =
        java.nio.file.Files.walk(java.nio.file.Paths.get(out, s"epoch=$e"))
      try walk.forEach(p =>
        if (p.getFileName.toString.startsWith("part-")) b += p.toString)
      finally walk.close()
      b.toSet
    }
    def manifest(e: Long): String = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, s"epoch=$e", "_MANIFEST.json"))

    // ---- 1. uninterrupted streaming run --------------------------
    val epochs = timed("streaming ingest→curate→shard (all epochs)") {
      val q = startQuery()
      try { q.processAllAvailable() } finally q.stop()
      graft.ops.Selection.verifyShardsStream(spark, out)
    }
    val expectedEpochs = (files + 1) / 2
    require(epochs.size == expectedEpochs,
      s"expected $expectedEpochs epochs, got $epochs")
    val golden = epochs.map(e => e -> manifest(e)).toMap
    val rowsPerEpoch = epochs.map(e =>
      spark.read.parquet(s"$out/epoch=$e").count())
    val batchCurated = {
      val r = graft.sources.Ingest.readJsonl(spark, jsonlDir.toString)
      val g = graft.ops.RuleFilters.gopherFilter(r.docs, "text",
        minWords = 50, maxWords = 100000, minMwl = 3.0, maxMwl = 4.5,
        minAlphaFrac = 0.8, minStopHits = 1)
      graft.ops.QualityClassifier.filterByQuality(g,
        PipelineQueries.qcWeights, PipelineQueries.qcDim, "text",
        cut = 0.0).count()
    }
    require(rowsPerEpoch.sum == batchCurated,
      s"conservation: ${rowsPerEpoch.sum} streamed vs $batchCurated batch")
    println(s"[srestart] ${files * linesPerFile} lines " +
      s"(planted=$planted) → $batchCurated curated docs across " +
      s"$expectedEpochs epochs ${rowsPerEpoch.mkString("[", ",", "]")}")

    val last = epochs.max
    val commitEntry = java.nio.file.Paths.get(ckpt, "commits", last.toString)
    require(java.nio.file.Files.exists(commitEntry),
      s"checkpoint layout surprise: $commitEntry missing")
    // drop the WAL commit AND its local-FS checksum sidecar (the
    // ChecksumFileSystem .crc would otherwise collide when the
    // replayed batch re-commits)
    def dropCommit(): Unit = {
      java.nio.file.Files.delete(commitEntry)
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(ckpt, "commits", s".$last.crc"))
    }

    // ---- 2. crash AFTER sink commit, BEFORE WAL commit -----------
    // restart must replay the batch and the epoch gate must SKIP
    dropCommit()
    val filesBefore = epochFiles(last)
    timed("restart (replay of a committed epoch)") {
      val q = startQuery()
      try { q.processAllAvailable() } finally q.stop()
    }
    require(epochFiles(last) == filesBefore,
      "replay of a committed epoch REWROTE it (exactly-once violated)")
    require(manifest(last) == golden(last), "manifest changed on replay")
    println(s"[srestart] replayed epoch $last skipped (file names " +
      "unchanged) — exactly-once holds across the WAL gap")

    // ---- 3. crash MID-EPOCH: manifest missing + truncated shard --
    dropCommit()
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(out, s"epoch=$last", "_MANIFEST.json"))
    val victim = java.nio.file.Paths.get(filesBefore.head)
    val raw = java.nio.file.Files.readAllBytes(victim)
    java.nio.file.Files.write(victim, raw.take(raw.length / 2))
    timed("restart (recovery of a half-written epoch)") {
      val q = startQuery()
      try { q.processAllAvailable() } finally q.stop()
    }
    require(manifest(last) == golden(last),
      "recovered epoch manifest differs from the uninterrupted run's")
    require(graft.ops.Selection.verifyShardsStream(spark, out) == epochs)
    println(s"[srestart] half-written epoch $last rewritten whole; " +
      "manifest byte-identical — streaming restartability holds " +
      "end-to-end at probe scale")
    spark.stop()
  }
}
