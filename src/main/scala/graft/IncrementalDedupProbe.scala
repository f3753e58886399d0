package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for INCREMENTAL dedup (Dedup.bandIndex /
  * nearDupsAgainstIndex) at corpus scale: a small daily batch against
  * a large indexed corpus vs re-running the full within-corpus
  * nearDupPairs over corpus ∪ batch — the claim being priced is
  * "never re-pair the corpus".
  *
  * Synthetic corpus: 12 tokens per doc drawn from a 50k vocabulary by
  * xxhash64 (distinct docs with heavy shingle reuse — adversarial for
  * banding). Every 100th batch doc is a near-copy of a corpus doc
  * (last token replaced: 3-shingle Jaccard 9/11 ≈ 0.818 ≥ the 0.8
  * threshold); the rest are new. Both paths must find EXACTLY the
  * same cross pairs (checksum-compared, not just counted).
  *
  * Usage: runMain graft.IncrementalDedupProbe [corpusRows] [batchRows]
  */
object IncrementalDedupProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nBatch = if (args.length > 1) args(1).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tok(id: org.apache.spark.sql.Column, i: Int) =
      concat(lit("t"), pmod(xxhash64(id, lit(i)), lit(50000)))
    def textOf(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 12).map(i => tok(id, i)): _*)
    // near-copy of corpus doc `src`: first 11 tokens identical, last
    // replaced — Jaccard 9/11 against the original
    def copyOf(src: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 11).map(i => tok(src, i)) :+ lit("zz"): _*)

    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
      .localCheckpoint()
    val src = pmod(xxhash64(col("id")), lit(nCorpus))
    val batch = spark.range(nBatch)
      .select((col("id") + nCorpus).as("doc_id"),
        when(pmod(col("id"), lit(100)) === 0, copyOf(src))
          .otherwise(textOf(col("id") + lit(2) * nCorpus)).as("text"))
      .localCheckpoint()

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }

    // one-time corpus cost (amortized over every future batch)
    val idx = time("index build (one-time)") {
      graft.ops.Dedup.bandIndex(corpus, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    // the daily job
    val incPairs = time("incremental: batch vs index") {
      graft.ops.Dedup.nearDupsAgainstIndex(batch, corpus, idx, "text",
        "doc_id", "doc_id", threshold = 0.8,
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    val nInc = incPairs.count()
    // the naive alternative: re-pair corpus ∪ batch, keep cross pairs
    val fullPairs = time("naive: re-pair corpus UNION batch") {
      graft.ops.Dedup.nearDupPairs(corpus.unionByName(batch), "text",
          "doc_id", threshold = 0.8, numHashes = 4, bandSize = 1, k = 3)
        .filter((col("id_a") >= nCorpus) =!= (col("id_b") >= nCorpus))
        .select(
          greatest(col("id_a"), col("id_b")).as("id_batch"),
          least(col("id_a"), col("id_b")).as("id_corpus"))
        .localCheckpoint()
    }
    val nFull = fullPairs.count()
    def checksum(d: org.apache.spark.sql.DataFrame) =
      d.select(xxhash64(col("id_batch"), col("id_corpus"))
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h")).head().get(0).toString
    val (ci, cf) =
      (checksum(incPairs.select("id_batch", "id_corpus")), checksum(fullPairs))
    println(s"[probe] pairs incremental=$nInc full-cross=$nFull " +
      s"checksums ${if (ci == cf) "MATCH" else s"MISMATCH $ci vs $cf"}")
    require(nInc == nFull && ci == cf, "incremental/full pair sets diverge")
    require(nInc >= nBatch / 100 / 2, s"planted dups not found: $nInc")

    // ---- r17 MAINTENANCE: admit batch1's survivors, dedup batch2 ----
    // The delta path (survivors' band keys as a day-scale side table,
    // query = index ∪ delta) vs the only pre-r17 alternative: a
    // corpus-scale index REBUILD per admission cycle. Both paths must
    // produce checksum-identical batch2 pairs, including pairs only
    // the delta can find (near-copies of batch1 survivors).
    val surv = time("survivors of batch1") {
      graft.ops.Dedup.dropNearDupsAgainstIndex(batch, corpus, idx, "text",
        "doc_id", "doc_id", threshold = 0.8,
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    // the grown content store (both paths need it for the verify)
    val corpus1 = corpus.unionByName(surv).localCheckpoint()
    // batch2: every 100th a near-copy of a CORPUS doc (index hit),
    // every (100th+1) a near-copy of a batch1 NEW doc (delta-only hit)
    val batch2 = spark.range(nBatch)
      .select((col("id") + 3 * nCorpus).as("doc_id"),
        when(pmod(col("id"), lit(100)) === 0, copyOf(src))
          .when(pmod(col("id"), lit(100)) === 1,
            copyOf(col("id") + lit(2) * nCorpus))
          .otherwise(textOf(col("id") + lit(4) * nCorpus)).as("text"))
      .localCheckpoint()
    val delta = time("delta append (survivor bands)") {
      graft.ops.Dedup.bandIndexDelta(surv, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    val viaDelta = time("batch2 vs index UNION delta") {
      graft.ops.Dedup.nearDupsAgainstIndex(batch2, corpus1, idx, "text",
        "doc_id", "doc_id", threshold = 0.8,
        numHashes = 4, bandSize = 1, k = 3,
        delta = Some(delta)).localCheckpoint()
    }
    val nDelta = viaDelta.count()
    val rebuilt = time("REBUILD index (corpus UNION surv)") {
      graft.ops.Dedup.bandIndex(corpus1, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    val viaRebuild = time("batch2 vs rebuilt index") {
      graft.ops.Dedup.nearDupsAgainstIndex(batch2, corpus1, rebuilt,
        "text", "doc_id", "doc_id", threshold = 0.8,
        numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
    }
    val nRebuild = viaRebuild.count()
    val (cd, cr) = (checksum(viaDelta.select("id_batch", "id_corpus")),
      checksum(viaRebuild.select("id_batch", "id_corpus")))
    val nDeltaOnly = viaDelta.filter(col("id_corpus") >= nCorpus).count()
    println(s"[probe] maintenance pairs delta=$nDelta rebuild=$nRebuild " +
      s"(delta-only hits=$nDeltaOnly) checksums " +
      s"${if (cd == cr) "MATCH" else s"MISMATCH $cd vs $cr"}")
    require(nDelta == nRebuild && cd == cr,
      "delta/rebuild pair sets diverge")
    require(nDeltaOnly > 0,
      "fixture must plant pairs only the delta can find")
    spark.stop()
  }
}
