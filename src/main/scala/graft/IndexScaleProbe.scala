package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** How the DAILY incremental-dedup job scales with CORPUS size — the
  * extrapolation evidence behind "the index never moves": at each
  * corpus scale, price (a) the one-time persisted-bucketed index build
  * (Dedup.writeBandIndex — paid once per compaction cycle), (b) the
  * daily batch query against the bucketed Layout table (the production
  * shape: candidate join plans NO exchange on the index side), and
  * (c) the same query against an UNBUCKETED pinned index (the control:
  * every batch re-shuffles the corpus-sized band table). The batch is
  * CONSTANT size across scales, so (b)'s growth isolates the
  * corpus-proportional term a daily job cannot avoid (scanning the
  * co-located index files + the semi-pruned corpus text) from the
  * shuffle term the Layout removes — (c) minus (b) per batch, growing
  * with the corpus.
  *
  * Usage: runMain graft.IndexScaleProbe [scale1,scale2,...] [batchRows]
  */
object IndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(2000000L, 8000000L))
    val nBatch = if (args.length > 1) args(1).toLong else 20000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft_idx_scale").toString

    def tok(id: org.apache.spark.sql.Column, i: Int) =
      concat(lit("t"), pmod(xxhash64(id, lit(i)), lit(50000)))
    def textOf(id: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 12).map(i => tok(id, i)): _*)
    def copyOf(src: org.apache.spark.sql.Column) =
      concat_ws(" ", (0 until 11).map(i => tok(src, i)) :+ lit("zz"): _*)
    def time[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-44s $s%7.1f s")
      (r, s)
    }

    val results = scales.map { n =>
      val corpus = spark.range(n)
        .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
      val src = pmod(xxhash64(col("id")), lit(n))
      val batch = spark.range(nBatch)
        .select((col("id") + n).as("doc_id"),
          when(pmod(col("id"), lit(100)) === 0, copyOf(src))
            .otherwise(textOf(col("id") + lit(2) * n)).as("text"))
        .localCheckpoint()
      val table = s"idx_scale_$n"
      val (_, tWrite) = time(s"[$n] write bucketed index (one-time)") {
        graft.ops.Dedup.writeBandIndex(corpus, "text", "doc_id", table,
          64, numHashes = 4, bandSize = 1, k = 3,
          path = Some(s"$root/$table"))
      }
      def runQuery(idx: org.apache.spark.sql.DataFrame) =
        graft.ops.Dedup.nearDupsAgainstIndex(batch, corpus, idx, "text",
          "doc_id", "doc_id", threshold = 0.8,
          numHashes = 4, bandSize = 1, k = 3)
          .select(count(lit(1))).head().getLong(0)
      // warm both paths once (page cache), then time
      val layoutIdx = graft.api.Layout.table(spark, table)
      runQuery(layoutIdx)
      val (pairsB, tBucketed) =
        time(s"[$n] daily batch vs BUCKETED layout") { runQuery(layoutIdx) }
      val (flatIdx, tPin) = time(s"[$n] control: pin unbucketed index") {
        graft.ops.Dedup.bandIndex(corpus, "text", "doc_id",
          numHashes = 4, bandSize = 1, k = 3).localCheckpoint()
      }
      runQuery(flatIdx)
      val (pairsF, tFlat) =
        time(s"[$n] daily batch vs UNBUCKETED pinned") { runQuery(flatIdx) }
      require(pairsB == pairsF && pairsB >= nBatch / 100 / 2,
        s"paths diverge or planted dups missing: $pairsB vs $pairsF")
      graft.api.Caches.release(flatIdx)
      (n, tWrite, tBucketed, tFlat, tPin)
    }
    // economics, honestly: at single-node scale the in-MEMORY pinned
    // control can beat the parquet-reading layout per batch (memory
    // bandwidth vs disk), but (1) its per-batch gap CLOSES as the
    // corpus grows — the gap is the corpus-proportional shuffle term,
    // which on a real cluster is network — and (2) the control pays a
    // corpus-scale pin per SESSION, where the layout's one write
    // amortizes over every session and batch until the next compaction.
    results.foreach { case (n, w, b, f, p) =>
      println(f"[probe] corpus=$n%-9d write(one-time)=$w%6.1f s  " +
        f"batch-vs-layout=$b%6.1f s  batch-vs-pinned=$f%6.1f s  " +
        f"pin(per-session)=$p%6.1f s")
    }
    if (results.length >= 2) {
      val (n0, _, b0, f0, p0) = results.head
      val (n1, _, b1, f1, p1) = results.last
      println(f"[probe] corpus grew ${n1.toDouble / n0}%.1fx: " +
        f"layout batch cost grew ${b1 / b0}%.2fx (sub-linear; no index " +
        f"shuffle), pinned-control gap closed ${(f0 - b0) - (f1 - b1)}%.1f s " +
        f"(the corpus-proportional shuffle term), per-session pin grew " +
        f"${p1 / p0}%.1fx (the cost the persisted layout amortizes away)")
    }
    spark.stop()
  }
}
