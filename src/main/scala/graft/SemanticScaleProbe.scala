package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** How the DAILY incremental SEMANTIC dedup job scales with corpus
  * size — [[IndexScaleProbe]]'s extrapolation evidence applied to the
  * embedding modality's PQ-coded cell index: at each corpus scale,
  * price (a) the one-time persisted-bucketed PQ index build
  * (Similarity.writeSemanticCellIndexPq — paid once per compaction
  * cycle), (b) the daily batch's two-phase drop against the bucketed
  * Layout table (ADC screen at threshold − err(row), exact re-verify
  * on the sliver fetched from the corpus content store), and (c) the
  * control: the exact vector-carrying tier against an UNBUCKETED
  * pinned index (every batch re-shuffles the corpus-sized vector
  * payload — the r17 shape this tier retires). The batch is CONSTANT
  * size across scales, so (b)'s growth isolates the
  * corpus-proportional term (co-located code-file scan + sliver
  * fetch) from the vector-payload shuffle the PQ layout removes.
  * Survivor sets must MATCH (the per-row bound makes the two-phase
  * path exact).
  *
  * Usage: runMain graft.SemanticScaleProbe [scale1,scale2,...] [batchRows] [k]
  */
object SemanticScaleProbe {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(1000000L, 4000000L))
    val nBatch = if (args.length > 1) args(1).toLong else 20000L
    val k = if (args.length > 2) args(2).toInt else 512
    val dims = 16
    val (m, cps) = (16, 16) // subDim=1: the fidelity end (see SemanticIndexProbe)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("graft_sem_scale").toString

    def vecOf(id: org.apache.spark.sql.Column) =
      array((0 until dims).map(d =>
        (pmod(xxhash64(id, lit(d)), lit(2000)).cast("double") / 1000.0
          - 1.0).cast("float")): _*)
    def time[A](label: String)(body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-46s $s%7.1f s")
      (r, s)
    }
    val thr = 0.95

    val results = scales.map { n =>
      val corpus = spark.range(n)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      val src = pmod(xxhash64(col("id")), lit(n))
      val batch = spark.range(nBatch)
        .select((col("id") + n).as("vec_id"),
          when(pmod(col("id"), lit(100)) === 0, vecOf(src))
            .otherwise(vecOf(col("id") + lit(2) * n)).as("embedding"))
        .localCheckpoint()
      // centroids + codebook are build-time constants of the index
      // version (k-bounded / driver literals); train on the SMALL head
      // so their cost is scale-independent here
      val cents = corpus.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"),
          col("embedding").cast("array<double>").as("cv"))
        .localCheckpoint()
      val cb = graft.ops.Similarity.trainPq(
        corpus.filter(col("vec_id") < 100000L), "vec_id", "embedding",
        dims, m, cps, iters = 2)
      val table = s"sem_scale_$n"
      val (_, tWrite) = time(s"[$n] write bucketed PQ index (one-time)") {
        graft.ops.Similarity.writeSemanticCellIndexPq(corpus, "vec_id",
          "embedding", cents, cb, m, cps, table, 64,
          path = Some(s"$root/$table"))
      }
      def survPq(idx: org.apache.spark.sql.DataFrame) =
        graft.ops.Similarity.dropSemanticAgainstIndexPq(batch, "vec_id",
          "embedding", idx, corpus, "vec_id", "embedding", cents,
          cb, m, cps, thr)
          .select(count(lit(1))).head().getLong(0)
      // warm both paths once (page cache), then time
      val layoutIdx = graft.api.Layout.table(spark, table)
      survPq(layoutIdx)
      val (nPq, tLayout) =
        time(s"[$n] daily batch vs BUCKETED PQ layout") { survPq(layoutIdx) }
      val (exactIdx, tPin) =
        time(s"[$n] control: pin unbucketed VECTOR index") {
          graft.ops.Similarity.semanticCellIndex(corpus, "vec_id",
            "embedding", cents).localCheckpoint()
        }
      def survExact() =
        graft.ops.Similarity.dropSemanticAgainstIndex(batch, "vec_id",
          "embedding", exactIdx, cents, thr)
          .select(count(lit(1))).head().getLong(0)
      survExact()
      val (nExact, tExact) =
        time(s"[$n] daily batch vs UNBUCKETED vector index") { survExact() }
      require(nPq == nExact,
        s"two-phase PQ diverged from the exact tier: $nPq vs $nExact")
      require(nBatch - nPq >= nBatch / 100 / 2,
        s"planted dups not dropped: survivors=$nPq of $nBatch")
      graft.api.Caches.release(exactIdx)
      (n, tWrite, tLayout, tExact, tPin)
    }
    results.foreach { case (n, w, b, f, p) =>
      println(f"[probe] corpus=$n%-9d write(one-time)=$w%6.1f s  " +
        f"batch-vs-PQ-layout=$b%6.1f s  batch-vs-vector-pinned=$f%6.1f s  " +
        f"pin(per-session)=$p%6.1f s")
    }
    if (results.length >= 2) {
      val (n0, _, b0, f0, p0) = results.head
      val (n1, _, b1, f1, p1) = results.last
      println(f"[probe] corpus grew ${n1.toDouble / n0}%.1fx: " +
        f"PQ-layout batch cost grew ${b1 / b0}%.2fx, exact-pinned grew " +
        f"${f1 / f0}%.2fx, per-session vector pin grew ${p1 / p0}%.1fx " +
        "(the payload cost the PQ layout amortizes away)")
    }
    spark.stop()
  }
}
