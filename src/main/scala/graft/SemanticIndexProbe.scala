package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the INCREMENTAL SEMANTIC path
  * (Similarity.semanticCellIndex / semanticNearDupsAgainstIndex): a
  * daily embedding batch against a persisted cell index vs re-running
  * the full within-corpus SemDeDup pair pass over corpus ∪ batch — the
  * same "never re-pair the corpus" claim IncrementalDedupProbe prices
  * for MinHash, here with the quadratic term per CELL (the naive path
  * recomputes every within-cell corpus self-pair; the index path only
  * ever forms batch × cell pairs).
  *
  * Synthetic corpus: dim-16 hash-derived vectors, k centroids seeded
  * from the first k corpus vectors. Every 100th batch vector is an
  * exact copy of a corpus vector (cos = 1 ≥ threshold); both paths
  * must find exactly the same cross pairs (checksum-compared).
  *
  * Usage: runMain graft.SemanticIndexProbe [corpusRows] [batchRows] [k]
  */
object SemanticIndexProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatch = if (args.length > 1) args(1).toLong else 5000L
    val k = if (args.length > 2) args(2).toInt else 512
    val dims = 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def vecOf(id: org.apache.spark.sql.Column) =
      array((0 until dims).map(d =>
        (pmod(xxhash64(id, lit(d)), lit(2000)).cast("double") / 1000.0
          - 1.0).cast("float")): _*)
    val corpus = spark.range(nCorpus)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"))
      .localCheckpoint()
    val src = pmod(xxhash64(col("id")), lit(nCorpus))
    val batch = spark.range(nBatch)
      .select((col("id") + nCorpus).as("vec_id"),
        when(pmod(col("id"), lit(100)) === 0, vecOf(src))
          .otherwise(vecOf(col("id") + lit(2) * nCorpus)).as("embedding"))
      .localCheckpoint()
    // centroids: the first k corpus vectors (spread by construction)
    val cents = corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
      .localCheckpoint()

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-38s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }
    val thr = 0.95
    val idx = time("cell index build (one-time)") {
      graft.ops.Similarity.semanticCellIndex(corpus, "vec_id",
        "embedding", cents).localCheckpoint()
    }
    val inc = time("incremental: batch vs cell index") {
      graft.ops.Similarity.semanticNearDupsAgainstIndex(batch, "vec_id",
        "embedding", idx, cents, thr).localCheckpoint()
    }
    val nInc = inc.count()
    val naive = time("naive: SemDeDup pairs over corpus UNION batch") {
      graft.ops.Similarity.semanticNearDupPairs(
          corpus.unionByName(batch), "vec_id", "embedding", cents, thr)
        .filter((col("id_a") >= nCorpus) =!= (col("id_b") >= nCorpus))
        .select(greatest(col("id_a"), col("id_b")).as("id_batch"),
          least(col("id_a"), col("id_b")).as("id_corpus"))
        .localCheckpoint()
    }
    val nNaive = naive.count()
    def checksum(d: org.apache.spark.sql.DataFrame) =
      d.select(xxhash64(col("id_batch"), col("id_corpus"))
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h")).head().get(0).toString
    val (ci, cn) = (checksum(inc.select("id_batch", "id_corpus")),
      checksum(naive))
    println(s"[probe] pairs incremental=$nInc naive-cross=$nNaive " +
      s"checksums ${if (ci == cn) "MATCH" else s"MISMATCH $ci vs $cn"}")
    require(nInc == nNaive && ci == cn,
      "incremental/naive semantic pair sets diverge")
    require(nInc >= nBatch / 100 / 2, s"planted dups not found: $nInc")
    spark.stop()
  }
}
