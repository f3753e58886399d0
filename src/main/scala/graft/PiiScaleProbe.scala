package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sparse-PII 100× slope row (r12 verdict #4's "Done" clause): on the
  * 100× derived docs (SkewProbe's docs_plain.parquet, 500k docs),
  * measure (a) the DENSE regime — q_pii's construct, PII injected into
  * EVERY doc, full scrub; (b) the SPARSE 2% regime through the
  * mayContainPii-gated scrubSparse; (c) the same 2% corpus through the
  * UNGATED scrub — the A/B isolating what the prefilter buys when the
  * clean bulk dominates.
  *
  * Usage: runMain graft.PiiScaleProbe <docsParquet>
  */
object PiiScaleProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/skewprobe/docs_plain.parquet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // IMPORTANT fixture detail: ScaleData's copy suffix is "_c<i>" —
    // it puts DIGITS in every token of copies 1..99, which defeats the
    // two-digit necessary condition (the prefilter can never prune
    // that corpus: ~99% of "clean" docs still contain digit pairs).
    // Rewrite the digit suffixes to letters so the clean bulk is
    // genuinely prefilter-clean, as a real non-numeric crawl would be.
    val d0 = spark.read.parquet(docsPath).select(col("doc_id"),
        regexp_replace(col("text"), "[0-9]", "z").as("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .localCheckpoint()
    val injected = concat(col("text"),
      lit(" Contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com, call 415-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(", ip 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
      ((col("doc_id") * 7) % 256).cast("string"),
      lit(", ssn 123-45-6789, card 4111 1111 1111 1111."))
    val dense = d0.select(col("doc_id"), injected.as("text"))
      .localCheckpoint()
    val sparse = d0.select(col("doc_id"),
      when(col("doc_id") % 50 === 0, injected).otherwise(col("text"))
        .as("text"))
      .localCheckpoint()
    val n = dense.count()
    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.agg(sum(col("n_pii")), sum(length(col("redacted"))))
        .collect() // warm
      val t0 = System.nanoTime()
      val r = df.agg(sum(col("n_pii")), sum(length(col("redacted"))))
        .collect()(0)
      println(f"[pii100x] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"over $n docs (n_pii=${r.getLong(0)})")
    }
    timed("dense scrub (100% incidence)") {
      graft.ops.Pii.scrub(dense, "text")
    }
    timed("sparse scrubSparse (2% incidence, prefilter ON)") {
      graft.ops.Pii.scrubSparse(sparse, "text")
    }
    timed("sparse scrub (2% incidence, prefilter OFF)") {
      graft.ops.Pii.scrub(sparse, "text")
    }
    // long-document regime: ~3KB docs (a realistic crawl page) — here
    // per-pattern regex time scales with length and the single byte
    // scan should win decisively
    val sparseLong = d0.select(col("doc_id"),
      when(col("doc_id") % 50 === 0, concat(repeat(col("text"), 20), injected))
        .otherwise(repeat(col("text"), 20)).as("text"))
      .localCheckpoint()
    sparseLong.count()
    def timedL(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.agg(sum(col("n_pii")), sum(length(col("redacted")))).collect()
      val t0 = System.nanoTime()
      val r = df.agg(sum(col("n_pii")), sum(length(col("redacted"))))
        .collect()(0)
      println(f"[pii100x] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(n_pii=${r.getLong(0)})")
    }
    timedL("LONG sparse scrubSparse (3KB docs, prefilter ON)") {
      graft.ops.Pii.scrubSparse(sparseLong, "text")
    }
    timedL("LONG sparse scrub (3KB docs, prefilter OFF)") {
      graft.ops.Pii.scrub(sparseLong, "text")
    }
    spark.stop()
  }
}
