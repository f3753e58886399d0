package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived-scale dataset builder for scale-slope experiments.
  *
  * `/root/testdata` tops out at sf0.1 and is read-only, so the only way
  * to measure how wall time scales with rows (the empirical leg of the
  * 100 TB story — the reference validates scaling the same way with its
  * large-shape asv scenarios, asv_bench/benchmarks/cohorts.py:100-139)
  * is to derive a larger dataset in a scratch dir: `factor` stacked
  * copies of the source tables with seed-perturbed keys.
  *
  * Perturbation rules keep each copy's internal structure EXACTLY that
  * of the source, so ground truth scales linearly and any superlinear
  * wall-time growth is the engine's fault, not the data's:
  *  - ids (l_orderkey, event_id/user_id, doc_id, vec_id) shift by
  *    i * 10^9 per copy — disjoint ranges, and residues mod small
  *    constants are preserved (copy-0 keeps the benchmark doc_id < 50
  *    slice; every copy splits identically under doc_id % 10);
  *  - document TEXT in copy i > 0 gets a "_c<i>" suffix on every token:
  *    within-copy shingle equality is untouched (every doc transforms
  *    the same way) while cross-copy shingles can never collide, so the
  *    near-dup graph is `factor` disjoint copies of the source graph —
  *    pair count scales exactly linearly instead of densifying
  *    quadratically the way verbatim duplicate copies would;
  *  - embeddings keep their vectors (cross-copy cosine duplicates exist
  *    — fine for brute-force/IVF throughput, NOT a linear-truth setup
  *    for the embedding near-dup family; the slope experiment uses the
  *    text queries).
  *
  * Usage: runMain graft.ScaleData <srcDir> <outDir> <factor>
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val off = 1000000000L
    def build(name: String)(perturb: (DataFrame, Int) => DataFrame): Unit = {
      val src = Tables(spark, srcDir, name)
      val out = (0 until factor).map(i => perturb(src, i)).reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaledata] $name x$factor written")
    }
    build("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * off)))
    build("events")((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * off))
        .withColumn("user_id", col("user_id") + lit(i * off)))
    build("documents")((df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * off))
        .withColumn("text",
          if (i == 0) col("text")
          else regexp_replace(col("text"), "(\\S+)", "$1_c" + i)))
    build("embeddings")((df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * off)))
    spark.stop()
  }
}
