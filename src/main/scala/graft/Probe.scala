package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d.cache().count()
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    val n = graft.ops.TextAnalysis.tokenCount(col("text")).cast("long")
    val nChunks = when(n === 0, lit(0L)).otherwise(
      floor((greatest(n - 16, lit(0L)) + 11) / 12).cast("long") + 1)
    val base = d.select(col("doc_id"), toks.as("__toks"), nChunks.as("__nc"))
      .filter(col("__nc") > 0)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
    for (r <- 1 to 3) time(s"explode-only r$r") {
      noop(base.select("doc_id", "chunk_idx"))
    }
    for (r <- 1 to 3) time(s"explode+slice r$r") {
      noop(base.select(col("doc_id"), col("chunk_idx"),
        slice(col("__toks"), (col("chunk_idx") * 12 + 1).cast("int"), lit(16)).as("__w")))
    }
    for (r <- 1 to 3) time(s"explode+slice+size r$r") {
      noop(base.select(col("doc_id"), col("chunk_idx"),
        size(slice(col("__toks"), (col("chunk_idx") * 12 + 1).cast("int"), lit(16))).as("nt")))
    }
    for (r <- 1 to 3) time(s"full+array_join r$r") {
      noop(base.select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("__toks"), (col("chunk_idx") * 12 + 1).cast("int"), lit(16)), " ").as("t")))
    }
    spark.stop()
  }
}
