package graft
import org.apache.spark.sql.SparkSession

/** Time a chosen subset of SparkEntry.queries, in the order given on the
  * command line — the tool behind per-query investigations (run-position
  * effects, iterative-operator latency) that the full sorted Bench sweep
  * can't isolate. Same session shape and noop sink as Bench.
  *
  * Usage: runMain graft.BenchOne <q1> [q2 ...]   (sfDir/cpus from env,
  * same as Bench; pass --repeat=N to time each query N times.)
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeat = args.collectFirst { case a if a.startsWith("--repeat=") =>
      a.stripPrefix("--repeat=").toInt }.getOrElse(1)
    val names = args.filterNot(_.startsWith("--"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { // same warm-up as Bench so first-query numbers are comparable
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[benchone] warmup: $e") }
    val out = for (name <- names; r <- 1 to repeat) yield {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[benchone] $name: $e")
          e.printStackTrace()
          false }
      val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      val escaped = name.replace("\\", "\\\\").replace("\"", "\\\"")
      (ok, s"""{"query":"$escaped","run":$r,"sec":$t,"ok":$ok}""")
    }
    out.foreach(o => println(o._2))
    spark.stop()
    // scripted consumers sum "sec": a silent 0-exit with sec:-1 rows
    // would subtract failures from the total — hard-fail instead
    if (out.exists(!_._1)) sys.exit(1)
  }
}
