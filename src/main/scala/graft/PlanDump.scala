package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for chosen queries to files — the
  * r21 optimization round's plan-evidence tool (the judge checks plan
  * claims against `plans/r21/<query>_{before,after}.txt`). Driver-side
  * plan compilation only, except the eager actions (localCheckpoint)
  * some query constructors run.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1> [q2 ...]
  *        (sfDir/cpus from env, same as Bench; suffix is e.g.
  *        "before" / "after")
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name: $e")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
