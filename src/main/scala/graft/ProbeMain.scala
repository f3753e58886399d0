package graft
import org.apache.spark.sql.SparkSession

object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sql = SparkEntry.oracleSql
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/probe_out/$n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/probe_out/${n}.sql"),
        sql(n).getBytes("UTF-8"))
      println(s"[probe] wrote $n")
    }
    spark.stop()
  }
}
