package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish test data
  * (see /root/repo/TESTDATA.md). Plain `spark.read.parquet` so filter
  * pushdown / column pruning reach the scan.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark rejects unless
    // read as long (nanoseconds since epoch). Element order comes from
    // event_id; convert with `timestamp_micros(ts div 1000)` when wall
    // time is needed.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
