package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated TPC-H-ish test data
  * (see /root/repo/TESTDATA.md). Plain `spark.read.parquet` so filter
  * pushdown / column pruning reach the scan.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Early testdata generations wrote events.ts as TIMESTAMP(NANOS),
    // which Spark rejects unless read as long (nanoseconds since
    // epoch); later generations write TIMESTAMP(MICROS). nanosAsLong
    // only affects the nanos encoding, so setting it keeps both
    // readable. Consumers that need wall time go through tsMicros,
    // which dispatches on whatever dtype actually loaded.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Event-time micros-since-epoch as BIGINT, robust to every physical
    * encoding the driver has generated events.ts with: nanos-as-long
    * (TIMESTAMP(NANOS) under nanosAsLong), TimestampType, or NTZ.
    * The NTZ→TZ cast interprets in the session timezone; Verify and
    * the test harness pin it to UTC so this matches DuckDB epoch_us.
    */
  def tsMicros(df: DataFrame, name: String = "ts"): Column =
    df.schema(name).dataType match {
      case LongType         => expr(s"$name div 1000")
      case TimestampType    => unix_micros(col(name))
      case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time dtype for '$name': $other")
    }
}
