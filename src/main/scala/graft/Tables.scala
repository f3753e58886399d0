package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated TPC-H-ish test data
  * (see /root/repo/TESTDATA.md). Plain `spark.read.parquet` so filter
  * pushdown / column pruning reach the scan.
  */
object Tables {

  /** Per-session memo of loaded table frames. `spark.read.parquet`
    * re-lists the directory and re-reads footers for schema inference
    * on EVERY call — measured 60-150ms per query in the r12 floor
    * decomposition, paid 131× per sweep. Reusing the resolved
    * DataFrame (an immutable logical plan holding its FileIndex) pays
    * that once per (session, path). This mirrors what a production
    * deployment gets from a real catalog (metastore-cached schema +
    * file index) — it does NOT cache any data. Weak session keys: a
    * stopped, GC'd session drops its entry. Correctness caveat
    * (documented, acceptable for read-only test tables): files
    * rewritten under a cached path in the SAME session would serve a
    * stale file list. */
  private val frames =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.HashMap[String, DataFrame]]()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    frames.synchronized {
      val per = {
        val existing = frames.get(spark)
        if (existing != null) existing
        else {
          val m = scala.collection.mutable.HashMap.empty[String, DataFrame]
          frames.put(spark, m)
          m
        }
      }
      per.getOrElseUpdate(s"$sfDir/$name.parquet", {
        // Early testdata generations wrote events.ts as TIMESTAMP(NANOS),
        // which Spark rejects unless read as long (nanoseconds since
        // epoch); later generations write TIMESTAMP(MICROS). nanosAsLong
        // only affects the nanos encoding, so setting it keeps both
        // readable. Consumers that need wall time go through tsMicros,
        // which dispatches on whatever dtype actually loaded.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/$name.parquet")
      })
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
