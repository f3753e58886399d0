package graft.streaming

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for ingest pipelines: fingerprint the
  * content, then `dropDuplicatesWithinWatermark` — the state store
  * keeps one entry per fingerprint only until the watermark passes it,
  * so state is bounded by the dedup horizon instead of the stream's
  * whole history (a full-history streaming dedup is a memory leak by
  * construction at 100 TB/day ingest rates).
  */
object StreamingDedup {

  /** Emit only the first occurrence of each content fingerprint within
    * the watermark horizon. `tsCol` is the event-time column the
    * watermark is declared on. */
  def dropExactWithinWatermark(df: DataFrame, textCol: String,
                               tsCol: String,
                               delay: String = "10 minutes"): DataFrame =
    df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
