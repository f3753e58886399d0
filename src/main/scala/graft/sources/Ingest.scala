package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corpus ingest sources. The engine's certified tables arrive as
  * parquet, but real crawls arrive as JSONL shards and text-file
  * trees; these readers normalize both into the `documents` shape
  * with an explicit corrupt-record policy — silent null-row ingestion
  * is how a 100 TB pipeline loses data without anyone noticing.
  *
  * Scale posture: both paths are plain `spark.read` sources — split
  * planning, predicate pushdown on the loaded frame, and partition
  * parallelism come from the datasource layer; nothing here adds a
  * shuffle. The sink half of the story is
  * [[graft.ops.Selection.writeShards]] (token-balanced parquet
  * shards).
  */
object Ingest {

  /** JSONL corpus reader with STRICT schema and quarantine: rows whose
    * JSON parses into the expected fields land in `docs`; malformed
    * lines land in `quarantine` with the raw line preserved — nothing
    * is silently dropped or nulled. `schema` defaults to the
    * documents-table shape. */
  final case class JsonlResult(docs: DataFrame, quarantine: DataFrame)

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", org.apache.spark.sql.types.LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentsSchema): JsonlResult = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark requires caching or a materialization barrier before
      // filtering on the corrupt-record column alone
      .cache()
    val docs = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    JsonlResult(docs, quarantine)
  }

  /** One document per text file under `path` (recursive): (doc_path,
    * text, n_bytes). `wholetext` keeps each file a single row — the
    * per-file granularity every ops.* text operator expects. */
  def readTextDir(spark: SparkSession, path: String,
                  glob: String = "*.txt"): DataFrame =
    spark.read.option("wholetext", "true")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .text(path)
      .select(
        input_file_name().as("doc_path"),
        col("value").as("text"),
        length(col("value")).cast("long").as("n_chars"))
}
