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

  /** Split a frame of raw JSONL lines (single string column `value`)
    * into typed docs + quarantine. Both outputs are lazy map-only
    * plans over the SAME line frame — no cache, no materialization
    * barrier: the "filter on the corrupt-record column alone"
    * restriction applies only to the JSON *datasource*, not to
    * `from_json`, so we read lines with the text source and parse per
    * branch. Declared cost of the no-cache posture: a consumer that
    * materializes BOTH outputs parses each line twice (two cheap text
    * scans + two codegen'd from_json passes) — at 100 TB that is two
    * streaming passes over the raw input, vs. the old `.cache()`
    * which retained 100% of the corpus in executor storage (the one
    * unbounded materialization the r12 verdict flagged). A line is
    * quarantined when from_json reports a corrupt record OR returns a
    * null struct (e.g. a blank line), so conservation — every line
    * lands in exactly one output — holds unconditionally. */
  private[sources] def splitJsonLines(lines: DataFrame,
                                      schema: StructType): JsonlResult = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    val opts = Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt_record")
    val parsed = lines.select(
      col("value"),
      from_json(col("value"), withCorrupt, opts).as("__j"))
    val bad = col("__j").isNull || col("__j._corrupt_record").isNotNull
    val docs = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col(s"__j.$f").as(f)).toSeq: _*)
    val quarantine = parsed.filter(bad)
      .select(coalesce(col("__j._corrupt_record"), col("value"))
        .as("raw_line"))
    JsonlResult(docs, quarantine)
  }

  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentsSchema): JsonlResult =
    splitJsonLines(spark.read.text(path), schema)

  /** Streaming mirror of [[readJsonl]]: the same quarantine split over
    * `readStream.text` micro-batches — map-only per batch, so the
    * conservation law carries over unchanged (StreamingSpec). Each
    * output is an independent streaming frame; start one sink per
    * branch. */
  def readJsonlStream(spark: SparkSession, path: String,
                      schema: StructType = documentsSchema,
                      readerOptions: Map[String, String] = Map.empty)
    : JsonlResult =
    splitJsonLines(
      spark.readStream.options(readerOptions).text(path), schema)

  /** One document per text file under `path` (recursive): (doc_path,
    * text, n_chars — CHARACTER count, `length(text)`, not bytes).
    * `wholetext` keeps each file a single row — the per-file
    * granularity every ops.* text operator expects. */
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
