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

  /** CSV corpus reader with the SAME quarantine discipline as
    * [[readJsonl]] (text source + `from_csv` per branch — lazy
    * map-only plans, no cache; a corrupt line can never silently null
    * into the corpus). A line is quarantined when from_csv reports a
    * corrupt record, returns a null struct, or is blank. With
    * `header = true`, lines EQUAL to the canonical header
    * (`fieldNames mkString sep`) are dropped as metadata — they are
    * neither docs nor corruption, and in a multi-file corpus the
    * header repeats per shard; the conservation law becomes
    * docs + quarantine + headers == lines (IngestSpec). Quoted fields
    * containing the separator or escaped quotes follow from_csv's
    * standard quoting. CONTRACT: one record per physical line — the
    * line-grain quarantine is exactly what multiline quoted records
    * (embedded newlines) cannot have; sanitize newlines at write time
    * (q_csv_roundtrip does) or use [[readCsvMultiline]], which keeps
    * the quarantine discipline at record grain (q_csv_multiline). */
  final case class CsvResult(docs: DataFrame, quarantine: DataFrame)

  private[sources] def splitCsvLines(lines: DataFrame, schema: StructType,
                                     options: Map[String, String],
                                     header: Boolean): CsvResult = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    // RFC-4180 by default: doubled quotes escape a quote inside a
    // quoted field (Spark's own default escape is backslash, which
    // almost no CSV corpus uses); callers can override via `options`
    val opts = Map("escape" -> "\"") ++ options ++ Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt_record")
    val sep = options.getOrElse("sep", ",")
    // both the canonical and the writer-QUOTED header form are metadata
    // (some writers quote every field); documented contract: a data row
    // byte-equal to either header form is unrepresentable under the
    // line-grain reader — use readCsvMultiline (datasource header
    // handling) when that matters
    val hdr = schema.fieldNames.mkString(sep)
    val hdrQ = schema.fieldNames.map(f => "\"" + f + "\"").mkString(sep)
    val base =
      if (header) lines.filter(col("value") =!= hdr && col("value") =!= hdrQ)
      else lines
    val parsed = base.select(
      col("value"),
      from_csv(col("value"), withCorrupt, opts).as("__c"))
    val bad = col("__c").isNull || col("__c._corrupt_record").isNotNull ||
      trim(col("value")) === ""
    val docs = parsed.filter(!bad)
      .select(schema.fieldNames.map(f => col(s"__c.$f").as(f)).toSeq: _*)
    val quarantine = parsed.filter(bad)
      .select(coalesce(col("__c._corrupt_record"), col("value"))
        .as("raw_line"))
    CsvResult(docs, quarantine)
  }

  def readCsv(spark: SparkSession, path: String,
              schema: StructType = documentsSchema,
              options: Map[String, String] = Map.empty,
              header: Boolean = true): CsvResult =
    splitCsvLines(spark.read.text(path), schema, options, header)

  /** CSV reader for corpora whose quoted fields contain EMBEDDED
    * NEWLINES (multiline records) — the one shape [[readCsv]]'s
    * one-record-per-line contract excludes, and the norm in exported
    * CSVs. Uses the csv DATASOURCE with `multiLine = true` and the
    * same quarantine discipline at RECORD grain: PERMISSIVE mode +
    * corrupt-record column; malformed records land in `quarantine`
    * with the raw record text and the source file path, nothing is
    * silently nulled. Header handling is the datasource's own
    * per-file first-record drop, which also fixes both line-reader
    * header caveats: a writer-quoted header is recognized, and a data
    * row byte-equal to the header text is NOT swallowed (only the
    * first record per file is). Conservation (IngestSpec law):
    * docs + quarantine == records.
    *
    * Scale cost, declared: multiLine makes a file NON-SPLITTABLE
    * (record boundaries need the quote parser, so one file = one
    * task) — that is the format's cost, not the reader's; keep shards
    * modest at write time. Both outputs stay lazy map-only plans.
    *
    * Content normalization, declared (r17 review): the underlying
    * univocity parser NORMALIZES embedded CRLF inside quoted fields
    * to LF — raw bytes `"two\r\nlines"` parse as `two\nlines`. This
    * is the parser's line-ending auto-detection, not exposed through
    * Spark's CSV options, so it cannot be turned off here; it only
    * ever rewrites `\r\n`/`\r` line breaks INSIDE quotes to `\n`
    * (fingerprint-relevant if the same corpus is also ingested
    * through a byte-exact path — normalize line endings before
    * hashing, as the Cleaning ops already do). Pinned in IngestSpec
    * so a Spark/univocity upgrade changing it is caught.
    *
    * Plan note: quarantine's raw_record coalesces over the schema
    * fields deliberately — Spark refuses a scan whose required schema
    * is ONLY the internal corrupt-record column (SPARK-21610), and
    * the coalesce keeps real columns referenced without caching
    * (corrupt records short-circuit to the raw text, so the fallback
    * arm never shows in output). */
  def readCsvMultiline(spark: SparkSession, path: String,
                       schema: StructType = documentsSchema,
                       options: Map[String, String] = Map.empty,
                       header: Boolean = true): CsvResult = {
    val (withCorrupt, opts) = multilineReadSpec(schema, options, header)
    splitCsvRecords(
      spark.read.options(opts).schema(withCorrupt).csv(path), schema)
  }

  /** Streaming mirror of [[readCsvMultiline]] (the readCsvStream
    * pattern): the same record-grain split over the streaming csv
    * source's micro-batches — map-only per batch, conservation law
    * carries over (StreamingSpec). */
  def readCsvMultilineStream(spark: SparkSession, path: String,
                             schema: StructType = documentsSchema,
                             options: Map[String, String] = Map.empty,
                             header: Boolean = true,
                             readerOptions: Map[String, String] = Map.empty)
    : CsvResult = {
    val (withCorrupt, opts) = multilineReadSpec(schema, options, header)
    splitCsvRecords(
      spark.readStream.options(opts ++ readerOptions)
        .schema(withCorrupt).csv(path), schema)
  }

  private def multilineReadSpec(schema: StructType,
                                options: Map[String, String],
                                header: Boolean)
    : (StructType, Map[String, String]) = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType))
    val opts = Map("escape" -> "\"") ++ options ++ Map(
      "mode" -> "PERMISSIVE",
      "multiLine" -> "true",
      "header" -> header.toString,
      "columnNameOfCorruptRecord" -> "_corrupt_record")
    (withCorrupt, opts)
  }

  private def splitCsvRecords(parsed: DataFrame,
                              schema: StructType): CsvResult = {
    // SPARK-21610 guard: Spark refuses any query whose required schema
    // is ONLY the internal corrupt-record column — and `count()` over
    // either branch prunes to exactly that. Referencing a real field
    // inside the predicate in an always-true form the optimizer cannot
    // fold (no range analysis on coalesce(length(x), 0)) keeps one
    // data column in the scan without caching. Cost: one length() per
    // record, map-side.
    val touch =
      coalesce(length(col(schema.fieldNames.head).cast("string")),
        lit(0)) >= -1
    val bad = col("_corrupt_record").isNotNull && touch
    val docs = parsed.filter(col("_corrupt_record").isNull && touch)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = parsed.filter(bad)
      .select(
        coalesce(col("_corrupt_record"),
          concat_ws(",", schema.fieldNames.map(col).toSeq: _*))
          .as("raw_record"),
        input_file_name().as("file"))
    CsvResult(docs, quarantine)
  }

  /** Streaming mirror of [[readCsv]] (the readJsonlStream pattern):
    * the same split over `readStream.text` micro-batches. */
  def readCsvStream(spark: SparkSession, path: String,
                    schema: StructType = documentsSchema,
                    options: Map[String, String] = Map.empty,
                    header: Boolean = true,
                    readerOptions: Map[String, String] = Map.empty)
    : CsvResult =
    splitCsvLines(spark.readStream.options(readerOptions).text(path),
      schema, options, header)

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
