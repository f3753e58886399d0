package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed by per-partition batch functions.
  *
  * The Spark-side shape is real and tested — schema, partition-parallel
  * decode, batch iteration, typed output. The pixel/sample decode itself
  * is a clearly-marked deterministic STUB (image/audio codecs are not in
  * this container); swap `decodeImageStub` for an actual codec call and
  * nothing else changes.
  *
  * At 100 TB: media bytes dominate row size — `binary` columns stay in
  * parquet until the decode stage, `spark.sql.files.maxPartitionBytes`
  * sizes decode tasks, and the mapPartitions below never materializes
  * more than one batch per task.
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte])
  case class ImageMeta(id: Long, width: Int, height: Int, channels: Int,
                       bytes: Long, featureHash: Long)

  /** STUB decode: deterministic pseudo-metadata derived from the bytes.
    * Replace the body with a real codec (e.g. ImageIO / ffmpeg bindings)
    * — the signature (bytes in, typed meta + feature out) is the
    * production contract. */
  def decodeImageStub(id: Long, bytes: Array[Byte]): ImageMeta = {
    var h = 1125899906842597L // ??? real codec goes here — deterministic fake:
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    ImageMeta(id, w, ht, 3, bytes.length.toLong, h)
  }

  /** Partition-parallel decode: Dataset[MediaRow] -> Dataset[ImageMeta].
    * One decode call per row, streamed per partition — the Scala analog
    * of mapInPandas batch UDFs. */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(r => decodeImageStub(r.id, r.media)))
  }

  /** Build a media table from documents (text bytes standing in for
    * image payloads — the container has no codecs; the binary-column
    * plumbing is what's exercised). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("media")).as[MediaRow]
  }

  /** Frame-sampling shape for video-like payloads: split a binary blob
    * into fixed-size frame slices and explode — schema + partitioning
    * pattern for per-frame feature extraction. */
  def sampleFrames(df: DataFrame, binCol: String, idCol: String,
                   frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameBytes).cast("int")
    df.select(col(idCol), col(binCol),
      posexplode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(everyNth))))
      .withColumnRenamed("col", "frame_idx")
      .withColumn("frame", col(binCol).substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
      .drop(binCol, "pos")
  }
}
