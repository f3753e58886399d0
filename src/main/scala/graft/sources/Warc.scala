package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** WARC (ISO 28500) crawl-archive reader — the format Common Crawl
  * and every Heritrix-style crawler ship, and the natural upstream of
  * the web curation family ([[graft.ops.Web]]: extract → canonicalize
  * → dedup → filter). Follows the Ingest quarantine posture: a
  * malformed record lands in the output WITH its error named, never
  * silently dropped — and parsing RESYNCS to the next record marker,
  * so one corrupt record does not eat the rest of a 1 GB archive.
  *
  * Scale posture: files load through Spark's `binaryFile` source
  * (split planning + file parallelism from the datasource layer); the
  * record parse is per-file imperative logic (mapPartitions-class —
  * the [[graft.ops.Multimodal]] decode convention, the one legitimate
  * use of the escape hatch). Parallelism is therefore PER FILE, and
  * the COMPRESSED file is held in memory while parsed (binaryFile
  * semantics): standard crawl rotation (~1 GB per WARC) fits an
  * executor; a pathological single-file dump does not — re-shard
  * upstream. `.warc.gz` (per-record gzip members) decompresses MEMBER
  * AT A TIME ([[parseGzMembers]]): decompressed memory is bounded by
  * the largest record (straddling records carry across members), not
  * the file; a corrupt member, inter-member garbage, a CRC mismatch,
  * or a member past `spark.graft.warc.maxMemberBytes` each quarantine
  * as ONE error-tagged row and the scan resyncs at the next member
  * magic — the same posture malformed WARC records get. The member
  * boundaries that would allow true mid-file SPLITS still need an
  * index sidecar real pipelines ship separately (documented non-goal
  * here).
  *
  * HTTP payloads of `response` records (Content-Type
  * `application/http`) are split into status + headers + body, so the
  * body can flow straight into [[graft.ops.Web.htmlToText]].
  */
object Warc {

  /** One parsed WARC record. `error == null` ⇔ well-formed;
    * `httpStatus == -1` ⇔ the payload is not a parsed HTTP message
    * (warcinfo/request/metadata records, or a response without an
    * HTTP head). `payload` is the HTTP BODY for parsed HTTP records,
    * the raw content block otherwise. */
  final case class WarcRecord(
      path: String, recordIdx: Int,
      warcType: String, targetUri: String, warcDate: String,
      recordId: String, contentType: String, contentLength: Long,
      httpStatus: Int, httpContentType: String,
      payload: Array[Byte], error: String)

  /** Default per-member decompressed-size cap for `.warc.gz` — far
    * above any sane record (WARC convention keeps records ≤ 1 GiB),
    * small enough that a pathological member quarantines instead of
    * eating executor heap. Override per session with
    * `spark.graft.warc.maxMemberBytes`. */
  val DefaultMaxMemberBytes: Long = 1L << 30

  /** Parse every record of every (path, content) file row. */
  def parseFiles(files: Dataset[(String, Array[Byte])],
                 maxMemberBytes: Long = DefaultMaxMemberBytes):
      Dataset[WarcRecord] =
    files.flatMap { case (path, content) =>
      if (path.endsWith(".gz")) parseGzMembers(path, content, maxMemberBytes)
      else parseRecords(path, content, maxMemberBytes)
    }(Encoders.product[WarcRecord])

  private def confMaxMember(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.warc.maxMemberBytes")
      .map(_.toLong).getOrElse(DefaultMaxMemberBytes)

  /** Read a directory/glob of `.warc` / `.warc.gz` files. */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
    parseFiles(files, confMaxMember(spark)).toDF()
  }

  /** Crawl archives → a documents-shaped corpus frame in one call:
    * well-formed 200-status HTML responses, text extracted
    * ([[graft.ops.Web.htmlToText]]), keyed by a doc_id that is STABLE
    * across re-reads of the same archives (xxhash64 of archive path +
    * record index — re-running ingest yields the same ids, so
    * downstream indexes and manifests stay valid). Columns:
    * (doc_id, url, text, n_chars). */
  def warcToDocuments(spark: SparkSession, path: String): DataFrame =
    documentsFromRecords(readWarc(spark, path))

  /** The crawl→documents projection over an ALREADY-READ records
    * frame — the shared tail of [[warcToDocuments]], so the indexed
    * ([[readWarcIndexed]]) and streaming ([[readWarcStream]]) readers
    * produce documents with IDENTICAL re-read-stable ids (the id is
    * xxhash64(path, recordIdx), and the sidecar reader reproduces
    * recordIdx bit-for-bit — WarcSpec law). */
  def documentsFromRecords(records: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    records
      // lower(): parseHttp lowercases only the header NAME, and real
      // crawls contain 'Text/HTML' values (r19 ADVICE fix)
      .filter(col("error").isNull && col("httpStatus") === 200 &&
        lower(col("httpContentType")).startsWith("text/html"))
      .select(
        xxhash64(col("path"), col("recordIdx")).as("doc_id"),
        col("targetUri").as("url"),
        // charset-AWARE decode (r20): header charset= param, then a
        // <meta charset> sniff, then UTF-8 — a latin-1 page decoded
        // blindly as UTF-8 shreds every non-ASCII char into U+FFFD
        // before extraction ever runs (WebKernels.decodeHtml)
        graft.ops.Web.htmlToText(
          graft.functions.VectorExprs.withKernels(call_function(
            "graft_decode_html", col("payload"),
            col("httpContentType")))).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** Common Crawl WET (extracted-text) archives → the documents
    * frame: WET is WARC whose `conversion` records carry the
    * ALREADY-EXTRACTED plain text (Content-Type text/plain) — the
    * entry point for pipelines that start from CC's text release
    * instead of raw HTML (skipping [[graft.ops.Web.htmlToText]]).
    * Same re-read-stable ids and (doc_id, url, text, n_chars) shape
    * as [[warcToDocuments]]; the leading warcinfo record and any
    * quarantined rows are excluded by the type/error gate. */
  def wetToDocuments(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    readWarc(spark, path)
      .filter(col("error").isNull && col("warcType") === "conversion" &&
        lower(col("contentType")).startsWith("text/plain"))
      .select(
        xxhash64(col("path"), col("recordIdx")).as("doc_id"),
        col("targetUri").as("url"),
        // a UTF-8 BOM at payload start decodes to U+FEFF and would
        // ride into every downstream tokenizer/fingerprint as a
        // phantom first character (r20 sweep find) — strip it; WET
        // payloads are UTF-8 by spec, so the BOM is pure marker
        regexp_replace(decode(col("payload"), "UTF-8"),
          "^\\uFEFF", "").as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** CONTINUOUS crawl ingest: a streaming reader over a landing
    * directory — each newly arriving `.warc`/`.warc.gz` file becomes
    * its records in the next micro-batch (the binaryFile format is a
    * FileFormat, so Spark's file stream source tracks arrivals and
    * never re-reads a processed archive). The parse is the same
    * stateless flatMap as the batch path, so every downstream
    * map-only stage (htmlToText, canonicalUrl, bloom URL dedup)
    * composes with zero state operators. */
  def readWarcStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // file stream sources demand an explicit schema; binaryFile's is
    // fixed by the format
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    val files = spark.readStream.format("binaryFile").schema(schema)
      .load(path)
      .select("path", "content").as[(String, Array[Byte])]
    parseFiles(files, confMaxMember(spark)).toDF()
  }

  // ---- member-at-a-time gunzip (r18 verdict #6 / r19 ADVICE #1) --------
  //
  // `.warc.gz` is one gzip member per record (the Common Crawl
  // convention), so decompressing MEMBER AT A TIME caps memory at the
  // largest record instead of the whole decompressed file, and gives
  // the gzip layer the same quarantine posture the WARC layer has: a
  // corrupt member becomes ONE error-tagged row and the scan resyncs
  // at the next member magic; garbage between/after members becomes an
  // error row instead of GZIPInputStream's silent truncation; a member
  // decompressing past the cap quarantines instead of OOMing the
  // executor. Records that straddle members (legal, non-CC layouts)
  // still parse: an incomplete record's bytes CARRY into the next
  // member's parse, so memory stays O(max record), never O(file).

  private sealed trait MemberResult
  private final case class MemberOk(bytes: Array[Byte], next: Int)
      extends MemberResult
  private final case class MemberErr(msg: String, next: Int)
      extends MemberResult

  /** Offset of the next gzip member magic (1f 8b 08) at/after `from`,
    * or `b.length` if none. */
  private def nextGzMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i <= b.length - 3) {
      if ((b(i) & 0xff) == 0x1f && (b(i + 1) & 0xff) == 0x8b &&
        b(i + 2) == 8) return i
      i += 1
    }
    b.length
  }

  /** Inflate ONE gzip member starting at `start`: RFC 1952 header
    * (FEXTRA/FNAME/FCOMMENT/FHCRC honored), raw-deflate body, CRC32
    * trailer verified. Output is retained only up to `cap` bytes —
    * past it the member keeps inflating (so the next-member offset
    * stays exact) but quarantines. */
  private def inflateMember(b: Array[Byte], start: Int,
                            cap: Long): MemberResult = {
    def resync = nextGzMagic(b, start + 1)
    if (start + 10 > b.length)
      return MemberErr(s"truncated gzip header at offset $start", b.length)
    if ((b(start) & 0xff) != 0x1f || (b(start + 1) & 0xff) != 0x8b)
      return MemberErr(s"bad gzip magic at offset $start", resync)
    if (b(start + 2) != 8)
      return MemberErr(
        s"unsupported gzip compression method ${b(start + 2)} at " +
          s"offset $start", resync)
    val flg = b(start + 3) & 0xff
    var p = start + 10
    try {
      if ((flg & 4) != 0) { // FEXTRA
        val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
        p += 2 + xlen
      }
      if ((flg & 8) != 0) { while (b(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (b(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
    } catch {
      case _: ArrayIndexOutOfBoundsException =>
        return MemberErr(s"truncated gzip header fields at offset $start",
          b.length)
    }
    if (p >= b.length)
      return MemberErr(s"gzip member at offset $start has no body", b.length)
    val inf = new java.util.zip.Inflater(true)
    val crc = new java.util.zip.CRC32
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val scratch = new Array[Byte](1 << 16)
    var total = 0L
    try {
      inf.setInput(b, p, b.length - p)
      while (!inf.finished()) {
        val n = inf.inflate(scratch)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary())
            return MemberErr(
              s"truncated deflate stream in gzip member at offset $start",
              b.length)
        } else {
          crc.update(scratch, 0, n)
          total += n
          if (total <= cap) out.write(scratch, 0, n)
        }
      }
      val consumed = inf.getBytesRead.toInt
      val trailerAt = p + consumed
      val next = math.min(trailerAt + 8, b.length)
      if (total > cap)
        return MemberErr(
          s"gzip member at offset $start decompresses to $total bytes, " +
            s"past the $cap-byte cap — re-shard or raise " +
            "spark.graft.warc.maxMemberBytes", next)
      if (trailerAt + 4 <= b.length) {
        val stored = (b(trailerAt) & 0xffL) |
          ((b(trailerAt + 1) & 0xffL) << 8) |
          ((b(trailerAt + 2) & 0xffL) << 16) |
          ((b(trailerAt + 3) & 0xffL) << 24)
        if (stored != crc.getValue)
          return MemberErr(
            s"gzip CRC mismatch in member at offset $start", next)
      } // a trailer cut off at EOF is tolerated, like a missing final CRLF
      MemberOk(out.toByteArray, next)
    } catch {
      case e: java.util.zip.DataFormatException =>
        MemberErr(
          s"corrupt gzip member at offset $start: ${e.getMessage}", resync)
    } finally inf.end()
  }

  /** Parse a `.warc.gz` file member by member — see the section
    * comment for the memory/quarantine contract. */
  private[graft] def parseGzMembers(path: String, gz: Array[Byte],
      maxMemberBytes: Long = DefaultMaxMemberBytes): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var idx = 0
    def emit(r: WarcRecord): Unit = { out += r.copy(recordIdx = idx); idx += 1 }
    def gzErr(msg: String): Unit =
      emit(WarcRecord(path, 0, null, null, null, null, null, -1L, -1, null,
        Array.emptyByteArray, msg))
    var carry = Array.emptyByteArray
    def flushCarry(): Unit = if (carry.nonEmpty) {
      // whatever is pending can no longer be completed — parse it to
      // the end, truncation errors and all (the EOF posture)
      parseRecords(path, carry, maxMemberBytes).foreach(emit)
      carry = Array.emptyByteArray
    }
    var pos = 0
    while (pos < gz.length) {
      inflateMember(gz, pos, maxMemberBytes) match {
        case MemberOk(bytes, next) =>
          val buf = if (carry.isEmpty) bytes else carry ++ bytes
          val (recs, tailStart) =
            parseRecordsWithTail(path, buf, atEof = false, maxMemberBytes)
          recs.foreach(emit)
          carry =
            if (tailStart >= 0)
              java.util.Arrays.copyOfRange(buf, tailStart, buf.length)
            else Array.emptyByteArray
          pos = next
        case MemberErr(msg, next) =>
          flushCarry() // a lost member breaks any straddling record
          gzErr(msg)
          pos = next
      }
    }
    flushCarry()
    out.toSeq
  }

  private val Marker = "WARC/".getBytes("US-ASCII")

  /** Parse records from one archive's bytes. Resync-on-error: a
    * malformed record is emitted with `error` set and the scan jumps
    * to the next `WARC/` marker. `maxBodyBytes` caps HTTP-body
    * inflation ([[gunzipBody]]) — the same knob as the gz-member cap,
    * so one configuration bounds EVERY decompression path. */
  private[graft] def parseRecords(path: String, bytes: Array[Byte],
      maxBodyBytes: Long = DefaultMaxMemberBytes,
      decodeBodies: Boolean = true): Seq[WarcRecord] =
    parseRecordsWithTail(path, bytes, atEof = true, maxBodyBytes,
      decodeBodies)._1

  /** [[parseRecords]] that can stop at an INCOMPLETE trailing record:
    * with `atEof = false`, a record whose header or declared payload
    * runs past the buffer end is NOT emitted as an error — its start
    * offset returns as the second element (-1 when none), so the
    * member-streaming gz path can carry those bytes into the next
    * member. Genuinely malformed records (bad Content-Length, missing
    * version line) still quarantine + resync either way. */
  private def parseRecordsWithTail(path: String, bytes: Array[Byte],
      atEof: Boolean,
      maxBodyBytes: Long = DefaultMaxMemberBytes,
      decodeBodies: Boolean = true): (Seq[WarcRecord], Int) = {
    val out = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var pos = indexOfMarker(bytes, 0)
    var idx = 0
    while (pos >= 0 && pos < bytes.length) {
      val (rec, next) =
        parseOne(path, idx, bytes, pos, maxBodyBytes, decodeBodies)
      val incomplete = rec.error != null && !atEof &&
        (rec.error.startsWith("truncated record") ||
          rec.error.startsWith("unterminated WARC header block"))
      if (incomplete) return (out.toSeq, pos)
      out += rec
      idx += 1
      pos =
        if (next > pos) {
          // a well-formed record ends exactly at its trailer; tolerate
          // stray padding by searching from `next` either way
          indexOfMarker(bytes, next)
        } else indexOfMarker(bytes, pos + Marker.length) // resync
    }
    // No further marker — but a gzip member boundary can fall INSIDE
    // the 5-byte marker itself (buffer ends "…WA"): indexOfMarker
    // needs all five bytes, so without this check nothing carried and
    // the next member started mid-marker, silently losing the whole
    // straddling record (r19 ADVICE, high). Carry the longest proper
    // marker prefix at the tail; it can never overlap an emitted
    // record (records end in CRLFCRLF, which shares no byte with
    // "WARC") and a junk 'W' costs a ≤4-byte carry parsed and dropped
    // at flush.
    val tail =
      if (atEof) -1
      else {
        var k = math.min(Marker.length - 1, bytes.length)
        while (k > 0 && !regionEq(bytes, bytes.length - k, Marker, k)) k -= 1
        if (k > 0) bytes.length - k else -1
      }
    (out.toSeq, tail)
  }

  private def regionEq(b: Array[Byte], off: Int, pre: Array[Byte],
                       k: Int): Boolean = {
    var i = 0
    while (i < k) {
      if (b(off + i) != pre(i)) return false
      i += 1
    }
    true
  }

  private def indexOfMarker(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = b.length - Marker.length
    while (i <= last) {
      if (b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' &&
        b(i + 3) == 'C' && b(i + 4) == '/') return i
      i += 1
    }
    -1
  }

  /** One record at `start` (which points at "WARC/"). Returns the
    * record and the offset just past its trailer (or `start` on a
    * structural error, signalling resync). */
  private def parseOne(path: String, idx: Int, bytes: Array[Byte],
                       start: Int, maxBodyBytes: Long,
                       decodeBodies: Boolean = true): (WarcRecord, Int) = {
    def err(msg: String): (WarcRecord, Int) =
      (WarcRecord(path, idx, null, null, null, null, null, -1L, -1, null,
        Array.emptyByteArray, msg), start)
    val headEnd = indexOfBlankLine(bytes, start)
    if (headEnd < 0) return err("unterminated WARC header block")
    val head = new String(bytes, start, headEnd - start, "UTF-8")
    val lines = head.split("\r?\n")
    if (!lines.head.startsWith("WARC/"))
      return err("missing WARC version line")
    val headers = lines.tail.flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val lenStr = headers.getOrElse("content-length", "")
    val len =
      try lenStr.toLong
      catch { case _: NumberFormatException => -1L }
    if (len < 0) return err(s"bad Content-Length '$lenStr'")
    val bodyStart = skipBlankLine(bytes, headEnd)
    if (bodyStart + len > bytes.length)
      return err(s"truncated record: need $len payload bytes, " +
        s"${bytes.length - bodyStart} remain")
    val block = java.util.Arrays.copyOfRange(
      bytes, bodyStart, bodyStart + (len min Int.MaxValue.toLong).toInt)
    val warcType = headers.getOrElse("warc-type", "")
    val contentType = headers.getOrElse("content-type", "")
    val (status, httpCt, payload) =
      if (contentType.startsWith("application/http"))
        parseHttp(block, maxBodyBytes, decodeBodies)
      else (-1, null, block)
    val rec = WarcRecord(path, idx,
      warcType,
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null),
      headers.getOrElse("warc-record-id", null),
      contentType, len, status, httpCt, payload, null)
    // trailer: two CRLFs after the payload (tolerated if absent at EOF)
    (rec, bodyStart + len.toInt)
  }

  /** Index of the first blank line (CRLFCRLF or LFLF) at/after `from`,
    * returning the offset of its FIRST byte; -1 if none. */
  private def indexOfBlankLine(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length - 1) {
      if (b(i) == '\n' &&
        (b(i + 1) == '\n' || (i + 2 < b.length && b(i + 1) == '\r' &&
          b(i + 2) == '\n'))) return i
      i += 1
    }
    -1
  }

  /** Offset just past the blank line starting at `at` (which points
    * at the first `\n` of `\n\n` or `\n\r\n`). */
  private def skipBlankLine(b: Array[Byte], at: Int): Int =
    if (at + 1 < b.length && b(at + 1) == '\n') at + 2
    else at + 3 // \n\r\n

  /** Split an application/http block into (status, content-type,
    * body); (-1, null, block) when it does not start with an HTTP
    * status line.
    *
    * TRANSFER DECODING (r20): real crawls capture bodies AS SENT —
    * `Transfer-Encoding: chunked` framing and `Content-Encoding:
    * gzip` compression included — and a body left framed/compressed
    * poisons every downstream stage (htmlToText reads hex chunk-size
    * lines as words; a gzip body is binary junk). Chunked framing is
    * removed first, then a gzip/x-gzip body inflates (cap:
    * [[DefaultMaxMemberBytes]]). BOTH decodes fall back to the RAW
    * bytes on any malformation or cap overrun — a decode failure must
    * not quarantine the whole record (the capture is still a valid
    * record; the extractor sees what a r19 reader saw). `deflate` and
    * `br` stay undecoded (rare in archives; documented). */
  private def parseHttp(block: Array[Byte], maxBodyBytes: Long,
                        decodeBodies: Boolean): (Int, String, Array[Byte]) = {
    val headEnd = indexOfBlankLine(block, 0)
    if (headEnd < 0) return (-1, null, block)
    val head = new String(block, 0, headEnd, "UTF-8")
    val lines = head.split("\r?\n")
    if (!lines.head.startsWith("HTTP/")) return (-1, null, block)
    val status =
      try lines.head.split(" ")(1).toInt
      catch { case _: Exception => -1 }
    def header(name: String): Option[String] = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith(name + ":") =>
        l.substring(name.length + 1).trim
    }
    val ct = header("content-type").orNull
    val bodyStart = skipBlankLine(block, headEnd)
    var body = java.util.Arrays.copyOfRange(block, bodyStart, block.length)
    // decodeBodies = false is the COUNT-ONLY mode the sidecar indexer
    // uses: record boundaries depend on Content-Length alone, so the
    // index must not pay a second decompression of every body just to
    // count records (r20 review find)
    if (decodeBodies) {
      if (header("transfer-encoding").exists(
        _.toLowerCase.contains("chunked")))
        body = dechunk(body).getOrElse(body)
      // substring, not whole-value equality: real captures carry
      // 'gzip, identity' / 'gzip;q=1.0' forms (r20 review find);
      // 'x-gzip' contains 'gzip' too
      if (header("content-encoding").exists(_.toLowerCase.contains("gzip")))
        body = gunzipBody(body, maxBodyBytes).getOrElse(body)
    }
    (status, ct, body)
  }

  /** Remove RFC 9112 §7.1 chunked framing: hex size line (chunk
    * extensions after ';' ignored), chunk bytes, CRLF, repeated until
    * the 0-size chunk; trailers ignored. None on ANY malformation
    * (bad hex, size past the buffer, missing terminator) — the caller
    * keeps the raw bytes. */
  private[graft] def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var p = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i // index of '\n', or length
    }
    while (true) {
      val le = lineEnd(p)
      if (le >= b.length) return None // no terminating size line
      val line = new String(b, p, le - p, "US-ASCII").trim
      val sizeStr = line.takeWhile(_ != ';').trim
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > Int.MaxValue.toLong) return None
      p = le + 1
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (p + size > b.length) return None
      out.write(b, p, size.toInt)
      p += size.toInt
      // chunk data is followed by CRLF (tolerate bare LF)
      if (p < b.length && b(p) == '\r') p += 1
      if (p >= b.length || b(p) != '\n') return None
      p += 1
    }
    None // unreachable
  }

  /** Inflate a gzip HTTP body (complete gzip stream, possibly
    * multi-member), retaining at most `cap` bytes; None on corrupt
    * data, truncation, or a body decompressing past the cap. */
  private[graft] def gunzipBody(b: Array[Byte],
                                cap: Long): Option[Array[Byte]] = {
    if (b.length < 10) return None
    // Magic/method pre-check BEFORE allocating (r21 review find): the
    // GZIPInputStream constructor allocates its native Inflater and
    // THEN parses the header with no cleanup handler (JDK 17), so a
    // body mislabeled 'Content-Encoding: gzip' — the common corrupt
    // case — would leak one Inflater to the Cleaner per record. The
    // 3-byte check rejects those without allocating; rarer mid-header
    // truncations still throw in the constructor and ride the Cleaner.
    if (b(0) != 0x1f.toByte || b(1) != 0x8b.toByte || b(2) != 8) return None
    try {
      // try/finally close: each GZIPInputStream holds a native zlib
      // Inflater; without close() it is freed only when the GC runs the
      // Cleaner, and this runs once per gzip HTTP body on the hot
      // ingest path — unbounded native-memory float on large crawls
      // (r20 ADVICE). close() releases the Inflater eagerly on the
      // success path and the early cap-overrun return.
      var in: java.util.zip.GZIPInputStream = null
      try {
        in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(b))
        val out = new java.io.ByteArrayOutputStream(math.min(
          b.length.toLong * 4, 1L << 20).toInt)
        val scratch = new Array[Byte](1 << 16)
        var total = 0L
        var n = in.read(scratch)
        while (n >= 0) {
          total += n
          if (total > cap) return None
          out.write(scratch, 0, n)
          n = in.read(scratch)
        }
        Some(out.toByteArray)
      } finally if (in != null) in.close()
    } catch {
      case _: java.io.IOException => None
    }
  }

  // ---- splittable .warc.gz: the member-boundary sidecar ----------------
  //
  // Per-file parallelism is right for 1 GB crawl rotations; a
  // few-huge-files archive serializes on it (r18 verdict's missing
  // #3). The repo's sidecar discipline (writeBandIndex's pruned-keys
  // sidecar, writeShards' manifest) applied to WARC: ONE indexing pass
  // walks the gzip member boundaries, closes a split at every clean
  // record boundary past the target size, and persists
  // (path, splitIdx, startOffset, endOffset, firstRecordIdx,
  // nRecords) as parquet. Reads then map over SPLITS — each task
  // seeks to its byte range and parses only that slice, so a 100 GB
  // archive becomes #splits parallel tasks with O(split) memory, and
  // `recordIdx` is reassigned from the sidecar's cumulative record
  // count so ids are IDENTICAL to a whole-file read (warcToDocuments'
  // re-read-stable xxhash64 keys keep working, law-pinned). Splits
  // only close where no record straddles the boundary (the indexing
  // walk tracks the same carry state as the member parser), so every
  // record lands in exactly one split.

  /** One byte-range split of a `.warc.gz` file. `fileLength` AND
    * `fileModTime` (epoch millis, from the same Hadoop FileStatus the
    * reader checks) stamp the indexed file so a rewritten file is
    * REFUSED at read time (the cfg-stamp discipline) instead of
    * silently range-read as garbage — the length alone missed a
    * SAME-LENGTH in-place rewrite (r20 sweep find). */
  final case class WarcSplit(path: String, splitIdx: Int,
      startOffset: Long, endOffset: Long, firstRecordIdx: Int,
      nRecords: Int, fileLength: Long, fileModTime: Long)

  /** Walk one file's gzip members, counting records and closing a
    * split at each clean (carry-free) member boundary once
    * `targetSplitBytes` of compressed input have accumulated. The walk
    * runs the same parse as [[parseGzMembers]], so per-split record
    * counts are exact by construction. */
  private[graft] def scanGzSplits(path: String, gz: Array[Byte],
      targetSplitBytes: Long,
      maxMemberBytes: Long = DefaultMaxMemberBytes,
      fileModTime: Long = 0L): Seq[WarcSplit] = {
    require(targetSplitBytes >= 1, "targetSplitBytes must be >= 1")
    val out = scala.collection.mutable.ArrayBuffer[WarcSplit]()
    var splitStart = 0L
    var splitFirstRecord = 0
    var recordsEmitted = 0
    var carry = Array.emptyByteArray
    var pos = 0
    def closeSplit(end: Long): Unit = {
      if (end > splitStart) {
        out += WarcSplit(path, out.length, splitStart, end,
          splitFirstRecord, recordsEmitted - splitFirstRecord,
          gz.length.toLong, fileModTime)
        splitStart = end
        splitFirstRecord = recordsEmitted
      }
    }
    while (pos < gz.length) {
      inflateMember(gz, pos, maxMemberBytes) match {
        case MemberOk(bytes, next) =>
          val buf = if (carry.isEmpty) bytes else carry ++ bytes
          val (recs, tailStart) = parseRecordsWithTail(path, buf,
            atEof = false, maxMemberBytes, decodeBodies = false)
          recordsEmitted += recs.length
          carry =
            if (tailStart >= 0)
              java.util.Arrays.copyOfRange(buf, tailStart, buf.length)
            else Array.emptyByteArray
          pos = next
        case MemberErr(_, next) =>
          // the parser emits the flushed carry's records + ONE error row
          if (carry.nonEmpty) {
            recordsEmitted += parseRecords(path, carry, maxMemberBytes,
              decodeBodies = false).length
            carry = Array.emptyByteArray
          }
          recordsEmitted += 1
          pos = next
      }
      if (carry.isEmpty && pos - splitStart >= targetSplitBytes)
        closeSplit(pos)
    }
    if (carry.nonEmpty)
      recordsEmitted += parseRecords(path, carry, maxMemberBytes,
        decodeBodies = false).length
    closeSplit(gz.length)
    out.toSeq
  }

  /** Index a directory/glob of `.warc.gz` files into a split sidecar
    * at `sidecarPath` (parquet, [[WarcSplit]] schema). One
    * decompress+parse pass per file (per-file parallel, like
    * [[readWarc]] — the file must fit an executor ONCE, at indexing;
    * every read after that is split-parallel). */
  def writeWarcSplitIndex(spark: SparkSession, path: String,
      sidecarPath: String,
      targetSplitBytes: Long = 128L << 20): Unit = {
    import spark.implicits._
    val maxMember = confMaxMember(spark)
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "modificationTime", "content")
      .as[(String, java.sql.Timestamp, Array[Byte])]
    files.flatMap { case (p, mt, content) =>
      val mtMs = mt.getTime
      if (p.endsWith(".gz")) scanGzSplits(p, content, targetSplitBytes,
        maxMember, mtMs)
      else {
        // uncompressed .warc: one whole-file split (binaryFile already
        // parallelizes per file; record-marker splitting is the gz
        // path's job — CC ships gz)
        Seq(WarcSplit(p, 0, 0L, content.length.toLong, 0,
          parseRecords(p, content, maxMember,
            decodeBodies = false).length,
          content.length.toLong, mtMs))
      }
    }(Encoders.product[WarcSplit])
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(sidecarPath)
  }

  /** Read WARC records THROUGH a split sidecar: one task per split,
    * each seeking its byte range via the Hadoop filesystem (never
    * loading a whole file), records bit-identical to [[readWarc]]
    * including `recordIdx` (WarcSpec law). The Hadoop conf ships via
    * Spark's serializable wrapper so non-local filesystems keep their
    * credentials/settings. */
  def readWarcIndexed(spark: SparkSession, sidecarPath: String): DataFrame = {
    import spark.implicits._
    val maxMember = confMaxMember(spark)
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val rawSidecar = spark.read.parquet(sidecarPath)
    // a sidecar written before the r20 mtime stamp must refuse with
    // the same ACTIONABLE message as a stale one, not a generic
    // encoder error (r20 review find — the fail-loud discipline)
    require(rawSidecar.columns.contains("fileModTime"),
      s"split sidecar at $sidecarPath predates the mtime stamp " +
        "(no fileModTime column) — rebuild it (writeWarcSplitIndex)")
    val splits = rawSidecar.as[WarcSplit]
    val n = splits.count()
    val parallelism = math.max(1, math.min(n,
      spark.sparkContext.defaultParallelism.toLong * 2L)).toInt
    splits.repartition(parallelism)
      .flatMap { s =>
        val uri = java.net.URI.create(s.path)
        val fs = org.apache.hadoop.fs.FileSystem.get(uri, hconf.value)
        val hPath = new org.apache.hadoop.fs.Path(uri)
        // stale-sidecar refusal: a file rewritten since indexing would
        // otherwise be range-read as silent garbage. Length AND mtime
        // (the same FileStatus source binaryFile stamped at indexing):
        // a same-length in-place rewrite slips the length check alone
        // (r20 sweep find)
        val st = fs.getFileStatus(hPath)
        if (st.getLen != s.fileLength ||
          st.getModificationTime != s.fileModTime)
          throw new IllegalStateException(
            s"${s.path} is ${st.getLen} bytes (mtime " +
              s"${st.getModificationTime}) but the split sidecar indexed " +
              s"${s.fileLength} bytes (mtime ${s.fileModTime}) — the " +
              "file changed since indexing; rebuild the sidecar " +
              "(writeWarcSplitIndex)")
        val span = s.endOffset - s.startOffset
        if (span > Int.MaxValue.toLong)
          throw new IllegalStateException(
            s"split ${s.splitIdx} of ${s.path} spans $span bytes (no " +
              "record-clean member boundary for over 2 GiB) — such an " +
              "archive has records straddling every member; re-shard it " +
              "or read it unindexed (readWarc)")
        val in = fs.open(hPath)
        val len = span.toInt
        val buf = new Array[Byte](len)
        try {
          in.seek(s.startOffset)
          in.readFully(buf, 0, len)
        } finally in.close()
        val recs =
          if (s.path.endsWith(".gz")) parseGzMembers(s.path, buf, maxMember)
          else parseRecords(s.path, buf, maxMember)
        recs.map(r => r.copy(recordIdx = r.recordIdx + s.firstRecordIdx))
      }(Encoders.product[WarcRecord]).toDF()
  }

  // ---- deterministic fixture (the Multimodal.fixturePng convention) ----

  /** A small deterministic CRAWL archive for the end-to-end pipeline
    * row (q_crawl_e2e): five HTTP responses exercising every stage —
    * a canonical-duplicate pair (tracking params + www + default port
    * vs the bare form; the better capture has the longer body), a
    * blocklisted host, a clean page, and a 404 the status gate drops —
    * plus a request record the type filter ignores. */
  def fixtureCrawl(): Array[Byte] = {
    def resp(uri: String, status: String, html: String): Array[Byte] = {
      val block = (s"HTTP/1.1 $status\r\n" +
        "Content-Type: text/html\r\n\r\n" + html).getBytes("UTF-8")
      val head = s"WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-01-03T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:r-$uri>\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val req = ("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: https://a.com/p1\r\n" +
      "WARC-Record-ID: <urn:uuid:q-1>\r\n" +
      "Content-Type: application/http; msgtype=request\r\n" +
      "Content-Length: 18\r\n\r\nGET /p1 HTTP/1.1\r\n" +
      "\r\n\r\n").getBytes("UTF-8")
    resp("https://WWW.a.com:443/p1?utm_source=f&x=1", "200 OK",
      "<p>alpha one</p>") ++
      resp("https://a.com/p1?x=1", "200 OK",
        "<p>alpha one, the better capture</p>") ++
      req ++
      resp("https://Blocked.bad/x", "200 OK", "<p>spam</p>") ++
      resp("https://b.com/ok", "200 OK", "<p>bravo page</p>") ++
      resp("https://c.com/miss", "404 Not Found", "<p>not found</p>")
  }

  /** A deterministic LINKED crawl archive for the crawl-graph rows
    * (q_crawl_edges / q_crawl_graph): three 200-status pages on three
    * domains whose `<a href>`s exercise every resolution shape —
    * absolute (mixed case), protocol-relative, root-relative,
    * relative with `../` (stays on the authority), `./`, a duplicate
    * absolute link (multi-edge votes twice), plus mailto/javascript/
    * fragment-only links that extract to nothing — and a 404 page
    * whose links the status gate must drop. The hand-derivable edge
    * multiset at registered-domain grain, after self-loop drop:
    * alpha→beta ×1, alpha→gamma ×1, beta→alpha ×2. */
  def fixtureLinkedCrawl(): Array[Byte] = {
    def resp(uri: String, status: String, html: String): Array[Byte] = {
      val block = (s"HTTP/1.1 $status\r\n" +
        "Content-Type: text/html\r\n\r\n" + html).getBytes("UTF-8")
      val head = s"WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-01-04T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:l-$uri>\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    resp("https://alpha.com/news/a1", "200 OK",
      "<p>alpha</p><a href=\"https://beta.com/x\">b</a>" +
        "<a href='/promo'>self abs</a>" + // alpha self-loop, dropped
        "<a href=\"rel/two\">self rel</a>" + // alpha self-loop, dropped
        "<a href=\"//gamma.com/lib\">g</a>" +
        "<a href=\"mailto:x@alpha.com\">m</a>") ++
      resp("https://beta.com/dir/b1", "200 OK",
        "<p>beta</p><a href=\"https://alpha.com/one\">1</a>" +
          "<A HREF=\"HTTPS://ALPHA.com/two?utm_s=9\">2</A>" +
          "<a href=\"../up\">self dotdot</a>" + // beta self-loop, dropped
          "<a href=\"javascript:void(0)\">j</a>") ++
      resp("https://gamma.com/g1", "200 OK",
        "<p>gamma dangles</p><a href=\"#sec\">t</a>") ++
      resp("https://delta.com/dead", "404 Not Found",
        "<a href=\"https://alpha.com/not-counted\">x</a>")
  }

  /** A deterministic archive of TRANSFER/CONTENT-ENCODED responses —
    * the shapes real crawls capture as sent (q_warc_encoded):
    * chunked framing (with a chunk extension), a gzip body, gzip
    * INSIDE chunked (the layering order RFC 9112 mandates: transfer
    * decoding first), and a MALFORMED chunked body that must fall
    * back to the raw bytes rather than quarantine the record. */
  def fixtureEncodedWarc(): Array[Byte] = {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    def chunked(b: Array[Byte], firstSize: Int,
                ext: String = ""): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      def put(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
      val cut = math.min(firstSize, b.length)
      put(Integer.toHexString(cut) + ext + "\r\n")
      bo.write(b, 0, cut); put("\r\n")
      if (cut < b.length) {
        put(Integer.toHexString(b.length - cut) + "\r\n")
        bo.write(b, cut, b.length - cut); put("\r\n")
      }
      put("0\r\n\r\n")
      bo.toByteArray
    }
    def resp(uri: String, extraHttp: String,
             body: Array[Byte]): Array[Byte] = {
      val httpHead = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        extraHttp + "\r\n").getBytes("UTF-8")
      val block = httpHead ++ body
      val head = s"WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-01-08T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:enc-$uri>\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    resp("https://enc.example/chunked",
      "Transfer-Encoding: chunked\r\n",
      chunked("<p>chunk one</p><p>chunk two</p>".getBytes("UTF-8"), 13,
        ext = ";name=val")) ++
      resp("https://enc.example/gzip", "Content-Encoding: gzip\r\n",
        gz("<p>gzipped page</p>".getBytes("UTF-8"))) ++
      resp("https://enc.example/both",
        "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        chunked(gz("<p>both paths decode</p>".getBytes("UTF-8")), 9)) ++
      resp("https://enc.example/badchunk",
        "Transfer-Encoding: chunked\r\n",
        "ZZ\r\n<p>raw</p>".getBytes("UTF-8"))
  }

  /** A deterministic archive of NON-UTF-8 responses (q_warc_charset):
    * a latin-1 page declared via the HTTP header's `charset=` param,
    * a windows-1252 page declared only in its `<meta charset>` tag
    * (the sniff path), a page with an UNKNOWN charset name (UTF-8
    * fallback), and a plain UTF-8 control. */
  def fixtureCharsetWarc(): Array[Byte] = {
    def resp(uri: String, ct: String, body: Array[Byte]): Array[Byte] = {
      val block = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n")
        .getBytes("UTF-8") ++ body
      val head = s"WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-01-09T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:cs-$uri>\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    resp("https://cs.example/latin1",
      "text/html; charset=ISO-8859-1",
      "<p>café crème</p>".getBytes("ISO-8859-1")) ++
      resp("https://cs.example/meta",
        "text/html",
        ("<meta charset=\"windows-1252\"><p>smart “quotes”</p>")
          .getBytes("windows-1252")) ++
      resp("https://cs.example/unknown",
        "text/html; charset=not-a-charset",
        "<p>plain ascii</p>".getBytes("US-ASCII")) ++
      resp("https://cs.example/utf8",
        "text/html; charset=utf-8",
        "<p>über — ok</p>".getBytes("UTF-8")) ++
      // a BOM beats a LYING header (the encoder's own stamp), and the
      // BOM bytes are consumed — no phantom U+FEFF first char
      resp("https://cs.example/bom",
        "text/html; charset=ISO-8859-1",
        Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
          "<p>naïve</p>".getBytes("UTF-8")) ++
      // a COMMENTED-OUT meta charset must not corrupt the decode
      // (the developer commented out the old declaration)
      resp("https://cs.example/commented-meta",
        "text/html",
        ("<!--<meta charset=\"iso-8859-1\">--><p>héllo</p>")
          .getBytes("UTF-8"))
  }

  /** A deterministic WET (extracted-text) archive: the warcinfo
    * header record CC ships first, two `conversion` records with
    * plain-text payloads, and a `response` record a WET reader must
    * ignore (wrong type). */
  def fixtureWet(): Array[Byte] = {
    def rec(tpe: String, uri: String, ct: String,
            body: String): Array[Byte] = {
      val block = body.getBytes("UTF-8")
      val head = s"WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        "WARC-Date: 2026-01-05T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:wet-$tpe-$uri>\r\n" +
        s"Content-Type: $ct\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    rec("warcinfo", "", "application/warc-fields",
      "software: graft-wet-fixture\r\n") ++
      rec("conversion", "https://a.com/page-one", "text/plain",
        "alpha page text\nsecond line") ++
      rec("conversion", "https://b.com/two", "Text/Plain; charset=utf-8",
        "bravo extracted text") ++
      rec("response", "https://c.com/raw", "application/http; msgtype=response",
        "HTTP/1.1 200 OK\r\n\r\n<p>not wet</p>")
  }

  /** [[fixtureWarc]]'s records as per-record gzip MEMBERS (the
    * Common-Crawl convention) — the byte-deterministic `.warc.gz`
    * mate, every member boundary record-clean so the split sidecar
    * can cut anywhere (q_warc_split). */
  def fixtureWarcGz(): Array[Byte] =
    fixtureWarcRecords().map { r =>
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(r); g.close(); bo.toByteArray
    }.reduce(_ ++ _)

  /** Hand-assembled two-record-plus-junk WARC archive: a warcinfo
    * record, an HTTP response with an HTML body, a request record,
    * and a TRUNCATED response (its Content-Length overruns the file)
    * — the shapes the parser and its quarantine/resync posture must
    * handle. Byte-deterministic, so query expectations are literals. */
  def fixtureWarc(): Array[Byte] = fixtureWarcRecords().reduce(_ ++ _)

  private def fixtureWarcRecords(): Seq[Array[Byte]] = {
    def rec(tpe: String, uri: String, block: Array[Byte],
            extra: String = ""): Array[Byte] = {
      val head = s"WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        s"WARC-Date: 2026-01-02T03:04:05Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:$tpe-1>\r\n" +
        extra +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val info = rec("warcinfo", "",
      "software: graft-fixture\r\n".getBytes("UTF-8"),
      "Content-Type: application/warc-fields\r\n")
    val html = "<html><body><p>hello &amp; crawl</p></body></html>"
    val httpBlock = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\n" + html)
      .getBytes("UTF-8")
    val resp = rec("response", "https://www.Example.com:443/a?utm_x=1",
      httpBlock, "Content-Type: application/http; msgtype=response\r\n")
    val req = rec("request", "https://www.Example.com:443/a?utm_x=1",
      ("GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n").getBytes("UTF-8"),
      "Content-Type: application/http; msgtype=request\r\n")
    val truncated = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://example.com/cut\r\n" +
      "WARC-Record-ID: <urn:uuid:cut-1>\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      "Content-Length: 99999\r\n\r\nHTTP/1.1 200 OK\r\n\r\nshort")
      .getBytes("UTF-8")
    Seq(info, resp, req, truncated)
  }
}
