package graft

import graft.sources.Warc
import org.apache.spark.sql.functions._

/** Laws for the WARC crawl-archive reader (sources/Warc.scala). */
class WarcSpec extends SparkTestBase {
  import spark.implicits._

  private def fixtureRecords = Warc.parseRecords("f", Warc.fixtureWarc())

  test("fixture parses into warcinfo + HTTP response + request + " +
    "quarantined truncated record") {
    val recs = fixtureRecords
    assert(recs.length === 4)
    val info = recs(0)
    assert(info.warcType === "warcinfo" && info.error == null)
    assert(info.httpStatus === -1)
    assert(new String(info.payload, "UTF-8").startsWith("software:"))
    val resp = recs(1)
    assert(resp.warcType === "response" && resp.error == null)
    assert(resp.httpStatus === 200)
    assert(resp.httpContentType === "text/html; charset=utf-8")
    assert(new String(resp.payload, "UTF-8")
      === "<html><body><p>hello &amp; crawl</p></body></html>")
    assert(resp.targetUri === "https://www.Example.com:443/a?utm_x=1")
    val req = recs(2)
    assert(req.warcType === "request" && req.error == null)
    // an application/http REQUEST block has no HTTP status line — the
    // payload stays raw and status is the not-an-HTTP-response sentinel
    assert(req.httpStatus === -1)
    val cut = recs(3)
    assert(cut.error != null && cut.error.contains("truncated"))
  }

  test("resync: a corrupt Content-Length quarantines ONE record and " +
    "parsing recovers at the next marker") {
    val good = Warc.fixtureWarc()
    val corrupted = new String(good, "ISO-8859-1")
      .replaceFirst("(?s)(WARC-Type: response.*?Content-Length: )\\d+",
        "$1abc")
      .getBytes("ISO-8859-1")
    val recs = Warc.parseRecords("f", corrupted)
    // warcinfo ok, response quarantined, request recovered, truncated
    // tail still quarantined
    assert(recs.map(_.error == null) === Seq(true, false, true, false))
    assert(recs(1).error.contains("Content-Length"))
    assert(recs(2).warcType === "request")
  }

  test("LF-only archives parse (some tooling emits bare LF line ends)") {
    val lfOnly = new String(Warc.fixtureWarc(), "ISO-8859-1")
      .replace("\r\n", "\n").getBytes("ISO-8859-1")
    val recs = Warc.parseRecords("f", lfOnly)
    // content-lengths were authored for CRLF payload framing; header
    // parsing and resync must still walk the file and type every
    // record rather than aborting at the first LF header block
    assert(recs.nonEmpty)
    assert(recs.head.warcType === "warcinfo" && recs.head.error == null)
  }

  test("gz round-trip, including CONCATENATED members (the .warc.gz " +
    "norm: one member per record)") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val raw = Warc.fixtureWarc()
    // split MID-RECORD: member A ends with a partial record that must
    // CARRY into member B's parse (the straddling-record law — memory
    // stays O(record) but no record is lost at a member boundary)
    val (a, b) = raw.splitAt(raw.length / 2)
    val concat = gzip(a) ++ gzip(b)
    def key(r: Warc.WarcRecord) =
      (r.recordIdx, r.warcType, r.targetUri, r.contentLength,
        r.httpStatus, r.payload.toSeq, r.error)
    assert(Warc.parseGzMembers("f", concat).map(key) ===
      Warc.parseRecords("f", raw).map(key),
      "member-at-a-time parse must equal the whole-file parse")
    // split INSIDE the 5-byte "WARC/" marker itself (r19 ADVICE,
    // high): the tail scan needs all five bytes to see a marker, so a
    // boundary 1–4 bytes into one used to carry nothing and silently
    // lose the straddling record. Every in-marker offset of every
    // record boundary must round-trip.
    val whole = Warc.parseRecords("f", raw).map(key)
    val markerAt = Iterator.iterate(
      new String(raw, "ISO-8859-1").indexOf("WARC/"))(i =>
        new String(raw, "ISO-8859-1").indexOf("WARC/", i + 1))
      .takeWhile(_ >= 0).toSeq
    for (m <- markerAt; k <- 1 to 4) {
      val (ma, mb) = raw.splitAt(m + k)
      assert(Warc.parseGzMembers("f", gzip(ma) ++ gzip(mb)).map(key) ===
        whole, s"marker at $m split $k bytes in must not lose a record")
    }
    // end-to-end through the Spark reader
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    java.nio.file.Files.write(dir.resolve("f.warc.gz"), concat)
    val recs = Warc.readWarc(spark, dir.toString + "/*.warc.gz")
    assert(recs.count() === 4)
    assert(recs.filter(col("error").isNull).count() === 3)
  }

  test("gz quarantine posture: a corrupt member is ONE error row and " +
    "the scan resyncs at the next member; inter-member garbage and a " +
    "bad CRC are named; an oversized member quarantines instead of " +
    "buffering past the cap") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val raw = Warc.fixtureWarc()
    val whole = Warc.parseRecords("f", raw)
    val good = gzip(raw)
    // corrupt the deflate body of a leading member; the trailing good
    // member must still yield every record
    val bad = good.clone()
    for (i <- 20 until 40) bad(i) = (bad(i) ^ 0x5a).toByte
    val r1 = Warc.parseGzMembers("f", bad ++ good)
    assert(r1.count(r => r.error != null && r.error.contains("gzip")) === 1,
      r1.map(_.error).mkString("; "))
    assert(r1.count(_.error == null) === whole.count(_.error == null),
      "records after the corrupt member must survive")
    // garbage BETWEEN members: one named error row, both members parse
    val junk = "NOT-GZIP-AT-ALL".getBytes("UTF-8")
    val r2 = Warc.parseGzMembers("f", good ++ junk ++ good)
    assert(r2.count(r => r.error != null &&
      r.error.contains("bad gzip magic")) === 1)
    assert(r2.count(_.error == null) === 2 * whole.count(_.error == null))
    // trailing garbage is an error row, not silent truncation (the
    // GZIPInputStream behavior this replaces)
    val r3 = Warc.parseGzMembers("f", good ++ junk)
    assert(r3.exists(r => r.error != null && r.error.contains("gzip")))
    // CRC corruption: flip a trailer byte (last 8 = CRC32 + ISIZE)
    val crcBad = good.clone()
    crcBad(good.length - 6) = (crcBad(good.length - 6) ^ 0xff).toByte
    val r4 = Warc.parseGzMembers("f", crcBad)
    assert(r4.exists(r => r.error != null && r.error.contains("CRC")))
    // cap: a member decompressing past maxMemberBytes quarantines with
    // the cap named; members after it still parse
    val r5 = Warc.parseGzMembers("f", good ++ good, maxMemberBytes = 64L)
    assert(r5.count(r => r.error != null && r.error.contains("cap")) === 2)
    assert(!r5.exists(_.error == null),
      "capped members must contribute no records")
  }

  test("splittable .warc.gz: sidecar-indexed range reads equal the " +
    "whole-file read bit-for-bit, recordIdx included; splits cover the " +
    "file contiguously and close only at record-clean boundaries") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    // file A: record-ALIGNED members (the CC convention) — every
    // member end is a clean cut, so the target size drives splits
    val aligned = (1 to 5).map(_ => gzip(Warc.fixtureCrawl()))
      .reduce(_ ++ _)
    // file B: members cut at ARBITRARY byte positions — records
    // straddle every boundary, so the carry state forbids cutting and
    // the whole file must stay ONE split (correctness over parallelism)
    val raw = Warc.fixtureCrawl()
    val jagged = raw.grouped(raw.length / 7 + 1).map(gzip).reduce(_ ++ _)
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_split")
    java.nio.file.Files.write(dir.resolve("aligned.warc.gz"), aligned)
    java.nio.file.Files.write(dir.resolve("jagged.warc.gz"), jagged)
    java.nio.file.Files.write(dir.resolve("plain.warc"), Warc.fixtureWarc())
    val side = dir.toString + "/sidecar"
    Warc.writeWarcSplitIndex(spark, dir.toString + "/*.warc*", side,
      targetSplitBytes = 600L)
    val splits = spark.read.parquet(side)
      .orderBy("path", "splitIdx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5)))
    val gzSplits = splits.filter(_._1.endsWith("aligned.warc.gz"))
    assert(gzSplits.length > 1, s"want multiple splits: ${gzSplits.toSeq}")
    // contiguous, zero-based, byte-complete coverage; cumulative
    // record indexes line up split to split
    assert(gzSplits.head._3 === 0L && gzSplits.head._5 === 0)
    gzSplits.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 === a._4, "splits must tile the byte range")
        assert(b._5 === a._5 + a._6, "record indexes must be cumulative")
      case _ =>
    }
    assert(gzSplits.last._4 === aligned.length.toLong)
    assert(splits.count(_._1.endsWith("jagged.warc.gz")) === 1,
      "no clean boundary → no split (straddling records stay whole)")
    assert(splits.count(_._1.endsWith("plain.warc")) === 1,
      "uncompressed .warc is one whole-file split")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0).substring(r.getString(0).lastIndexOf('/')),
        r.getInt(1), r.getString(2), r.getString(3), r.getInt(8),
        Option(r.getAs[Array[Byte]]("payload")).map(_.toSeq),
        r.getString(11))
    }.toSet
    val whole = Warc.readWarc(spark, dir.toString + "/*.warc*")
    val viaIndex = Warc.readWarcIndexed(spark, side)
    assert(key(viaIndex) === key(whole),
      "indexed range reads must equal the whole-file parse")
    // stale-sidecar refusal: a file rewritten after indexing must
    // throw loudly, never range-read garbage
    java.nio.file.Files.write(dir.resolve("aligned.warc.gz"),
      aligned ++ gzip(Warc.fixtureCrawl()))
    val e = intercept[org.apache.spark.SparkException] {
      Warc.readWarcIndexed(spark, side).collect()
    }
    assert(e.getMessage.contains("sidecar") ||
      Option(e.getCause).exists(_.getMessage.contains("sidecar")),
      s"want the stale-sidecar refusal, got: ${e.getMessage.take(300)}")
  }

  test("stale-sidecar refusal catches a SAME-LENGTH in-place rewrite " +
    "(mtime stamp — the length check alone misses it; r20 sweep find)") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mtime")
    val f = dir.resolve("a.warc.gz")
    val bytes = gzip(Warc.fixtureCrawl())
    java.nio.file.Files.write(f, bytes)
    val side = dir.toString + "/sidecar"
    Warc.writeWarcSplitIndex(spark, f.toString, side)
    // sanity: unmodified file reads fine
    assert(Warc.readWarcIndexed(spark, side).count() > 0)
    // rewrite IN PLACE with the same byte length (flip one payload
    // byte deep in the deflate stream) and a bumped mtime — the local
    // FS could otherwise land the rewrite in the same mtime tick
    val flipped = bytes.clone(); flipped(bytes.length / 2) =
      (flipped(bytes.length / 2) ^ 0x01).toByte
    java.nio.file.Files.write(f, flipped)
    f.toFile.setLastModified(f.toFile.lastModified() + 2000L)
    val e = intercept[org.apache.spark.SparkException] {
      Warc.readWarcIndexed(spark, side).collect()
    }
    assert(e.getMessage.contains("sidecar") ||
      Option(e.getCause).exists(_.getMessage.contains("sidecar")),
      s"want the stale-sidecar refusal, got: ${e.getMessage.take(300)}")
  }

  test("WAT ingest: the precomputed link table resolves through the " +
    "SHARED kernel rule — WAT-derived edges ≡ edgesFromDocuments on " +
    "the linked fixture pair; malformed JSON quarantines ONE row; " +
    "record conservation holds; metadata carries title + link counts") {
    import graft.sources.Wat
    val dir = java.nio.file.Files.createTempDirectory("graft_wat")
    java.nio.file.Files.write(dir.resolve("f.wat"), Wat.fixtureWat())
    java.nio.file.Files.write(dir.resolve("linked.warc"),
      Warc.fixtureLinkedCrawl())
    // THE law: edges from CC's precomputed WAT links equal edges from
    // the full HTML scan, multi-edge counts included
    val watEdges = Wat.edgesFromWat(spark, dir.toString + "/f.wat")
      .groupBy("src", "dst").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val pages = Warc.readWarc(spark, dir.toString + "/linked.warc")
      .filter(col("httpStatus") === 200)
      .select(col("targetUri").as("url"),
        decode(col("payload"), "UTF-8").as("html"))
    val docEdges = graft.ops.Web.edgesFromDocuments(pages, "url", "html")
      .groupBy("src", "dst").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(watEdges === docEdges,
      s"WAT edges must equal document edges: $watEdges vs $docEdges")
    assert(watEdges === Set(("alpha.com", "beta.com", 1L),
      ("alpha.com", "gamma.com", 1L), ("beta.com", "alpha.com", 2L)))
    val links = Wat.watToLinks(spark, dir.toString + "/f.wat")
    // quarantine: the malformed-JSON capture is ONE error row with
    // null link fields — never silently dropped
    val bad = links.filter(col("error").isNotNull).collect()
    assert(bad.length === 1 && bad.head.getAs[String]("url") ===
      "https://mal.example/x" && bad.head.isNullAt(
      bad.head.fieldIndex("raw_href")))
    // record conservation: every metadata capture appears (4 pages +
    // the malformed one; warcinfo is not a metadata record)
    assert(links.select("url").distinct().count() === 5L)
    // dropped-scheme and fragment-only raw values keep their rows
    // with null resolved href (the extractOutlinks drop contract)
    val mailto = links.filter(col("raw_href") === "mailto:x@alpha.com")
      .collect()
    assert(mailto.length === 1 && mailto.head.isNullAt(
      mailto.head.fieldIndex("href")))
    // the link-kind gate: real WAT lists EVERY outbound reference —
    // the IMG asset row is IN the link table (a prefetcher wants it)
    // but NOT an authority edge (edgesFromDocuments scans <a href>
    // only; the watEdges ≡ docEdges assert above would fail if the
    // gate leaked it)
    val img = links.filter(col("link_path") === "IMG@/src").collect()
    assert(img.length === 1 &&
      img.head.getAs[String]("href").contains("cdn-zeta.com"))
    assert(!watEdges.exists(_._2.contains("cdn-zeta")),
      "asset references must not mint authority edges")
    val meta = Wat.watToMetadata(spark, dir.toString + "/f.wat")
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("title"), r.getAs[Long]("n_links")))).toMap
    assert(meta("https://alpha.com/news/a1") === (("alpha", 6L)))
    assert(meta("https://delta.com/dead") === (("dead", 1L)))
  }

  test("wetToDocuments strips a UTF-8 BOM from the payload (a phantom " +
    "U+FEFF first char would ride into every tokenizer; r20 sweep)") {
    def rec(uri: String, body: Array[Byte]): Array[Byte] = {
      val head = s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-01-07T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:bom-$uri>\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ body ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val dir = java.nio.file.Files.createTempDirectory("graft_wet_bom")
    java.nio.file.Files.write(dir.resolve("b.wet"),
      rec("https://a.com/bom", bom ++ "hello".getBytes("UTF-8")) ++
        rec("https://a.com/plain", "hello".getBytes("UTF-8")))
    val got = Warc.wetToDocuments(spark, dir.toString + "/b.wet")
      .select("url", "text", "n_chars")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set(("https://a.com/bom", "hello", 5L),
      ("https://a.com/plain", "hello", 5L)),
      s"BOM must strip, interior text untouched: $got")
  }

  test("HTTP transfer/content decoding (r20): chunked framing removed " +
    "(extensions, bare-LF tolerance), gzip bodies inflated, layered " +
    "in RFC 9112 order, malformed/oversized inputs fall back to raw — " +
    "never a record quarantine") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    // unit edges on the decoders themselves
    assert(Warc.dechunk("3\r\nabc\r\n0\r\n\r\n".getBytes("US-ASCII"))
      .map(new String(_, "UTF-8")) === Some("abc"))
    assert(Warc.dechunk("3;x=y\nabc\n0\n\n".getBytes("US-ASCII"))
      .map(new String(_, "UTF-8")) === Some("abc"),
      "bare-LF chunk lines and extensions tolerated")
    assert(Warc.dechunk("ZZ\r\nabc".getBytes("US-ASCII")) === None,
      "bad hex size → raw fallback")
    assert(Warc.dechunk("9\r\nabc\r\n0\r\n\r\n".getBytes("US-ASCII"))
      === None, "size past the buffer → raw fallback")
    assert(Warc.dechunk("3\r\nabc".getBytes("US-ASCII")) === None,
      "missing chunk terminator → raw fallback")
    val big = gz(Array.fill[Byte](4096)('a'))
    assert(Warc.gunzipBody(big, cap = 1024L) === None,
      "body past the cap → raw fallback, never executor heap")
    assert(Warc.gunzipBody(gz("hi".getBytes) ++ gz(" there".getBytes),
      cap = 1L << 20).map(new String(_, "UTF-8")) === Some("hi there"),
      "multi-member gzip bodies concatenate")
    assert(Warc.gunzipBody("not gzip".getBytes, 1L << 20) === None)
    // end-to-end through the record parser: the fixture archive's
    // four shapes (framed, compressed, layered, malformed-raw)
    val recs = Warc.parseRecords("enc", Warc.fixtureEncodedWarc())
    assert(recs.forall(_.error == null),
      "decode failures must not quarantine records")
    val byUri = recs.map(r => r.targetUri ->
      new String(r.payload, "UTF-8")).toMap
    assert(byUri("https://enc.example/chunked") ===
      "<p>chunk one</p><p>chunk two</p>")
    assert(byUri("https://enc.example/gzip") === "<p>gzipped page</p>")
    assert(byUri("https://enc.example/both") ===
      "<p>both paths decode</p>")
    assert(byUri("https://enc.example/badchunk") === "ZZ\r\n<p>raw</p>")
  }

  test("sidecar indexing runs COUNT-ONLY (no body decode) yet yields " +
    "records bit-identical to the whole-file DECODING read — record " +
    "boundaries depend on Content-Length alone (r20 review find: the " +
    "index must not pay a second decompression of every body)") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_enc_idx")
    java.nio.file.Files.write(dir.resolve("enc.warc.gz"),
      gzip(Warc.fixtureEncodedWarc()))
    val side = dir.toString + "/sidecar"
    Warc.writeWarcSplitIndex(spark, dir.toString + "/enc.warc.gz", side)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getInt(1), r.getString(3),
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8"))).toSet
    val whole = key(Warc.readWarc(spark, dir.toString + "/enc.warc.gz"))
    val indexed = key(Warc.readWarcIndexed(spark, side))
    assert(indexed === whole)
    // the read path DID decode: chunked/gzip bodies arrive as HTML
    assert(whole.exists(_._3 == "<p>gzipped page</p>"), s"$whole")
    assert(whole.exists(_._3 == "<p>chunk one</p><p>chunk two</p>"))
  }

  test("decodeHtml charset precedence (r20): the HTTP header's " +
    "charset= param beats a CONFLICTING meta tag; null Content-Type " +
    "sniffs the meta; arbitrary bytes never throw (REPLACE)") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.WebKernels
    def d(b: Array[Byte], ct: String): String =
      WebKernels.decodeHtml(b,
        if (ct == null) null else UTF8String.fromString(ct)).toString
    // header (latin-1) wins over a lying meta (utf-8): byte 0xE9 is
    // 'é' in latin-1 but malformed UTF-8
    val lying = "<meta charset=\"utf-8\">café".getBytes("ISO-8859-1")
    assert(d(lying, "text/html; charset=iso-8859-1") ===
      "<meta charset=\"utf-8\">café")
    // null content-type → the meta sniff applies
    val metaOnly = "<meta charset=iso-8859-1>café"
      .getBytes("ISO-8859-1")
    assert(d(metaOnly, null) === "<meta charset=iso-8859-1>café")
    // arbitrary binary junk decodes with replacement, never throws
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 200).toByte)
    assert(d(junk, "text/html; charset=utf-8").nonEmpty)
    // quoted charset value in the header param
    assert(d("café".getBytes("ISO-8859-1"),
      "text/html; charset=\"ISO-8859-1\"") === "café")
    // an UNKNOWN header charset name falls THROUGH to the meta sniff
    // (same information state as no header param — documented order),
    // not straight to UTF-8
    val metaLatin = "<meta charset=iso-8859-1>café"
      .getBytes("ISO-8859-1")
    assert(d(metaLatin, "text/html; charset=bogus-name") ===
      "<meta charset=iso-8859-1>café")
    // a BOM beats EVERYTHING (the encoder's own stamp — WHATWG order)
    // and is consumed, never a phantom U+FEFF first char (r20 review:
    // the WET BOM defect's WARC twin)
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    assert(d(bom ++ "naïve".getBytes("UTF-8"),
      "text/html; charset=ISO-8859-1") === "naïve")
    val utf16 = Array(0xFE.toByte, 0xFF.toByte) ++
      "hi".getBytes("UTF-16BE")
    assert(d(utf16, "text/html; charset=iso-8859-1") === "hi")
    // a COMMENTED-OUT meta charset is skipped (the findBaseAttr
    // hardening class — honoring it would corrupt the whole decode);
    // the next uncommented declaration wins
    assert(d(("<!--<meta charset=\"iso-8859-1\">--><p>héllo</p>")
      .getBytes("UTF-8"), "text/html") === "<!--<meta charset=\"iso-8859-1\">--><p>héllo</p>")
    assert(d(("<!--<meta charset=utf-8>--><meta charset=iso-8859-1>café")
      .getBytes("ISO-8859-1"), null) ===
      "<!--<meta charset=utf-8>--><meta charset=iso-8859-1>café")
  }

  test("the HTTP body flows straight into the Web extraction stage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc2")
    java.nio.file.Files.write(dir.resolve("f.warc"), Warc.fixtureWarc())
    val recs = Warc.readWarc(spark, dir.toString + "/*.warc")
    val txt = recs.filter(col("httpStatus") === 200)
      .select(graft.ops.Web.htmlToText(decode(col("payload"), "UTF-8")))
      .as[String].head()
    assert(txt === "hello & crawl")
  }

  test("readWarcStream: files landing in a directory become records " +
    "across micro-batches, no re-reads, zero state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_stream")
    java.nio.file.Files.write(dir.resolve("day1.warc"), Warc.fixtureWarc())
    val out = Warc.readWarcStream(spark, dir.toString)
      .select(col("path"), col("recordIdx"), col("warcType"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("warc_stream_out").start()
    try {
      q.processAllAvailable()
      val afterOne = spark.table("warc_stream_out").count()
      assert(afterOne === 4L, s"day1 should parse to 4 records")
      // a second archive arrives; only ITS records are appended
      java.nio.file.Files.write(dir.resolve("day2.warc"),
        Warc.fixtureCrawl())
      q.processAllAvailable()
      val rows = spark.table("warc_stream_out").collect()
      assert(rows.length === 4 + 6,
        s"day2 adds the crawl fixture's 6 records, got ${rows.length}")
      assert(rows.count(_.getString(0).contains("day1")) === 4)
      assert(q.lastProgress.stateOperators.isEmpty,
        "warc stream parse must be stateless")
    } finally q.stop()
  }

  test("readWarcStream restart: a checkpointed stop/restart never " +
    "re-emits processed archives; new arrivals flow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_rs")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_warc_ck")
    val out = java.nio.file.Files.createTempDirectory("graft_warc_sink")
    java.nio.file.Files.write(dir.resolve("day1.warc"), Warc.fixtureWarc())
    // file sink: the one sink that RECOVERS from a checkpoint (the
    // memory sink refuses), so restart semantics are testable
    // end-to-end with exactly-once output
    def start() = Warc.readWarcStream(spark, dir.toString)
      .select(col("path"), col("recordIdx"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .format("parquet").option("path", out.toString).start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.read.parquet(out.toString).count() === 4L)
    // restart from the checkpoint; day2 lands after the restart
    java.nio.file.Files.write(dir.resolve("day2.warc"), Warc.fixtureCrawl())
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out.toString).collect()
      assert(rows.length === 4 + 6, s"got ${rows.length}")
      assert(rows.count(_.getString(0).contains("day1")) === 4,
        "restart must keep day1's records exactly once")
    } finally q2.stop()
  }

  test("warcToDocuments: documents-shaped frame with re-read-stable " +
    "ids; quarantined/404/non-html records excluded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc3")
    java.nio.file.Files.write(dir.resolve("crawl.warc"), Warc.fixtureCrawl())
    def read() = Warc.warcToDocuments(spark, dir.toString + "/crawl.warc")
    val a = read().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // four 200-status html responses in fixtureCrawl; the 404 and the
    // request record are out
    assert(a.length === 4)
    assert(a.forall(_._4 > 0))
    assert(a.map(_._2).toSet.contains("https://b.com/ok"))
    // stability: a second read yields identical ids and rows
    val b = read().collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(a.toSet === b.toSet)
    assert(a.map(_._1).distinct.length === 4)
  }

  test("documentsFromRecords over the sidecar reader yields doc_ids " +
    "IDENTICAL to warcToDocuments — indexed reads feed the same " +
    "downstream indexes and manifests") {
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_docs")
    java.nio.file.Files.write(dir.resolve("c.warc.gz"),
      (1 to 3).map(_ => gzip(Warc.fixtureCrawl())).reduce(_ ++ _))
    val side = dir.toString + "/side"
    Warc.writeWarcSplitIndex(spark, dir.toString + "/c.warc.gz", side,
      targetSplitBytes = 1L)
    val whole = Warc.warcToDocuments(spark, dir.toString + "/c.warc.gz")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val indexed = Warc.documentsFromRecords(
      Warc.readWarcIndexed(spark, side))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(indexed === whole)
    assert(whole.size === 12, "3 copies x 4 html-200 responses")
  }

  test("warcToDocuments keeps 'Text/HTML' responses — the content-type " +
    "VALUE matches case-insensitively (r19 ADVICE fix)") {
    val html = "<p>upper case content type</p>"
    val block = ("HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; charset=UTF-8" +
      "\r\n\r\n" + html).getBytes("UTF-8")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://up.com/x\r\n" +
      "WARC-Record-ID: <urn:uuid:up-1>\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n").getBytes("UTF-8") ++
      block ++ "\r\n\r\n".getBytes("UTF-8")
    val dir = java.nio.file.Files.createTempDirectory("graft_warc4")
    java.nio.file.Files.write(dir.resolve("u.warc"), rec)
    val rows = Warc.warcToDocuments(spark, dir.toString + "/u.warc").collect()
    assert(rows.length === 1)
    assert(rows.head.getString(2) === "upper case content type")
  }
}
