package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Common Crawl WAT (web-archive-transformation) ingest — CC's THIRD
  * release format next to raw WARC and extracted-text WET: one WARC
  * `metadata` record per original capture whose payload is a JSON
  * envelope of per-record metadata (HTTP headers, the page `<head>`'s
  * title and `<base href>`, and — the part a pipeline wants — the
  * PRECOMPUTED raw link list). A link-graph build that starts from
  * WAT skips [[graft.ops.Web.edgesFromDocuments]]' full-HTML regex
  * scan entirely: the links arrive as rows and only the RESOLUTION
  * step remains, which runs through the same compiled kernel rule as
  * the HTML extractors ([[graft.functions.WebKernels.resolveHref]] —
  * law-pinned: WAT-derived edges ≡ document-derived edges on the
  * linked fixture).
  *
  * Shape: rides [[Warc.readWarc]] (binaryFile parallelism, member
  * gunzip, quarantine/resync — everything the WARC layer already
  * guarantees), then ONE `from_json` against a minimal schema (only
  * the fields consumed are declared — unparsed envelope branches cost
  * nothing) and a posexplode. Map-only end to end; the Ingest
  * quarantine posture at record grain: a metadata record whose JSON
  * payload does not parse lands in the output AS one error-tagged row
  * (never silently dropped), and a record that parses but has no
  * links keeps one null-link row — record conservation, so
  * `watToLinks(...).select('url').distinct` still enumerates every
  * capture.
  *
  * Reference: the WAT envelope layout is the Common Crawl / IIPC
  * webarchive-commons convention (`Envelope.Payload-Metadata
  * .HTTP-Response-Metadata.HTML-Metadata.{Head,Links}`); flox has no
  * web layer — §2.5b beyond-reference surface. */
object Wat {

  /** The consumed subset of the WAT envelope. Only declared fields
    * parse; everything else in the JSON is skipped by Jackson. */
  private val WatSchema: StructType = StructType(Seq(
    StructField("Envelope", StructType(Seq(
      StructField("Payload-Metadata", StructType(Seq(
        StructField("HTTP-Response-Metadata", StructType(Seq(
          StructField("Response-Message", StructType(Seq(
            StructField("Status", StringType)))),
          StructField("HTML-Metadata", StructType(Seq(
            StructField("Head", StructType(Seq(
              StructField("Title", StringType),
              StructField("Base", StringType)))),
            StructField("Links", ArrayType(StructType(Seq(
              StructField("path", StringType),
              StructField("url", StringType)))))))))))))))))))

  /** Parsed WAT records: one row per `metadata` record with the
    * envelope fields projected out — the shared head of
    * [[watToLinks]] / [[watToMetadata]], over an ALREADY-READ records
    * frame so the batch ([[Warc.readWarc]]), sidecar-indexed
    * ([[Warc.readWarcIndexed]]), and streaming
    * ([[Warc.readWarcStream]]) readers all flow through IDENTICAL
    * projections (the documentsFromRecords convention — map-only, so
    * the streaming mirror is stateless for free). */
  private def parsed(records: DataFrame): DataFrame = {
    val hm = col("__j.Envelope.Payload-Metadata.HTTP-Response-Metadata")
    records
      .filter(col("error").isNull && col("warcType") === "metadata" &&
        lower(col("contentType")).startsWith("application/json"))
      .select(
        xxhash64(col("path"), col("recordIdx")).as("doc_id"),
        col("targetUri").as("url"),
        from_json(decode(col("payload"), "UTF-8"), WatSchema).as("__j"))
      .select(col("doc_id"), col("url"),
        hm.getField("Response-Message").getField("Status")
          .try_cast("long").as("http_status"),
        hm.getField("HTML-Metadata").getField("Head").getField("Title")
          .as("title"),
        hm.getField("HTML-Metadata").getField("Head").getField("Base")
          .as("base"),
        hm.getField("HTML-Metadata").getField("Links").as("__links"),
        // from_json in PERMISSIVE mode yields a row of NULL fields
        // (not a null struct) for unparseable JSON, so the quarantine
        // condition is a null Envelope — which also catches valid
        // JSON that is not a WAT envelope at all
        when(col("__j").isNull || col("__j.Envelope").isNull,
          lit("malformed WAT envelope"))
          .otherwise(lit(null).cast("string")).as("error"))
  }

  /** The precomputed link table: one row per (capture, link) with the
    * link's KIND (`link_path` — CC's locator, e.g. `A@/href`,
    * `IMG@/src`, `LINK@/href`: real WAT lists every outbound
    * reference, not just anchors), the RAW attribute value
    * (`raw_href` — what CC stores) and the RESOLVED absolute URL
    * (`href` — through the shared effectiveBase/resolveHref kernel
    * rule, `<base href>` honored via the envelope's `Head.Base`; null
    * when the value is a dropped scheme / empty / unresolvable, the
    * extractOutlinks drop contract). Duplicates and document order
    * are kept (multi-edge votes). Captures with no links keep ONE
    * null-link row; a malformed-JSON capture keeps one error row —
    * record conservation. Columns: (doc_id, url, http_status,
    * link_idx, link_path, raw_href, href, error). */
  def watToLinks(spark: SparkSession, path: String): DataFrame =
    linksFromRecords(Warc.readWarc(spark, path))

  /** [[watToLinks]] over an already-read records frame — feed
    * [[Warc.readWarcStream]] output here for CONTINUOUS WAT ingest
    * (the whole chain is map-only: zero state operators, law-pinned
    * batch-equal in StreamingSpec). Resolution runs through the
    * WHOLE-PAGE kernel BEFORE the posexplode, so a 100-link capture
    * derives its base parts once, not 100× (r20 review find). */
  def linksFromRecords(records: DataFrame): DataFrame =
    parsed(records)
      .select(col("doc_id"), col("url"), col("http_status"),
        col("error"),
        // the link KIND rides along zipped with the resolved pair so
        // one posexplode keeps all three aligned
        posexplode_outer(arrays_zip(
          transform(col("__links"), l => l.getField("path")),
          graft.functions.VectorExprs.withKernels(
            call_function("graft_resolve_hrefs",
              transform(col("__links"), l => l.getField("url")),
              col("url"), col("base"))))).as(Seq("__i", "__z")))
      .select(col("doc_id"), col("url"), col("http_status"),
        col("__i").cast("long").as("link_idx"),
        col("__z").getField("0").as("link_path"),
        col("__z").getField("1").getField("raw").as("raw_href"),
        col("__z").getField("1").getField("href").as("href"),
        col("error"))

  /** Per-capture metadata at the grain a pre-fetch gate wants:
    * (doc_id, url, http_status, title, n_links, error). `n_links`
    * counts the RAW link entries (resolution drops are a link-table
    * concern); a malformed-JSON capture carries its error row with
    * null fields. */
  def watToMetadata(spark: SparkSession, path: String): DataFrame =
    parsed(Warc.readWarc(spark, path))
      .select(col("doc_id"), col("url"), col("http_status"), col("title"),
        coalesce(size(col("__links")).cast("long"), lit(0L))
          .as("n_links"),
        col("error"))

  /** Registered-domain link edges from a WAT archive — the cheap
    * alternative to [[graft.ops.Web.edgesFromDocuments]] when WAT is
    * available: same status-200 gate, same resolution
    * rule, same [[graft.ops.Web.edgesFromLinks]] projection
    * (multi-edges kept, self-loops dropped), law-pinned equal to the
    * HTML-scan edges on the linked fixture — INCLUDING the link-kind
    * gate: real WAT lists every outbound reference (`IMG@/src`,
    * `SCRIPT@/src`, `LINK@/href`, …), while edgesFromDocuments scans
    * `<a href>` only, so only `A@…` locators (or entries with no
    * locator — permissive toward WAT variants that omit it) count as
    * authority edges. */
  def edgesFromWat(spark: SparkSession, path: String,
                   suffixes: Seq[String] =
                     graft.ops.Web.DefaultPublicSuffixes,
                   dropSelf: Boolean = true): DataFrame =
    edgesFromWatLinks(watToLinks(spark, path), suffixes, dropSelf)

  /** [[edgesFromWat]] over an already-built [[watToLinks]]-shaped
    * frame — THE one rendition of the status/error/resolution/
    * link-kind gate, so probes and streaming callers cannot drift
    * from the production edge semantics (r20 review find). */
  def edgesFromWatLinks(links: DataFrame,
                        suffixes: Seq[String] =
                          graft.ops.Web.DefaultPublicSuffixes,
                        dropSelf: Boolean = true): DataFrame =
    graft.ops.Web.edgesFromLinks(
      links.filter(col("error").isNull && col("http_status") === 200 &&
        col("href").isNotNull &&
        (col("link_path").isNull || col("link_path").startsWith("A@"))),
      "url", "href", suffixes, dropSelf)

  // ---- deterministic fixture (the Warc.fixtureLinkedCrawl mate) --------

  /** The WAT rendering of [[Warc.fixtureLinkedCrawl]]: one `metadata`
    * record per page carrying the SAME raw href values the HTML
    * fixture embeds (plus the 404 page, whose links the status gate
    * must drop), a warcinfo header record, and one metadata record
    * with a MALFORMED JSON payload (the quarantine row). Keeping the
    * two fixtures in lockstep is what the WAT-edges ≡ document-edges
    * law certifies. */
  def fixtureWat(): Array[Byte] = {
    def rec(tpe: String, uri: String, ct: String,
            body: String): Array[Byte] = {
      val block = body.getBytes("UTF-8")
      val head = s"WARC/1.0\r\n" +
        s"WARC-Type: $tpe\r\n" +
        (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
        "WARC-Date: 2026-01-06T00:00:00Z\r\n" +
        s"WARC-Record-ID: <urn:uuid:wat-$tpe-$uri>\r\n" +
        s"Content-Type: $ct\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n"
      head.getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    }
    def watJson(status: Int, title: String,
                links: Seq[(String, String)]): String = {
      val ls = links.map { case (p, l) => s"""{"path":"$p","url":"${l
        .replace("\\", "\\\\").replace("\"", "\\\"")}"}""" }
        .mkString("[", ",", "]")
      s"""{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":{""" +
        s""""Response-Message":{"Status":"$status"},""" +
        s""""HTML-Metadata":{"Head":{"Title":"$title"},""" +
        s""""Links":$ls}}}}}"""
    }
    def meta(uri: String, status: Int, title: String,
             links: Seq[(String, String)]): Array[Byte] =
      rec("metadata", uri, "application/json",
        watJson(status, title, links))
    def a(l: String): (String, String) = ("A@/href", l)
    rec("warcinfo", "", "application/warc-fields",
      "software: graft-wat-fixture\r\n") ++
      meta("https://alpha.com/news/a1", 200, "alpha",
        Seq(a("https://beta.com/x"), a("/promo"), a("rel/two"),
          a("//gamma.com/lib"), a("mailto:x@alpha.com"),
          // real WAT lists EVERY outbound reference — an IMG target
          // that the <a href> HTML scan never sees; the edge gate
          // must drop it (WAT ≡ documents law) while the link table
          // keeps it (a prefetcher wants asset URLs too)
          ("IMG@/src", "https://assets.cdn-zeta.com/logo.png"))) ++
      meta("https://beta.com/dir/b1", 200, "beta",
        Seq(a("https://alpha.com/one"),
          a("HTTPS://ALPHA.com/two?utm_s=9"),
          a("../up"), a("javascript:void(0)"))) ++
      meta("https://gamma.com/g1", 200, "gamma", Seq(a("#sec"))) ++
      meta("https://delta.com/dead", 404, "dead",
        Seq(a("https://alpha.com/not-counted"))) ++
      rec("metadata", "https://mal.example/x", "application/json",
        "{not json")
  }
}
