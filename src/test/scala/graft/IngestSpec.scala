package graft

import java.nio.file.Files

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  test("readJsonl: well-formed rows load typed, malformed lines " +
    "quarantine with the raw line — nothing silently dropped") {
    val dir = Files.createTempDirectory("graft_jsonl")
    try {
      Files.writeString(dir.resolve("part0.jsonl"),
        """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}
          |{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}
          |this is not json at all
          |{"doc_id": 3, "text": "ok", "lang": "en", "source": "books"}
          |{"broken": [unterminated
          |""".stripMargin)
      val r = graft.sources.Ingest.readJsonl(spark, dir.toString)
      val docs = r.docs.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
      assert(docs.toSeq === Seq((1L, "hello world", "en"),
        (2L, "bonjour", "fr"), (3L, "ok", "en")))
      val bad = r.quarantine.as[String].collect().sorted
      assert(bad.length === 2)
      assert(bad.exists(_.contains("not json")))
      assert(bad.exists(_.contains("unterminated")))
      // conservation: every input line accounted for exactly once
      assert(r.docs.count() + r.quarantine.count() === 5)
      // the loaded frame feeds the ops layer directly
      val toks = r.docs.select(
        graft.ops.TextAnalysis.tokenCount(org.apache.spark.sql.functions.col("text")))
        .as[Int].collect().sum
      assert(toks === 4)
      // no-cache posture pinned (r12 What's-wrong #1): neither branch
      // retains the corpus — no InMemoryRelation anywhere in the plan;
      // both are lazy map-only reads of the text source.
      Seq(r.docs, r.quarantine).foreach { d =>
        val plan = d.queryExecution.optimizedPlan.toString
        assert(!plan.contains("InMemoryRelation"),
          s"ingest branch must not cache the corpus:\n$plan")
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("readJsonl conservation is unconditional: blank and " +
    "whitespace-only lines quarantine rather than vanish") {
    val dir = Files.createTempDirectory("graft_jsonl_blank")
    try {
      Files.writeString(dir.resolve("part0.jsonl"),
        "{\"doc_id\": 1, \"text\": \"a\", \"lang\": \"en\", \"source\": \"w\"}\n" +
          "\n" +
          "   \n" +
          "{\"doc_id\": 2, \"text\": \"b\", \"lang\": \"en\", \"source\": \"w\"}\n")
      val r = graft.sources.Ingest.readJsonl(spark, dir.toString)
      assert(r.docs.count() === 2)
      assert(r.quarantine.count() === 2)
      assert(r.docs.count() + r.quarantine.count() === 4)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("readCsv: typed rows load, malformed/blank lines quarantine, " +
    "per-shard headers drop, quoting respected — conservation law " +
    "docs + quarantine + headers == lines") {
    val dir = Files.createTempDirectory("graft_csv")
    try {
      val hdr = "doc_id,text,lang,source"
      // two shards, each with its own header; one quoted text field
      // carrying a comma and an escaped quote; a malformed doc_id; a
      // blank line
      Files.writeString(dir.resolve("shard0.csv"),
        hdr + "\n" +
          "1,\"hello, \"\"world\"\"\",en,web\n" +
          "2,bonjour,fr,web\n" +
          "notanumber,oops,en,web\n")
      Files.writeString(dir.resolve("shard1.csv"),
        hdr + "\n3,ok,en,books\n\n")
      val r = graft.sources.Ingest.readCsv(spark, dir.toString)
      val docs = r.docs.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
      assert(docs.toSeq === Seq((1L, "hello, \"world\"", "en"),
        (2L, "bonjour", "fr"), (3L, "ok", "en")))
      val bad = r.quarantine.as[String].collect().sorted
      assert(bad.exists(_.contains("notanumber")))
      // conservation: 7 non-empty physical lines + 1 blank read as a
      // line = docs(3) + quarantine(2: malformed + blank) + headers(2)
      val lines = spark.read.text(dir.toString).count()
      assert(r.docs.count() + r.quarantine.count() + 2 === lines)
      // no-cache posture, same as readJsonl
      Seq(r.docs, r.quarantine).foreach { d =>
        val plan = d.queryExecution.optimizedPlan.toString
        assert(!plan.contains("InMemoryRelation"))
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("readCsv header forms: the writer-QUOTED header also drops as " +
    "metadata (r15 advice: an all-string schema would silently parse " +
    "it as data)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv_qh")
    try {
      val schema = StructType(Seq(
        StructField("a", StringType), StructField("b", StringType)))
      Files.writeString(dir.resolve("s0.csv"),
        "\"a\",\"b\"\n" + // quoted header variant
          "x,y\n" +
          "a,b\n") // data row byte-equal to the CANONICAL header:
      // documented as unrepresentable under the line-grain contract —
      // it drops as metadata (readCsvMultiline handles it correctly)
      val r = graft.sources.Ingest.readCsv(spark, dir.toString, schema)
      val docs = r.docs.collect().map(x => (x.getString(0), x.getString(1)))
      assert(docs.toSeq === Seq(("x", "y")))
      assert(r.quarantine.count() === 0)
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("readCsvMultiline: quoted embedded newlines parse as ONE record, " +
    "malformed records quarantine at record grain with the file path, " +
    "per-file header handled, header-equal data row NOT swallowed — " +
    "conservation docs + quarantine == records") {
    val dir = Files.createTempDirectory("graft_csv_ml")
    try {
      val hdr = "doc_id,text,lang,source"
      // shard0: a two-line quoted text field with comma + doubled
      // quote; a record whose text is byte-equal to the header (the
      // line reader's unrepresentable row — must survive here); a
      // malformed doc_id
      Files.writeString(dir.resolve("s0.csv"),
        hdr + "\n" +
          "1,\"line one\nline two, \"\"quoted\"\"\",en,web\n" +
          "2,\"" + hdr + "\",en,web\n" +
          "notanumber,oops,en,web\n")
      Files.writeString(dir.resolve("s1.csv"),
        hdr + "\n3,plain,fr,books\n")
      val r = graft.sources.Ingest.readCsvMultiline(spark, dir.toString)
      val docs = r.docs.orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
      assert(docs.toSeq === Seq(
        (1L, "line one\nline two, \"quoted\"", "en"),
        (2L, hdr, "en"),
        (3L, "plain", "fr")))
      val bad = r.quarantine.collect()
        .map(x => (x.getString(0), x.getString(1)))
      assert(bad.length === 1)
      assert(bad.head._1.contains("notanumber"))
      assert(bad.head._2.endsWith("s0.csv"))
      // conservation at record grain: 4 data records across both files
      assert(r.docs.count() + r.quarantine.count() === 4)
      // no-cache posture, same as the line-grain readers
      Seq(r.docs, r.quarantine).foreach { d =>
        val plan = d.queryExecution.optimizedPlan.toString
        assert(!plan.contains("InMemoryRelation"))
      }
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("readCsvMultiline CRLF pin (r17 review): embedded CRLF inside a " +
    "quoted field normalizes to LF (declared content alteration — " +
    "univocity's line-ending detection, not switchable via Spark " +
    "options); CR-only record separators parse identically in both " +
    "readers") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_csv_crlf")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    try {
      Files.write(dir.resolve("crlf.csv"),
        "doc_id,text\r\n1,plain\r\n2,\"two\r\nlines\"\r\n3,trail\r\n"
          .getBytes("UTF-8"))
      val m = graft.sources.Ingest.readCsvMultiline(spark,
        dir.resolve("crlf.csv").toString, schema)
      val byId = m.docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // the pin: raw bytes carry \r\n inside the quotes, the parsed
      // value carries \n — if a Spark upgrade changes this, the
      // declared contract in the scaladoc must change with it
      assert(byId(2L) === "two\nlines")
      assert(byId(1L) === "plain" && byId(3L) === "trail",
        "CRLF record separators must not leak \\r into field values")
      assert(m.quarantine.count() === 0)
      // CR-only (old-Mac) separators: both readers agree (Hadoop's
      // line reader and univocity both treat lone CR as a terminator)
      Files.write(dir.resolve("cr.csv"),
        "doc_id,text\r1,plain\r3,trail\r".getBytes("UTF-8"))
      val lineDocs = graft.sources.Ingest.readCsv(spark,
          dir.resolve("cr.csv").toString, schema)
        .docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val mlDocs = graft.sources.Ingest.readCsvMultiline(spark,
          dir.resolve("cr.csv").toString, schema)
        .docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(lineDocs === mlDocs && lineDocs === Set((1L, "plain"), (3L, "trail")))
    } finally {
      dir.toFile.listFiles().foreach(_.delete()); Files.delete(dir)
    }
  }

  test("readTextDir: one row per file, recursive, glob-filtered") {
    val dir = Files.createTempDirectory("graft_txt")
    try {
      Files.createDirectory(dir.resolve("sub"))
      Files.writeString(dir.resolve("a.txt"), "alpha beta")
      Files.writeString(dir.resolve("sub").resolve("b.txt"), "gamma")
      Files.writeString(dir.resolve("ignored.json"), "{}")
      val rows = graft.sources.Ingest.readTextDir(spark, dir.toString)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows.length === 2)
      assert(rows.exists(r => r._1.endsWith("a.txt") && r._2 == "alpha beta" && r._3 == 10L))
      assert(rows.exists(r => r._1.endsWith("b.txt") && r._2 == "gamma"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir.toFile)
    }
  }
}
