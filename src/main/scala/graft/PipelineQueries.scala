package graft

import graft.ops.{Dedup, Selection, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline queries (dedup / similarity / text analysis)
  * with DuckDB oracle SQL. Hash functions in the oracle-checked queries
  * are md5-based so both engines derive bit-identical signatures; the
  * library defaults to xxhash64 for production speed.
  */
object PipelineQueries {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")

  /** Single-split-scan parallelism fix — see [[Tables.spread]].
    * Applied only where stage-1 kernel cost dominates (tokenize/
    * shingle/minhash/segment over documents; encode/score over
    * embeddings).
    *
    * Output-order note (r13 floor work): queries whose trailing
    * `.orderBy` was purely cosmetic (doc-keyed map outputs, top-k
    * results already ranked inside the operator) no longer sort —
    * the driver compare sorts rows itself, and at 100 TB a
    * gratuitous total sort is a full extra range-partition shuffle.
    * Every orderBy feeding a `limit` (true top-k semantics) and every
    * grouped-reduce output sort (the §2.3 flox sort contract, applied
    * inside GroupByReduce) is retained. */
  private def spread(s: SparkSession, df: DataFrame,
                     key: String = "doc_id"): DataFrame =
    Tables.spread(s, df, key)
  private def emb(s: SparkSession, d: String) = Tables(s, d, "embeddings")
  private def ev(s: SparkSession, d: String) = Tables(s, d, "events")
  // events with event time normalized to micros-since-epoch BIGINT
  // regardless of the physical ts encoding (see Tables.tsMicros)
  private def evu(s: SparkSession, d: String) = {
    val e = ev(s, d)
    e.withColumn("tsu", Tables.tsMicros(e))
  }

  // ---- web/URL fixtures (q_url_*, q_domain_cap) -------------------------
  // Deterministic absolute URLs derived from documents columns so both
  // engines construct byte-identical inputs (the q_pii convention).

  /** Domain-rich fixture: 22 registered domains (20 src*-news.com +
    * example.com + blogspot.co.uk), mixed-case scheme/host, default +
    * non-default ports, tracking params, fragments, trailing slashes,
    * and multi-label subdomains (cdn.media.*) for suffix blocking. */
  private def urlFixtureWeb: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val host = when(id % 4 === 0, concat(lit("WWW."), col("source"), lit("-News.COM")))
      .when(id % 4 === 1, concat(lit("cdn.media."), col("source"), lit("-news.com")))
      .when(id % 4 === 2, concat(col("source"), lit(".example.com")))
      .otherwise(concat(col("source"), lit(".blogspot.CO.UK")))
    val scheme = when(id % 2 === 0, lit("https")).otherwise(lit("HTTP"))
    val port = when(id % 6 === 0, lit(":443"))
      .when(id % 6 === 3, lit(":8080")).otherwise(lit(""))
    val path = concat(lit("/"), col("lang"), lit("/Doc/"), id.cast("string"),
      when(id % 7 === 0, lit("/")).otherwise(lit("")))
    val qs = when(id % 3 === 0, lit("?utm_source=feed&b=2&a=1"))
      .when(id % 3 === 1, lit("?a=1&utm_campaign=x&ref=tw")).otherwise(lit(""))
    val frag = when(id % 5 === 0, concat(lit("#sec-"), col("lang"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path, qs, frag)
  }

  /** Collision-rich fixture: every canonical-RELEVANT part derives
    * from doc_id % 120 (exactly 120 canonical URLs over 500 docs, ~4
    * captures each); every canonical-IRRELEVANT part (www., default
    * port matched to the scheme, tracking param, fragment, trailing
    * slash, case) varies with the FULL doc_id — so dedup exercises the
    * normalizer, not string equality. */
  private def urlFixtureDedup: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    val key = id % 120
    val scheme0 = when(key % 2 === 0, lit("https")).otherwise(lit("http"))
    val scheme = when(id % 5 === 0, upper(scheme0)).otherwise(scheme0)
    val www = when(id % 2 === 0, lit("www.")).otherwise(lit(""))
    val host0 = concat(lit("h"), (key % 6).cast("string"), lit(".example.com"))
    val host = when(id % 10 === 0, upper(host0)).otherwise(host0)
    val port = when(id % 2 === 1,
      when(key % 2 === 0, lit(":443")).otherwise(lit(":80"))).otherwise(lit(""))
    val path = concat(lit("/p/"), key.cast("string"),
      when(id % 3 === 0, lit("/")).otherwise(lit("")))
    val qs = concat(lit("?utm_source=u"), id.cast("string"),
      lit("&a="), (key % 3).cast("string"))
    val frag = when(id % 4 === 0, concat(lit("#f"), id.cast("string"))).otherwise(lit(""))
    concat(scheme, lit("://"), www, host, port, path, qs, frag)
  }

  /** HTML-page fixture for q_html_extract: script with an unescaped
    * `<`, style, headings, paragraphs, conditional <br>/entity runs,
    * nested list — the shapes the extractor's five rules must handle. */
  private def htmlFixture: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      lit("<html><head><title>"), col("lang"), lit("</title>"),
      lit("<script type=\"text/javascript\">var x = 1; if (x<2) { x = 3; }</script>"),
      lit("<style>.c { color: red; }</style></head><body><h1>"),
      col("source"), lit("</h1>"),
      lit("<p>"), substring(col("text"), 1, 100), lit("</p>"),
      when(id % 4 === 0, lit("<br>extra &amp; line<br/>")).otherwise(lit("")),
      lit("<div class=\"main\">"), substring(col("text"), 101, 120),
      when(id % 3 === 0, lit(" &nbsp;tail&#39;s &lt;ok&gt;")).otherwise(lit("")),
      lit("</div><ul><li>one</li><li>two</li></ul></body></html>"))
  }

  /** Per-host robots.txt fixture shared by q_robots_parse /
    * q_robots_delay / q_robots_sitemap: three document variants —
    * exact-agent groups with per-group Crawl-delays (the matched
    * group's 2.5 must beat the * group's 10), a *-only document with
    * a Sitemap and no delay, and a document with pre-group lines
    * (ignored), a non-numeric delay, a * delay, and one absolute +
    * one relative Sitemap value. */
  private def robotsFixture(s: org.apache.spark.sql.SparkSession,
                            d: String): org.apache.spark.sql.DataFrame = {
    val n = substring(col("source"), 4, 10).cast("int")
    val txt = when(n % 3 === 0,
      lit("User-agent: GraftBot\nCrawl-delay: 2.5\nDisallow: /private/\n" +
        "Allow: /private/pub/\n\nUser-agent: *\nCrawl-delay: 10\n" +
        "Disallow: /all/\n"))
      .when(n % 3 === 1,
        lit("# hi\nUser-agent: *\nDisallow: /p\n" +
          "Sitemap: https://x/s.xml\nDisallow:\n"))
      .otherwise(
        lit("Crawl-delay: oops\nDisallow: /orphan/\nUser-agent: *\n" +
          "Allow: /ok/\nDisallow: /no/\nCrawl-delay: 7\n" +
          "Sitemap: https://y/z.xml\nSitemap: relative/no\n"))
    docs(s, d)
      .select(concat(col("source"), lit("-news.com")).as("host"),
        txt.as("txt")).distinct()
  }

  /** Page URL for the outlink fixture: scheme https, authority
    * `<source>-news.com`, path directory `/sec/<doc_id%7>/` — the base
    * every relative href resolves against. */
  private def outlinkBase: org.apache.spark.sql.Column =
    concat(lit("https://"), col("source"), lit("-news.com/sec/"),
      (col("doc_id") % 7).cast("string"), lit("/page.html"))

  /** HTML fixture for q_outlinks: every href shape the resolver must
    * handle — absolute (plus an uppercase-scheme variant), single- and
    * double-quoted and BARE values, protocol-relative, root-relative,
    * relative and `./`-relative (with a fragment to strip), and the
    * mailto/fragment-only links that must extract to nothing. */
  private def outlinkFixtureHtml: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(
      lit("<html><body><h1>"), col("source"), lit("</h1>"),
      // every 6th page rebases via <base href> — relative and
      // root-relative links must resolve against it (r19)
      when(id % 6 === 0,
        lit("<base href=\"https://static.hub.org/lib/\">"))
        .otherwise(lit("")),
      lit("<a href=\"https://partner"), (id % 5).cast("string"),
      lit(".com/x?id="), id.cast("string"), lit("\">p</a>"),
      lit("<a href='//cdn-assets.net/l"), (id % 3).cast("string"),
      lit("'>c</a>"),
      lit("<a href=/local/"), (id % 7).cast("string"), lit(">l</a>"),
      when(id % 2 === 0, lit("<a href=\"rel/page2.html\">r</a>"))
        .otherwise(lit("<a href=\"./sib.html#frag\">s</a>")),
      lit("<a href=\"mailto:x@y.com\">m</a><a href=\"#top\">t</a>"),
      when(id % 4 === 0, lit("<A HREF=\"HTTP://Upper.org/Y\">u</A>"))
        .otherwise(lit("")),
      lit("</body></html>"))
  }

  /** Collision-AND-domain fixture for the web e2e capstone: canonical
    * identity = (source, doc_id % 100) — ~50 collision pairs over 500
    * docs — while hosts still spread over 20 registered domains for
    * the blocklist and cap stages. */
  private def urlFixtureE2e: org.apache.spark.sql.Column = {
    val id = col("doc_id")
    concat(lit("https://"),
      when(id % 2 === 0, lit("www.")).otherwise(lit("")),
      col("source"), lit("-news.com"),
      when(id % 2 === 1, lit(":443")).otherwise(lit("")),
      lit("/p/"), (id % 100).cast("string"),
      lit("?utm_s="), id.cast("string"), lit("&a=1"))
  }

  /** One shared per-JVM fixture directory for the WARC queries —
    * repeated bench/verify invocations must not accumulate temp dirs
    * (r18 review find). */
  private lazy val warcFixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_fixtures")
    java.nio.file.Files.write(dir.resolve("fixture.warc"),
      graft.sources.Warc.fixtureWarc())
    java.nio.file.Files.write(dir.resolve("crawl.warc"),
      graft.sources.Warc.fixtureCrawl())
    java.nio.file.Files.write(dir.resolve("linked.warc"),
      graft.sources.Warc.fixtureLinkedCrawl())
    java.nio.file.Files.write(dir.resolve("fixture.warc.gz"),
      graft.sources.Warc.fixtureWarcGz())
    java.nio.file.Files.write(dir.resolve("fixture.wet"),
      graft.sources.Warc.fixtureWet())
    java.nio.file.Files.write(dir.resolve("fixture.wat"),
      graft.sources.Wat.fixtureWat())
    java.nio.file.Files.write(dir.resolve("encoded.warc"),
      graft.sources.Warc.fixtureEncodedWarc())
    java.nio.file.Files.write(dir.resolve("charset.warc"),
      graft.sources.Warc.fixtureCharsetWarc())
    dir.toFile.deleteOnExit()
    dir.toString
  }

  // ---- shared oracle SQL fragments -------------------------------------
  private def wOf(c: String) = raw"string_split_regex(lower(trim($c)), '\s+')"
  private def shOf(c: String) = {
    val w = wOf(c)
    s"list_transform(range(1, CASE WHEN len($w) >= 3 THEN len($w) - 1 ELSE 1 END), " +
      s"i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])"
  }
  private def mhSqlOf(c: String, h: Int) =
    s"list_min(list_transform(${shOf(c)}, s -> md5('$h' || '|' || s)))"
  // generic k-gram mirror of shOf (shOf is the k=3 fast path)
  private def kShOf(c: String, k: Int) = {
    val w = wOf(c)
    s"list_transform(range(1, CASE WHEN len($w) >= $k THEN len($w) - ${k - 2} " +
      s"ELSE 1 END), i -> list_aggregate(list_slice($w, i, i + ${k - 1}), " +
      "'string_agg', ' '))"
  }
  private val W = wOf("text")

  // ---- pinned quality-classifier model (q_quality_classifier) ----------
  // fastText-style hashed-bag logistic model trained ONCE at sf0.01
  // (QualityClassifier.train, dim=128, 300 iters, lr=1.0, label
  // "more 'slow' than 'fast' tokens"), weights rounded to 6 dp and
  // pinned — the q_unigram_tokenize convention: training is
  // spec-certified (QualityClassifierSpec vs a local reference), the
  // INFERENCE path is hash-certified against DuckDB re-deriving the
  // same margins from these literals. 6-dp weights × integer counts
  // make every margin a 6-dp decimal, so round(margin, 6) is
  // bit-stable across engines (probe: max distance to the 6-dp grid
  // 9e-14, min |margin| 0.030 — sign clearance >> cross-engine ulps).
  private[graft] val qcDim = 128
  private[graft] val qcWeights: Seq[Double] = Seq(
    0.0, 0.0, 0.0, 0.0, 0.86429, 0.0, 0.0, 1.98785, 0.0, -1.719233,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.697211, 0.0, 0.0,
    0.0, 0.0, 0.0, -0.413231, 0.722986, 0.0, 0.0, 0.0, 0.0, 0.0,
    -1.308308, 0.0, 0.0, -0.714209, -8.298956, 0.0, 0.612238, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.149355, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.114926, 0.0, 0.0, 0.0, 0.0, 0.0, 0.549249, 0.0,
    0.0, 0.0, 0.0, 0.643988, -0.208054, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 1.36358, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 1.097129, 0.520279, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.057033,
    0.0, 0.0, 0.0, -0.01419, 0.0, 0.0, 0.0, 0.0, 15.322973, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.769584, -0.947089, 0.0, -0.989977, -0.321158,
    0.0, 0.0, 0.0, 0.0, 0.0, -1.460289, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -3.295219)
  // the same model rendered for the oracle: nonzero (feat, wt) rows
  private def qcValuesSql: String =
    qcWeights.init.zipWithIndex
      .collect { case (wt, i) if wt != 0.0 => s"($i, $wt)" }
      .mkString(", ")
  private val SH = shOf("text")
  private def mhSql(h: Int) = mhSqlOf("text", h)

  /** Pinned PQ codebook for q_pq_topk: trained ONCE at sf0.01
    * (Similarity.trainPq, dims=64, m=8, codesPerSub=16, iters=3,
    * 6-dp rounded — the quality-classifier pinning convention:
    * training is spec-certified (PqSpec determinism + monotone-error
    * laws), the ENCODE + ADC SEARCH path is hash-certified against
    * DuckDB re-deriving codes and scores from these literals. Flat
    * row-major (s*16 + c)*8 + d. */
  private val pqCb: Seq[Double] = Seq(
    0.081334, 0.192456, 0.077139, 0.045294, -0.039774, 0.034325, 0.026667, -0.075818,
    -0.093724, -0.013413, -0.010318, 0.096698, -0.072637, 0.030768, 0.115382, 0.068522,
    0.072501, -0.013953, 0.175345, 7.02E-4, 0.02799, 0.164214, -0.0936, 0.042421,
    0.096124, -0.026621, 0.108499, -0.103401, 0.098886, 0.032747, 0.066946, 0.012303,
    0.069096, 0.132907, -0.096214, -0.130694, -0.005147, -0.020926, -0.033842, 0.094673,
    -0.100654, -0.152998, 0.023368, -0.043592, 0.069643, 0.018416, -0.122166, 0.043885,
    0.037775, 0.016344, 0.093822, 0.010324, 0.075685, -0.163731, 0.012034, 0.128219,
    -0.109104, 0.123173, 0.100597, -0.106396, -0.020086, -0.001309, 0.002467, -0.058245,
    0.007899, 0.018996, -0.042039, 0.113093, 0.045252, 0.029464, -0.209507, -0.070203,
    -0.129222, 0.001427, 0.063391, -0.028566, 0.027904, -0.211734, -0.056452, -0.072483,
    -0.129962, 0.097937, 0.04621, -0.002457, 0.091468, 0.101546, -0.025284, 0.089709,
    0.031698, -0.022985, 0.05879, -0.084739, -0.199283, -0.026718, -0.046787, -9.72E-4,
    0.06178, -0.099763, -0.085407, -0.012136, -0.002501, -0.140609, 0.050514, 0.078111,
    -0.015107, -0.013043, -0.144934, -0.041282, -0.013391, 0.105013, -0.031079, -0.017301,
    0.12096, -0.039844, -0.027072, 0.128001, 0.048697, 0.062714, -0.091429, 0.107695,
    0.019252, -0.064017, -0.030839, 0.018203, 0.057286, 0.005835, 0.040518, -0.184653,
    -0.156119, -0.009307, 0.139263, -0.004736, 0.015628, 0.063877, -0.035139, 0.024638,
    -0.00858, -0.00775, 0.004133, -0.181689, -0.061018, 0.003356, -0.144753, 0.106123,
    -0.014207, 0.062578, 0.020563, 0.23039, -0.085019, -0.02181, -0.130403, 0.060725,
    -0.102044, -0.116617, 0.060907, 0.094722, -0.125811, 0.027537, 0.078709, 0.12237,
    0.042055, -0.096583, -0.037191, -0.013613, 0.095196, 0.129574, -0.037773, 0.141845,
    0.018149, 0.088941, -0.101501, 0.018141, 0.024005, -0.17147, 0.043226, 0.037851,
    -0.131089, 0.005851, -0.114874, -0.079648, -0.036012, 0.06688, 0.057058, 0.090282,
    0.135334, 0.043176, 2.39E-4, 0.052944, -0.123763, 0.052564, 0.071898, -0.051535,
    0.015359, -0.157884, 0.001075, -0.100291, -0.08105, -0.044326, 0.002818, -0.111873,
    -0.061766, 0.094251, -0.069653, 0.145833, 0.113935, 0.01325, 0.070663, 0.015546,
    -0.056171, -0.140032, -0.123731, 0.072479, 0.051694, 0.079646, 0.074444, -0.136134,
    0.14464, -0.037237, -0.049449, -0.149165, 0.089076, -0.030259, 0.006254, -0.048683,
    0.057113, 0.006779, 0.135097, -0.029596, 0.071454, -0.064302, 0.090802, 0.06371,
    0.036444, 0.178677, 0.07786, -0.044897, 0.024308, 0.123692, -0.017067, -0.030566,
    -0.080823, 0.032874, 0.065132, -0.03591, -0.062112, -0.095188, -0.04834, -0.150904,
    0.029653, -0.110169, -0.00686, 0.082241, 0.008659, -0.01508, -0.117083, 0.022426,
    -0.114702, 0.015356, -0.10238, -0.039267, 0.013015, -0.008964, -0.134153, -0.026675,
    -0.153048, -0.152006, -0.037744, -0.018854, -0.097814, 0.008978, -0.046992, -0.061432,
    0.023408, -0.02056, -0.030427, -0.097178, 0.029587, -0.011476, 0.08486, -0.178323,
    0.068397, 0.00971, 0.063684, -0.050735, -0.085643, -0.057464, -0.009907, 0.198138,
    0.083098, -0.01677, 0.038823, -0.153502, 0.132584, 0.083695, 0.062841, 0.031815,
    0.032922, 0.033659, -0.051621, 0.174033, 0.062612, 0.044459, 0.075668, -1.64E-4,
    -0.050882, -0.03449, 0.036842, 0.053077, 0.110641, -0.0802, 0.054381, 0.044533,
    -0.15752, 0.068595, 0.007913, -0.036433, -0.011634, 0.169497, -0.014486, 0.087808,
    0.132642, 0.090764, 0.013185, -0.082265, -0.109005, 0.111302, 0.065935, -0.173574,
    -0.043798, 0.187164, 0.039509, -0.025572, -0.006339, 0.064413, 0.01255, -0.032417,
    0.095766, -0.130057, -0.169579, 0.056228, 0.01431, -0.011126, -0.047424, 0.012804,
    -0.00791, 0.128347, -0.021898, 0.090775, -0.045938, -0.109142, 0.0208, -0.109942,
    0.099202, -0.062351, 0.033344, -0.031232, -0.035927, -0.069869, -0.110439, -0.01167,
    0.015034, -0.026694, -0.07225, 0.027173, -0.190664, 0.062696, 0.10519, 0.032102,
    -0.048623, -0.086925, 0.192414, 0.042978, -0.024387, -7.98E-4, 0.007461, 0.004364,
    0.070505, 0.028986, -0.03163, 0.034871, 0.111487, 0.089301, -0.098188, 0.146818,
    0.062671, 0.103439, -0.052337, 0.088781, 0.087441, 0.136432, -0.04292, -0.079745,
    0.011548, -0.026659, 0.010511, -0.034946, 0.029467, -0.180353, 0.034974, 0.002703,
    0.100198, 0.031951, -0.027599, -0.062928, 0.070378, 0.03785, 0.143549, -0.125852,
    -0.068883, 0.071473, 0.133255, 0.041142, 0.052987, 0.027535, -0.12741, 0.053282,
    -0.113564, -0.047127, 0.036403, -0.127928, -0.081837, 0.04209, 0.042288, -0.035043,
    -0.050851, 0.206544, 0.088083, -0.03586, 0.012692, -0.136825, 0.040415, 0.049367,
    -0.147147, 0.066624, -0.108946, 0.02706, 0.095186, 0.02425, -0.018884, 0.136521,
    -0.047082, 0.017939, -0.007724, -0.061119, -0.00272, -0.040015, -0.15682, -0.164347,
    -0.147296, -0.119858, -0.014444, 0.025589, 0.103686, 0.03988, 0.03457, -0.068407,
    0.039354, 0.072236, -0.155801, -0.049633, -0.080392, 0.074143, -0.080211, 0.059229,
    0.148848, 0.12597, 0.083741, -0.005241, -0.067065, 0.025719, -0.011965, 0.059756,
    -0.009638, 0.048751, -0.090671, 0.128526, -0.111069, -0.011307, 0.113042, -0.063223,
    -0.040337, -0.016712, -0.03411, 0.163206, -0.186174, -0.065125, -0.137131, -0.057315,
    0.016399, -0.12634, 0.144951, 0.094155, 0.025295, -0.022636, 0.089427, -0.001381,
    0.111331, -0.049599, 0.012928, 0.045955, 0.092182, 0.084226, -0.022655, 0.131379,
    0.049018, -0.159493, -0.078702, 0.073583, -0.05056, -0.020595, -0.012855, -0.011271,
    0.073699, -0.090493, -0.086607, -0.047036, -0.079197, -0.056777, 0.103617, -0.033719,
    0.101781, 0.102939, 0.168657, 0.081615, -0.030551, 0.043606, -0.075654, 0.087824,
    -0.048581, -0.16156, -0.035105, -0.032689, 0.047932, -0.081048, -0.068769, 0.048858,
    0.067382, -0.007479, 0.111146, -0.053601, -0.032183, 0.121392, 0.102332, -0.067125,
    -0.145391, 0.026929, -0.030586, -0.021316, 0.096231, 0.049074, 0.009192, -0.072619,
    0.036829, -0.041494, 0.026368, -0.221782, -0.034646, -0.115932, -6.26E-4, -0.02426,
    0.074341, -0.056621, -0.087423, 0.030674, 0.01741, 0.149761, -0.144755, 0.044138,
    0.026132, 0.0756, 0.093675, -0.022292, 0.041682, -0.142825, -0.06912, -0.112474,
    -0.042897, -0.001113, 0.10217, 0.07401, -0.175695, -0.125737, 0.107859, 0.102106,
    0.019411, 0.049365, -0.094688, 0.160552, -0.01487, -0.007036, 0.139725, -0.009556,
    0.05488, 0.09071, -0.070745, 0.146263, 0.027428, -0.161332, -0.046872, -0.055018,
    -0.027286, 0.109972, -0.061747, -0.04938, -0.121591, 0.063621, -0.031834, -0.065034,
    -0.001591, -0.072761, 0.107729, 0.105638, 0.049017, 0.041207, -0.084894, -0.11784,
    0.095905, -0.073348, -0.011939, 0.130159, 0.151685, 0.026801, 0.058987, 0.059277,
    -0.160954, -0.036142, -0.001438, -0.042135, -0.085152, 0.103636, -0.033348, 0.081291,
    0.091773, 0.077555, 0.024867, -0.050345, 0.078915, -0.013931, 0.030945, 0.129351,
    0.085039, -0.149389, -0.06664, -0.009944, -0.162079, 0.028903, -0.044099, 0.024378,
    -0.106141, 0.009907, -0.104178, -0.105652, -0.047866, 0.073733, -0.15744, 0.091368,
    0.103919, -0.055314, -0.002758, -0.132842, 0.006905, -0.004961, 0.0528, 0.128708,
    -0.142686, 0.036763, 0.040146, -0.007919, -0.058262, -0.111417, 0.049082, 0.039974,
    0.030973, 0.150136, -0.115099, -0.056311, -0.008216, -0.07022, -0.011554, 0.001216,
    -0.015295, -0.093043, 0.106531, -0.009141, 0.109779, 0.040594, 0.033219, 0.043047,
    0.077821, 0.11562, 0.059522, 0.027348, -0.081754, 0.023464, 0.1012, -0.175998,
    0.179562, -0.014194, 0.005546, -0.055092, 0.017738, 0.106099, -0.087313, -0.038102,
    -0.086378, -0.04476, -0.101126, -0.007038, 0.03301, 0.038633, 0.001214, -0.108215,
    -0.02175, -0.013129, 0.177911, 0.065238, -0.130883, 0.089548, -0.087564, -0.062755,
    -0.045018, -0.079025, -0.004131, -0.083296, -0.035488, -0.128164, -0.125304, -0.033585,
    1.77E-4, -0.06099, -0.076682, 0.100784, -0.022444, 0.114776, 0.144978, 0.025131,
    0.014254, -0.036585, 0.002964, 0.228072, 0.025174, -6.21E-4, -0.013246, 0.016222,
    0.159015, -0.140053, 0.126312, -0.043956, 0.011962, -0.094438, -0.004566, -0.054821,
    -0.056148, -7.09E-4, -0.043731, 0.059918, 0.030095, -0.102634, -0.062603, 0.217214,
    -0.056371, 0.238764, 0.02251, -0.040994, 0.135163, 0.037611, 0.066492, 0.099192,
    0.028849, -0.12925, -0.144646, -0.026139, 0.010061, 0.113874, -0.058208, -0.103498,
    -0.003575, 0.111519, 0.082005, -0.02697, 0.04261, 0.121559, 0.022654, -0.004884,
    -0.001762, 0.068432, 0.064703, 0.076244, 0.091529, -0.08592, 0.014144, 0.115625,
    0.025524, -0.111972, -0.024416, 0.018483, -0.027643, -0.07734, -0.130792, 0.131304,
    -0.00942, 0.02234, -0.096816, -0.168785, -0.020753, 0.001304, 0.109636, -0.062503,
    -0.158104, 0.041698, -0.016823, 0.133145, -0.078007, 0.067653, -0.076082, -0.098524,
    -0.095593, 0.025651, -0.079737, -0.02494, 0.139271, -0.033749, -0.048137, 0.019663,
    0.175357, -0.113619, 0.008602, -0.092592, 0.037151, 0.050255, -0.004908, 0.051043,
    -0.063056, -0.056852, 0.030897, -0.00948, 0.144965, -0.057374, 0.11848, -0.045677,
    0.021177, -0.079633, 0.175774, 0.047565, -0.00123, -0.012008, -0.033836, -0.039051,
    -0.051185, -0.006734, -0.059782, 0.098636, -0.109686, -0.048729, 0.135759, 0.010941,
    -0.019917, -0.114398, 0.055002, 0.072521, -0.063301, 0.134792, 0.105788, 0.054047,
    0.086204, 0.098268, 0.055185, -0.059382, -0.041151, -0.049991, -0.083363, -0.131324,
    0.164226, 0.121247, -0.131902, 0.017447, -0.018139, -0.072891, 0.05242, 0.051713,
    -0.120697, -0.040861, -0.041635, -0.100549, -0.156498, -0.081321, -0.090966, 0.016095,
    -0.100991, -0.220065, 0.053248, 0.005848, 0.052174, -0.116595, -0.107116, -0.079862,
    0.17409, 0.073056, 0.09388, 0.021945, 0.110594, 0.069082, -0.074129, -0.018177,
    0.049338, 0.123334, 0.011534, -0.143333, -0.069876, -0.034104, 0.066921, -0.148133,
    0.075807, -0.038374, -0.143998, -0.08294, 0.100111, -0.155743, 0.014234, -0.029895,
    -0.015824, 0.074792, -0.079502, 0.080761, 0.074721, -0.032982, -0.055524, 0.15551,
    -0.052183, 0.05787, -0.041884, 0.044579, 0.034227, -0.030942, 0.219171, -0.003485,
    0.049412, -0.099582, -0.046987, 0.062298, -0.005152, 0.009417, -0.049172, -0.18367,
    0.045153, 0.037489, -0.165016, 0.024688, -0.115154, 0.047166, -0.048151, 0.090671,
    -0.051221, -0.01688, 0.093252, -0.079686, -0.054479, -0.0581, 0.087787, 0.056271,
    -0.041655, 0.036296, 0.185919, 0.016022, -0.034464, 0.110129, -0.122149, -0.035873,
    -0.014621, -0.035151, -0.095031, -0.042119, -0.150336, 0.172884, -0.015704, -0.081113,
    0.052993, -0.007725, 0.059504, 0.142928, -0.102057, -0.065957, 0.033889, -0.011648,
    -0.100817, 0.109647, -0.108584, -0.107793, -0.001107, -0.089349, -0.0926, -0.03874,
    0.070426, 0.002655, 0.067115, -0.158933, -0.111722, 0.04454, -0.121117, -0.016039,
    -0.045641, 0.028596, 0.002597, -0.074877, 0.078224, 0.14931, 0.013656, -0.022027,
    -0.023105, -0.171459, -0.077085, -0.025368, 0.007047, 0.042879, 0.075417, 0.051725,
    -0.062715, -0.067519, 0.070785, 0.046454, 0.125103, -0.056881, -0.081874, -0.036776)
  private val pqM = 8
  private val pqK = 16
  private val pqSubDim = 8
  // the same codebook rendered for the oracle: (s, c, [8 components])
  private def pqCbValuesSql: String =
    (for (s <- 0 until pqM; c <- 0 until pqK) yield {
      val comps = (0 until pqSubDim)
        .map(d => pqCb((s * pqK + c) * pqSubDim + d)).mkString(", ")
      s"($s, $c, [$comps])"
    }).mkString(",\n         ")

  /** Pinned unigram-LM piece table for q_unigram_tokenize: trained
    * ONCE by ops.UnigramLm.train at sf0.01 (numRounds=3, maxPieceLen=4,
    * maxSeed=2048, keepPieces=32 — every corpus codepoint is seeded, so
    * coverage is total on the certified corpus), log-probs rounded to
    * 1e-3 then perturbed with a distinct per-piece sub-1e-6 offset so
    * no two distinct piece multisets tie on a path score — the Viterbi
    * argmax is unique and cross-engine comparable. Kept as STRINGS:
    * Scala parses with toDouble, DuckDB parses the same decimal
    * literal, both land on the identical nearest double, so path
    * scores accumulate bit-equal addends in both engines. */
  private val unigramPieces: Seq[(String, String)] = Seq(
    ("a", "-3.746001000000"),
    ("agg", "-3.723001427799"),
    ("b", "-5.150001855598"),
    ("batc", "-3.956001283394"),
    ("big", "-3.751001711193"),
    ("c", "-14.704001138989"),
    ("cust", "-3.687001566788"),
    ("d", "-14.244001994587"),
    ("data", "-3.715001422383"),
    ("e", "-2.612001850182"),
    ("er", "-3.393001277978"),
    ("f", "-22.452001705777"),
    ("fast", "-3.777001133573"),
    ("filt", "-3.690001561372"),
    ("g", "-3.855001989171"),
    ("h", "-3.956001416967"),
    ("hash", "-3.673001844766"),
    ("i", "-23.798001272562"),
    ("j", "-37.611001700361"),
    ("join", "-3.656001128157"),
    ("k", "-11.516001555956"),
    ("key", "-3.729001983755"),
    ("l", "-6.636001411551"),
    ("line", "-3.713001839350"),
    ("m", "-9.893001267146"),
    ("mall", "-3.746001694945"),
    ("merg", "-3.707001122741"),
    ("n", "-17.118001550540"),
    ("o", "-6.127001978339"),
    ("omer", "-3.687001406135"),
    ("or", "-3.607001833934"),
    ("ow", "-3.745001261730"),
    ("p", "-6.065001689529"),
    ("park", "-3.747001117325"),
    ("part", "-3.749001545124"),
    ("q", "-6.868001972923"),
    ("quer", "-3.940001400719"),
    ("r", "-4.498001828518"),
    ("ream", "-3.768001256314"),
    ("roup", "-3.857001684113"),
    ("row", "-3.688001111909"),
    ("s", "-3.047001539708"),
    ("scan", "-3.685001967507"),
    ("slow", "-3.705001395303"),
    ("sort", "-3.756001823102"),
    ("st", "-3.779001250898"),
    ("t", "-6.918001678697"),
    ("tabl", "-3.743001106493"),
    ("the", "-3.794001534292"),
    ("u", "-16.396001962091"),
    ("v", "-12.567001389887"),
    ("valu", "-3.728001817686"),
    ("vect", "-3.729001245482"),
    ("w", "-15.265001673281"),
    ("wind", "-3.756001101077"),
    ("y", "-3.930001528876")
  )

  /** Unrolled 8-step BPE learn over `documents` (see ops.Bpe, q_bpe,
    * q_bpe_encode): tok → w0 (space-joined char symbols + marker) →
    * per step k: pair counts p_k, argmax m_k (lexicographic
    * tie-break), merged state w_{k+1} via the doubled-space replace
    * (= Sennrich's non-overlapping re.sub). m_k mirrors the Spark
    * side's minCount=2 early stop (`WHERE cnt >= 2` — learnBpe's
    * default), and w_{k+1} LEFT-joins m_k so an exhausted step passes
    * the symbol state through unchanged instead of annihilating it —
    * without these the oracle would keep merging count-1 pairs on a
    * corpus that exhausts pairs within 8 merges. */
  private val bpeLearnCtes: String = {
    val steps = (0 until 8).map { k =>
      s"""p$k AS (SELECT p.lft AS lft, p.rgt AS rgt,
           sum(cnt)::BIGINT AS cnt FROM (
           SELECT unnest(list_transform(range(1, len(s)),
             i -> {'lft': s[i], 'rgt': s[i+1]})) AS p, cnt
           FROM (SELECT string_split(w, ' ') AS s, cnt FROM w$k))
         GROUP BY 1, 2),
       m$k AS (SELECT $k AS rank, lft, rgt, cnt FROM p$k
         WHERE cnt >= 2 ORDER BY cnt DESC, lft, rgt LIMIT 1),
       w${k + 1} AS (SELECT w.t AS t, CASE WHEN m.lft IS NULL THEN w.w
           ELSE replace(trim(replace(
           ' ' || replace(w.w, ' ', '  ') || ' ',
           ' ' || m.lft || '  ' || m.rgt || ' ',
           ' ' || m.lft || m.rgt || ' ')), '  ', ' ') END AS w, w.cnt AS cnt
         FROM w$k AS w LEFT JOIN m$k AS m ON TRUE)"""
    }.mkString(",\n")
    s"""tok AS (SELECT t, count(*)::BIGINT AS cnt FROM
         (SELECT unnest($W) AS t FROM documents) WHERE len(t) > 0 GROUP BY t),
       w0 AS (SELECT t, array_to_string(string_split(t, ''), ' ') || ' </w>' AS w,
              cnt FROM tok),
       $steps"""
  }

  private val simhashSql: String = {
    val hs = s"list_transform($W, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)"
    (0 until 32).map { j =>
      s"CASE WHEN list_sum(list_transform($hs, h -> ((h >> $j) & 1) * 2 - 1)) >= 0 " +
        s"THEN (1::BIGINT << $j) ELSE 0 END"
    }.mkString(" + ")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- text analysis
    "q_doc_tokens" -> ((s, d) =>
      spread(s, docs(s, d)).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))),

    // NOTE: these ratios are finite decimals, which land exactly on
    // .xxxx5 — engine round() implementations disagree there (Spark
    // rounds the decimal repr, DuckDB the binary). floor(x*1e4+0.5)/1e4
    // is bitwise-deterministic in both.
    "q_doc_quality" -> ((s, d) => {
      def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
      // ONE text pass: all five base counts come from the
      // graft_quality_features kernel struct; the ratios reproduce the
      // exact arithmetic of the per-function formulation (and of the
      // oracle SQL, which computes from the same five counts)
      val f = TextAnalysis.qualityFeatures(col("text"))
      docs(s, d).select(col("doc_id"), f.as("__f"))
        .select(col("doc_id"),
          col("__f.n_tokens").as("n_tokens"),
          r4(col("__f.len_nws") / greatest(col("__f.n_tokens"), lit(1L)))
            .as("avg_tok_len"),
          r4(col("__f.n_stop") / greatest(col("__f.n_tokens"), lit(1L)))
            .as("stop_ratio"),
          r4(col("__f.n_punct") / greatest(col("__f.len_nws"), lit(1L)))
            .as("punct_ratio"),
          r4(col("__f.n_digit") / greatest(col("__f.len_nws"), lit(1L)))
            .as("digit_ratio"),
          r4(least(col("__f.n_tokens") / lit(100.0), lit(1.0)) * 0.5 +
            (lit(1.0) - col("__f.n_stop") / greatest(col("__f.n_tokens"), lit(1L))) * 0.3 +
            (lit(1.0) - col("__f.n_punct") / greatest(col("__f.len_nws"), lit(1L))) * 0.2)
            .as("quality"))
        .orderBy("doc_id")
    }),

    // BPE-ish subword count next to the whitespace count: the token
    // estimate a training pipeline budgets with
    "q_doc_subwords" -> ((s, d) =>
      spread(s, docs(s, d)).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        TextAnalysis.subwordTokenCount(col("text")).cast("long").as("n_subwords"))),

    // multimodal binary plumbing, hash-certified: text bytes stand in
    // for media payloads; frame slicing + per-frame digest is the exact
    // schema/partitioning shape of per-frame feature extraction
    "q_frames" -> ((s, d) => {
      val media = docs(s, d).select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"))
      graft.ops.Multimodal.sampleFrames(media, "media", "doc_id",
        frameBytes = 32, everyNth = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          hex(col("frame")).as("frame_hex"))
        .orderBy("doc_id", "frame_idx")
    }),

    "q_lang_id" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    "q_fingerprint" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.rollingFingerprint(col("text")).as("rfp"))
        .orderBy("doc_id")),

    // PII scrub report: category counts + masked text. The synthetic
    // corpus carries no organic PII, so both engines inject the same
    // deterministic doc_id-derived contacts before scrubbing — the
    // oracle interpolates the SAME Pii regex/token constants, making
    // this a cross-engine (java.util.regex vs RE2) parity certificate.
    "q_pii" -> ((s, d) => {
      val injected = concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or \"u "), col("doc_id").cast("string"),
        lit("\"@corp.example.com, call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" or (628) 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" or +1 206.555."),
        lpad(((col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
        lit(", ip 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string"),
        lit(", v6 2001:db8::"), ((col("doc_id") % 9000) + 1000).cast("string"),
        lit(", ssn 123-45-6789, card 4111 1111 1111 1111."))
      // repartition BEFORE the regex-heavy projection: the bench input
      // is one parquet split, which would run the per-row kernels
      // single-threaded — at production scale input splits provide the
      // parallelism and the operator itself stays a pure projection
      graft.ops.Pii.scrub(
          docs(s, d).select(col("doc_id"), injected.as("text"))
            // explicit count: REPARTITION_BY_NUM is exempt from AQE
            // coalescing, which would fold these small rows back to 1
            .repartition(s.sparkContext.defaultParallelism,
              col("doc_id")), "text")
        .select(col("doc_id"), col("n_email"), col("n_card"), col("n_ssn"),
          col("n_ipv6"), col("n_ip"), col("n_phone"), col("n_pii"),
          md5(col("redacted")).as("red_hash"))
    }),

    // the SPARSE-PII regime (r12 missing #3): PII injected into 2% of
    // docs (doc_id % 50 == 0) — the realistic crawl incidence — and
    // scrubbed through the mayContainPii-gated kernels. The synthetic
    // corpus is digit/@/colon-free, so the prefilter provably prunes
    // every clean doc; the gate's EXACTNESS is the PropertySpec law
    // (scrubSparse ≡ scrub on any corpus), this row certifies the
    // gated path end-to-end cross-engine.
    "q_pii_sparse" -> ((s, d) => {
      val injected = concat(col("text"),
        lit(" Contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or \"u "), col("doc_id").cast("string"),
        lit("\"@corp.example.com, call 415-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" or (628) 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" or +1 206.555."),
        lpad(((col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
        lit(", ip 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string"),
        lit(", v6 2001:db8::"), ((col("doc_id") % 9000) + 1000).cast("string"),
        lit(", ssn 123-45-6789, card 4111 1111 1111 1111."))
      val sparse = when(col("doc_id") % 50 === 0, injected)
        .otherwise(col("text"))
      graft.ops.Pii.scrubSparse(
          spread(s, docs(s, d).select(col("doc_id"), sparse.as("text"))),
          "text")
        .select(col("doc_id"), col("n_email"), col("n_card"), col("n_ssn"),
          col("n_ipv6"), col("n_ip"), col("n_phone"), col("n_pii"),
          md5(col("redacted")).as("red_hash"))
    }),

    // data-recipe mixing: deterministic per-source token budgets (the
    // Pile/Dolma mixture step); budgets generated by the same formula
    // on both engines
    "q_mix_corpus" -> ((s, d) => {
      val budgets =
        (0 until 20).map(i => s"src$i" -> (400L + 100L * (i % 5))).toMap
      graft.ops.Selection.mixCorpus(docs(s, d), "source", "text",
          "doc_id", budgets)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // temperature-scaled source mixing (r17): budgets COMPUTED from the
    // observed per-source token mass (n_s^(1/T) normalized — the
    // Pile/GPT-3 recipe step), then the same certified prefix-sum
    // selection. T = 0.5 here so 1/T is integral: the power is exact
    // integer arithmetic in double and both engines floor identical
    // values (the scaladoc's cross-engine exactness note)
    "q_mix_temperature" -> ((s, d) => {
      val budgets = graft.ops.Selection.temperatureBudgets(docs(s, d),
        "source", "text", totalTokens = 6000L, temperature = 0.5)
      graft.ops.Selection.mixCorpus(docs(s, d), "source", "text",
          "doc_id", budgets)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),

    // epoch-repeated mixing (r17): budgets EXCEEDING a source's token
    // mass deliver full repeat passes + a canonical remainder prefix
    // (the Pile-style >1-epoch treatment of small curated sources),
    // capped at maxEpochs — plain mixCorpus would silently
    // under-deliver these budgets
    "q_mix_repeated" -> ((s, d) => {
      val budgets =
        (0 until 20).map(i => s"src$i" -> (2500L + 700L * (i % 3))).toMap
      graft.ops.Selection.mixCorpusRepeated(docs(s, d), "source", "text",
          "doc_id", budgets, maxEpochs = 3)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy("doc_id", "epoch")
    }),

    // the ONE-TOKENIZE-PASS recipe composed end-to-end (r18): tokenize
    // once into a count column, DROP the text (type-level proof no
    // later stage can re-tokenize), observe per-source masses, derive
    // temperature budgets (T=0.5: the Pile/GPT-3 n^(1/T) step, 1/T
    // integral so both engines floor identical doubles), then
    // epoch-repeated mixing from the SAME counts — the r17-review fix
    // (three tokenize passes for one mixture) certified as a
    // composition, with budgets large enough that some sources repeat
    "q_recipe_e2e" -> ((s, d) => {
      val counted = docs(s, d)
        .withColumn("n_tok",
          graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
        .drop("text")
      val masses = graft.ops.Selection.sourceMasses(counted, "source",
        "n_tok")
      val budgets = graft.ops.Selection.temperatureBudgets(masses,
        totalTokens = 50000L, temperature = 0.5)
      graft.ops.Selection.mixCorpusRepeatedByTokens(counted, "source",
          "n_tok", "doc_id", budgets, maxEpochs = 3)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy("doc_id", "epoch")
    }),

    // Lee-et-al-style span dedup: token 3-gram spans recurring across
    // documents (boilerplate discovery), and the positional scrub that
    // removes every covered token from every document
    "q_dup_spans" -> ((s, d) =>
      graft.ops.Spans.duplicatedSpans(spread(s, docs(s, d)), "text", "doc_id",
          k = 3, minDocs = 2, useMd5 = true)
        .select(col("span_hash"), col("n_docs"), col("n_total"))
        .orderBy("span_hash")),

    "q_span_scrub" -> ((s, d) =>
      graft.ops.Spans.scrubSpans(spread(s, docs(s, d).select("doc_id", "text")),
          "text", "doc_id", k = 3, minDocs = 2, useMd5 = true)
        .select(col("doc_id"), md5(col("clean")).as("clean_hash"))
        .orderBy("doc_id")),

    // Gopher-style repetition filters: docs that loop over few words or
    // one phrase — the quality signal exact dedup can't see
    "q_repetition" -> ((s, d) =>
      TextAnalysis.repetitionSignals(docs(s, d), "text", "doc_id")
        .orderBy("doc_id")),

    // corpus vocabulary with deterministic ranks: the token-budget /
    // tokenizer-training view of the corpus
    "q_vocab" -> ((s, d) =>
      TextAnalysis.vocabulary(docs(s, d), "text", topN = 100)
        .withColumnRenamed("rank", "rnk")),

    // BPE merge learning (Sennrich 2016): the tokenizer-TRAINING pass.
    // 8 merges; cross-engine oracle is the same algorithm unrolled in
    // SQL (greedy non-overlapping merge via the doubled-space replace
    // trick — see oracleSql)
    "q_bpe" -> ((s, d) =>
      graft.ops.Bpe.learnBpe(docs(s, d), "text", numMerges = 8)
        .orderBy("rank")),

    // the encode side: top-50 corpus subword frequencies under the 8
    // learned merges — read off the learn loop's final vocab state
    // (training and encoding the training corpus share all their work)
    "q_bpe_encode" -> ((s, d) => {
      val (_, vocab) =
        graft.ops.Bpe.learnBpeWithVocab(docs(s, d), "text", numMerges = 8)
      vocab.select(explode(col("syms")).as("subword"), col("cnt"))
        .groupBy("subword").agg(sum("cnt").as("cnt"))
        .orderBy(desc("cnt"), asc("subword")).limit(50)
    }),

    // production tokenization: min-rank encode of every document with
    // the learned 8-merge table (merge table collected — tokenizer-
    // sized, the centroid contract); per-doc subword counts
    "q_bpe_tokenize" -> ((s, d) => {
      val merges = graft.ops.Bpe.learnBpe(docs(s, d), "text", numMerges = 8)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.ops.Bpe.encodeDocs(docs(s, d), "text", merges)
        .select(col("doc_id"),
          size(col("subwords")).cast("long").as("n_subwords"))
        .orderBy("doc_id")
    }),

    // tokenizer round-trip certification: decodeSubwords ∘ encodeDocs
    // == whitespace-normalized identity for ANY merge table (merges
    // only concatenate within a word; markers restore boundaries).
    // The oracle never runs BPE — it tokenizes the raw text directly,
    // which is exactly what makes the law cross-engine: a decode OR
    // encode defect on ANY document breaks the hash. Fixed arbitrary
    // table (incl. marker merges), map-only at any scale.
    "q_bpe_roundtrip" -> ((s, d) => {
      val merges = Seq(("e", "</w>"), ("t", "h"), ("th", "e</w>"),
        ("a", "n"), ("an", "d</w>"), ("o", "f"))
      graft.ops.Bpe.encodeDocs(docs(s, d), "text", merges)
        .select(col("doc_id"),
          graft.ops.Bpe.decodeSubwords(col("subwords")).as("decoded"))
        .orderBy("doc_id")
    }),

    // SentencePiece-style production tokenization (Kudo 2018 §3.2
    // inference): Viterbi segmentation of every document under the
    // FIXED pinned piece table below — the deploy shape of a trained
    // unigram-LM tokenizer. Map-only at any scale (the model rides
    // into the codegen'd kernel via addReferenceObj). Certified
    // end-to-end: per-doc subword count + md5 of the space-joined
    // segmentation vs the oracle's recursive path enumeration (the
    // pinned log-probs carry distinct sub-1e-6 jitter, so the argmax
    // path is unique and both engines must find the same one).
    "q_unigram_tokenize" -> ((s, d) =>
      graft.ops.UnigramLm.segmentDocs(
          spread(s, docs(s, d).select(col("doc_id"), col("text"))),
          "text", unigramPieces.map { case (p, lp) => (p, lp.toDouble) },
          maxPieceLen = 4)
        .select(col("doc_id"),
          size(col("subwords")).cast("long").as("n_subwords"),
          md5(concat_ws(" ", col("subwords"))).as("seg_hash"))),

    // raw-crawl cleanup (C4/Dolma normalization): tag strip -> entity
    // unescape -> control strip -> whitespace collapse; certified via
    // md5 + length of the normalized text (compact, fully sensitive)
    "q_normalize" -> ((s, d) =>
      spread(s, docs(s, d)).select(col("doc_id"),
        md5(graft.ops.Cleaning.normalize(col("text"))).as("h"),
        length(graft.ops.Cleaning.normalize(col("text"))).cast("long").as("len"))),

    // CSV ingest round trip, cross-engine certified: documents →
    // Spark CSV writer (RFC doubled-quote escaping, per-partition
    // headers) → Ingest.readCsv (quarantine MUST stay empty — a
    // quoting/escape defect lands lines there and breaks the row
    // count) → per-row md5+length certificate, which must equal the
    // same certificate computed directly off the parquet (the oracle
    // never sees the CSV — identity of the round trip IS the check).
    // Newlines are sanitized first (the line-based quarantine reader's
    // documented single-line contract) and empty-text docs filtered
    // (CSV cannot distinguish empty from null).
    "q_csv_roundtrip" -> ((s, d) => {
      val tag = java.lang.Integer.toHexString(d.hashCode).replace("-", "m")
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_csv_rt_$tag"
      val clean = docs(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          translate(col("text"), "\n\r", "  ").as("text"),
          col("lang"), col("source"))
      clean.coalesce(2).write.mode("overwrite")
        .option("header", "true").option("escape", "\"").csv(out)
      graft.sources.Ingest.readCsv(s, out).docs
        .select(col("doc_id"), md5(col("text")).as("h"),
          length(col("text")).cast("long").as("len"),
          col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // MULTILINE CSV round trip (r16, closing the r15 missing #3):
    // every 7th doc gets an injected quoted newline + separator +
    // quote tail so multiline records provably exist, then documents →
    // Spark CSV writer (fields with \n/,/" are quoted, " doubled) →
    // Ingest.readCsvMultiline (record-grain quarantine must stay
    // empty — any quoting defect breaks the row count) → per-row
    // md5+length certificate equal to the parquet-direct oracle.
    // Carriage returns are sanitized on BOTH sides: the quote parser
    // normalizes line endings inside quoted fields, so \r is the one
    // byte the round trip cannot preserve (documented format cost).
    "q_csv_multiline" -> ((s, d) => {
      val tag = java.lang.Integer.toHexString(d.hashCode).replace("-", "m")
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_csv_ml_$tag"
      val withNl = docs(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(translate(col("text"), "\r", " "), lit("\nln2,\"x")))
            .otherwise(translate(col("text"), "\r", " ")).as("text"),
          col("lang"), col("source"))
      withNl.coalesce(2).write.mode("overwrite")
        .option("header", "true").option("escape", "\"").csv(out)
      graft.sources.Ingest.readCsvMultiline(s, out).docs
        .select(col("doc_id"), md5(col("text")).as("h"),
          length(col("text")).cast("long").as("len"),
          col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // PMI collocation mining: top bigram phrases by pointwise mutual
    // information at a min-count floor (ordering on the ROUNDED score
    // so both engines cut the same top-100)
    "q_collocations" -> ((s, d) =>
      graft.ops.LanguageModel.collocations(docs(s, d), "text", minCount = 5L)
        .select(col("bigram"), col("cnt"), round(col("pmi"), 6).as("pmi"))
        .orderBy(desc("pmi"), asc("bigram")).limit(100)),

    // CCNet-style LM quality: self-trained add-1 bigram model, per-doc
    // average negative log-likelihood (rounded — libm ln on both
    // engines agrees to well past 6 decimals)
    "q_perplexity" -> ((s, d) => {
      val dd = spread(s, docs(s, d))
      val model = graft.ops.LanguageModel.trainBigram(dd, "text")
      val vocab = graft.ops.LanguageModel.vocabSize(dd, "text")
      graft.ops.LanguageModel.scoreDocs(dd, model, vocab, "text", "doc_id")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("nll"), 6).as("nll"))
    }),

    // interpolated Kneser-Ney perplexity (KenLM's smoothing family —
    // what CCNet's shipped models actually use), count-of-counts
    // discount estimated from the corpus; same rounding contract
    "q_perplexity_kn" -> ((s, d) => {
      val dd = spread(s, docs(s, d))
      val model = graft.ops.LanguageModel.trainBigram(dd, "text")
      val vocab = graft.ops.LanguageModel.vocabSize(dd, "text")
      graft.ops.LanguageModel.scoreDocsKneserNey(
        dd, model, vocab, "text", "doc_id")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("nll"), 6).as("nll"))
    }),

    // CCNet head/middle/tail curation buckets: per-language perplexity
    // terciles (value cutoffs broadcast back — no per-language window)
    "q_ppl_buckets" -> ((s, d) => {
      val dd = spread(s, docs(s, d))
      val model = graft.ops.LanguageModel.trainBigram(dd, "text")
      val vocab = graft.ops.LanguageModel.vocabSize(dd, "text")
      graft.ops.LanguageModel.perplexityBuckets(
        dd, model, vocab, "text", "doc_id", "lang")
    }),

    // context-window chunking with overlap (size 16, stride 12): the
    // packing prep that turns documents into training sequences
    "q_chunks" -> ((s, d) =>
      TextAnalysis.chunks(docs(s, d), "text", "doc_id", size = 16, stride = 12)
        .orderBy("doc_id", "chunk_idx")),

    // ---------------- global order (distributed prefix scan — no
    // single-partition window anywhere in these plans)
    // concat-then-chunk sequence packing in doc_id order, 64-token
    // budget: which training sequences each document lands in
    "q_pack" -> ((s, d) =>
      graft.ops.Packing.packSequences(
        docs(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("toks")),
        "doc_id", col("toks"), budget = 64)
        .select("doc_id", "n_tokens", "first_seq", "last_seq", "n_seqs")
        .orderBy("doc_id")),

    // corpus-wide ranking by size: two-pass range-partitioned row
    // number, the scale shape for any "global ORDER BY + rank"
    "q_global_rank" -> ((s, d) =>
      graft.api.GlobalScan.rowNumber(
        docs(s, d).select("doc_id", "n_chars"),
        Seq(col("n_chars").desc, col("doc_id").asc), "rnk")
        .orderBy("rnk")),

    // top-3 characteristic terms per document; tf*N/df idf form keeps
    // the score engine-exact (single IEEE division, no libm log)
    "q_tfidf" -> ((s, d) =>
      TextAnalysis.tfidfTopTerms(spread(s, docs(s, d)), "text", "doc_id", k = 3)
        .withColumnRenamed("rank", "rnk")),

    // per-source token-distribution shift vs the corpus (total-variation
    // distance, integer-exact until one final division)
    "q_source_shift" -> ((s, d) =>
      TextAnalysis.sourceShift(docs(s, d), "text", "source")
        .orderBy("source")),

    // ---------------- event streams (keyed windows, never range joins)
    // backward as-of join: each click matched to the user's most recent
    // error at-or-before it (the operator Spark lacks; DuckDB ASOF JOIN
    // is the oracle). Timestamps compared at micros on both sides.
    "q_asof" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"), col("event_type"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "event_id", "tsu")
      val errors = e.filter(col("event_type") === "error")
        .groupBy("user_id", "tsu").agg(max("value").as("eval"))
        .withColumnRenamed("tsu", "etsu")
      graft.ops.Events.asofJoin(clicks, errors, Seq("user_id"),
        "tsu", "etsu", Seq("etsu", "eval"), prefix = "err_")
        .orderBy("event_id")
    }),

    // the double-digit-hot-key escalation tier (time-block carry
    // decomposition, span = 1 day) — same oracle as q_asof by design
    "q_asof_skewed" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"), col("event_type"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "event_id", "tsu")
      val errors = e.filter(col("event_type") === "error")
        .groupBy("user_id", "tsu").agg(max("value").as("eval"))
        .withColumnRenamed("tsu", "etsu")
      graft.ops.Events.asofJoinSkewed(clicks, errors, Seq("user_id"),
        "tsu", "etsu", Seq("etsu", "eval"), span = 86400000000L,
        prefix = "err_")
        .orderBy("event_id")
    }),

    // as-of with pandas merge_asof `tolerance`: a backward match only
    // counts within 10 minutes (6e8 us) — stale matches null out
    "q_asof_tol" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"), col("event_type"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "event_id", "tsu")
      val errors = e.filter(col("event_type") === "error")
        .groupBy("user_id", "tsu").agg(max("value").as("eval"))
        .withColumnRenamed("tsu", "etsu")
      graft.ops.Events.asofJoin(clicks, errors, Seq("user_id"),
        "tsu", "etsu", Seq("etsu", "eval"), prefix = "err_",
        tolerance = Some(600000000L))
        .orderBy("event_id")
    }),

    // forward as-of: each click matched to the user's EARLIEST error
    // at-or-after it (direction="forward"; DuckDB oracle = backward
    // ASOF on negated timestamps)
    "q_asof_fwd" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"), col("event_type"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "event_id", "tsu")
      val errors = e.filter(col("event_type") === "error")
        .groupBy("user_id", "tsu").agg(max("value").as("eval"))
        .withColumnRenamed("tsu", "etsu")
      graft.ops.Events.asofJoin(clicks, errors, Seq("user_id"),
        "tsu", "etsu", Seq("etsu", "eval"), prefix = "err_",
        direction = "forward")
        .orderBy("event_id")
    }),

    // trailing 24h per-user rolling stats (RANGE frame — tie-safe);
    // integral values keep the windowed sum engine-exact
    "q_rolling" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"), floor(col("value")).cast("long").as("v"))
      graft.ops.Events.rollingAgg(e, "user_id", "tsu", "v",
        span = 86400000000L)
        .select("user_id", "event_id", "tsu", "roll_n", "roll_sum", "roll_mean")
        .orderBy("event_id")
    }),

    // the double-digit-hot-key escalation tier: same trailing-range
    // semantics through the time-block decomposition (no partition is
    // ever keyed by user_id alone) — certified against the SAME
    // window-SQL oracle as q_rolling
    "q_rolling_skewed" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"), floor(col("value")).cast("long").as("v"))
      graft.ops.Events.rollingAggSkewed(e, "user_id", "tsu", "v",
        span = 86400000000L)
        .select("user_id", "event_id", "tsu", "roll_n", "roll_sum", "roll_mean")
        .orderBy("event_id")
    }),

    // gap sessionization (4h inactivity cut) + per-session rollup
    "q_sessions" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"))
      graft.ops.Events.sessionize(e, "user_id", "tsu", "event_id",
        gap = 14400000000L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("tsu").as("start_us"), max("tsu").as("end_us"))
        .orderBy("user_id", "session_id")
    }),

    // the double-digit-hot-key escalation tier (per-block break sums +
    // boundary-break offsets, span = 1 day) — same oracle as q_sessions
    "q_sessions_skewed" -> ((s, d) => {
      val e = evu(s, d).select(col("user_id"), col("event_id"),
        col("tsu"))
      graft.ops.Events.sessionizeSkewed(e, "user_id", "tsu", "event_id",
        gap = 14400000000L, span = 86400000000L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("tsu").as("start_us"), max("tsu").as("end_us"))
        .orderBy("user_id", "session_id")
    }),

    // keyless interval join, bucketed: clicks within the trailing 10
    // minutes of each error, ANY user — the join shape Spark would
    // otherwise plan as a nested loop. Inner semantics: errors with no
    // click in range don't appear (matches the oracle's inner join).
    "q_range_join" -> ((s, d) => {
      val e = evu(s, d).select(col("event_id"),
        col("tsu"), col("event_type"))
      val errors = e.filter(col("event_type") === "error")
        .select("event_id", "tsu")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("tsu").as("ctsu"))
      graft.ops.Events.rangeJoin(errors, clicks, "tsu", "ctsu",
        lower = -600000000L, upper = 0L,
        payload = Seq("click_id"), prefix = "c_")
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_clicks"),
          min("c_click_id").as("first_click"))
        .orderBy("event_id")
    }),

    // edit-distance self-join via lossless SymSpell deletion-neighborhood
    // blocking + exact levenshtein verify (never a cross product)
    "q_fuzzy_join" -> ((s, d) =>
      graft.ops.Linkage.fuzzySelfPairs(
        Tables(s, d, "supplier").select("s_suppkey", "s_name"),
        "s_suppkey", "s_name", maxDist = 1)
        .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
        .orderBy("id_a", "id_b")),

    // ---------------- selection
    // top-k per language by the certified 4-decimal quality score
    // (rounded BEFORE ordering so the rank is engine-independent)
    "q_quality_filter" -> ((s, d) => {
      def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
      val f = TextAnalysis.qualityFeatures(col("text"))
      val scored = docs(s, d).select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"), f.as("__f"))
        .select(col("doc_id"), col("pred_lang"),
          r4(least(col("__f.n_tokens") / lit(100.0), lit(1.0)) * 0.5 +
            (lit(1.0) - col("__f.n_stop") / greatest(col("__f.n_tokens"), lit(1L))) * 0.3 +
            (lit(1.0) - col("__f.n_punct") / greatest(col("__f.len_nws"), lit(1L))) * 0.2)
            .as("quality"))
      Selection.topKPerGroup(scored, "pred_lang", "quality", "doc_id", k = 5)
        .select("pred_lang", "doc_id", "quality")
        .orderBy("pred_lang", "doc_id")
    }),

    // C4 line/page cleanup (Raffel 2020 §2.2) — the synthetic corpus
    // has no newlines or punctuation, so (the q_pii convention) both
    // engines inject the same deterministic doc_id-derived line
    // structure first: terminal-punct variance, a javascript line,
    // a varying sentence tail, lorem-ipsum and brace page vetoes
    "q_c4" -> ((s, d) => {
      val injected = concat(
        col("text"), lit("."), lit("\n"),
        lit("Second line kept here"),
        when(col("doc_id") % 3 === 0, ".").otherwise(""), lit("\n"),
        when(col("doc_id") % 5 === 0, "Enable javascript to continue.")
          .otherwise("Plain closing line."), lit("\n"),
        expr("repeat('Extra sentence goes here. ', cast(doc_id % 4 as int))"),
        when(col("doc_id") % 11 === 0, "\nlorem ipsum disclaimer.")
          .otherwise(""),
        when(col("doc_id") % 13 === 0, "\ncode { sample }").otherwise(""))
      val m = graft.ops.RuleFilters.c4Metrics(col("__t"), minSentences = 4)
      docs(s, d).select(col("doc_id"), injected.as("__t"))
        .select(col("doc_id"), m.as("__m"))
        .select(col("doc_id"),
          col("__m.n_lines"), col("__m.n_kept_lines"),
          col("__m.n_sentences"), col("__m.keep"),
          md5(col("__m.kept_text")).as("kept_hash"))
        .orderBy("doc_id")
    }),

    // the MODERN curation recipe end-to-end: Gopher rule gate ->
    // pinned-classifier quality filter -> DSIR domain resampling
    // toward the en slice -> token-balanced output sharding. Certifies
    // that this round's model-based stages COMPOSE (the q_pipeline_e2e
    // posture for the r12 operator families)
    "q_curation_e2e" -> ((s, d) => {
      val gated = graft.ops.RuleFilters.gopherFilter(docs(s, d), "text",
        minWords = 50, maxWords = 100000, minMwl = 3.0, maxMwl = 4.5,
        minAlphaFrac = 0.8, minStopHits = 1)
      val quality = graft.ops.QualityClassifier.filterByQuality(
        gated, qcWeights, qcDim, "text", cut = 0.0)
      val picked = graft.ops.Dsir.resample(quality,
        quality.filter(col("lang") === "en"), "text", "doc_id",
        dim = 512, k = 40)
      val sel = quality.join(picked.select("doc_id", "logw"), Seq("doc_id"))
      Selection.shardByTokenBudget(
          sel.select("doc_id", "text", "logw"), "text", "doc_id", 4)
        .select(col("doc_id"), col("logw"), col("n_tok"), col("shard"))
        .orderBy("doc_id")
    }),

    // Gopher document-level rule gate (Rae 2021 A1.1): per-doc metrics
    // + composite keep, thresholds tuned to this corpus's length
    // regime (the paper's 50-word floor kept; mwl ceiling 4.5 and
    // 1-stopword floor split the synthetic vocabulary non-trivially)
    "q_gopher_filter" -> ((s, d) => {
      val m = graft.ops.RuleFilters.gopherMetrics(col("text"),
        minWords = 50, maxWords = 100000, minMwl = 3.0, maxMwl = 4.5,
        minAlphaFrac = 0.8, minStopHits = 1)
      docs(s, d).select(col("doc_id"), m.as("__m"))
        .filter(col("__m.n_words") > 0)
        .select(col("doc_id"), col("__m.n_words").as("n_words"),
          round(col("__m.mean_word_len"), 4).as("mwl"),
          round(col("__m.alpha_frac"), 4).as("af"),
          col("__m.n_stop").as("n_stop"),
          col("__m.keep").cast("long").as("keep"))
        .orderBy("doc_id")
    }),

    // model-based quality filter: the pinned fastText-style classifier
    // scores every document in one map-only pass (weights are a plan
    // literal; no join, no shuffle before the sort)
    "q_quality_classifier" -> ((s, d) =>
      graft.ops.QualityClassifier.scoreDocs(
        spread(s, docs(s, d)), qcWeights, qcDim, "text", "doc_id")
        .select(col("doc_id"), round(col("margin"), 6).as("marg"),
          (col("margin") >= 0).cast("long").as("pred"))),

    // TRAIN-THEN-INFER certification (r12 missing #2): the full GD
    // trajectory — not pinned weights — certified cross-engine.
    // trainCertified snaps weights to exact 2^-20 multiples each
    // iteration, so every margin is an exact (order/engine-independent)
    // double sum and the oracle re-derives the SAME 4-iteration
    // trajectory in unrolled DuckDB SQL; output margins compare as
    // exact doubles, no rounding anywhere.
    "q_quality_train_infer" -> ((s, d) => {
      val dd = docs(s, d)
      val toks = filter(TextAnalysis.tokens(col("text")),
        t => length(t) > 0)
      val y = (size(filter(toks, t => t === lit("slow"))) >
        size(filter(toks, t => t === lit("fast")))).cast("double")
      val w = graft.ops.QualityClassifier.trainCertified(
        dd.select(col("doc_id"), col("text"), y.as("label")),
        "text", "doc_id", "label", dim = 16, iters = 4, lr = 1.0)
      graft.ops.QualityClassifier.scoreDocs(dd, w.toSeq, 16,
        "text", "doc_id")
        .select(col("doc_id"), col("margin"),
          (col("margin") >= 0).cast("long").as("pred"))
    }),

    // DSIR importance resampling (Xie 2023): 100 docs Gumbel-top-k
    // resampled toward the lang='en' hashed-n-gram distribution;
    // models trained inline, ratio table complete over 512 buckets
    "q_dsir" -> ((s, d) => {
      val dd = spread(s, docs(s, d))
      graft.ops.Dsir.resample(dd, dd.filter(col("lang") === "en"),
        "text", "doc_id", dim = 512, k = 100)
    }),

    // reproducible content-hash sampling: ~20% keep, same rows every
    // run on every engine
    "q_sample_hash" -> ((s, d) =>
      Selection.hashSample(docs(s, d), "text", pctKeep = 20)
        .select("doc_id")
        .orderBy("doc_id")),

    // exact 10% per language, hash-ordered: the reproducible-quota
    // sampler (grouped scan spreads each stratum over the cluster)
    "q_stratified_sample" -> ((s, d) =>
      Selection.stratifiedSample(
        docs(s, d).select("doc_id", "lang"), "lang", "doc_id", pct = 10)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")),

    // cluster-BALANCED sampling (r16): stratifiedSample quotas per IVF
    // cell instead of per language — the embedding-space selection
    // shape diverse-data pipelines run so big semantic clusters don't
    // dominate the mixture. Pure composition of two certified
    // operators (ivfAssign × stratifiedSample), certified composed.
    "q_cluster_sample" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
      val cells = Similarity.ivfAssign(e, "vec_id", "embedding", cents)
      Selection.stratifiedSample(cells, "cid", "vec_id", pct = 20)
        .select(col("cid"), col("vec_id"))
        .orderBy("cid", "vec_id")
    }),

    // END-TO-END pipeline: quality filter → exact dedup → near-dup drop
    // → decontaminate → stratified sample, each stage feeding the next —
    // certifies that the certified pieces COMPOSE (the "switch your
    // pipeline to this library" claim), not just that they work alone
    "q_pipeline_e2e" -> ((s, d) => {
      def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
      val all = docs(s, d)
      val f = TextAnalysis.qualityFeatures(col("text"))
      val qual = all.select(col("doc_id"), col("lang"), col("text"), f.as("__f"))
        .withColumn("quality",
          r4(least(col("__f.n_tokens") / lit(100.0), lit(1.0)) * 0.5 +
            (lit(1.0) - col("__f.n_stop") / greatest(col("__f.n_tokens"), lit(1L))) * 0.3 +
            (lit(1.0) - col("__f.n_punct") / greatest(col("__f.len_nws"), lit(1L))) * 0.2))
        .filter(col("quality") >= 0.6)
        .select("doc_id", "lang", "text")
      // Materialize the exact-deduped corpus ONCE (executor-local
      // storage, the band-table precedent in Dedup.lshCandidates): the
      // near-dup stage reads it three times (signature bands, shingle
      // verify, survivor anti-join) and each read would otherwise
      // re-run quality scoring + exact dedup over the full text.
      val exact = Dedup.dropExact(qual, "text", "doc_id").localCheckpoint()
      val nd = Dedup.dropNearDups(exact, "text", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
      val clean = Selection.decontaminate(nd,
        all.filter(col("doc_id") < 50), "text")
      Selection.stratifiedSample(clean.select("lang", "doc_id"),
        "lang", "doc_id", pct = 50)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }),

    // near-duplicate IMAGE detection: real PNG decode -> 64-bit dHash
    // -> pigeonhole band join + hamming verify. Deterministic fixture
    // images (12 distinct + 3 tweaked copies); the oracle pins the
    // expected pairs as literals (the q_decode convention — decode is
    // not SQL-expressible, but its deterministic output is pinnable;
    // the banding==brute-force law is spec-asserted in OpsSpec)
    "q_image_neardup" -> ((s, d) => {
      import graft.ops.Multimodal.{MediaRow, fixtureImage}
      val rows = (0 until 12).map(i =>
        MediaRow(i.toLong, fixtureImage(64, 48, seed = i * 7 + 1))) ++
        (0 until 3).map(i => MediaRow(100L + i,
          fixtureImage(64, 48, seed = i * 7 + 1, tweak = 0x080808)))
      val ds = s.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[MediaRow])
      graft.ops.Multimodal.imageNearDupPairs(ds, maxHamming = 6)
        .orderBy("id_a", "id_b")
    }),

    // near-duplicate AUDIO detection: real WAV decode -> 64-bit
    // energy-envelope fingerprint -> the same pigeonhole band join;
    // planted copies are HALF-VOLUME (gain scaling preserves every
    // envelope difference sign -> hamming 0, the invariance claim)
    "q_audio_neardup" -> ((s, d) => {
      import graft.ops.Multimodal.{MediaRow, fixtureAudio}
      val rows = (0 until 10).map(i =>
        MediaRow(i.toLong, fixtureAudio(seed = i * 11 + 5))) ++
        (0 until 3).map(i => MediaRow(100L + i,
          fixtureAudio(seed = i * 11 + 5, gain = 0.5)))
      val ds = s.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[MediaRow])
      graft.ops.Multimodal.audioNearDupPairs(ds, maxHamming = 4)
        .orderBy("id_a", "id_b")
    }),

    // weighted sampling without replacement (Efraimidis–Spirakis via
    // deterministic Gumbel keys): inclusion probability ∝ token count
    "q_weighted_sample" -> ((s, d) =>
      Selection.weightedSample(
        spread(s, docs(s, d)).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("w")),
        "w", "doc_id", k = 100, seed = 11)),

    // deterministic token-balanced output sharding: each doc assigned
    // to the shard where its exclusive token prefix (canonical md5
    // permutation) falls
    "q_shard" -> ((s, d) =>
      Selection.shardByTokenBudget(
        docs(s, d).select("doc_id", "text"), "text", "doc_id", 8)
        .select(col("doc_id"), col("n_tok"), col("shard"))
        .orderBy("doc_id")),

    // exact train/eval contamination: docs sharing a normalized
    // fingerprint with the benchmark slice (doc_id < 50 stands in for
    // the eval set; the slice itself reports as self-contaminated,
    // which certifies the join end-to-end with guaranteed hits)
    "q_contaminated" -> ((s, d) =>
      Selection.contaminated(docs(s, d),
        docs(s, d).filter(col("doc_id") < 50), "text")
        .select("doc_id")
        .orderBy("doc_id")),

    "q_decontaminate" -> ((s, d) =>
      Selection.decontaminate(docs(s, d),
        docs(s, d).filter(col("doc_id") < 50), "text")
        .select("doc_id")
        .orderBy("doc_id")),

    // N-GRAM-overlap contamination (Brown et al. 2020 appendix C):
    // docs sharing ANY 5-gram with the benchmark slice — catches
    // partial inclusion fingerprint matching misses. Exact path.
    "q_ngram_contam" -> ((s, d) =>
      graft.ops.Contamination.contaminated(docs(s, d),
        docs(s, d).filter(col("doc_id") < 50), "text", "doc_id", k = 5)
        .select("doc_id")
        .orderBy("doc_id")),

    // bloom two-phase decontaminate: map-only bloom prefilter (plan-
    // constant filter over benchmark 5-gram xxhash64s), exact verify
    // over the candidate sliver only. The EXACT oracle passing is the
    // machine-checked no-false-negative law.
    "q_bloom_decontam" -> ((s, d) =>
      graft.ops.Contamination.decontaminateBloom(docs(s, d),
        docs(s, d).filter(col("doc_id") < 50), "text", "doc_id", k = 5)
        .select("doc_id")
        .orderBy("doc_id")),

    // FUZZY contamination: corpus passages near-duplicating a benchmark
    // doc (mod-10 split), via the bipartite broadcast LSH path
    "q_contam_fuzzy" -> ((s, d) => {
      val all = docs(s, d)
      Dedup.crossNearDupPairs(
        all.filter(col("doc_id") % 10 === 0),
        all.filter(col("doc_id") % 10 =!= 0),
        "text", "doc_id", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("id_l", "id_r")
    }),

    // ---------------- dedup
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(docs(s, d), "text", "doc_id")
        .orderBy("fp")),

    "q_minhash" -> ((s, d) =>
      Dedup.withMinhashSignature(docs(s, d), "text",
        numHashes = 4, k = 3, useMd5 = true)
        .select("doc_id", "mh0", "mh1", "mh2", "mh3")
        .orderBy("doc_id")),

    "q_near_dup" -> ((s, d) =>
      Dedup.nearDupPairs(docs(s, d), "text", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("id_a", "id_b")),

    // near-dup CLUSTERS via connected components over the verified pair
    // graph (keep_id = smallest id per cluster) — what a pipeline needs
    // for survivor selection, not just pairs
    "q_near_dup_groups" -> ((s, d) =>
      Dedup.nearDupGroups(docs(s, d), "text", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .orderBy("doc_id")),

    // the pipeline's END PRODUCT: survivor selection — drop every
    // near-dup cluster member except the smallest id, keep singletons
    "q_drop_near_dups" -> ((s, d) =>
      Dedup.dropNearDups(docs(s, d), "text", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .select("doc_id")
        .orderBy("doc_id")),

    // INCREMENTAL dedup (r16): a new batch deduped AGAINST an indexed
    // corpus — the production daily-crawl shape where re-pairing the
    // corpus is unaffordable. The corpus's band index (band_key, id)
    // is built once (bandIndex; persisted+bucketed via writeBandIndex
    // at scale — LayoutSpec pins the exchange-free index side); the
    // batch pays its own map-only signature pass + one band_key
    // equi-join; verify touches candidate rows only. Split: every 5th
    // doc is "today's batch", the rest are the corpus.
    "q_incremental_dedup" -> ((s, d) => {
      val all = docs(s, d)
      val batch = all.filter(col("doc_id") % 5 === 0)
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
      val idx = Dedup.bandIndex(corpus, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
      Dedup.nearDupsAgainstIndex(batch, corpus, idx, "text",
        "doc_id", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("id_batch", "id_corpus")
    }),

    // the incremental END PRODUCT: batch survivors (the corpus always
    // wins — it is the published data)
    "q_incremental_drop" -> ((s, d) => {
      val all = docs(s, d)
      val batch = all.filter(col("doc_id") % 5 === 0)
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
      val idx = Dedup.bandIndex(corpus, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
      Dedup.dropNearDupsAgainstIndex(batch, corpus, idx, "text",
        "doc_id", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .select("doc_id").orderBy("doc_id")
    }),

    // INCREMENTAL index MAINTENANCE (r17): after batch1's survivors are
    // admitted to the corpus, their band keys ride a small DELTA side
    // table (bandIndexDelta — Layout correctly refuses appending into
    // the bucketed index) and batch2 queries index ∪ delta: the
    // corpus-sized index still never shuffles or rebuilds; the delta
    // equi-join is day-scale. Certified against DuckDB computing
    // batch2-vs-(corpus ∪ batch1-survivors) from scratch — i.e. the
    // delta path must equal a full rebuild. compactBandIndex (folding
    // deltas back into a new bucketed layout, rebuild-equal via the
    // pruned-keys sidecar) is law-pinned in OpsSpec.
    "q_incremental_refresh" -> ((s, d) => {
      val all = docs(s, d)
      val m5 = col("doc_id") % 5
      val batch2 = all.filter(m5 === 0)
      val batch1 = all.filter(m5 === 1)
      val corpus0 = all.filter(m5 =!= 0 && m5 =!= 1)
      // the index feeds TWO consumers (batch1's drop and batch2's
      // query) — pin it, as production would read it back bucketed;
      // survivors are day-scale and feed the delta AND the content
      // union, so they pin too
      val idx = Dedup.bandIndex(corpus0, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .localCheckpoint()
      val surv1 = Dedup.dropNearDupsAgainstIndex(batch1, corpus0, idx,
        "text", "doc_id", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .localCheckpoint()
      val delta1 = Dedup.bandIndexDelta(surv1, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
      Dedup.nearDupsAgainstIndex(batch2, corpus0.unionByName(surv1), idx,
        "text", "doc_id", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true,
        delta = Some(delta1))
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("id_batch", "id_corpus")
    }),

    // the DAILY-ADMISSION loop end-to-end (r17 capstone): quality-gate
    // the raw crawl batch, exact-dedup it within itself (first id per
    // fingerprint wins), then drop near-dups against the indexed
    // corpus — the output is the day's ADMITTED ids, exactly what
    // appendBandIndexDelta persists and compactBandIndex folds in.
    // Every stage is individually certified (q_doc_tokens,
    // q_dedup_exact, q_incremental_drop); this row certifies the
    // COMPOSITION cross-engine.
    "q_incremental_e2e" -> ((s, d) => {
      val all = docs(s, d)
      val corpus = all.filter(col("doc_id") % 5 =!= 0)
      val gated = all.filter(col("doc_id") % 5 === 0)
        .filter(TextAnalysis.tokenCount(col("text")) >= 5)
      val exact = Dedup.dropExact(gated, "text", "doc_id")
      val idx = Dedup.bandIndex(corpus, "text", "doc_id",
        numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
      Dedup.dropNearDupsAgainstIndex(exact, corpus, idx, "text",
        "doc_id", "doc_id",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .select("doc_id").orderBy("doc_id")
    }),

    // passage-granularity fuzzy dedup: fixed token windows (the chunk
    // level context-window pipelines dedup at; blank-line paragraphs via
    // Dedup.paragraphs when the corpus has them), then the SAME fused
    // shingle-minhash LSH machinery as the doc-level path — boilerplate
    // repeating across otherwise-distinct documents surfaces here
    "q_passage_near_dup" -> ((s, d) => {
      val p = Dedup.passages(spread(s, docs(s, d)), "text", "doc_id", window = 20)
        .withColumn("pid", col("doc_id") * 1000 + col("para_idx"))
      Dedup.nearDupPairs(p, "para_text", "pid",
        threshold = 0.8, numHashes = 4, bandSize = 1, k = 3, useMd5 = true)
        .withColumn("jaccard", round(col("jaccard"), 4))
        .orderBy("id_a", "id_b")
    }),

    // CCNet/Dolma-style boilerplate: passage windows whose hash recurs
    // corpus-wide (total occurrences), and the per-doc scrub that
    // removes them and reassembles the survivors in order
    "q_boilerplate" -> ((s, d) =>
      Dedup.frequentPassages(spread(s, docs(s, d)), "text", "doc_id",
          window = 10, minCount = 2, useMd5 = true)),

    "q_boilerplate_scrub" -> ((s, d) =>
      Dedup.scrubFrequentPassages(spread(s, docs(s, d).select("doc_id", "text")),
          "text", "doc_id", window = 10, minCount = 2, useMd5 = true)
        .select(col("doc_id"), md5(col("clean")).as("clean_hash"))),

    // SimHash near-dup pairs: pigeonhole-banded candidates + hamming
    // verify — provably equal to the O(n²) scan it never runs
    "q_simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDupPairs(docs(s, d), "text", "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b")),

    "q_simhash" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        Dedup.simhash32(col("text")).as("simhash"))
        .orderBy("doc_id")),

    // INCREMENTAL hamming near-dup (r16): the SimHash/multimodal mate
    // of q_incremental_dedup — one persisted band index (signature
    // riding along) serves text SimHash, image dHash, audio envelope
    // and video frame fingerprints; the daily batch job touches ONLY
    // the index, never corpus content. Oracle = the brute-force
    // bipartite hamming join (banding is lossless within maxBucket).
    "q_incremental_simhash" -> ((s, d) => {
      val all = docs(s, d)
      def sigOf(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id").as("__id"),
          Dedup.simhash32(col("text")).as("__sig"))
      val idx = Dedup.hammingBandIndex(
        sigOf(all.filter(col("doc_id") % 5 =!= 0)),
        sigBits = 32, maxHamming = 3)
      Dedup.hammingNearDupsAgainstIndex(
        sigOf(all.filter(col("doc_id") % 5 === 0)), idx,
        sigBits = 32, maxHamming = 3)
        .orderBy("id_batch", "id_corpus")
    }),

    // ---------------- similarity search
    // JL ±1 compression 64->8 dims: the map-only shuffle-byte cutter
    // in front of the LSH/IVF family; sign matrix re-derived from the
    // seed by BOTH engines (md5), so this certifies the whole
    // derivation, not just the arithmetic
    "q_random_proj" -> ((s, d) =>
      graft.ops.Similarity.randomProject(emb(s, d), "embedding",
          inDim = 64, outDim = 8, seed = "jl1")
        .select(col("vec_id") +:
          // one scalar column per dim (the compare harness takes no
          // array columns — the q_quantile_multi convention), cast to
          // float32 NOT round()ed: the decimal HALF_UP round disagrees
          // with DuckDB's binary round at representability boundaries
          // (~1% of rows); the IEEE double->float cast is bit-identical
          (0 until 8).map(j =>
            col("proj").getItem(j).cast("float").as(s"p$j")): _*)
        .orderBy("vec_id")),

    "q_embed_topk" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("sim"), 4).as("sim"))
        .orderBy("query_id", "rank")
    }),

    // The CERTIFIED near-dup path is the scale-safe one: LSH signature
    // buckets + exact cosine re-rank inside buckets — never an O(n²)
    // cross product. The exact all-pairs join below stays certified
    // separately as the bounded-corpus verify step it is.
    "q_embed_neardup" -> ((s, d) =>
      Similarity.lshNearDupPairs(spread(s, emb(s, d), "vec_id"), "vec_id", "embedding",
        dims = 64, threshold = 0.4, planes = 16, bandPlanes = 4)
        .withColumn("sim", round(col("sim"), 4))),

    "q_embed_neardup_groups" -> ((s, d) =>
      Similarity.lshNearDupGroups(emb(s, d), "vec_id", "embedding",
        dims = 64, threshold = 0.4, planes = 16, bandPlanes = 4)
        .orderBy("vec_id")),

    // embedding-side survivor selection (mirror of q_drop_near_dups)
    "q_embed_drop" -> ((s, d) =>
      Similarity.dropNearDups(emb(s, d), "vec_id", "embedding",
        dims = 64, threshold = 0.4, planes = 16, bandPlanes = 4)
        .select("vec_id")
        .orderBy("vec_id")),

    "q_embed_neardup_exact" -> ((s, d) =>
      Similarity.nearDupPairs(emb(s, d), "vec_id", "embedding", threshold = 0.4)
        .withColumn("sim", round(col("sim"), 4))
        .orderBy("id_a", "id_b")),

    // IVF ANN: corpus partitioned into per-label centroid lists, queries
    // probe the nProbe nearest lists only — the scale path where
    // brute-force is the baseline
    "q_ivf_topk" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), "vec_id",
        "embedding", cents, k = 3, nProbe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("sim"), 4).as("sim"))
    }),

    // IVF-PQ: the production ANN index — IVF cells bound WHICH vectors
    // each query scores, PQ codes bound the per-candidate cost; equals
    // pqTopK restricted to probed cells (PqSpec law), both halves ALSO
    // certified standalone (q_ivf_topk, q_pq_topk)
    "q_ivf_pq_topk" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 8), "vec_id",
        "embedding", Similarity.centroidsFromLabels(e, "label", "embedding"),
        pqCb.toArray, pqM, pqK, topK = 4, nProbe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
    }),

    // product-quantization ADC search (Jégou 2011) under the PINNED
    // codebook above: map-only encode (m codes/vector), per-query LUT,
    // codegen'd lookup-sum scoring — the memory/recall tier of the ANN
    // ladder (brute -> LSH -> IVF -> PQ)
    "q_pq_topk" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      Similarity.pqTopK(e, e.filter(col("vec_id") < 10), "vec_id",
        "embedding", pqCb.toArray, pqM, pqK, topK = 5)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
    }),

    "q_embed_centroids" -> ((s, d) =>
      Similarity.dimMeans(emb(s, d), "label", "embedding")
        .select(col("label"), col("pos").cast("long").as("pos"),
          round(col("mean"), 4).as("mean"))
        .orderBy("label", "pos")),

    // SemDeDup: within-coarse-cell near-dup pairs + min-id survivors —
    // the cluster-bounded (deliberately cross-cell-lossy) semantic
    // dedup that published training-data pipelines run next to LSH
    "q_semantic_neardup" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      Similarity.semanticNearDupPairs(e, "vec_id", "embedding",
        Similarity.centroidsFromLabels(e, "label", "embedding"),
        threshold = 0.4)
        .select(col("cid"), col("id_a"), col("id_b"),
          round(col("sim"), 4).as("sim"))
    }),

    "q_semantic_drop" -> ((s, d) => {
      val e = emb(s, d)
      Similarity.semanticDrop(e, "vec_id", "embedding",
        Similarity.centroidsFromLabels(e, "label", "embedding"),
        threshold = 0.4)
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // INCREMENTAL semantic dedup (r17): the SemDeDup modality joins
    // the incremental family — a daily batch of embeddings vs a
    // persisted CELL index whose rows carry the corpus vectors, so the
    // exact cosine verify reads only the index (the hamming-index
    // economics applied to embeddings); bucketed on cid at scale
    // (writeSemanticCellIndex), delta-maintained like the band indexes
    "q_incremental_semantic" -> ((s, d) => {
      val e = emb(s, d)
      // pinned ONCE (r22): every reference — the index build's
      // assignment broadcast, the query-side assignment, and each
      // cfg-stamp collect (centroidCfg/pqCellCfg run a COLLECT at
      // operator construction) — otherwise re-runs the full-corpus
      // posexplode+groupBy centroid derivation
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
        .localCheckpoint()
      val idx = Similarity.semanticCellIndex(
        e.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", cents)
      Similarity.semanticNearDupsAgainstIndex(
        e.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
        idx, cents, threshold = 0.4)
        .select(col("cid"), col("id_batch"), col("id_corpus"),
          round(col("sim"), 4).as("sim"))
        .orderBy("id_batch", "id_corpus")
    }),

    // PQ-CODED incremental semantic dedup (r18): the same daily-batch
    // query through the two-phase tier — ADC screen against the m-byte
    // code index at threshold − err(row) (each index row carries its
    // own sound Cauchy–Schwarz score-error bound, so screen recall is
    // provably 1 with no calibration pass), exact cosine re-verify on
    // the candidate sliver only (raw vectors fetched by size-gated
    // broadcast semi-join). The result is bit-EXACTLY the vector
    // tier's — same oracle SQL as q_incremental_semantic certifies it.
    "q_incremental_semantic_pq" -> ((s, d) => {
      val e = emb(s, d)
      // pinned ONCE (r22): every reference — the index build's
      // assignment broadcast, the query-side assignment, and each
      // cfg-stamp collect (centroidCfg/pqCellCfg run a COLLECT at
      // operator construction) — otherwise re-runs the full-corpus
      // posexplode+groupBy centroid derivation
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
        .localCheckpoint()
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val idx = Similarity.semanticCellIndexPq(corpus, "vec_id",
        "embedding", cents, pqCb.toArray, pqM, pqK)
      Similarity.semanticNearDupsAgainstIndexPq(
        e.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
        idx, corpus, "vec_id", "embedding", cents,
        pqCb.toArray, pqM, pqK, threshold = 0.4)
        .select(col("cid"), col("id_batch"), col("id_corpus"),
          round(col("sim"), 4).as("sim"))
        .orderBy("id_batch", "id_corpus")
    }),

    // ANN SERVING against the persisted PQ index (r18): the ivfPqTopK
    // semantics with the corpus side read from semanticCellIndexPq —
    // codes never re-derived per query batch, index never shuffled
    // (bucketed on cid at scale), per-request work = the broadcast
    // probe table only
    "q_ann_serve" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      // pinned ONCE (r22): every reference — the index build's
      // assignment broadcast, the query-side assignment, and each
      // cfg-stamp collect (centroidCfg/pqCellCfg run a COLLECT at
      // operator construction) — otherwise re-runs the full-corpus
      // posexplode+groupBy centroid derivation
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
        .localCheckpoint()
      val idx = Similarity.semanticCellIndexPq(
        e.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", cents,
        pqCb.toArray, pqM, pqK)
      Similarity.pqTopKAgainstIndex(e.filter(col("vec_id") < 10),
        "vec_id", "embedding", idx, cents, pqCb.toArray, pqM, pqK,
        topK = 4, nProbe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("sim"))
    }),

    // serving with the FAISS-style refine stage (r18): ADC shortlist
    // of topK×refineFactor from the persisted codes, exact COSINE
    // re-rank after fetching raw vectors for the shortlist only —
    // the exactness knob over q_ann_serve
    "q_ann_serve_refined" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      // pinned ONCE (r22): every reference — the index build's
      // assignment broadcast, the query-side assignment, and each
      // cfg-stamp collect (centroidCfg/pqCellCfg run a COLLECT at
      // operator construction) — otherwise re-runs the full-corpus
      // posexplode+groupBy centroid derivation
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
        .localCheckpoint()
      val corpus = e.filter(col("vec_id") % 5 =!= 0)
      val idx = Similarity.semanticCellIndexPq(corpus, "vec_id",
        "embedding", cents, pqCb.toArray, pqM, pqK)
      Similarity.pqTopKRefinedAgainstIndex(e.filter(col("vec_id") < 10),
        "vec_id", "embedding", idx, corpus, "vec_id", "embedding",
        cents, pqCb.toArray, pqM, pqK, topK = 4, refineFactor = 2,
        nProbe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("sim"), 4).as("sim"))
    }),

    // the EMBEDDING-modality daily-admission loop end-to-end (r18):
    // within-batch SemDeDup drop (shared quantizer), then drop vs the
    // persisted cell index — the q_incremental_e2e composition
    // capstone for the semantic family; output = the day's admitted
    // vec_ids, exactly what semanticCellIndexDelta persists and
    // compactSemanticCellIndex folds in. Stages individually
    // certified (q_semantic_drop, q_incremental_semantic); this row
    // certifies the COMPOSITION cross-engine.
    "q_semantic_e2e" -> ((s, d) => {
      val e = emb(s, d)
      // pinned ONCE (r22): every reference — the index build's
      // assignment broadcast, the query-side assignment, and each
      // cfg-stamp collect (centroidCfg/pqCellCfg run a COLLECT at
      // operator construction) — otherwise re-runs the full-corpus
      // posexplode+groupBy centroid derivation
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
        .localCheckpoint()
      val batch = e.filter(col("vec_id") % 5 === 0)
      val idx = Similarity.semanticCellIndex(
        e.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", cents)
      val within = Similarity.semanticDrop(batch, "vec_id", "embedding",
        cents, threshold = 0.4)
      Similarity.dropSemanticAgainstIndex(within, "vec_id", "embedding",
        idx, cents, threshold = 0.4)
        .select("vec_id")
        .orderBy("vec_id")
    }),

    // multi-probe recall dial (r18): the batch side queries its TOP-2
    // nearest cells, recovering duplicates whose batch vector sits
    // near a cell boundary — SemDeDup's documented cross-cell loss,
    // dialed down at candidate-scope (×2) cost; the corpus index stays
    // nearest-1, the exact verify is untouched, found pairs grow
    // monotonically (OpsSpec law)
    "q_incremental_semantic_probe2" -> ((s, d) => {
      val e = emb(s, d)
      // pinned ONCE (r22): every reference — the index build's
      // assignment broadcast, the query-side assignment, and each
      // cfg-stamp collect (centroidCfg/pqCellCfg run a COLLECT at
      // operator construction) — otherwise re-runs the full-corpus
      // posexplode+groupBy centroid derivation
      val cents = Similarity.centroidsFromLabels(e, "label", "embedding")
        .localCheckpoint()
      val idx = Similarity.semanticCellIndex(
        e.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding", cents)
      Similarity.semanticNearDupsAgainstIndex(
        e.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
        idx, cents, threshold = 0.4, queryProbes = 2)
        .select(col("cid"), col("id_batch"), col("id_corpus"),
          round(col("sim"), 4).as("sim"))
        .orderBy("id_batch", "id_corpus")
    }),

    // IVF with one Lloyd refinement round end-to-end: label-seeded
    // centroids -> assign -> recompute (rounded-centroid determinism)
    // -> probe-limited search against the REFINED quantizer
    "q_ivf_refined_topk" -> ((s, d) => {
      val e = spread(s, emb(s, d), "vec_id")
      val cents0 = Similarity.centroidsFromLabels(e, "label", "embedding")
      val cents1 = Similarity.refineCentroids(e, "vec_id", "embedding",
        cents0, iters = 1)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 20), "vec_id",
        "embedding", cents1, k = 3, nProbe = 2)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), round(col("sim"), 4).as("sim"))
    }),

    // ---------------- multimodal decode certification: REAL JDK codec
    // decodes (ImageIO PNG, javax.sound WAV) over deterministic
    // fixtures (Multimodal.fixturePng/fixtureWav — lossless formats, so
    // decoded metadata and the pixel-grid feature hash are literals),
    // plus the declared fallback contract for non-media payloads. The
    // oracle pins every decoded value as a DuckDB VALUES literal.
    // container-HEADER metadata without codecs (webp VP8/VP8L/VP8X,
    // avif ispe, mp4 mvhd+tkhd — pure byte parsing): the dimensions/
    // duration gates a pipeline runs BEFORE any pixel decode, so the
    // carried non-JDK-codec gap no longer blocks pre-decode filtering.
    // Deterministic header fixtures → literal oracle (q_decode
    // convention); junk quarantines as an error row
    "q_container_meta" -> ((s, d) => {
      import graft.ops.Multimodal._
      val rows = Seq(
        MediaRow(1L, fixtureWebpLossy(640, 480)),
        MediaRow(2L, fixtureWebpLossless(320, 200)),
        MediaRow(3L, fixtureWebpExtended(4096, 2160)),
        MediaRow(4L, fixtureMp4(1920, 1080, durationMs = 90500L)),
        MediaRow(5L, fixtureAvif(800, 600)),
        MediaRow(6L, "not a container at all".getBytes("UTF-8")))
      val ds = s.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[MediaRow])
      containerMetas(ds).toDF()
        .select(col("id"), col("format"), col("width"), col("height"),
          col("durationMs").as("duration_ms"),
          col("error").isNotNull.cast("long").as("has_err"))
    }),

    "q_decode" -> ((s, d) => {
      val media = graft.ops.Multimodal.fixtureMedia(s)
      // sentinel 0 instead of NULL in the not-applicable slots: nullable
      // int64 degrades to float64 in the pandas-side compare, which
      // cannot represent the 63-bit feature hash exactly
      val img = graft.ops.Multimodal
        .decodeImages(media.filter(m => m.id <= 3 || m.id == 21L)).toDF()
        .select(col("id"), lit("image").as("kind"),
          col("width"), col("height"), col("channels"),
          lit(0).as("sample_rate"), lit(0).as("bits"),
          lit(0L).as("n_samples"), col("featureHash").as("feature"))
      val aud = graft.ops.Multimodal
        .decodeAudios(media.filter(m => m.id >= 11L && m.id <= 12L)).toDF()
        .select(col("id"), lit("audio").as("kind"),
          lit(0).as("width"), lit(0).as("height"),
          col("channels"), col("sampleRate").as("sample_rate"),
          col("bitsPerSample").as("bits"), col("nSamples").as("n_samples"),
          lit(0L).as("feature"))
      img.unionByName(aud).orderBy("id")
    }),

    // video plug-in certification (r13 #8): REAL multi-frame decode
    // through the FrameDecoder contract's in-JDK proof (animated GIF).
    // GIF's palette encoder is lossless on the <=256-color fixture
    // frames, so canvas dims, GCE delays, and per-frame dHashes are
    // codec-version-stable literals; row 9 is the declared
    // undecodable-payload fallback (frame_idx = -1).
    "q_video_frames" -> ((s, d) => {
      import graft.ops.Multimodal
      import graft.ops.Multimodal.{GifFrameDecoder, MediaRow}
      val rows = Seq(
        MediaRow(1L, Multimodal.fixtureAnimatedGif(64, 64, 3, seed = 5L)),
        MediaRow(2L, Multimodal.fixtureAnimatedGif(48, 32, 2, seed = 9L)),
        MediaRow(9L, "not a gif at all".getBytes("UTF-8")))
      val ds = s.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[MediaRow]).repartition(3)
      Multimodal.decodeVideoFrames(ds, GifFrameDecoder).toDF()
        .select(col("id"), col("frameIdx").as("frame_idx"),
          col("width"), col("height"),
          col("durationMs").as("duration_ms"), col("dhash"))
        .orderBy("id", "frame_idx")
    }),

    // URL canonicalization + host + eTLD+1 — one map-only codegen'd
    // pass over the scan, no UDF, no shuffle (ops/Web.scala)
    "q_url_canon" -> ((s, d) => {
      val u = docs(s, d).select(col("doc_id"), urlFixtureWeb.as("url"))
      val h = graft.ops.Web.hostOf(col("url"))
      u.select(col("doc_id"),
        graft.ops.Web.canonicalUrl(col("url")).as("curl"),
        h.as("host"),
        graft.ops.Web.registeredDomain(h).as("dom"))
    }),

    // one page per canonical URL, best capture wins (C4 §2.2): ONE
    // hash aggregation via max_by (map-side partial), no window sort
    "q_url_dedup" -> ((s, d) => {
      val u = docs(s, d)
        .select(col("doc_id"), col("n_chars"), urlFixtureDedup.as("url"))
      graft.ops.Web.dropDuplicateUrls(u, "url", "doc_id", "n_chars")
        .select(col("canonical_url").as("curl"), col("doc_id"), col("n_chars"))
    }),

    // FineWeb-style per-registered-domain volume cap: top-3 by length,
    // one shuffle on the domain
    "q_domain_cap" -> ((s, d) => {
      val u = docs(s, d)
        .select(col("doc_id"), col("n_chars"), urlFixtureWeb.as("url"))
      graft.ops.Web.capPerDomain(u, "url", "n_chars", "doc_id", k = 3)
        .select(col("domain").as("dom"), col("doc_id"), col("n_chars"))
    }),

    // UT1-style host blocklist with domain-suffix semantics: the
    // map-only arrays_overlap tier (blocklist under the size gate);
    // WebSpec pins tier equivalence and the no-join plan shape
    "q_url_blocklist" -> ((s, d) => {
      import s.implicits._
      val u = docs(s, d).select(col("doc_id"), urlFixtureWeb.as("url"))
      val bl = Seq("src3-news.com", "src7-news.com", "blogspot.co.uk",
        "cdn.media.src5-news.com", "nope.example.org").toDF("domain")
      graft.ops.Web.dropBlockedHosts(u, "url", "doc_id", bl)
        .select(col("doc_id"), graft.ops.Web.hostOf(col("url")).as("host"))
    }),

    // incremental URL admission: the day's crawl anti-joined against
    // the corpus URL index (index wins — first capture published stays
    // published). Index bucketed via Layout in production (WebSpec pins
    // the batch-side-only exchange); built in-memory here like the
    // band-index rows
    "q_url_index_drop" -> ((s, d) => {
      val all = docs(s, d)
        .select(col("doc_id"), col("n_chars"), urlFixtureDedup.as("url"))
      val corpus = all.filter(col("doc_id") < 100)
      val batch = all.filter(col("doc_id") >= 400)
      val idx = graft.ops.Web.urlIndex(corpus, "url", "doc_id", "n_chars")
      graft.ops.Web.dropUrlsAgainstIndex(batch, "url", idx)
        .select("doc_id")
    }),

    // URL index MAINTENANCE: batch1's admitted survivors ride a delta
    // side table; batch2 queries index ∪ delta. Certified against
    // DuckDB recomputing membership from scratch — the delta path must
    // equal a full rebuild (compactUrlIndex rebuild-equality is
    // law-pinned in WebSpec)
    "q_url_index_refresh" -> ((s, d) => {
      val all = docs(s, d)
        .select(col("doc_id"), col("n_chars"), urlFixtureDedup.as("url"))
      val corpus = all.filter(col("doc_id") < 100)
      val batch1 = all.filter(col("doc_id").between(300, 349))
      val batch2 = all.filter(col("doc_id") >= 400)
      val idx = graft.ops.Web.urlIndex(corpus, "url", "doc_id", "n_chars")
      val admitted1 = graft.ops.Web.dropUrlsAgainstIndex(batch1, "url", idx)
      val delta = graft.ops.Web.urlIndexDelta(admitted1, "url", "doc_id",
        "n_chars")
      graft.ops.Web.dropUrlsAgainstIndex(batch2, "url", idx, Some(delta))
        .select("doc_id")
    }),

    // crawl scheduling from the link graph: domainRank → temperature
    // budgets (T=1/2 ⇒ integral 1/T=2 keeps powers exact — the
    // q_mix_temperature discipline over exact 2^-20 ranks). Certified
    // through the DISTRIBUTED form (r19: budgets never leave the
    // cluster); WebSpec pins it ≡ the small-k Map form
    "q_crawl_budget" -> ((s, d) => {
      val u = docs(s, d).select(col("doc_id"), urlFixtureWeb.as("url"))
      val edges = u.select(
        graft.ops.Web.registeredDomainOfUrl(col("url")).as("src"),
        concat(lit("src"), ((col("doc_id") * 7 + 3) % 20).cast("string"),
          lit("-news.com")).as("dst"))
      val ranks = graft.ops.Web.domainRank(edges, "src", "dst",
        iterations = 4)
      graft.ops.Web.crawlBudgetsDf(ranks, 100000L, temperature = 0.5)
    }),

    // domain-graph PageRank (4 rounds, d=0.85): every contribution and
    // rank snaps to exact 2^-20 multiples, so the trajectory is
    // certified against an UNROLLED DuckDB replica with no float
    // tolerance — the q_quality_train_infer discipline applied to an
    // iterative graph algorithm
    "q_domain_rank" -> ((s, d) => {
      val u = docs(s, d).select(col("doc_id"), urlFixtureWeb.as("url"))
      val edges = u.select(
        graft.ops.Web.registeredDomainOfUrl(col("url")).as("src"),
        concat(lit("src"), ((col("doc_id") * 7 + 3) % 20).cast("string"),
          lit("-news.com")).as("dst"))
      graft.ops.Web.domainRank(edges, "src", "dst", iterations = 4)
        .select(col("node").as("dom"), col("rank"))
    }),

    // one-pass pipeline funnel: per-stage survivors/drops for
    // length → lang → Gopher-quality, ONE aggregation over one scan
    // (no stage ever materializes), k+1 driver-bounded output rows
    "q_funnel" -> ((s, d) => {
      val keep = graft.ops.RuleFilters.gopherMetrics(col("text"),
        minWords = 50, maxWords = 100000, minMwl = 3.0, maxMwl = 4.5,
        minAlphaFrac = 0.8, minStopHits = 1).getField("keep")
      graft.ops.RuleFilters.funnelReport(docs(s, d), Seq(
        "length" -> (col("n_chars") >= 80),
        "lang" -> col("lang").isin("en", "de", "fr"),
        "quality" -> keep))
    }),

    // robots.txt PARSING: raw per-host robots documents → the rules
    // table, RFC 9309 group/agent-fallback semantics via one window
    // over line order — certified against a DuckDB window replica.
    // The fixture carries Crawl-delay/Sitemap lines the RULES parse
    // must ignore (and q_robots_delay/q_robots_sitemap consume)
    "q_robots_parse" -> ((s, d) => {
      graft.ops.Web.parseRobotsTxt(robotsFixture(s, d), "host", "txt",
        "graftbot")
        .select(col("host"), col("prefix"), col("allow").cast("long"))
    }),

    // Crawl-delay extraction (the politeness knob crawlBudgets
    // scheduling needs): the delay of the MATCHED agent group beats
    // the * fallback's; non-numeric and pre-group delays drop; max
    // over applicable lines — DuckDB window replica
    "q_robots_delay" -> ((s, d) => {
      graft.ops.Web.parseCrawlDelays(robotsFixture(s, d), "host", "txt",
        "graftbot")
    }),

    // Sitemap extraction (frontier seeds): group-independent per the
    // sitemaps protocol, absolute URLs only, distinct per host
    "q_robots_sitemap" -> ((s, d) => {
      graft.ops.Web.parseSitemaps(robotsFixture(s, d), "host", "txt")
    }),

    // robots.txt-style crawl permission (RFC 9309 longest-match,
    // allow-wins ties): one host equi-join + extremum argmax — rules
    // for other hosts never meet a row
    "q_robots" -> ((s, d) => {
      import s.implicits._
      val u = docs(s, d).select(col("doc_id"), urlFixtureWeb.as("url"))
      val rules = Seq(
        ("src3-news.com", "/", false),
        ("src3-news.com", "/de/", true),
        ("src5.example.com", "/fr/", false),
        ("src7.blogspot.co.uk", "/", false)
      ).toDF("host", "prefix", "allow")
      graft.ops.Web.robotsFilter(u, "url", "doc_id", rules)
        .select(col("doc_id"), graft.ops.Web.hostOf(col("url")).as("host"))
    }),

    // RFC 9309 §2.2.3 wildcard rules (MUST-level: '*' any-sequence,
    // trailing '$' end-anchor): regex-translated match tier,
    // most-specific (longest rule) wins — DuckDB replica translates
    // the same rules with the same escaping
    "q_robots_wildcard" -> ((s, d) => {
      import s.implicits._
      val u = docs(s, d).select(col("doc_id"), urlFixtureWeb.as("url"))
      val rules = Seq(
        ("src4-news.com", "/*", false),
        ("src4-news.com", "/de/*", true),
        ("src6.example.com", "/*/Doc/*3", false),
        ("src7.blogspot.co.uk", "/*c/7$", false)
      ).toDF("host", "prefix", "allow")
      graft.ops.Web.robotsFilter(u, "url", "doc_id", rules)
        .select(col("doc_id"), graft.ops.Web.hostOf(col("url")).as("host"))
    }),

    // the WEB CAPSTONE: length gate → canonical-URL dedup (best
    // capture) → host blocklist → per-domain cap, one composed plan —
    // the q_pipeline_e2e stage-boundary-mistakes row for the web layer
    "q_web_e2e" -> ((s, d) => {
      import s.implicits._
      val all = docs(s, d)
        .select(col("doc_id"), col("n_chars"), urlFixtureE2e.as("url"))
        .filter(col("n_chars") >= 80)
      val dd = graft.ops.Web.dropDuplicateUrls(all, "url", "doc_id",
        "n_chars")
      val bl = Seq("src3-news.com", "src7-news.com").toDF("domain")
      val kept = graft.ops.Web.dropBlockedHosts(dd, "url", "doc_id", bl)
      graft.ops.Web.capPerDomain(kept, "url", "n_chars", "doc_id", k = 5)
        .select(col("domain").as("dom"), col("doc_id"), col("n_chars"))
    }),

    // the CRAWL-TO-CORPUS composition over one archive: WARC parse →
    // 200-status gate → HTML extraction → canonical-URL dedup
    // (best-capture by extracted length) → host blocklist — every web
    // stage in ONE plan over byte-deterministic input, literal oracle
    "q_crawl_e2e" -> ((s, _) => {
      import s.implicits._
      val pages = graft.sources.Warc.readWarc(s, s"$warcFixtureDir/crawl.warc")
        .filter(col("httpStatus") === 200)
        .select(col("recordIdx").cast("long").as("rid"),
          col("targetUri").as("url"),
          graft.ops.Web.htmlToText(decode(col("payload"), "UTF-8")).as("txt"))
        .withColumn("n", length(col("txt")).cast("long"))
      val dd = graft.ops.Web.dropDuplicateUrls(pages, "url", "rid", "n")
      val bl = Seq("blocked.bad").toDF("domain")
      graft.ops.Web.dropBlockedHosts(dd, "url", "rid", bl)
        .select(col("canonical_url").as("curl"), col("txt"), col("n"))
    }),

    // outlink extraction + resolution (the link-graph PRODUCER): every
    // href shape — quote forms, absolute/protocol-relative/
    // root-relative/relative/dot-slash, scheme filtering — certified
    // against a DuckDB replica of the same scan + resolution rules
    "q_outlinks" -> ((s, d) => {
      val h = docs(s, d).select(col("doc_id"), outlinkBase.as("base"),
        outlinkFixtureHtml.as("html"))
      h.select(col("doc_id"),
        posexplode(graft.ops.Web.extractOutlinks(col("html"), col("base")))
          .as(Seq("link_idx", "link")))
        .select(col("doc_id"), col("link_idx").cast("long").as("link_idx"),
          col("link"))
    }),

    // anchor TEXT extraction (the link-label signal anchor-text
    // corpora are built from): whole <a …>…</a> elements, href through
    // the shared resolution rule, text de-tagged/entity-decoded/
    // collapsed — DuckDB replica of the same two-phase scan
    "q_anchors" -> ((s, d) => {
      val h = docs(s, d).select(col("doc_id"), outlinkBase.as("base"),
        outlinkFixtureHtml.as("html"))
      h.select(col("doc_id"),
        posexplode(graft.ops.Web.extractAnchors(col("html"), col("base")))
          .as(Seq("a_idx", "a")))
        .select(col("doc_id"), col("a_idx").cast("long").as("a_idx"),
          col("a.href").as("href"), col("a.text").as("a_text"))
    }),

    // the link-graph edges DERIVED FROM THE ARCHIVE (not synthesized):
    // WARC → status gate → href extraction → registered-domain grain
    // with self-loop drop and multi-edge counts — literal oracle over
    // the hand-derivable byte-deterministic fixture
    "q_crawl_edges" -> ((s, _) => {
      val pages = graft.sources.Warc
        .readWarc(s, s"$warcFixtureDir/linked.warc")
        .filter(col("httpStatus") === 200)
        .select(col("targetUri").as("url"),
          decode(col("payload"), "UTF-8").as("html"))
      graft.ops.Web.edgesFromDocuments(pages, "url", "html")
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    }),

    // the CLOSED crawl loop: archive → real link graph → domainRank —
    // the oracle recomputes the whole snapped trajectory in DuckDB
    // from the hand-derived literal edge multiset
    "q_crawl_graph" -> ((s, _) => {
      val pages = graft.sources.Warc
        .readWarc(s, s"$warcFixtureDir/linked.warc")
        .filter(col("httpStatus") === 200)
        .select(col("targetUri").as("url"),
          decode(col("payload"), "UTF-8").as("html"))
      val edges = graft.ops.Web.edgesFromDocuments(pages, "url", "html")
      graft.ops.Web.domainRank(edges, "src", "dst", iterations = 3)
        .select(col("node").as("dom"), col("rank"))
    }),

    // the FULL crawl-scheduling loop in ONE plan: archive → href
    // extraction → domain link graph → PageRank → DISTRIBUTED
    // temperature budgets → robots Crawl-delay politeness join →
    // per-domain schedule (budget, delay, est. seconds to spend it).
    // Every arithmetic step is exact (dyadic ranks, integral 1/T,
    // single IEEE mul), so the whole composition certifies literally
    "q_crawl_schedule" -> ((s, _) => {
      import s.implicits._
      val pages = graft.sources.Warc
        .readWarc(s, s"$warcFixtureDir/linked.warc")
        .filter(col("httpStatus") === 200)
        .select(col("targetUri").as("url"),
          decode(col("payload"), "UTF-8").as("html"))
      val edges = graft.ops.Web.edgesFromDocuments(pages, "url", "html")
      val ranks = graft.ops.Web.domainRank(edges, "src", "dst",
        iterations = 3)
      val budgets = graft.ops.Web.crawlBudgetsDf(ranks, 10000L,
        temperature = 0.5)
      val robots = Seq(
        ("alpha.com", "User-agent: *\nCrawl-delay: 2\n"),
        ("beta.com", "User-agent: graftbot\nCrawl-delay: 0.5\n\n" +
          "User-agent: *\nCrawl-delay: 30\n")).toDF("host", "txt")
      val delays = graft.ops.Web.parseCrawlDelays(robots, "host", "txt",
        "graftbot")
      budgets.join(delays, budgets("dom") === delays("host"), "left")
        .select(col("dom"), col("budget"),
          coalesce(col("crawl_delay"), lit(1.0)).as("delay"),
          (col("budget").cast("double") *
            coalesce(col("crawl_delay"), lit(1.0))).as("est_seconds"))
    }),

    // WARC ingest → URL canonicalization → HTML extraction, end to
    // end over the deterministic fixture archive (the q_decode
    // convention: byte-deterministic input, literal-VALUES oracle).
    // The quarantined truncated record rides along with has_err=1 —
    // the Ingest conservation posture
    "q_warc_read" -> ((s, _) => {
      graft.sources.Warc.readWarc(s, s"$warcFixtureDir/fixture.warc")
        .select(col("recordIdx").cast("long").as("idx"),
          col("warcType").as("wtype"),
          col("targetUri").as("uri"),
          col("httpStatus").cast("long").as("status"),
          graft.ops.Web.canonicalUrl(col("targetUri")).as("curl"),
          graft.ops.Web.htmlToText(decode(col("payload"), "UTF-8")).as("txt"),
          col("error").isNotNull.cast("long").as("has_err"))
    }),

    // WET ingest (Common Crawl's extracted-text release): conversion
    // records' plain-text payloads → the documents shape, type/
    // content-type gated (case-insensitive), warcinfo and response
    // records excluded — literal oracle over the fixture archive
    "q_wet_read" -> ((s, _) => {
      graft.sources.Warc.wetToDocuments(s, s"$warcFixtureDir/fixture.wet")
        .select(col("url"), col("text"), col("n_chars"))
    }),

    // HTTP transfer/content decoding at ingest: chunked framing
    // removed (extension tolerated), gzip bodies inflated, gzip
    // INSIDE chunked layered in RFC 9112 order, and a malformed
    // chunked body falls back to the raw bytes (the record is still
    // a capture) — literal oracle over the byte-deterministic fixture
    "q_warc_encoded" -> ((s, _) => {
      graft.sources.Warc.readWarc(s, s"$warcFixtureDir/encoded.warc")
        .select(col("targetUri").as("uri"),
          col("httpStatus").cast("long").as("status"),
          graft.ops.Web.htmlToText(decode(col("payload"), "UTF-8"))
            .as("txt"),
          col("error").isNotNull.cast("long").as("has_err"))
    }),

    // charset-aware ingest decode: header charset= param beats the
    // <meta charset> sniff beats the UTF-8 fallback; unknown names
    // fall back instead of throwing — literal oracle over latin-1 /
    // windows-1252 / unknown / utf-8 fixture responses
    "q_warc_charset" -> ((s, _) => {
      graft.sources.Warc.warcToDocuments(s,
        s"$warcFixtureDir/charset.warc")
        .select(col("url"), col("text"), col("n_chars"))
    }),

    // sitemap XML parsing (sitemaps.org): urlset entries → seed rows
    // with decoded locs and nullable lastmod; sitemapindex children
    // flagged; relative/empty locs drop (the protocol requires
    // absolute) — literal oracle over deterministic documents
    "q_sitemap_parse" -> ((s, _) => {
      import s.implicits._
      val urlset = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        " <url><loc>https://a.com/p1</loc>" +
        "<lastmod>2026-01-01</lastmod></url>\n" +
        " <url>\n  <loc> https://a.com/p2?x=1&amp;y=2 </loc>\n </url>\n" +
        " <url><loc>relative/skip</loc></url>\n" +
        " <url><priority>0.5</priority></url>\n" +
        "</urlset>"
      val index = "<sitemapindex>" +
        "<sitemap><loc>https://a.com/s1.xml.gz</loc>" +
        "<lastmod>2026-02-02T00:00:00Z</lastmod></sitemap>" +
        "<sitemap><loc>HTTPS://A.com/s2.xml</loc></sitemap>" +
        "</sitemapindex>"
      val df = Seq(("https://a.com/sitemap.xml", urlset),
        ("https://a.com/sitemap_index.xml", index)).toDF("url", "xml")
      graft.ops.Web.parseSitemapXml(df, "url", "xml")
    }),

    // WAT ingest (Common Crawl's metadata-JSON release): one metadata
    // record per capture → the precomputed link table, RAW values
    // resolved through the SAME kernel rule as the HTML extractors;
    // the malformed-JSON capture quarantines as one error row and the
    // no-surviving-links capture keeps its null-link row (record
    // conservation) — literal oracle over the fixture archive
    "q_wat_read" -> ((s, _) => {
      graft.sources.Wat.watToLinks(s, s"$warcFixtureDir/fixture.wat")
        .select(col("url"), col("http_status"), col("link_idx"),
          col("link_path"), col("raw_href"), col("href"),
          col("error").isNotNull.cast("long").as("has_err"))
    }),

    // anchor-text corpus at the consumable (dst domain, anchor text)
    // grain: one extraction scan → per-(dst,text,src) counts → the
    // per-source cap (votes = Σ min(n, cap)) — DuckDB replica runs
    // the same two-phase aggregation over the q_anchors extraction
    "q_anchor_corpus" -> ((s, d) => {
      val h = docs(s, d).select(col("doc_id"), outlinkBase.as("url"),
        outlinkFixtureHtml.as("html"))
      graft.ops.Web.anchorTextCorpus(h, "url", "html")
    }),

    // frontier planning: budgets + robots delays → an executable
    // fetch schedule — per-domain rank via the range-partitioned
    // groupedRowNumber (budgets are VARIABLE per domain, so no
    // constant-k heap; no Window.partitionBy either), budget cap,
    // fetch_at = (rank-1)·delay politeness spacing
    "q_frontier" -> ((s, d) => {
      import s.implicits._
      val u = docs(s, d).select(col("doc_id"), col("n_chars"),
        urlFixtureWeb.as("url"))
      val budgets = Seq(("src1-news.com", 5L), ("src3-news.com", 2L),
        ("example.com", 7L), ("blogspot.co.uk", 3L))
        .toDF("domain", "budget")
      val delays = Seq(("src1-news.com", 2.0), ("example.com", 0.5))
        .toDF("host", "crawl_delay")
      graft.ops.Web.frontierPlan(u, "url", "n_chars", "doc_id",
        budgets, delays)
        .select(col("domain").as("dom"), col("doc_id"),
          col("rank").cast("long").as("rank"), col("fetch_at"))
    }),

    // SPLITTABLE .warc.gz: per-record gzip members → split sidecar
    // (1-byte target forces one split per record-clean boundary) →
    // range reads off the Hadoop filesystem — bit-identical to the
    // whole-file q_warc_read, same literal oracle, recordIdx carried
    // through the sidecar's cumulative counts
    "q_warc_split" -> ((s, _) => {
      val sidecar = s"$warcFixtureDir/sidecar_fixture"
      graft.sources.Warc.writeWarcSplitIndex(s,
        s"$warcFixtureDir/fixture.warc.gz", sidecar, targetSplitBytes = 1L)
      graft.sources.Warc.readWarcIndexed(s, sidecar)
        .select(col("recordIdx").cast("long").as("idx"),
          col("warcType").as("wtype"),
          col("targetUri").as("uri"),
          col("httpStatus").cast("long").as("status"),
          graft.ops.Web.canonicalUrl(col("targetUri")).as("curl"),
          graft.ops.Web.htmlToText(decode(col("payload"), "UTF-8")).as("txt"),
          col("error").isNotNull.cast("long").as("has_err"))
    }),

    // HTML → text extraction (the crawl pipeline's trafilatura-core
    // stage): one codegen'd map-only expression chain, certified
    // byte-exact against a DuckDB replica of the same five rules
    "q_html_extract" -> ((s, d) => {
      val h = docs(s, d).select(col("doc_id"), htmlFixture.as("html"))
      h.select(col("doc_id"), graft.ops.Web.htmlToText(col("html")).as("txt"))
        .withColumn("n_lines",
          size(split(col("txt"), "\n")).cast("long"))
    })
  )

  /** DuckDB replica of the multi-table LSH near-dup query: the
    * deterministic hyperplane weights (Similarity.planeWeight) are
    * embedded as SQL double literals, so both engines derive
    * bit-identical table signatures (shortest-round-trip
    * Double.toString reparses to the same bits in DuckDB). The OR-join
    * over table signatures is only oracle ceremony — the Spark plan is
    * an equi-join on the exploded (table, signature) key. */
  private def lshNearDupSql(dims: Int, planes: Int, bandPlanes: Int,
                            threshold: Double): String = {
    def weights(p: Int): String =
      (0 until dims).map(dm => Similarity.planeWeight(p, dm).toString)
        .mkString("[", ", ", "]")
    val nTables = planes / bandPlanes
    val sigCols = (0 until nTables).map { t =>
      val bits = (0 until bandPlanes).map { j =>
        val p = t * bandPlanes + j
        s"(CASE WHEN list_dot_product(v, ${weights(p)}) >= 0 THEN ${1L << j} ELSE 0 END)"
      }
      bits.mkString(" + ") + s" AS sig$t"
    }
    val anyTable = (0 until nTables).map(t => s"a.sig$t = b.sig$t").mkString(" OR ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nn
         FROM embeddings),
       s AS (SELECT vec_id, v, nn, ${sigCols.mkString(", ")} FROM e)
       SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)), 4) AS sim
       FROM s a JOIN s b ON ($anyTable) AND a.vec_id < b.vec_id
       WHERE list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)) >= $threshold
       ORDER BY 1, 2"""
  }

  /** Connected components over the LSH pair graph (nested WITH is legal
    * inside a DuckDB CTE body, so the pair SQL embeds whole). */
  private def lshNearDupGroupsSql(dims: Int, planes: Int, bandPlanes: Int,
                                  threshold: Double): String =
    s"""WITH RECURSIVE pairs AS (
         SELECT id_a, id_b FROM (
           ${lshNearDupSql(dims, planes, bandPlanes, threshold)})),
       edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
       reach AS (
         SELECT src AS id, src AS label FROM edges
         UNION
         SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id)
       SELECT id AS vec_id, min(label) AS keep_id
       FROM reach GROUP BY 1 ORDER BY 1"""

  /** DuckDB label-seeded rounded centroids + nearest-centroid
    * assignment (the q_ivf_topk fragments) WITHOUT pair generation —
    * the r17 incremental-semantic oracle builds batch-vs-corpus cross
    * pairs over the same assignment. */
  private val semanticAssignCoreSql: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
         FROM embeddings),
       cent AS (SELECT label::BIGINT AS cid,
         list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
         FROM (SELECT label, pos, avg(x) AS m FROM (
           SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
             unnest(embedding)::DOUBLE AS x FROM embeddings)
           GROUP BY 1, 2) GROUP BY 1),
       centn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
       assign AS (SELECT vec_id, cid FROM (
         SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(CASE WHEN e.n * c.cn > 0
             THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
             c.cid) AS rk
         FROM e CROSS JOIN centn c) WHERE rk = 1)"""

  /** [[semanticAssignCoreSql]] + the within-corpus pair CTE — DuckDB
    * centroids + nearest-centroid assignment (the q_ivf_topk fragments)
    * + within-cell pairs. */
  private val semanticAssignSql: String = semanticAssignCoreSql +
    """,
       sempairs AS (SELECT cid, a1.vec_id AS id_a, a2.vec_id AS id_b,
           list_dot_product(e1.v, e2.v) / (e1.n * e2.n) AS rawsim
         FROM assign a1 JOIN assign a2 USING (cid)
         JOIN e e1 ON e1.vec_id = a1.vec_id
         JOIN e e2 ON e2.vec_id = a2.vec_id
         WHERE a1.vec_id < a2.vec_id
           AND list_dot_product(e1.v, e2.v) / (e1.n * e2.n) >= 0.4)"""

  // ---- web/URL oracle fragments -----------------------------------------

  /** DuckDB mirror of [[urlFixtureWeb]] → CTE `u0(doc_id, n_chars, url)`. */
  private val urlFixtureWebSql: String =
    """u0 AS (SELECT doc_id, n_chars,
      (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END) || '://' ||
      (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' || source || '-News.COM'
            WHEN doc_id % 4 = 1 THEN 'cdn.media.' || source || '-news.com'
            WHEN doc_id % 4 = 2 THEN source || '.example.com'
            ELSE source || '.blogspot.CO.UK' END) ||
      (CASE WHEN doc_id % 6 = 0 THEN ':443'
            WHEN doc_id % 6 = 3 THEN ':8080' ELSE '' END) ||
      '/' || lang || '/Doc/' || doc_id::VARCHAR ||
      (CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END) ||
      (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
            WHEN doc_id % 3 = 1 THEN '?a=1&utm_campaign=x&ref=tw' ELSE '' END) ||
      (CASE WHEN doc_id % 5 = 0 THEN '#sec-' || lang ELSE '' END) AS url
     FROM documents)"""

  /** DuckDB mirror of [[urlFixtureDedup]] → CTE `u0(doc_id, n_chars, url)`. */
  private val urlFixtureDedupSql: String =
    """u0 AS (SELECT doc_id, n_chars,
      (CASE WHEN doc_id % 5 = 0 THEN upper(s0) ELSE s0 END) || '://' ||
      (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
      (CASE WHEN doc_id % 10 = 0 THEN upper(h0) ELSE h0 END) ||
      (CASE WHEN doc_id % 2 = 1 THEN
        (CASE WHEN k % 2 = 0 THEN ':443' ELSE ':80' END) ELSE '' END) ||
      '/p/' || k::VARCHAR ||
      (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
      '?utm_source=u' || doc_id::VARCHAR || '&a=' || (k % 3)::VARCHAR ||
      (CASE WHEN doc_id % 4 = 0 THEN '#f' || doc_id::VARCHAR ELSE '' END) AS url
     FROM (SELECT doc_id, n_chars, doc_id % 120 AS k,
       (CASE WHEN (doc_id % 120) % 2 = 0 THEN 'https' ELSE 'http' END) AS s0,
       'h' || ((doc_id % 120) % 6)::VARCHAR || '.example.com' AS h0
      FROM documents))"""

  /** The five canonicalization rules (Web.canonicalUrl scaladoc) in
    * DuckDB — from `u0` to `canon(doc_id, n_chars, host, curl)`. Every
    * regexp_replace pattern matches at most once, so replace-first
    * (DuckDB) and replace-all (Spark) agree by construction. */
  private val urlCanonSql: String =
    s"""c1 AS (SELECT doc_id, n_chars, regexp_replace(url, '#.*$$', '') AS defrag FROM u0),
      c2 AS (SELECT doc_id, n_chars,
        lower(regexp_extract(defrag, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        regexp_replace(defrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '') AS rest FROM c1),
      c3 AS (SELECT *, regexp_replace(
          lower(regexp_extract(rest, '^([^/?]*)', 1)), '^[^@]*@', '') AS hp,
        regexp_replace(rest, '^[^/?]*', '') AS pathq FROM c2),
      c4a AS (SELECT *,
        regexp_replace(regexp_replace(hp, ':[0-9]+$$', ''), '\\.+$$', '') AS h0,
        regexp_extract(hp, ':([0-9]+)$$', 1) AS port FROM c3),
      c4 AS (SELECT *,
        CASE WHEN len(string_split(
            regexp_replace(h0, '^(www\\.)+', ''), '.')) >= 2
          THEN regexp_replace(h0, '^(www\\.)+', '')
          ELSE h0 END AS host FROM c4a),
      c5 AS (SELECT *,
        CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
          OR (scheme = 'http' AND port = '80') THEN '' ELSE ':' || port END AS portpart,
        regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$$', '') AS path,
        CASE WHEN contains(pathq, '?')
          THEN regexp_replace(pathq, '^[^?]*\\?', '') ELSE '' END AS qstr FROM c4),
      c6 AS (SELECT *, list_sort(list_filter(string_split(qstr, '&'),
          x -> len(x) > 0 AND NOT regexp_matches(lower(regexp_extract(x, '^([^=]*)', 1)),
            '^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)$$'))) AS params
        FROM c5),
      canon AS (SELECT doc_id, n_chars, host,
        scheme || '://' || host || portpart || path ||
        (CASE WHEN len(params) > 0
          THEN '?' || array_to_string(params, '&') ELSE '' END) AS curl
       FROM c6)"""

  /** The heuristic public-suffix set as a SQL IN-list literal. */
  private val suffixListSql: String = graft.ops.Web.DefaultPublicSuffixes
    .map(x => s"'$x'").mkString(", ")

  /** The eTLD+1 CASE (registeredDomain's PSL-heuristic rule) as ONE
    * SQL rendition — expects `labs` (string_split(host, '.')) in
    * scope; shared by regDomainSql and the q_anchor_corpus replica so
    * the rule cannot drift between oracles (r20 review find). */
  private def rdomCaseSql(hostCol: String): String =
    s"""CASE WHEN len(labs) <= 2
               OR regexp_matches($hostCol, '^[0-9]{1,3}(\\.[0-9]{1,3}){3}$$')
               THEN $hostCol
             WHEN array_to_string(labs[-2:], '.') IN ($suffixListSql)
               THEN array_to_string(labs[-3:], '.')
             ELSE array_to_string(labs[-2:], '.') END"""

  /** DuckDB replica of the anchor extraction over the outlink fixture
    * — the CTE chain shared by q_anchors (raw pairs) and
    * q_anchor_corpus (the aggregated corpus): whole `<a …>…</a>`
    * elements, href cleanup + RFC 3986-subset resolution, text
    * de-tag/entity-decode/collapse. Ends at
    * `sel(doc_id, a_idx, a{href, atext})`. */
  private val anchorsReplicaCtes: String =
    """h AS (SELECT doc_id,
        CASE WHEN doc_id % 6 = 0 THEN 'https://static.hub.org'
             ELSE 'https://' || source || '-news.com' END AS bauthu,
        CASE WHEN doc_id % 6 = 0 THEN '/lib/'
             ELSE '/sec/' || (doc_id % 7)::VARCHAR || '/' END AS bdir,
        '<html><body><h1>' || source || '</h1>' ||
        (CASE WHEN doc_id % 6 = 0
              THEN '<base href="https://static.hub.org/lib/">'
              ELSE '' END) ||
        '<a href="https://partner' || (doc_id % 5)::VARCHAR ||
          '.com/x?id=' || doc_id::VARCHAR || '">p</a>' ||
        '<a href=''//cdn-assets.net/l' || (doc_id % 3)::VARCHAR ||
          '''>c</a>' ||
        '<a href=/local/' || (doc_id % 7)::VARCHAR || '>l</a>' ||
        (CASE WHEN doc_id % 2 = 0 THEN '<a href="rel/page2.html">r</a>'
              ELSE '<a href="./sib.html#frag">s</a>' END) ||
        '<a href="mailto:x@y.com">m</a><a href="#top">t</a>' ||
        (CASE WHEN doc_id % 4 = 0 THEN '<A HREF="HTTP://Upper.org/Y">u</A>'
              ELSE '' END) ||
        '</body></html>' AS html
       FROM documents),
      r AS (SELECT doc_id, bauthu, bdir, regexp_extract_all(html,
        '(?is)<a\b[^>]*?\shref\s*=\s*(?:"[^"]*"|''[^'']*''|[^\s>]+)[^>]*>.*?</a>',
        0) AS elems FROM h),
      p0 AS (SELECT doc_id, bauthu, bdir, list_transform(elems, e ->
        struct_pack(
          cv := trim(regexp_replace(regexp_replace(regexp_extract(e,
            '(?is)<a\b[^>]*?\shref\s*=\s*("[^"]*"|''[^'']*''|[^\s>]+)', 1),
            '^["'']|["'']$', '', 'g'), '#.*$', '')),
          atext := trim(regexp_replace(
            replace(replace(replace(replace(replace(replace(
              regexp_replace(regexp_replace(regexp_replace(e,
                '(?is)^<a[^>]*>', ''), '(?is)</a>$', ''),
                '<[^>]*>', ' ', 'g'),
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
            '&#39;', chr(39)), '&amp;', '&'),
            '\s+', ' ', 'g')))) AS l0 FROM r),
      p AS (SELECT doc_id, list_filter(list_transform(l0, x ->
        struct_pack(
          href := CASE
            WHEN regexp_matches(x.cv, '^(?i)https?://') THEN x.cv
            WHEN regexp_matches(x.cv, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN NULL
            WHEN starts_with(x.cv, '//') THEN 'https:' || x.cv
            WHEN starts_with(x.cv, '/') THEN bauthu || x.cv
            WHEN len(x.cv) > 0 THEN bauthu || bdir ||
              regexp_replace(x.cv, '^(\./)+', '')
            ELSE NULL END,
          atext := x.atext)), x -> x.href IS NOT NULL) AS ls FROM p0),
      sel AS (SELECT doc_id, generate_subscripts(ls, 1)::BIGINT - 1 AS a_idx,
        unnest(ls) AS a FROM p)"""

  /** eTLD+1 over the heuristic suffix set — from `canon` to
    * `rd2(doc_id, n_chars, host, curl, dom)`. */
  private val regDomainSql: String =
    s"""rd AS (SELECT *, string_split(host, '.') AS labs FROM canon),
      rd2 AS (SELECT doc_id, n_chars, host, curl,
        ${rdomCaseSql("host")} AS dom FROM rd)"""

  /** Unrolled DuckDB PageRank over the urlFixtureWeb domain graph —
    * one (contrib, sum, rank) CTE triple per round, every value
    * snapped to 2^-20 multiples exactly like Web.domainRank. */
  /** The unrolled PageRank CTE chain over an ALREADY-DEFINED
    * `edges(src, dst)` CTE — shared by the fixture-derived
    * q_domain_rank replica and the literal-edge q_crawl_graph replica
    * (the oracle computes the whole trajectory itself either way). */
  /** Just the CTE chain (nodes … pr$iters) — for oracles that keep
    * composing past the rank (q_crawl_schedule). */
  private def pageRankCtesSql(iters: Int): String = {
    val head = s"""nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      deg AS (SELECT src, count(*)::BIGINT AS deg FROM edges GROUP BY 1),
      pr0 AS (SELECT node, 1.0::DOUBLE AS rank FROM nodes)"""
    val rounds = (1 to iters).map { i =>
      s""",
      pc$i AS (SELECT e.dst AS node,
          floor(r.rank / d.deg * 1048576.0) / 1048576.0 AS c
        FROM edges e JOIN deg d ON e.src = d.src
        JOIN pr${i - 1} r ON r.node = e.src),
      ps$i AS (SELECT node, sum(c) AS s FROM pc$i GROUP BY 1),
      pr$i AS (SELECT n.node,
          floor(((1.0 - 0.85) + 0.85 * coalesce(s.s, 0.0)) * 1048576.0)
            / 1048576.0 AS rank
        FROM nodes n LEFT JOIN ps$i s USING (node))"""
    }.mkString
    s"$head$rounds"
  }

  private def pageRankUnrolledSql(iters: Int): String =
    s"${pageRankCtesSql(iters)} SELECT node AS dom, rank FROM pr$iters"

  private def domainRankSql(iters: Int): String =
    s"""WITH $urlFixtureWebSql, $urlCanonSql, $regDomainSql,
      edges AS (SELECT dom AS src,
        'src' || ((doc_id * 7 + 3) % 20)::VARCHAR || '-news.com' AS dst
        FROM rd2),
      ${pageRankUnrolledSql(iters)}"""

  /** Shared robots replica CTEs: the fixture documents (must mirror
    * [[robotsFixture]] byte-for-byte) and the comment-strip/key-split
    * line scan. */
  private val robotsDocSql: String =
    """r0 AS (SELECT DISTINCT source || '-news.com' AS host,
      (CASE WHEN (substr(source, 4)::INT % 3) = 0 THEN
         'User-agent: GraftBot' || chr(10) || 'Crawl-delay: 2.5' ||
         chr(10) || 'Disallow: /private/' || chr(10) ||
         'Allow: /private/pub/' || chr(10) || chr(10) ||
         'User-agent: *' || chr(10) || 'Crawl-delay: 10' || chr(10) ||
         'Disallow: /all/' || chr(10)
       WHEN (substr(source, 4)::INT % 3) = 1 THEN
         '# hi' || chr(10) || 'User-agent: *' || chr(10) ||
         'Disallow: /p' || chr(10) || 'Sitemap: https://x/s.xml' ||
         chr(10) || 'Disallow:' || chr(10)
       ELSE
         'Crawl-delay: oops' || chr(10) || 'Disallow: /orphan/' ||
         chr(10) || 'User-agent: *' || chr(10) || 'Allow: /ok/' ||
         chr(10) || 'Disallow: /no/' || chr(10) || 'Crawl-delay: 7' ||
         chr(10) || 'Sitemap: https://y/z.xml' || chr(10) ||
         'Sitemap: relative/no' || chr(10) END) AS txt FROM documents),
    l0 AS (SELECT host, generate_subscripts(ls, 1)::BIGINT AS pos,
        unnest(ls) AS raw
      FROM (SELECT host, string_split(txt, chr(10)) AS ls FROM r0)),
    l1 AS (SELECT host, pos,
        lower(trim(regexp_extract(c, '^([^:]+):', 1))) AS key,
        trim(regexp_replace(c, '^[^:]+:', '')) AS val
      FROM (SELECT host, pos,
        trim(regexp_replace(raw, '#.*$', '')) AS c FROM l0))"""

  /** The group-numbering + agent-fallback replica over `l1` — group
    * identity is computed over the RUN-NUMBERING line set
    * (user-agent/allow/disallow/crawl-delay plus sitemap, which is
    * never emitted as a rule but still ENDS a user-agent run — r19
    * ADVICE), matching Web.applicableRuleLines; consumers filter the
    * emitted rule kind in their own rr CTE. */
  private def robotsGroupedSql(): String =
    s"""l2 AS (SELECT * FROM l1 WHERE key IN
      ('user-agent', 'allow', 'disallow', 'crawl-delay', 'sitemap')),
    l3 AS (SELECT *, (key = 'user-agent') AS isua,
        coalesce(lag(key = 'user-agent') OVER (
          PARTITION BY host ORDER BY pos), false) AS prevua FROM l2),
    l4 AS (SELECT *, sum(CASE WHEN isua AND NOT prevua
          THEN 1 ELSE 0 END) OVER (PARTITION BY host ORDER BY pos
          ROWS UNBOUNDED PRECEDING) AS gid FROM l3),
    l5 AS (SELECT * FROM l4 WHERE gid > 0),
    g AS (SELECT host, gid,
        max(CASE WHEN lower(val) = '*' THEN 1 ELSE 0 END) AS star,
        max(CASE WHEN lower(val) = 'graftbot' THEN 1 ELSE 0 END) AS ex
      FROM l5 WHERE isua GROUP BY 1, 2),
    he AS (SELECT host, max(ex) AS hex FROM g GROUP BY 1)"""

  /** The normalizeHost replica applied to a column `b2` that already
    * lowercased/trimmed/de-dotted. */
  private def normHostSql(b2: String): String =
    s"""CASE WHEN len(string_split(
          regexp_replace($b2, '^(www\\.)+', ''), '.')) >= 2
        THEN regexp_replace($b2, '^(www\\.)+', '')
        ELSE $b2 END"""

  /** Literal expectation shared by q_warc_read (whole file) and
    * q_warc_split (per-record gz members through the split sidecar) —
    * identical rows by construction. */
  private val warcReadOracle: String =
    """SELECT * FROM (VALUES
         (0::BIGINT, 'warcinfo', NULL::VARCHAR, -1::BIGINT, NULL::VARCHAR,
          'software: graft-fixture', 0::BIGINT),
         (1::BIGINT, 'response', 'https://www.Example.com:443/a?utm_x=1',
          200::BIGINT, 'https://example.com/a', 'hello & crawl', 0::BIGINT),
         (2::BIGINT, 'request', 'https://www.Example.com:443/a?utm_x=1',
          -1::BIGINT, 'https://example.com/a',
          'GET /a HTTP/1.1' || chr(10) || 'Host: example.com', 0::BIGINT),
         (3::BIGINT, NULL::VARCHAR, NULL::VARCHAR, -1::BIGINT,
          NULL::VARCHAR, '', 1::BIGINT)
        ) t(idx, wtype, uri, status, curl, txt, has_err)"""

  val oracleSql: Map[String, String] = Map(
    "q_domain_rank" -> domainRankSql(4),

    "q_crawl_budget" ->
      s"""WITH ranks AS (SELECT * FROM (${domainRankSql(4)})),
         m AS (SELECT dom, (rank * 1048576.0)::BIGINT AS mass FROM ranks),
         p AS (SELECT dom, (mass::DOUBLE * mass::DOUBLE) AS pw FROM m),
         z AS (SELECT sum(pw) AS zz FROM p)
         SELECT dom, floor(100000 * pw / zz)::BIGINT AS budget
         FROM p, z""",

    "q_url_canon" ->
      s"""WITH $urlFixtureWebSql, $urlCanonSql, $regDomainSql
         SELECT doc_id, curl, host, dom FROM rd2""",

    "q_url_dedup" ->
      s"""WITH $urlFixtureDedupSql, $urlCanonSql
         SELECT curl, doc_id, n_chars FROM (
           SELECT curl, doc_id, n_chars, row_number() OVER (
             PARTITION BY curl ORDER BY n_chars DESC, doc_id) AS rn
           FROM canon) WHERE rn = 1""",

    "q_domain_cap" ->
      s"""WITH $urlFixtureWebSql, $urlCanonSql, $regDomainSql
         SELECT dom, doc_id, n_chars FROM (
           SELECT dom, doc_id, n_chars, row_number() OVER (
             PARTITION BY dom ORDER BY n_chars DESC, doc_id) AS rn
           FROM rd2) WHERE rn <= 3""",

    "q_url_blocklist" ->
      s"""WITH $urlFixtureWebSql, $urlCanonSql,
         bl(d) AS (VALUES ('src3-news.com'), ('src7-news.com'),
           ('blogspot.co.uk'), ('cdn.media.src5-news.com'),
           ('nope.example.org'))
         SELECT doc_id, host FROM canon c
         WHERE NOT EXISTS (SELECT 1 FROM bl
           WHERE c.host = bl.d OR c.host LIKE '%.' || bl.d)""",

    "q_url_index_drop" ->
      s"""WITH $urlFixtureDedupSql, $urlCanonSql
         SELECT doc_id FROM canon
         WHERE doc_id >= 400 AND curl NOT IN (
           SELECT curl FROM canon WHERE doc_id < 100)""",

    "q_funnel" ->
      s"""WITH t AS (SELECT doc_id, n_chars, lang,
           list_filter($W, x -> len(x) > 0) AS w FROM documents),
         m AS (SELECT n_chars, lang,
           (len(w) > 0 AND len(w) >= 50 AND len(w) <= 100000
            AND list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) >= 3.0
            AND list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) <= 4.5
            AND len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0
              / len(w) >= 0.8
            AND ((CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END) +
                 (CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)) >= 1
           ) AS keep FROM t),
         f AS (SELECT (n_chars >= 80) AS c1,
           (n_chars >= 80 AND lang IN ('en', 'de', 'fr')) AS c2,
           (n_chars >= 80 AND lang IN ('en', 'de', 'fr') AND keep) AS c3
          FROM m)
         SELECT 'input' AS stage, 0::BIGINT AS stage_idx,
           count(*)::BIGINT AS survivors, 0::BIGINT AS dropped_here FROM f
         UNION ALL SELECT 'length', 1, sum(c1::INT)::BIGINT,
           (count(*) - sum(c1::INT))::BIGINT FROM f
         UNION ALL SELECT 'lang', 2, sum(c2::INT)::BIGINT,
           (sum(c1::INT) - sum(c2::INT))::BIGINT FROM f
         UNION ALL SELECT 'quality', 3, sum(c3::INT)::BIGINT,
           (sum(c2::INT) - sum(c3::INT))::BIGINT FROM f""",

    "q_robots_parse" ->
      s"""WITH $robotsDocSql,
      ${robotsGroupedSql()},
      rr AS (SELECT regexp_replace(lower(trim(l5.host)), '\\.+$$', '') AS b2,
          val AS prefix, (key = 'allow')::BIGINT AS allow
        FROM l5 JOIN g USING (host, gid) JOIN he USING (host)
        WHERE NOT isua AND len(val) > 0 AND key IN ('allow', 'disallow')
          AND (CASE WHEN hex = 1 THEN ex = 1 ELSE star = 1 END))
      SELECT ${normHostSql("b2")} AS host, prefix, allow FROM rr""",

    "q_robots_delay" ->
      s"""WITH $robotsDocSql,
      ${robotsGroupedSql()},
      rr AS (SELECT regexp_replace(lower(trim(l5.host)), '\\.+$$', '') AS b2,
          TRY_CAST(val AS DOUBLE) AS delay
        FROM l5 JOIN g USING (host, gid) JOIN he USING (host)
        WHERE NOT isua AND len(val) > 0 AND key = 'crawl-delay'
          AND (CASE WHEN hex = 1 THEN ex = 1 ELSE star = 1 END)),
      rd AS (SELECT b2, max(delay) AS crawl_delay FROM rr
        WHERE delay IS NOT NULL AND delay >= 0 GROUP BY 1)
      SELECT ${normHostSql("b2")} AS host, crawl_delay FROM rd""",

    "q_robots_sitemap" ->
      s"""WITH $robotsDocSql,
      sm AS (SELECT DISTINCT
          regexp_replace(lower(trim(host)), '\\.+$$', '') AS b2,
          val AS sitemap
        FROM l1 WHERE key = 'sitemap'
          AND regexp_matches(val, '^[a-zA-Z][a-zA-Z0-9+.-]*://'))
      SELECT ${normHostSql("b2")} AS host, sitemap FROM sm""",

    "q_robots" ->
      s"""WITH $urlFixtureWebSql, $urlCanonSql,
         pp AS (SELECT doc_id, host,
           CASE WHEN len(pathq) = 0 THEN '/' ELSE pathq END AS rpath
          FROM c5),
         rb(rhost, prefix, allow) AS (VALUES
           ('src3-news.com', '/', false),
           ('src3-news.com', '/de/', true),
           ('src5.example.com', '/fr/', false),
           ('src7.blogspot.co.uk', '/', false)),
         m AS (SELECT p.doc_id, r.prefix, r.allow
           FROM pp p JOIN rb r ON p.host = r.rhost
           WHERE starts_with(p.rpath, r.prefix)),
         v AS (SELECT doc_id, allow FROM (
           SELECT doc_id, allow, row_number() OVER (PARTITION BY doc_id
             ORDER BY len(prefix) DESC, allow DESC) AS rn FROM m)
           WHERE rn = 1)
         SELECT p.doc_id, p.host FROM pp p LEFT JOIN v USING (doc_id)
         WHERE v.allow IS NULL OR v.allow""",

    "q_robots_wildcard" ->
      s"""WITH $urlFixtureWebSql, $urlCanonSql,
         pp AS (SELECT doc_id, host,
           CASE WHEN len(pathq) = 0 THEN '/' ELSE pathq END AS rpath
          FROM c5),
         rb(rhost, rule, allow) AS (VALUES
           ('src4-news.com', '/*', false),
           ('src4-news.com', '/de/*', true),
           ('src6.example.com', '/*/Doc/*3', false),
           ('src7.blogspot.co.uk', '/*c/7$$', false)),
         rx AS (SELECT rhost, rule, allow,
           '^' || replace(regexp_replace(
             CASE WHEN rule LIKE '%$$' THEN substr(rule, 1, len(rule) - 1)
                  ELSE rule END,
             '([.\\[\\]{}()+?^$$|\\\\])', '\\\\\\1', 'g'), '*', '.*') ||
           (CASE WHEN rule LIKE '%$$' THEN '$$' ELSE '' END) AS pat
          FROM rb),
         m AS (SELECT p.doc_id, r.rule, r.allow
           FROM pp p JOIN rx r ON p.host = r.rhost
           WHERE regexp_matches(p.rpath, r.pat)),
         v AS (SELECT doc_id, allow FROM (
           SELECT doc_id, allow, row_number() OVER (PARTITION BY doc_id
             ORDER BY len(rule) DESC, allow DESC) AS rn FROM m)
           WHERE rn = 1)
         SELECT p.doc_id, p.host FROM pp p LEFT JOIN v USING (doc_id)
         WHERE v.allow IS NULL OR v.allow""",

    "q_web_e2e" ->
      s"""WITH u0 AS (SELECT doc_id, n_chars,
         'https://' || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) ||
         source || '-news.com' ||
         (CASE WHEN doc_id % 2 = 1 THEN ':443' ELSE '' END) ||
         '/p/' || (doc_id % 100)::VARCHAR ||
         '?utm_s=' || doc_id::VARCHAR || '&a=1' AS url
        FROM documents WHERE n_chars >= 80),
       $urlCanonSql,
       dd AS (SELECT doc_id, n_chars, host FROM (
         SELECT doc_id, n_chars, host, row_number() OVER (
           PARTITION BY curl ORDER BY n_chars DESC, doc_id) AS rn
         FROM canon) WHERE rn = 1),
       bl AS (SELECT doc_id, n_chars, host FROM dd
         WHERE host NOT IN ('src3-news.com', 'src7-news.com')
           AND host NOT LIKE '%.src3-news.com'
           AND host NOT LIKE '%.src7-news.com')
       SELECT host AS dom, doc_id, n_chars FROM (
         SELECT doc_id, n_chars, host, row_number() OVER (
           PARTITION BY host ORDER BY n_chars DESC, doc_id) AS rn
         FROM bl) WHERE rn <= 5""",

    "q_crawl_e2e" ->
      """SELECT * FROM (VALUES
         ('https://a.com/p1?x=1', 'alpha one, the better capture', 29::BIGINT),
         ('https://b.com/ok', 'bravo page', 10::BIGINT)
        ) t(curl, txt, n)""",

    "q_outlinks" ->
      """WITH h AS (SELECT doc_id,
        CASE WHEN doc_id % 6 = 0 THEN 'https://static.hub.org'
             ELSE 'https://' || source || '-news.com' END AS bauthu,
        CASE WHEN doc_id % 6 = 0 THEN '/lib/'
             ELSE '/sec/' || (doc_id % 7)::VARCHAR || '/' END AS bdir,
        '<html><body><h1>' || source || '</h1>' ||
        (CASE WHEN doc_id % 6 = 0
              THEN '<base href="https://static.hub.org/lib/">'
              ELSE '' END) ||
        '<a href="https://partner' || (doc_id % 5)::VARCHAR ||
          '.com/x?id=' || doc_id::VARCHAR || '">p</a>' ||
        '<a href=''//cdn-assets.net/l' || (doc_id % 3)::VARCHAR ||
          '''>c</a>' ||
        '<a href=/local/' || (doc_id % 7)::VARCHAR || '>l</a>' ||
        (CASE WHEN doc_id % 2 = 0 THEN '<a href="rel/page2.html">r</a>'
              ELSE '<a href="./sib.html#frag">s</a>' END) ||
        '<a href="mailto:x@y.com">m</a><a href="#top">t</a>' ||
        (CASE WHEN doc_id % 4 = 0 THEN '<A HREF="HTTP://Upper.org/Y">u</A>'
              ELSE '' END) ||
        '</body></html>' AS html
       FROM documents),
      r AS (SELECT doc_id, bauthu, bdir, regexp_extract_all(html,
        '(?i)<a\b[^>]*?\shref\s*=\s*("[^"]*"|''[^'']*''|[^\s>]+)', 1)
        AS raws FROM h),
      v AS (SELECT doc_id, bauthu, bdir, list_transform(raws,
        x -> trim(regexp_replace(regexp_replace(x, '^["'']|["'']$', '', 'g'),
          '#.*$', ''))) AS vals FROM r),
      res AS (SELECT doc_id, list_filter(list_transform(vals, x ->
        CASE WHEN regexp_matches(x, '^(?i)https?://') THEN x
             WHEN regexp_matches(x, '^[a-zA-Z][a-zA-Z0-9+.-]*:') THEN NULL
             WHEN starts_with(x, '//') THEN 'https:' || x
             WHEN starts_with(x, '/') THEN bauthu || x
             WHEN len(x) > 0 THEN bauthu || bdir ||
               regexp_replace(x, '^(\./)+', '')
             ELSE NULL END), x -> x IS NOT NULL) AS ls FROM v)
      SELECT doc_id, generate_subscripts(ls, 1)::BIGINT - 1 AS link_idx,
        unnest(ls) AS link FROM res""",

    "q_anchors" ->
      s"""WITH $anchorsReplicaCtes
      SELECT doc_id, a_idx, a.href AS href, a.atext AS a_text FROM sel""",

    "q_anchor_corpus" ->
      s"""WITH $anchorsReplicaCtes,
      pg AS (SELECT s.doc_id, d.source || '-news.com' AS src,
          s.a.href AS href, s.a.atext AS anchor_text
        FROM sel s JOIN documents d USING (doc_id)),
      d1 AS (SELECT src, anchor_text, regexp_replace(regexp_replace(
          lower(regexp_extract(regexp_replace(regexp_replace(href,
            '#.*$$', ''), '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
            '^([^/?]*)', 1)), '^[^@]*@', ''), ':[0-9]+$$', '') AS hp
        FROM pg),
      d2 AS (SELECT src, anchor_text,
          regexp_replace(hp, '\\.+$$', '') AS h0 FROM d1),
      d3 AS (SELECT src, anchor_text,
          CASE WHEN len(string_split(
              regexp_replace(h0, '^(www\\.)+', ''), '.')) >= 2
            THEN regexp_replace(h0, '^(www\\.)+', '')
            ELSE h0 END AS host FROM d2),
      d4 AS (SELECT src, anchor_text, string_split(host, '.') AS labs,
          host FROM d3),
      d5 AS (SELECT src, anchor_text,
          ${rdomCaseSql("host")} AS dst FROM d4),
      pf AS (SELECT * FROM d5
        WHERE src IS NOT NULL AND dst IS NOT NULL
          AND len(src) > 0 AND len(dst) > 0
          AND len(anchor_text) > 0 AND src <> dst),
      g1 AS (SELECT dst AS domain, anchor_text, src, count(*) AS n
        FROM pf GROUP BY 1, 2, 3)
      SELECT domain, anchor_text, count(*)::BIGINT AS n_src,
        sum(least(n, 3))::BIGINT AS votes
      FROM g1 GROUP BY 1, 2""",

    "q_crawl_edges" ->
      """SELECT * FROM (VALUES
         ('alpha.com', 'beta.com', 1::BIGINT),
         ('alpha.com', 'gamma.com', 1::BIGINT),
         ('beta.com', 'alpha.com', 2::BIGINT)
        ) t(src, dst, n)""",

    "q_crawl_graph" ->
      s"""WITH edges(src, dst) AS (VALUES
         ('alpha.com', 'beta.com'), ('alpha.com', 'gamma.com'),
         ('beta.com', 'alpha.com'), ('beta.com', 'alpha.com')),
       ${pageRankUnrolledSql(3)}""",

    "q_crawl_schedule" ->
      s"""WITH edges(src, dst) AS (VALUES
         ('alpha.com', 'beta.com'), ('alpha.com', 'gamma.com'),
         ('beta.com', 'alpha.com'), ('beta.com', 'alpha.com')),
       ${pageRankCtesSql(3)},
       m AS (SELECT node AS dom, (rank * 1048576.0)::BIGINT AS mass
         FROM pr3),
       p AS (SELECT dom, (mass::DOUBLE * mass::DOUBLE) AS pw FROM m),
       z AS (SELECT sum(pw) AS zz FROM p),
       b AS (SELECT dom, floor(10000 * pw / zz)::BIGINT AS budget
         FROM p, z),
       d(host, crawl_delay) AS (VALUES
         ('alpha.com', 2.0), ('beta.com', 0.5))
       SELECT b.dom, b.budget,
         coalesce(d.crawl_delay, 1.0) AS delay,
         b.budget::DOUBLE * coalesce(d.crawl_delay, 1.0) AS est_seconds
       FROM b LEFT JOIN d ON b.dom = d.host""",

    "q_wet_read" ->
      """SELECT * FROM (VALUES
         ('https://a.com/page-one',
          'alpha page text' || chr(10) || 'second line', 27::BIGINT),
         ('https://b.com/two', 'bravo extracted text', 20::BIGINT)
        ) t(url, text, n_chars)""",

    "q_warc_encoded" ->
      """SELECT * FROM (VALUES
         ('https://enc.example/chunked', 200::BIGINT,
          'chunk one' || chr(10) || 'chunk two', 0::BIGINT),
         ('https://enc.example/gzip', 200::BIGINT, 'gzipped page',
          0::BIGINT),
         ('https://enc.example/both', 200::BIGINT, 'both paths decode',
          0::BIGINT),
         ('https://enc.example/badchunk', 200::BIGINT,
          'ZZ' || chr(10) || 'raw', 0::BIGINT)
        ) t(uri, status, txt, has_err)""",

    "q_warc_charset" ->
      """SELECT * FROM (VALUES
         ('https://cs.example/latin1', 'café crème', 10::BIGINT),
         ('https://cs.example/meta', 'smart “quotes”', 14::BIGINT),
         ('https://cs.example/unknown', 'plain ascii', 11::BIGINT),
         ('https://cs.example/utf8', 'über — ok', 9::BIGINT),
         ('https://cs.example/bom', 'naïve', 5::BIGINT),
         -- the CHARSET is what this row certifies (héllo intact, no
         -- mojibake); htmlToText's tag strip eats '<!--<meta …>' to
         -- the first '>' and leaves '-->' as text — the documented
         -- no-comment-handling heuristic, reproduced literally
         ('https://cs.example/commented-meta', '--> héllo', 9::BIGINT)
        ) t(url, text, n_chars)""",

    "q_sitemap_parse" ->
      """SELECT * FROM (VALUES
         ('https://a.com/sitemap.xml', 'https://a.com/p1',
          '2026-01-01', false),
         ('https://a.com/sitemap.xml', 'https://a.com/p2?x=1&y=2',
          NULL::VARCHAR, false),
         ('https://a.com/sitemap_index.xml', 'https://a.com/s1.xml.gz',
          '2026-02-02T00:00:00Z', true),
         ('https://a.com/sitemap_index.xml', 'HTTPS://A.com/s2.xml',
          NULL::VARCHAR, true)
        ) t(sitemap_url, loc, lastmod, is_child_sitemap)""",

    "q_wat_read" ->
      """SELECT * FROM (VALUES
         ('https://alpha.com/news/a1', 200::BIGINT, 0::BIGINT, 'A@/href',
          'https://beta.com/x', 'https://beta.com/x', 0::BIGINT),
         ('https://alpha.com/news/a1', 200::BIGINT, 1::BIGINT, 'A@/href',
          '/promo', 'https://alpha.com/promo', 0::BIGINT),
         ('https://alpha.com/news/a1', 200::BIGINT, 2::BIGINT, 'A@/href',
          'rel/two', 'https://alpha.com/news/rel/two', 0::BIGINT),
         ('https://alpha.com/news/a1', 200::BIGINT, 3::BIGINT, 'A@/href',
          '//gamma.com/lib', 'https://gamma.com/lib', 0::BIGINT),
         ('https://alpha.com/news/a1', 200::BIGINT, 4::BIGINT, 'A@/href',
          'mailto:x@alpha.com', NULL::VARCHAR, 0::BIGINT),
         ('https://alpha.com/news/a1', 200::BIGINT, 5::BIGINT, 'IMG@/src',
          'https://assets.cdn-zeta.com/logo.png',
          'https://assets.cdn-zeta.com/logo.png', 0::BIGINT),
         ('https://beta.com/dir/b1', 200::BIGINT, 0::BIGINT, 'A@/href',
          'https://alpha.com/one', 'https://alpha.com/one', 0::BIGINT),
         ('https://beta.com/dir/b1', 200::BIGINT, 1::BIGINT, 'A@/href',
          'HTTPS://ALPHA.com/two?utm_s=9', 'HTTPS://ALPHA.com/two?utm_s=9',
          0::BIGINT),
         ('https://beta.com/dir/b1', 200::BIGINT, 2::BIGINT, 'A@/href',
          '../up', 'https://beta.com/dir/../up', 0::BIGINT),
         ('https://beta.com/dir/b1', 200::BIGINT, 3::BIGINT, 'A@/href',
          'javascript:void(0)', NULL::VARCHAR, 0::BIGINT),
         ('https://gamma.com/g1', 200::BIGINT, 0::BIGINT, 'A@/href',
          '#sec', NULL::VARCHAR, 0::BIGINT),
         ('https://delta.com/dead', 404::BIGINT, 0::BIGINT, 'A@/href',
          'https://alpha.com/not-counted', 'https://alpha.com/not-counted',
          0::BIGINT),
         ('https://mal.example/x', NULL::BIGINT, NULL::BIGINT,
          NULL::VARCHAR, NULL::VARCHAR, NULL::VARCHAR, 1::BIGINT)
        ) t(url, http_status, link_idx, link_path, raw_href, href,
            has_err)""",

    "q_frontier" ->
      s"""WITH $urlFixtureWebSql, $urlCanonSql, $regDomainSql,
         b(bdom, budget) AS (VALUES
           ('src1-news.com', 5), ('src3-news.com', 2),
           ('example.com', 7), ('blogspot.co.uk', 3)),
         dl(dhost, delay) AS (VALUES
           ('src1-news.com', 2.0), ('example.com', 0.5)),
         j AS (SELECT rd2.doc_id, rd2.n_chars, rd2.dom, b.budget
           FROM rd2 JOIN b ON rd2.dom = b.bdom),
         r AS (SELECT dom, doc_id, budget, row_number() OVER (
             PARTITION BY dom ORDER BY n_chars DESC, doc_id) AS rank
           FROM j),
         f AS (SELECT dom, doc_id, rank FROM r WHERE rank <= budget)
         SELECT f.dom, f.doc_id, f.rank::BIGINT AS rank,
           (f.rank - 1)::DOUBLE * coalesce(dl.delay, 1.0)::DOUBLE AS fetch_at
         FROM f LEFT JOIN dl ON f.dom = dl.dhost""",

    "q_warc_read" -> warcReadOracle,

    // the SAME archive through per-record gzip members + the split
    // sidecar: identical rows prove the range-read path end to end
    "q_warc_split" -> warcReadOracle,

    "q_html_extract" ->
      """WITH h0 AS (SELECT doc_id,
        '<html><head><title>' || lang || '</title>' ||
        '<script type="text/javascript">var x = 1; if (x<2) { x = 3; }</script>' ||
        '<style>.c { color: red; }</style></head><body><h1>' || source || '</h1>' ||
        '<p>' || substr(text, 1, 100) || '</p>' ||
        (CASE WHEN doc_id % 4 = 0 THEN '<br>extra &amp; line<br/>' ELSE '' END) ||
        '<div class="main">' || substr(text, 101, 120) ||
        (CASE WHEN doc_id % 3 = 0 THEN ' &nbsp;tail&#39;s &lt;ok&gt;' ELSE '' END) ||
        '</div><ul><li>one</li><li>two</li></ul></body></html>' AS html
       FROM documents),
      e1a AS (SELECT doc_id, regexp_replace(html,
        '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h0),
      e1 AS (SELECT doc_id, regexp_replace(t,
        '(?is)<(script|style)[^>]*>.*$', ' ', 'g') AS t FROM e1a),
      e2 AS (SELECT doc_id, regexp_replace(t,
        '(?i)<br[^>]*>|</p>|</div>|</li>|</h[1-6]>|</tr>|</table>|</ul>|</ol>',
        chr(10), 'g') AS t FROM e1),
      e3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM e2),
      e4 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(t,
        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        '&#39;', chr(39)), '&amp;', '&') AS t FROM e3),
      e5 AS (SELECT doc_id, array_to_string(list_filter(list_transform(
        string_split(t, chr(10)),
        x -> trim(regexp_replace(x, '[ \t\r]+', ' ', 'g'))),
        x -> len(x) > 0), chr(10)) AS txt FROM e4)
      SELECT doc_id, txt,
        len(string_split(txt, chr(10)))::BIGINT AS n_lines FROM e5""",

    "q_url_index_refresh" ->
      s"""WITH $urlFixtureDedupSql, $urlCanonSql,
         corpusk AS (SELECT DISTINCT curl FROM canon WHERE doc_id < 100),
         adm1 AS (SELECT DISTINCT curl FROM canon
           WHERE doc_id BETWEEN 300 AND 349
             AND curl NOT IN (SELECT curl FROM corpusk))
         SELECT doc_id FROM canon
         WHERE doc_id >= 400
           AND curl NOT IN (SELECT curl FROM corpusk)
           AND curl NOT IN (SELECT curl FROM adm1)""",

    "q_semantic_neardup" ->
      s"""WITH $semanticAssignSql
         SELECT cid, id_a, id_b, round(rawsim, 4) AS sim
         FROM sempairs ORDER BY id_a, id_b""",

    "q_semantic_drop" ->
      s"""WITH RECURSIVE $semanticAssignSql,
         edges AS (SELECT id_a AS src, id_b AS dst FROM sempairs
                   UNION SELECT id_b, id_a FROM sempairs),
         reach AS (
           SELECT src AS id, src AS label FROM edges
           UNION
           SELECT e2.src AS id, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id)
         SELECT vec_id FROM embeddings
         WHERE vec_id NOT IN (
           SELECT id FROM (SELECT id, min(label) AS keep FROM reach GROUP BY 1)
           WHERE id != keep)
         ORDER BY vec_id""",

    // the PQ tier's final semantics are EXACTLY the vector tier's
    // (calibrated-margin screen + exact re-verify), so the same SQL
    // certifies it — the screen is internal query machinery, like the
    // bloom phase of q_bloom_decontam
    "q_incremental_semantic_pq" ->
      s"""WITH $semanticAssignCoreSql,
         b AS (SELECT * FROM assign WHERE vec_id % 5 = 0),
         c AS (SELECT * FROM assign WHERE vec_id % 5 <> 0)
         SELECT b.cid, b.vec_id AS id_batch, c.vec_id AS id_corpus,
           round(list_dot_product(e1.v, e2.v) / (e1.n * e2.n), 4) AS sim
         FROM b JOIN c USING (cid)
         JOIN e e1 ON e1.vec_id = b.vec_id
         JOIN e e2 ON e2.vec_id = c.vec_id
         WHERE list_dot_product(e1.v, e2.v) / (e1.n * e2.n) >= 0.4
         ORDER BY 2, 3""",

    // within-batch SemDeDup CC survivors, then the vs-index drop —
    // the embedding-modality admission composition
    "q_semantic_e2e" ->
      s"""WITH RECURSIVE $semanticAssignCoreSql,
         b AS (SELECT * FROM assign WHERE vec_id % 5 = 0),
         bpairs AS (SELECT a1.vec_id AS id_a, a2.vec_id AS id_b
           FROM b a1 JOIN b a2 USING (cid)
           JOIN e e1 ON e1.vec_id = a1.vec_id
           JOIN e e2 ON e2.vec_id = a2.vec_id
           WHERE a1.vec_id < a2.vec_id
             AND list_dot_product(e1.v, e2.v) / (e1.n * e2.n) >= 0.4),
         edges AS (SELECT id_a AS src, id_b AS dst FROM bpairs
                   UNION SELECT id_b, id_a FROM bpairs),
         reach AS (
           SELECT src AS id, src AS label FROM edges
           UNION
           SELECT e2.src AS id, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id),
         surv AS (SELECT vec_id FROM b WHERE vec_id NOT IN (
           SELECT id FROM (SELECT id, min(label) AS keep FROM reach GROUP BY 1)
           WHERE id != keep)),
         c AS (SELECT * FROM assign WHERE vec_id % 5 <> 0),
         dropped AS (SELECT DISTINCT s.vec_id
           FROM surv s JOIN b ON b.vec_id = s.vec_id
           JOIN c ON b.cid = c.cid
           JOIN e e1 ON e1.vec_id = s.vec_id
           JOIN e e2 ON e2.vec_id = c.vec_id
           WHERE list_dot_product(e1.v, e2.v) / (e1.n * e2.n) >= 0.4)
         SELECT vec_id FROM surv
         WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
         ORDER BY vec_id""",

    // batch side re-ranked at rk <= 2 (top-2 nearest cells); corpus
    // side stays the index's nearest-1 assignment
    "q_incremental_semantic_probe2" ->
      s"""WITH $semanticAssignCoreSql,
         b2 AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id % 5 = 0)
           WHERE rk <= 2),
         c AS (SELECT * FROM assign WHERE vec_id % 5 <> 0)
         SELECT c.cid, b2.vec_id AS id_batch, c.vec_id AS id_corpus,
           round(list_dot_product(e1.v, e2.v) / (e1.n * e2.n), 4) AS sim
         FROM b2 JOIN c ON b2.cid = c.cid
         JOIN e e1 ON e1.vec_id = b2.vec_id
         JOIN e e2 ON e2.vec_id = c.vec_id
         WHERE list_dot_product(e1.v, e2.v) / (e1.n * e2.n) >= 0.4
         ORDER BY 2, 3""",

    "q_incremental_semantic" ->
      s"""WITH $semanticAssignCoreSql,
         b AS (SELECT * FROM assign WHERE vec_id % 5 = 0),
         c AS (SELECT * FROM assign WHERE vec_id % 5 <> 0)
         SELECT b.cid, b.vec_id AS id_batch, c.vec_id AS id_corpus,
           round(list_dot_product(e1.v, e2.v) / (e1.n * e2.n), 4) AS sim
         FROM b JOIN c USING (cid)
         JOIN e e1 ON e1.vec_id = b.vec_id
         JOIN e e2 ON e2.vec_id = c.vec_id
         WHERE list_dot_product(e1.v, e2.v) / (e1.n * e2.n) >= 0.4
         ORDER BY 2, 3""",

    "q_embed_neardup" ->
      lshNearDupSql(dims = 64, planes = 16, bandPlanes = 4, threshold = 0.4),

    "q_embed_neardup_groups" ->
      lshNearDupGroupsSql(dims = 64, planes = 16, bandPlanes = 4, threshold = 0.4),

    "q_embed_drop" ->
      s"""SELECT vec_id FROM embeddings
         WHERE vec_id NOT IN (
           SELECT vec_id FROM (
             ${lshNearDupGroupsSql(dims = 64, planes = 16, bandPlanes = 4, threshold = 0.4)})
           WHERE vec_id != keep_id)
         ORDER BY vec_id""",
    "q_doc_tokens" ->
      s"""SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0
         ELSE len($W) END::BIGINT AS n_tokens
         FROM documents ORDER BY doc_id""",

    "q_doc_quality" ->
      s"""SELECT doc_id, n_tokens,
         floor((len_nws / greatest(n_tokens, 1)) * 10000 + 0.5) / 10000 AS avg_tok_len,
         floor((n_stop / greatest(n_tokens, 1)) * 10000 + 0.5) / 10000 AS stop_ratio,
         floor((n_punct / greatest(len_nws, 1)) * 10000 + 0.5) / 10000 AS punct_ratio,
         floor((n_digit / greatest(len_nws, 1)) * 10000 + 0.5) / 10000 AS digit_ratio,
         floor((least(n_tokens / 100.0, 1.0) * 0.5
           + (1.0 - n_stop / greatest(n_tokens, 1)) * 0.3
           + (1.0 - n_punct / greatest(len_nws, 1)) * 0.2) * 10000 + 0.5) / 10000 AS quality
         FROM (SELECT doc_id,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS n_tokens,
           len(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE AS len_nws,
           len(list_filter($W, t -> list_contains(['a','the','and','of','to','is','in'], t)))::DOUBLE AS n_stop,
           len(regexp_replace(regexp_replace(lower(text), '\\s+', '', 'g'), '[a-z0-9]', '', 'g'))::DOUBLE AS n_punct,
           len(regexp_replace(regexp_replace(lower(text), '\\s+', '', 'g'), '[^0-9]', '', 'g'))::DOUBLE AS n_digit
           FROM documents) ORDER BY doc_id""",

    "q_doc_subwords" ->
      s"""SELECT doc_id, CASE WHEN len(trim(text)) = 0 THEN 0
         ELSE len($W) END::BIGINT AS n_ws_tokens,
         len(regexp_extract_all(lower(text),
           '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+'))::BIGINT AS n_subwords
         FROM documents ORDER BY doc_id""",

    // blob slicing certified on the hex view (DuckDB 1.0 has no BLOB
    // substring); hex-then-slice == slice-then-hex byte-for-byte
    "q_frames" ->
      """SELECT doc_id, frame_idx,
         substring(hex(media) FROM (frame_idx * 64 + 1)::INT FOR 64) AS frame_hex
         FROM (SELECT doc_id, encode(text) AS media,
           unnest(range(0, greatest(octet_length(encode(text)) // 32, 1), 2))::BIGINT AS frame_idx
           FROM documents)
         ORDER BY doc_id, frame_idx""",

    "q_lang_id" ->
      s"""SELECT doc_id,
         CASE WHEN s_en = g AND s_en > 0 THEN 'en'
              WHEN s_es = g AND s_es > 0 THEN 'es'
              WHEN s_de = g AND s_de > 0 THEN 'de'
              WHEN s_fr = g AND s_fr > 0 THEN 'fr'
              WHEN s_zh = g AND s_zh > 0 THEN 'zh'
              ELSE 'und' END AS pred_lang
         FROM (SELECT doc_id,
           len(list_filter($W, t -> list_contains(['the','a','is','and'], t))) AS s_en,
           len(list_filter($W, t -> list_contains(['el','la','es','que'], t))) AS s_es,
           len(list_filter($W, t -> list_contains(['der','die','und','ist'], t))) AS s_de,
           len(list_filter($W, t -> list_contains(['le','les','est','une'], t))) AS s_fr,
           len(list_filter($W, t -> list_contains(['的','是','了'], t))) AS s_zh,
           greatest(
             len(list_filter($W, t -> list_contains(['the','a','is','and'], t))),
             len(list_filter($W, t -> list_contains(['el','la','es','que'], t))),
             len(list_filter($W, t -> list_contains(['der','die','und','ist'], t))),
             len(list_filter($W, t -> list_contains(['le','les','est','une'], t))),
             len(list_filter($W, t -> list_contains(['的','是','了'], t)))) AS g
           FROM documents) ORDER BY doc_id""",

    "q_fingerprint" ->
      s"""SELECT doc_id,
         md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         list_min(list_transform($SH, s -> md5(s))) AS rfp
         FROM documents ORDER BY doc_id""",

    "q_pii" -> {
      // single source of truth: interpolate the library's own regex /
      // token constants (Java-==-RE2 subset by contract in Pii.scala)
      val cats = graft.ops.Pii.defaults
      val cnts = cats.map(c =>
        s"len(regexp_extract_all(text, '${c.re}'))::BIGINT AS n_${c.name}")
        .mkString(",\n           ")
      val red = cats.foldLeft("text")((acc, c) =>
        s"regexp_replace($acc, '${c.re}', '${c.token}', 'g')")
      val tot = cats.map(c => s"n_${c.name}").mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
           text || ' Contact user' || doc_id::VARCHAR ||
           '@mail.example.com or "u ' || doc_id::VARCHAR ||
           '"@corp.example.com, call 415-555-' ||
           lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
           ' or (628) 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
           ' or +1 206.555.' || lpad(((doc_id * 3) % 10000)::VARCHAR, 4, '0') ||
           ', ip 10.0.' || (doc_id % 256)::VARCHAR || '.' ||
           ((doc_id * 7) % 256)::VARCHAR ||
           ', v6 2001:db8::' || ((doc_id % 9000) + 1000)::VARCHAR ||
           ', ssn 123-45-6789, card 4111 1111 1111 1111.' AS text
           FROM documents),
         c AS (SELECT doc_id, $cnts, md5($red) AS red_hash FROM t)
         SELECT doc_id, n_email, n_card, n_ssn, n_ipv6, n_ip, n_phone,
           $tot AS n_pii, red_hash
         FROM c ORDER BY doc_id"""
    },

    "q_pii_sparse" -> {
      // q_pii's oracle with the injection conditional on doc_id % 50:
      // the oracle scrubs EVERY row unconditionally (DuckDB has no
      // prefilter) — so a hash match here is exactly the claim that
      // the gated Spark path equals the ungated scrub
      val cats = graft.ops.Pii.defaults
      val cnts = cats.map(c =>
        s"len(regexp_extract_all(text, '${c.re}'))::BIGINT AS n_${c.name}")
        .mkString(",\n           ")
      val red = cats.foldLeft("text")((acc, c) =>
        s"regexp_replace($acc, '${c.re}', '${c.token}', 'g')")
      val tot = cats.map(c => s"n_${c.name}").mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
           CASE WHEN doc_id % 50 = 0 THEN
           text || ' Contact user' || doc_id::VARCHAR ||
           '@mail.example.com or "u ' || doc_id::VARCHAR ||
           '"@corp.example.com, call 415-555-' ||
           lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
           ' or (628) 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
           ' or +1 206.555.' || lpad(((doc_id * 3) % 10000)::VARCHAR, 4, '0') ||
           ', ip 10.0.' || (doc_id % 256)::VARCHAR || '.' ||
           ((doc_id * 7) % 256)::VARCHAR ||
           ', v6 2001:db8::' || ((doc_id % 9000) + 1000)::VARCHAR ||
           ', ssn 123-45-6789, card 4111 1111 1111 1111.'
           ELSE text END AS text
           FROM documents),
         c AS (SELECT doc_id, $cnts, md5($red) AS red_hash FROM t)
         SELECT doc_id, n_email, n_card, n_ssn, n_ipv6, n_ip, n_phone,
           $tot AS n_pii, red_hash
         FROM c ORDER BY doc_id"""
    },

    "q_quality_train_infer" -> {
      // the SAME 4-iteration full-batch GD, unrolled: weights snap to
      // exact 2^-20 multiples each step (floor(w·2²⁰+0.5)/2²⁰ — every
      // operation exact double arithmetic), margins are exact sums of
      // grid multiples, so the final margins compare as exact doubles
      val dim = 16
      val iters = 4
      def wStep(k: Int): String = {
        val prev = if (k == 1) "w0" else s"w${k - 1}"
        s"""m$k AS (SELECT f.doc_id, f.y, sum(w.wt) AS m
              FROM feats f JOIN $prev w USING (f) GROUP BY f.doc_id, f.y),
            r$k AS (SELECT doc_id, 1.0/(1.0 + exp(-m)) - y AS r FROM m$k),
            g$k AS (SELECT f.f, sum(r.r) AS g
              FROM feats f JOIN r$k r USING (doc_id) GROUP BY f.f),
            w$k AS (SELECT p.f,
              floor((p.wt - 1.0*coalesce(g.g, 0.0)/(SELECT c FROM n))
                * 1048576.0 + 0.5) / 1048576.0 AS wt
              FROM $prev p LEFT JOIN g$k g USING (f))"""
      }
      s"""WITH toks AS (SELECT doc_id,
             list_filter($W, t -> len(t) > 0) AS w FROM documents),
         labeled AS (SELECT doc_id,
             CASE WHEN len(list_filter(w, x -> x = 'slow')) >
                       len(list_filter(w, x -> x = 'fast'))
               THEN 1.0 ELSE 0.0 END AS y, w
           FROM toks WHERE len(w) > 0),
         feats AS (
           SELECT doc_id, y,
             ('0x' || substr(md5(u), 1, 15))::BIGINT % $dim AS f
           FROM (SELECT doc_id, y, unnest(w) AS u FROM labeled)
           UNION ALL SELECT doc_id, y, $dim AS f FROM labeled),
         n AS (SELECT count(*)::DOUBLE AS c FROM labeled),
         w0 AS (SELECT f::BIGINT AS f, 0.0 AS wt FROM range(${dim + 1}) t(f)),
         ${(1 to iters).map(wStep).mkString(",\n         ")},
         scored AS (SELECT f.doc_id, sum(w.wt) AS margin
           FROM feats f JOIN w$iters w USING (f) GROUP BY f.doc_id)
         SELECT doc_id, margin, (margin >= 0)::BIGINT AS pred
         FROM scored ORDER BY doc_id"""
    },

    "q_mix_corpus" -> {
      val budgetVals = (0 until 20)
        .map(i => s"('src$i', ${400 + 100 * (i % 5)})").mkString(", ")
      s"""WITH b(source, budget) AS (VALUES $budgetVals),
         t AS (SELECT doc_id, source,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS tok,
           md5(source || '§' || doc_id::VARCHAR) AS k FROM documents),
         c AS (SELECT doc_id, source,
           sum(tok) OVER (PARTITION BY source ORDER BY k, doc_id) AS cum
           FROM t)
         SELECT c.doc_id, c.source FROM c JOIN b USING (source)
         WHERE c.cum <= b.budget ORDER BY doc_id"""
    },

    // budgets recomputed in SQL from the same token mass: n_s^2 (1/T=2,
    // exact in double) normalized over sources, floored; then the same
    // hash-ordered inclusive-cumsum prefix rule as q_mix_corpus
    "q_mix_temperature" ->
      s"""WITH t AS (SELECT doc_id, source,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS tok,
           md5(source || '§' || doc_id::VARCHAR) AS k FROM documents),
         n AS (SELECT source, sum(tok)::DOUBLE AS n FROM t GROUP BY 1),
         b AS (SELECT source,
           floor(6000 * power(n, 2.0) /
             (SELECT sum(power(n, 2.0)) FROM n)) AS budget FROM n),
         c AS (SELECT doc_id, source,
           sum(tok) OVER (PARTITION BY source ORDER BY k, doc_id) AS cum
           FROM t)
         SELECT c.doc_id, c.source FROM c JOIN b USING (source)
         WHERE c.cum <= b.budget ORDER BY doc_id""",

    // the composed recipe: temperature budgets (n^2 at T=0.5) feeding
    // the full-pass + remainder rule — both derived from ONE token
    // column, like the Spark side's single tokenize pass
    "q_recipe_e2e" ->
      s"""WITH t AS (SELECT doc_id, source,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS tok,
           md5(source || '§' || doc_id::VARCHAR) AS k FROM documents),
         n AS (SELECT source, sum(tok)::BIGINT AS n FROM t GROUP BY 1),
         b AS (SELECT source, n,
           floor(50000 * power(n::DOUBLE, 2.0) /
             (SELECT sum(power(n::DOUBLE, 2.0)) FROM n))::BIGINT AS budget
           FROM n),
         e AS (SELECT source,
           CASE WHEN n > 0 THEN least(budget // n, 3) ELSE 0 END AS fe,
           CASE WHEN n > 0 AND budget // n < 3
                  THEN budget - least(budget // n, 3) * n
                WHEN n > 0 THEN 0 ELSE budget END AS rem
           FROM b),
         c AS (SELECT doc_id, source,
           sum(tok) OVER (PARTITION BY source ORDER BY k, doc_id) AS cum
           FROM t),
         fullp AS (SELECT t.doc_id, t.source,
             unnest(generate_series(0, fe - 1)) AS epoch
           FROM t JOIN e USING (source) WHERE fe > 0),
         remp AS (SELECT c.doc_id, c.source, e.fe AS epoch
           FROM c JOIN e USING (source)
           WHERE e.rem > 0 AND c.cum <= e.rem)
         SELECT doc_id, source, epoch::BIGINT AS epoch FROM fullp
         UNION ALL
         SELECT doc_id, source, epoch::BIGINT AS epoch FROM remp
         ORDER BY doc_id, epoch""",

    // full passes = budget div mass (capped), remainder = the same
    // hash-ordered inclusive-cumsum prefix at epoch fe
    "q_mix_repeated" -> {
      val budgetVals = (0 until 20)
        .map(i => s"('src$i', ${2500 + 700 * (i % 3)})").mkString(", ")
      s"""WITH b(source, budget) AS (VALUES $budgetVals),
         t AS (SELECT doc_id, source,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS tok,
           md5(source || '§' || doc_id::VARCHAR) AS k FROM documents),
         n AS (SELECT source, sum(tok)::BIGINT AS n FROM t GROUP BY 1),
         e AS (SELECT source,
           CASE WHEN n > 0 THEN least(budget // n, 3) ELSE 0 END AS fe,
           CASE WHEN n > 0 AND budget // n < 3
                  THEN budget - least(budget // n, 3) * n
                WHEN n > 0 THEN 0 ELSE budget END AS rem
           FROM n JOIN b USING (source)),
         c AS (SELECT doc_id, source,
           sum(tok) OVER (PARTITION BY source ORDER BY k, doc_id) AS cum
           FROM t),
         fullp AS (SELECT t.doc_id, t.source,
             unnest(generate_series(0, fe - 1)) AS epoch
           FROM t JOIN e USING (source) WHERE fe > 0),
         -- rem > 0 (r18): a ZERO remainder emits nothing, so zero-token
         -- docs (cum = 0) cannot ride a surprise extra pass at epoch fe
         -- — matches the Spark-side fix exactly
         remp AS (SELECT c.doc_id, c.source, e.fe AS epoch
           FROM c JOIN e USING (source)
           WHERE e.rem > 0 AND c.cum <= e.rem)
         SELECT doc_id, source, epoch::BIGINT AS epoch FROM fullp
         UNION ALL
         SELECT doc_id, source, epoch::BIGINT AS epoch FROM remp
         ORDER BY doc_id, epoch"""
    },

    "q_dup_spans" ->
      s"""WITH t AS (SELECT doc_id, $SH AS sh FROM documents),
         occ AS (SELECT doc_id, u.h AS h FROM
           (SELECT doc_id, unnest(list_transform(range(1, len(sh)+1),
              i -> {'h': md5(sh[i])})) AS u FROM t))
         SELECT h AS span_hash, count(DISTINCT doc_id)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_total
         FROM occ GROUP BY h HAVING count(DISTINCT doc_id) >= 2
         ORDER BY span_hash""",

    "q_span_scrub" ->
      s"""WITH t AS (SELECT doc_id, $W AS w, $SH AS sh FROM documents),
         occ AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM
           (SELECT doc_id, unnest(list_transform(range(1, len(sh)+1),
              i -> {'pos': i-1, 'h': md5(sh[i])})) AS u FROM t)),
         dup AS (SELECT h FROM occ GROUP BY h
                 HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(0, 3), d -> pos + d)) AS tpos
           FROM occ JOIN dup USING (h)),
         tok AS (SELECT doc_id, u.pos AS tpos, u.tok FROM
           (SELECT doc_id, unnest(list_transform(range(1, len(w)+1),
              i -> {'pos': i-1, 'tok': w[i]})) AS u FROM t)),
         keep AS (SELECT tok.doc_id, tok.tpos, tok.tok FROM tok
                  ANTI JOIN cov ON tok.doc_id = cov.doc_id
                    AND tok.tpos = cov.tpos),
         agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean
                 FROM keep GROUP BY doc_id)
         SELECT d.doc_id, md5(coalesce(a.clean, '')) AS clean_hash
         FROM documents d LEFT JOIN agg a USING (doc_id)
         ORDER BY doc_id""",

    "q_repetition" ->
      s"""WITH t AS (SELECT doc_id, $W AS w,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS n
           FROM documents),
         b AS (SELECT doc_id, unnest(list_transform(
             range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
             i -> w[i] || ' ' || w[i+1])) AS bg FROM t),
         c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY 1, 2),
         f AS (SELECT doc_id, max(cnt)::DOUBLE / sum(cnt) AS tbf FROM c GROUP BY 1)
         SELECT t.doc_id, t.n AS n_tokens,
           floor((CASE WHEN t.n = 0 THEN 0.0
             ELSE len(list_distinct(w))::DOUBLE / t.n END) * 10000 + 0.5) / 10000
             AS distinct_ratio,
           floor(coalesce(f.tbf, 0.0) * 10000 + 0.5) / 10000 AS top_bigram_frac
         FROM t LEFT JOIN f USING (doc_id) ORDER BY doc_id""",

    // Decode certification: every value below is the REAL decoded
    // output of the deterministic fixtures (PNG pixels are lossless so
    // the 8x8-grid feature hash is a pure function of the formula in
    // Multimodal.fixturePng; WAV headers are hand-written bytes; row 21
    // is the declared non-media fallback). Literals dumped once via a
    // probe run and pinned here — a codec or plumbing regression breaks
    // the hash compare.
    "q_container_meta" ->
      """SELECT * FROM (VALUES
         (1::BIGINT, 'webp', 640, 480, 0::BIGINT, 0::BIGINT),
         (2::BIGINT, 'webp', 320, 200, 0::BIGINT, 0::BIGINT),
         (3::BIGINT, 'webp', 4096, 2160, 0::BIGINT, 0::BIGINT),
         (4::BIGINT, 'mp4', 1920, 1080, 90500::BIGINT, 0::BIGINT),
         (5::BIGINT, 'avif', 800, 600, 0::BIGINT, 0::BIGINT),
         (6::BIGINT, 'unknown', 0, 0, 0::BIGINT, 1::BIGINT)
        ) t(id, format, width, height, duration_ms, has_err)""",

    "q_decode" ->
      """SELECT * FROM (VALUES
         (1::BIGINT, 'image', 16::INT, 9::INT, 3::INT,
          0::INT, 0::INT, 0::BIGINT, -8782981226447482235::BIGINT),
         (2::BIGINT, 'image', 32::INT, 8::INT, 4::INT,
          0::INT, 0::INT, 0::BIGINT, -8390026334274910427::BIGINT),
         (3::BIGINT, 'image', 7::INT, 5::INT, 3::INT,
          0::INT, 0::INT, 0::BIGINT, -4531939645285318721::BIGINT),
         (11::BIGINT, 'audio', 0::INT, 0::INT, 1::INT,
          8000::INT, 16::INT, 32::BIGINT, 0::BIGINT),
         (12::BIGINT, 'audio', 0::INT, 0::INT, 2::INT,
          44100::INT, 16::INT, 100::BIGINT, 0::BIGINT),
         (21::BIGINT, 'image', 804::INT, 703::INT, 3::INT,
          0::INT, 0::INT, 0::BIGINT, 6873258764545949412::BIGINT)
         ) AS t(id, kind, width, height, channels,
                sample_rate, bits, n_samples, feature)
         ORDER BY id""",

    // literals dumped once via a probe run of the GIF plug-in decode
    // over the deterministic fixtures (q_decode convention)
    "q_video_frames" ->
      """SELECT * FROM (VALUES
         (1::BIGINT, 0::INT, 64::INT, 64::INT, 50::INT,
          -7439145777522892108::BIGINT),
         (1::BIGINT, 1::INT, 64::INT, 64::INT, 100::INT,
          3049617382892513868::BIGINT),
         (1::BIGINT, 2::INT, 64::INT, 64::INT, 150::INT,
          6100361180458536090::BIGINT),
         (2::BIGINT, 0::INT, 48::INT, 32::INT, 50::INT,
          3221365232690800806::BIGINT),
         (2::BIGINT, 1::INT, 48::INT, 32::INT, 100::INT,
          -3411924937218676140::BIGINT),
         (9::BIGINT, -1::INT, 0::INT, 0::INT, 0::INT,
          -4748848604330705087::BIGINT)
         ) AS t(id, frame_idx, width, height, duration_ms, dhash)
         ORDER BY id, frame_idx""",

    "q_vocab" ->
      s"""WITH tok AS (SELECT unnest($W) AS token FROM documents),
         c AS (SELECT token, count(*)::BIGINT AS n FROM tok
               WHERE len(token) > 0 GROUP BY 1)
         SELECT token, n,
           (row_number() OVER (ORDER BY n DESC, token))::BIGINT AS rnk
         FROM c ORDER BY n DESC, token LIMIT 100""",

    // BPE unrolled: each step k = adjacent-pair count over the symbol
    // table -> argmax (lexicographic tie-break) -> greedy
    // non-overlapping merge. Words are space-joined symbol strings;
    // the merge doubles separators so plain replace(' l  r ' -> ' lr ')
    // is exactly Sennrich's left-to-right non-overlapping re.sub
    // (probe-verified vs Spark's fold on [a a a] etc.).
    "q_bpe" -> {
      val union = (0 until 8).map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ")
      s"""WITH $bpeLearnCtes
         SELECT rank, lft, rgt, cnt FROM ($union) ORDER BY rank"""
    },

    // encode side: the unrolled chain's final w8 state IS the
    // segmented vocabulary (rank-order replay = Sennrich encode), so
    // the subword-frequency oracle is one unnest away
    "q_bpe_encode" ->
      s"""WITH $bpeLearnCtes
         SELECT subword, sum(cnt)::BIGINT AS cnt FROM (
           SELECT unnest(string_split(w, ' ')) AS subword, cnt FROM w8)
         GROUP BY 1 ORDER BY cnt DESC, subword LIMIT 50""",

    // per-doc subword counts = doc tokens joined to the chain's w8
    // segmentation (min-rank and replay agree on learned tables —
    // the kernel's min-rank contract is separately spec-pinned)
    // the oracle tokenizes the RAW text — no BPE anywhere — so the
    // hash compare certifies decode ∘ encode == normalized identity
    "q_bpe_roundtrip" ->
      s"""SELECT doc_id, array_to_string($W, ' ') AS decoded
         FROM documents ORDER BY doc_id""",

    "q_bpe_tokenize" ->
      s"""WITH $bpeLearnCtes,
         seg AS (SELECT t, len(string_split(w, ' '))::BIGINT AS ns FROM w8),
         dt AS (SELECT doc_id, unnest($W) AS t FROM documents),
         j AS (SELECT dt.doc_id, seg.ns FROM dt
               JOIN seg USING (t) WHERE len(dt.t) > 0)
         SELECT d.doc_id, coalesce(sum(j.ns), 0)::BIGINT AS n_subwords
         FROM documents d LEFT JOIN j USING (doc_id)
         GROUP BY 1 ORDER BY doc_id""",

    // Viterbi re-expressed as recursive path enumeration: every
    // segmentation of every distinct token into pinned pieces is a
    // path (piece table is small and the corpus tokens short, so the
    // walk is bounded); arg_max(seg, score) picks the unique-by-
    // construction argmax path (distinct per-piece jitter — see
    // unigramPieces). Both engines accumulate the score left-to-right
    // along the path from bit-identical addends, so the winner agrees.
    // Unsegmentable tokens fall back to raw codepoints (never hit on
    // the certified corpus — the model seeds every corpus codepoint).
    "q_unigram_tokenize" -> {
      val vals = unigramPieces.map { case (p, lp) =>
        s"('${p.replace("'", "''")}', ${lp}::DOUBLE)"
      }.mkString(",\n           ")
      s"""WITH RECURSIVE
         up(p, lp) AS (VALUES $vals),
         toks AS (SELECT DISTINCT t FROM
           (SELECT unnest($W) AS t FROM documents) WHERE len(t) > 0),
         paths AS (
           SELECT t, 0 AS pos, 0.0::DOUBLE AS score, '' AS seg FROM toks
           UNION ALL
           SELECT pa.t, pa.pos + len(up.p), pa.score + up.lp,
             CASE WHEN pa.seg = '' THEN up.p
                  ELSE pa.seg || ' ' || up.p END
           FROM paths pa JOIN up
             ON substr(pa.t, pa.pos + 1, len(up.p)) = up.p
           WHERE pa.pos < len(pa.t)),
         best AS (SELECT t, arg_max(seg, score) AS seg
           FROM paths WHERE pos = len(t) GROUP BY t),
         sg AS (SELECT toks.t AS t, coalesce(best.seg,
             array_to_string(regexp_extract_all(toks.t, '.'), ' ')) AS seg
           FROM toks LEFT JOIN best USING (t)),
         dtok AS (SELECT doc_id, i, w[i] AS t FROM
           (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM
             (SELECT doc_id, $W AS w FROM documents))
           WHERE len(w[i]) > 0),
         j AS (SELECT dtok.doc_id,
             sum(len(string_split(sg.seg, ' ')))::BIGINT AS ns,
             string_agg(sg.seg, ' ' ORDER BY dtok.i) AS ss
           FROM dtok JOIN sg USING (t) GROUP BY dtok.doc_id)
         SELECT d.doc_id, coalesce(j.ns, 0)::BIGINT AS n_subwords,
           md5(coalesce(j.ss, '')) AS seg_hash
         FROM documents d LEFT JOIN j USING (doc_id)
         ORDER BY doc_id"""
    },

    // the same chain, DuckDB-side: regexp_replace needs the 'g' flag
    // (Spark replaces all matches by default); whitespace is the
    // explicit class — Java's \\s includes \\x0B, RE2's does not
    "q_normalize" -> {
      val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      val unescaped = entities.foldLeft(
        "regexp_replace(text, '<[^>]*>', ' ', 'g')") { case (acc, (f, t)) =>
        s"replace($acc, '$f', '$t')"
      }
      val norm = s"trim(regexp_replace(regexp_replace($unescaped, " +
        raw"'[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\r\f\x0B]+', ' ', 'g'))"
      s"""SELECT doc_id, md5($norm) AS h, length($norm)::BIGINT AS len
         FROM documents ORDER BY doc_id"""
    },

    "q_csv_roundtrip" ->
      """SELECT doc_id,
           md5(replace(replace(text, chr(10), ' '), chr(13), ' ')) AS h,
           length(replace(replace(text, chr(10), ' '), chr(13), ' '))::BIGINT AS len,
           lang, source
         FROM documents WHERE length(text) > 0 ORDER BY doc_id""",

    "q_csv_multiline" ->
      """SELECT doc_id,
           md5(CASE WHEN doc_id % 7 = 0
               THEN replace(text, chr(13), ' ') || chr(10) || 'ln2,"x'
               ELSE replace(text, chr(13), ' ') END) AS h,
           length(CASE WHEN doc_id % 7 = 0
               THEN replace(text, chr(13), ' ') || chr(10) || 'ln2,"x'
               ELSE replace(text, chr(13), ' ') END)::BIGINT AS len,
           lang, source
         FROM documents WHERE length(text) > 0 ORDER BY doc_id""",

    "q_collocations" ->
      s"""WITH bg AS (SELECT doc_id, unnest(list_transform(
           range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i+1])) AS bigram FROM
           (SELECT doc_id, $W AS w FROM documents)),
         model AS (SELECT bigram, count(*)::BIGINT AS cnt FROM bg GROUP BY 1),
         uni AS (SELECT t, count(*)::BIGINT AS ucnt FROM
           (SELECT unnest($W) AS t FROM documents) WHERE len(t) > 0 GROUP BY 1),
         tot AS (SELECT sum(ucnt)::BIGINT AS tt FROM uni)
         SELECT m.bigram, m.cnt,
           round(ln(m.cnt::DOUBLE * tot.tt::DOUBLE /
             (l.ucnt::DOUBLE * r.ucnt::DOUBLE)), 6) AS pmi
         FROM model m
         JOIN uni l ON split_part(m.bigram, ' ', 1) = l.t
         JOIN uni r ON split_part(m.bigram, ' ', 2) = r.t, tot
         WHERE m.cnt >= 5
         ORDER BY pmi DESC, m.bigram LIMIT 100""",

    "q_perplexity" ->
      s"""WITH tok AS (SELECT doc_id, $W AS w FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(
           range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i+1])) AS bigram FROM tok),
         model AS (SELECT bigram, count(*)::BIGINT AS cnt FROM bg GROUP BY 1),
         hist AS (SELECT split_part(bigram, ' ', 1) AS lft,
           sum(cnt)::BIGINT AS hcnt FROM model GROUP BY 1),
         v AS (SELECT count(DISTINCT t)::BIGINT AS vv FROM
           (SELECT unnest($W) AS t FROM documents) WHERE len(t) > 0),
         scored AS (SELECT b.doc_id, b.bigram,
             -(ln(coalesce(m.cnt, 0) + 1.0) -
               ln(coalesce(h.hcnt, 0) + 1.0 * v.vv)) AS nll
           FROM bg b LEFT JOIN model m USING (bigram)
           LEFT JOIN hist h ON split_part(b.bigram, ' ', 1) = h.lft, v)
         SELECT d.doc_id, count(s.bigram)::BIGINT AS n_bigrams,
           round(avg(s.nll), 6) AS nll
         FROM documents d LEFT JOIN scored s USING (doc_id)
         GROUP BY 1 ORDER BY doc_id""",

    "q_perplexity_kn" ->
      s"""WITH tok AS (SELECT doc_id, $W AS w FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(
           range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i+1])) AS bigram FROM tok),
         model AS (SELECT bigram, count(*)::BIGINT AS cnt FROM bg GROUP BY 1),
         hist AS (SELECT split_part(bigram, ' ', 1) AS lft,
           sum(cnt)::BIGINT AS hcnt, count(*)::BIGINT AS n1h
           FROM model GROUP BY 1),
         cont AS (SELECT split_part(bigram, ' ', 2) AS rgt,
           count(*)::BIGINT AS n1c FROM model GROUP BY 1),
         tot AS (SELECT count(*)::BIGINT AS b,
           sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
           sum(CASE WHEN cnt = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
           FROM model),
         v AS (SELECT count(DISTINCT t)::BIGINT AS vv FROM
           (SELECT unnest($W) AS t FROM documents) WHERE len(t) > 0),
         dsc AS (SELECT CASE WHEN n1 + 2 * n2 > 0
             THEN n1::DOUBLE / (n1 + 2 * n2) ELSE 0.5 END AS d
           FROM tot),
         scored AS (SELECT b.doc_id, b.bigram,
             -ln(CASE WHEN h.hcnt IS NOT NULL THEN
               (greatest(coalesce(m.cnt, 0) - dsc.d, 0.0) +
                dsc.d * h.n1h *
                ((coalesce(c.n1c, 0) + 1.0) / (tot.b + v.vv))) / h.hcnt
             ELSE (coalesce(c.n1c, 0) + 1.0) / (tot.b + v.vv) END) AS nll
           FROM bg b LEFT JOIN model m USING (bigram)
           LEFT JOIN hist h ON split_part(b.bigram, ' ', 1) = h.lft
           LEFT JOIN cont c ON split_part(b.bigram, ' ', 2) = c.rgt,
           tot, v, dsc)
         SELECT d.doc_id, count(s.bigram)::BIGINT AS n_bigrams,
           round(avg(s.nll), 6) AS nll
         FROM documents d LEFT JOIN scored s USING (doc_id)
         GROUP BY 1 ORDER BY doc_id""",

    "q_ppl_buckets" ->
      s"""WITH tok AS (SELECT doc_id, $W AS w FROM documents),
         bg AS (SELECT doc_id, unnest(list_transform(
           range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i+1])) AS bigram FROM tok),
         model AS (SELECT bigram, count(*)::BIGINT AS cnt FROM bg GROUP BY 1),
         hist AS (SELECT split_part(bigram, ' ', 1) AS lft,
           sum(cnt)::BIGINT AS hcnt FROM model GROUP BY 1),
         v AS (SELECT count(DISTINCT t)::BIGINT AS vv FROM
           (SELECT unnest($W) AS t FROM documents) WHERE len(t) > 0),
         scored AS (SELECT b.doc_id, b.bigram,
             -(ln(coalesce(m.cnt, 0) + 1.0) -
               ln(coalesce(h.hcnt, 0) + 1.0 * v.vv)) AS nll
           FROM bg b LEFT JOIN model m USING (bigram)
           LEFT JOIN hist h ON split_part(b.bigram, ' ', 1) = h.lft, v),
         per_doc AS (SELECT d.doc_id, d.lang,
             round(avg(s.nll), 6) AS nllr
           FROM documents d JOIN scored s USING (doc_id)
           GROUP BY 1, 2),
         cuts AS (SELECT lang,
             round(quantile_cont(nllr, 1.0/3), 6) AS q1,
             round(quantile_cont(nllr, 2.0/3), 6) AS q2
           FROM per_doc GROUP BY 1)
         SELECT p.doc_id, p.lang, p.nllr,
           CASE WHEN p.nllr <= c.q1 THEN 'head'
                WHEN p.nllr <= c.q2 THEN 'middle'
                ELSE 'tail' END AS bucket
         FROM per_doc p JOIN cuts c USING (lang)
         ORDER BY p.doc_id""",

    "q_chunks" ->
      s"""WITH t AS (SELECT doc_id, $W AS w,
           CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END AS n
           FROM documents),
         c AS (SELECT doc_id, w, unnest(range(0,
           CASE WHEN n = 0 THEN 0
             ELSE (CASE WHEN n > 16 THEN n - 16 ELSE 0 END + 11) // 12 + 1
           END))::BIGINT AS chunk_idx FROM t)
         SELECT doc_id, chunk_idx,
           len(w[(chunk_idx*12+1)::INT : (chunk_idx*12+16)::INT])::BIGINT
             AS n_chunk_tokens,
           array_to_string(w[(chunk_idx*12+1)::INT : (chunk_idx*12+16)::INT], ' ')
             AS chunk_text
         FROM c ORDER BY doc_id, chunk_idx""",

    "q_pack" ->
      s"""WITH t AS (SELECT doc_id,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT
             AS n_tokens FROM documents),
         c AS (SELECT doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS prev FROM t)
         SELECT doc_id, n_tokens,
           (prev // 64)::BIGINT AS first_seq,
           GREATEST(prev // 64, (prev + n_tokens - 1) // 64)::BIGINT AS last_seq,
           (CASE WHEN n_tokens = 0 THEN 0
             ELSE GREATEST(prev // 64, (prev + n_tokens - 1) // 64)
               - (prev // 64) + 1 END)::BIGINT AS n_seqs
         FROM c ORDER BY doc_id""",

    "q_global_rank" ->
      """SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)::BIGINT AS rnk
         FROM documents ORDER BY rnk""",

    "q_asof" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts)::BIGINT AS etsu,
             MAX(value) AS eval
           FROM events WHERE event_type = 'error' GROUP BY 1, 2)
         SELECT l.user_id, l.event_id, l.tsu,
           r.etsu AS err_etsu, r.eval AS err_eval
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.tsu >= r.etsu
         ORDER BY l.event_id""",

    // identical semantics; the Spark side differs only in physical
    // decomposition
    "q_asof_skewed" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts)::BIGINT AS etsu,
             MAX(value) AS eval
           FROM events WHERE event_type = 'error' GROUP BY 1, 2)
         SELECT l.user_id, l.event_id, l.tsu,
           r.etsu AS err_etsu, r.eval AS err_eval
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.tsu >= r.etsu
         ORDER BY l.event_id""",

    "q_asof_tol" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts)::BIGINT AS etsu,
             MAX(value) AS eval
           FROM events WHERE event_type = 'error' GROUP BY 1, 2)
         SELECT l.user_id, l.event_id, l.tsu,
           CASE WHEN l.tsu - r.etsu <= 600000000 THEN r.etsu END AS err_etsu,
           CASE WHEN l.tsu - r.etsu <= 600000000 THEN r.eval END AS err_eval
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.tsu >= r.etsu
         ORDER BY l.event_id""",

    "q_asof_fwd" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu,
           -epoch_us(ts)::BIGINT AS nts
           FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, epoch_us(ts)::BIGINT AS etsu,
             -epoch_us(ts)::BIGINT AS nts, MAX(value) AS eval
           FROM events WHERE event_type = 'error' GROUP BY 1, 2, 3)
         SELECT l.user_id, l.event_id, l.tsu,
           r.etsu AS err_etsu, r.eval AS err_eval
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.nts >= r.nts
         ORDER BY l.event_id""",

    "q_rolling" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu,
           FLOOR(value)::BIGINT AS v FROM events)
         SELECT user_id, event_id, tsu,
           (COUNT(v) OVER w)::BIGINT AS roll_n,
           (SUM(v) OVER w)::BIGINT AS roll_sum,
           CAST(SUM(v) OVER w AS DOUBLE) / (COUNT(v) OVER w) AS roll_mean
         FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tsu
           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    // same semantics, different physical decomposition on the Spark
    // side — the oracle is identical by design
    "q_rolling_skewed" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu,
           FLOOR(value)::BIGINT AS v FROM events)
         SELECT user_id, event_id, tsu,
           (COUNT(v) OVER w)::BIGINT AS roll_n,
           (SUM(v) OVER w)::BIGINT AS roll_sum,
           CAST(SUM(v) OVER w AS DOUBLE) / (COUNT(v) OVER w) AS roll_mean
         FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tsu
           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",

    "q_sessions" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu
           FROM events),
         s AS (SELECT user_id, event_id, tsu,
           CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id) > 14400000000
             THEN 1 ELSE 0 END AS brk FROM o),
         t AS (SELECT user_id, tsu,
           1 + SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM s)
         SELECT user_id, session_id::BIGINT AS session_id,
           COUNT(*)::BIGINT AS n_events,
           MIN(tsu)::BIGINT AS start_us, MAX(tsu)::BIGINT AS end_us
         FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    // identical semantics; the Spark side differs only in physical
    // decomposition
    "q_sessions_skewed" ->
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts)::BIGINT AS tsu
           FROM events),
         s AS (SELECT user_id, event_id, tsu,
           CASE WHEN tsu - LAG(tsu) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id) > 14400000000
             THEN 1 ELSE 0 END AS brk FROM o),
         t AS (SELECT user_id, tsu,
           1 + SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM s)
         SELECT user_id, session_id::BIGINT AS session_id,
           COUNT(*)::BIGINT AS n_events,
           MIN(tsu)::BIGINT AS start_us, MAX(tsu)::BIGINT AS end_us
         FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_range_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts)::BIGINT AS tsu
           FROM events WHERE event_type = 'error'),
         c AS (SELECT event_id AS click_id, epoch_us(ts)::BIGINT AS ctsu
           FROM events WHERE event_type = 'click')
         SELECT e.event_id, COUNT(*)::BIGINT AS n_clicks,
           MIN(c.click_id)::BIGINT AS first_click
         FROM e JOIN c ON c.ctsu BETWEEN e.tsu - 600000000 AND e.tsu
         GROUP BY 1 ORDER BY 1""",

    "q_fuzzy_join" ->
      """SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           levenshtein(a.s_name, b.s_name)::BIGINT AS dist
         FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
         WHERE levenshtein(a.s_name, b.s_name) <= 1
         ORDER BY 1, 2""",

    "q_tfidf" ->
      s"""WITH tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
           FROM (SELECT doc_id, unnest($W) AS term FROM documents
                 WHERE len(trim(text)) > 0)
           GROUP BY doc_id, term),
         dfreq AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents
               WHERE len(trim(text)) > 0),
         scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             (tf.tf * n.n_docs) / dfreq.df AS tfidf
           FROM tf, dfreq, n WHERE tf.term = dfreq.term),
         ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, term)::BIGINT AS rnk FROM scored)
         SELECT doc_id, term, tf, df, tfidf, rnk FROM ranked
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",

    "q_source_shift" ->
      s"""WITH cgt AS (SELECT source, term, COUNT(*)::BIGINT AS cgt
           FROM (SELECT source, unnest($W) AS term FROM documents
                 WHERE len(trim(text)) > 0)
           GROUP BY source, term),
         ct AS (SELECT term, SUM(cgt)::BIGINT AS ct FROM cgt GROUP BY term),
         tg AS (SELECT source, SUM(cgt)::BIGINT AS n_tokens FROM cgt
                GROUP BY source),
         tot AS (SELECT SUM(ct)::BIGINT AS t FROM ct),
         dev AS (SELECT cgt.source, tg.n_tokens, tot.t,
             SUM(ABS(cgt.cgt * tot.t - ct.ct * tg.n_tokens)
               - ct.ct * tg.n_tokens)::BIGINT AS dev
           FROM cgt, ct, tg, tot
           WHERE cgt.term = ct.term AND cgt.source = tg.source
           GROUP BY cgt.source, tg.n_tokens, tot.t)
         SELECT source, n_tokens, (dev + n_tokens * t)::BIGINT AS tv_num,
           CAST(dev + n_tokens * t AS DOUBLE)
             / CAST(n_tokens * t * 2 AS DOUBLE) AS tv
         FROM dev ORDER BY source""",

    "q_quality_filter" ->
      s"""WITH base AS (SELECT doc_id,
           (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS n_tokens,
           len(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE AS len_nws,
           len(list_filter($W, t -> list_contains(['a','the','and','of','to','is','in'], t)))::DOUBLE AS n_stop,
           len(regexp_replace(regexp_replace(lower(text), '\\s+', '', 'g'), '[a-z0-9]', '', 'g'))::DOUBLE AS n_punct,
           len(list_filter($W, t -> list_contains(['the','a','is','and'], t))) AS s_en,
           len(list_filter($W, t -> list_contains(['el','la','es','que'], t))) AS s_es,
           len(list_filter($W, t -> list_contains(['der','die','und','ist'], t))) AS s_de,
           len(list_filter($W, t -> list_contains(['le','les','est','une'], t))) AS s_fr,
           len(list_filter($W, t -> list_contains(['的','是','了'], t))) AS s_zh
           FROM documents),
         q AS (SELECT doc_id,
           CASE WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) AND s_en > 0 THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) AND s_es > 0 THEN 'es'
                WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) AND s_de > 0 THEN 'de'
                WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) AND s_fr > 0 THEN 'fr'
                WHEN s_zh = greatest(s_en, s_es, s_de, s_fr, s_zh) AND s_zh > 0 THEN 'zh'
                ELSE 'und' END AS pred_lang,
           floor((least(n_tokens / 100.0, 1.0) * 0.5
             + (1.0 - n_stop / greatest(n_tokens, 1)) * 0.3
             + (1.0 - n_punct / greatest(len_nws, 1)) * 0.2) * 10000 + 0.5) / 10000
             AS quality
           FROM base),
         r AS (SELECT *, row_number() OVER
           (PARTITION BY pred_lang ORDER BY quality DESC, doc_id) AS rk FROM q)
         SELECT pred_lang, doc_id, quality FROM r WHERE rk <= 5
         ORDER BY pred_lang, doc_id""",

    "q_c4" ->
      """WITH t AS (SELECT doc_id,
           text || '.' || chr(10) ||
           'Second line kept here' ||
             (CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END) || chr(10) ||
           (CASE WHEN doc_id % 5 = 0 THEN 'Enable javascript to continue.'
             ELSE 'Plain closing line.' END) || chr(10) ||
           repeat('Extra sentence goes here. ', (doc_id % 4)::INT) ||
           (CASE WHEN doc_id % 11 = 0
             THEN chr(10) || 'lorem ipsum disclaimer.' ELSE '' END) ||
           (CASE WHEN doc_id % 13 = 0
             THEN chr(10) || 'code { sample }' ELSE '' END) AS txt
           FROM documents),
         m AS (SELECT doc_id, txt,
           list_filter(string_split(txt, chr(10)),
             l -> len(trim(l)) > 0) AS lines FROM t),
         k AS (SELECT doc_id, txt, lines,
           list_filter(lines, l -> regexp_matches(trim(l), '[.!?"'']$')
             AND NOT contains(lower(l), 'javascript')) AS kept FROM m),
         x AS (SELECT doc_id, txt, len(lines)::BIGINT AS n_lines,
           len(kept)::BIGINT AS n_kept_lines,
           array_to_string(kept, chr(10)) AS kt FROM k),
         y AS (SELECT doc_id, txt, n_lines, n_kept_lines, kt,
           len(list_filter(string_split_regex(kt, '[.!?]+'),
             s2 -> len(trim(s2)) > 0))::BIGINT AS n_sentences FROM x)
         SELECT doc_id, n_lines, n_kept_lines, n_sentences,
           (n_sentences >= 4 AND NOT contains(lower(txt), 'lorem ipsum')
             AND NOT contains(txt, '{')) AS keep,
           md5(kt) AS kept_hash
         FROM y ORDER BY doc_id""",

    "q_curation_e2e" ->
      s"""WITH t0 AS (SELECT doc_id, lang, text,
           list_filter($W, x -> len(x) > 0) AS w FROM documents),
         gm AS (SELECT doc_id, lang, text, w, len(w)::BIGINT AS n_words,
             list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) AS mwl0,
             len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0
               / len(w) AS af0,
             ((CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)
             )::BIGINT AS n_stop
           FROM t0 WHERE len(w) > 0),
         gated AS (SELECT doc_id, lang, w FROM gm
           WHERE n_words >= 50 AND n_words <= 100000
             AND mwl0 >= 3.0 AND mwl0 <= 4.5
             AND af0 >= 0.8 AND n_stop >= 1),
         ctok AS (SELECT doc_id, unnest(w) AS t FROM gated),
         cf AS (SELECT doc_id,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % $qcDim AS feat,
             count(*)::BIGINT AS cnt FROM ctok GROUP BY 1, 2),
         cw AS (SELECT * FROM (VALUES $qcValuesSql) AS v(feat, wt)),
         cm AS (SELECT cf.doc_id,
             sum(coalesce(cw.wt, 0) * cf.cnt) + (${qcWeights.last}) AS margin
           FROM cf LEFT JOIN cw ON cf.feat = cw.feat GROUP BY 1),
         quality AS (SELECT g.doc_id, g.lang, g.w FROM gated g
           JOIN cm ON cm.doc_id = g.doc_id WHERE cm.margin >= 0),
         uni AS (SELECT doc_id, lang, unnest(w) AS t FROM quality),
         bi AS (SELECT doc_id, lang, unnest(list_transform(
           range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i+1])) AS t FROM quality),
         feats AS (SELECT doc_id, lang,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS bucket
           FROM (SELECT * FROM uni WHERE len(t) > 0
                 UNION ALL SELECT * FROM bi)),
         tcnt AS (SELECT bucket, count(*)::BIGINT AS tcnt FROM feats
           WHERE lang = 'en' GROUP BY 1),
         rcnt AS (SELECT bucket, count(*)::BIGINT AS rcnt FROM feats
           GROUP BY 1),
         buckets AS (SELECT range::INT AS bucket FROM range(512)),
         j AS (SELECT b.bucket, t.tcnt, r.rcnt FROM buckets b
           LEFT JOIN tcnt t USING (bucket) LEFT JOIN rcnt r USING (bucket)),
         tot AS (SELECT sum(coalesce(tcnt, 0))::BIGINT AS tt,
           sum(coalesce(rcnt, 0))::BIGINT AS tr FROM j),
         ratio AS (SELECT bucket,
             round(ln((coalesce(tcnt, 0) + 1.0) / (tot.tt + 512)) -
                   ln((coalesce(rcnt, 0) + 1.0) / (tot.tr + 512)), 6) AS r
           FROM j, tot),
         scored AS (SELECT f.doc_id, round(sum(rt.r), 6) AS logw
           FROM feats f JOIN ratio rt USING (bucket) GROUP BY 1),
         keyed AS (SELECT doc_id, logw,
             round(logw + round(-ln(-ln(
               ((('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT
                 ::DOUBLE + 0.5) / 1152921504606846976.0))), 6), 6) AS key
           FROM scored),
         picked AS (SELECT doc_id, logw FROM keyed
           ORDER BY key DESC, doc_id LIMIT 40),
         sel AS (SELECT q.doc_id, p.logw, q.w FROM picked p
           JOIN quality q USING (doc_id)),
         sh0 AS (SELECT doc_id, logw, len(w)::BIGINT AS n_tok,
           md5(doc_id::VARCHAR) AS k2 FROM sel),
         c AS (SELECT doc_id, logw, n_tok,
           sum(n_tok) OVER (ORDER BY k2, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
           sum(n_tok) OVER () AS total FROM sh0)
         SELECT doc_id, logw, n_tok,
           least(floor((cum - n_tok) / ceil(total / 4.0)), 3)::INT AS shard
         FROM c ORDER BY doc_id""",

    "q_gopher_filter" ->
      s"""WITH t AS (SELECT doc_id,
           list_filter($W, x -> len(x) > 0) AS w FROM documents),
         m AS (SELECT doc_id, len(w)::BIGINT AS n_words,
             list_sum(list_transform(w, x -> len(x))) * 1.0 / len(w) AS mwl0,
             len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0
               / len(w) AS af0,
             ((CASE WHEN list_contains(w, 'the') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'be') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'to') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'of') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'and') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'that') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'have') THEN 1 ELSE 0 END) +
              (CASE WHEN list_contains(w, 'with') THEN 1 ELSE 0 END)
             )::BIGINT AS n_stop
           FROM t WHERE len(w) > 0)
         SELECT doc_id, n_words, round(mwl0, 4) AS mwl,
           round(af0, 4) AS af, n_stop,
           (CASE WHEN n_words >= 50 AND n_words <= 100000
              AND mwl0 >= 3.0 AND mwl0 <= 4.5
              AND af0 >= 0.8 AND n_stop >= 1 THEN 1 ELSE 0 END)::BIGINT AS keep
         FROM m ORDER BY doc_id""",

    "q_quality_classifier" ->
      s"""WITH tok AS (SELECT doc_id, unnest($W) AS t FROM documents),
         f AS (SELECT doc_id,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % $qcDim AS feat,
             count(*)::BIGINT AS cnt
           FROM tok WHERE len(t) > 0 GROUP BY 1, 2),
         w AS (SELECT * FROM (VALUES $qcValuesSql) AS v(feat, wt)),
         m AS (SELECT f.doc_id,
             sum(coalesce(w.wt, 0) * f.cnt) + (${qcWeights.last}) AS margin
           FROM f LEFT JOIN w ON f.feat = w.feat GROUP BY 1)
         SELECT doc_id, round(margin, 6) AS marg,
           (CASE WHEN margin >= 0 THEN 1 ELSE 0 END)::BIGINT AS pred
         FROM m ORDER BY doc_id""",

    "q_dsir" ->
      s"""WITH tok AS (SELECT doc_id, lang, $W AS w FROM documents),
         uni AS (SELECT doc_id, lang, unnest(w) AS t FROM tok),
         bi AS (SELECT doc_id, lang, unnest(list_transform(
           range(1, CASE WHEN len(w) >= 2 THEN len(w) ELSE 1 END),
           i -> w[i] || ' ' || w[i+1])) AS t FROM tok),
         feats AS (SELECT doc_id, lang,
             ('0x' || substr(md5(t), 1, 15))::BIGINT % 512 AS bucket
           FROM (SELECT * FROM uni WHERE len(t) > 0
                 UNION ALL SELECT * FROM bi)),
         tcnt AS (SELECT bucket, count(*)::BIGINT AS tcnt FROM feats
           WHERE lang = 'en' GROUP BY 1),
         rcnt AS (SELECT bucket, count(*)::BIGINT AS rcnt FROM feats
           GROUP BY 1),
         buckets AS (SELECT range::INT AS bucket FROM range(512)),
         j AS (SELECT b.bucket, t.tcnt, r.rcnt FROM buckets b
           LEFT JOIN tcnt t USING (bucket) LEFT JOIN rcnt r USING (bucket)),
         tot AS (SELECT sum(coalesce(tcnt, 0))::BIGINT AS tt,
           sum(coalesce(rcnt, 0))::BIGINT AS tr FROM j),
         ratio AS (SELECT bucket,
             round(ln((coalesce(tcnt, 0) + 1.0) / (tot.tt + 512)) -
                   ln((coalesce(rcnt, 0) + 1.0) / (tot.tr + 512)), 6) AS r
           FROM j, tot),
         scored AS (SELECT f.doc_id, round(sum(rt.r), 6) AS logw
           FROM feats f JOIN ratio rt USING (bucket) GROUP BY 1),
         keyed AS (SELECT doc_id, logw,
             round(logw + round(-ln(-ln(
               ((('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 15))::BIGINT
                 ::DOUBLE + 0.5) / 1152921504606846976.0))), 6), 6) AS key
           FROM scored)
         SELECT doc_id, logw, key FROM keyed
         ORDER BY key DESC, doc_id LIMIT 100""",

    "q_sample_hash" ->
      s"""SELECT doc_id FROM documents
         WHERE ('0x' || substr(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 15))::BIGINT % 100 < 20
         ORDER BY doc_id""",

    "q_audio_neardup" ->
      """SELECT * FROM (VALUES
         (0::BIGINT, 100::BIGINT, 0::BIGINT),
         (1::BIGINT, 101::BIGINT, 0::BIGINT),
         (2::BIGINT, 102::BIGINT, 0::BIGINT))
         AS t(id_a, id_b, hamming_dist) ORDER BY id_a, id_b""",

    "q_image_neardup" ->
      """SELECT * FROM (VALUES
         (0::BIGINT, 100::BIGINT, 0::BIGINT),
         (1::BIGINT, 101::BIGINT, 0::BIGINT),
         (2::BIGINT, 102::BIGINT, 1::BIGINT))
         AS t(id_a, id_b, hamming_dist) ORDER BY id_a, id_b""",

    "q_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id,
           (CASE WHEN trim(text) = '' THEN 0 ELSE len($W) END)::BIGINT AS w
           FROM documents),
         keyed AS (SELECT doc_id, w,
             round(round(ln(w::DOUBLE), 6) + round(-ln(-ln(
               ((('0x' || substr(md5('11:' || doc_id::VARCHAR), 1, 15))::BIGINT
                 ::DOUBLE + 0.5) / 1152921504606846976.0))), 6), 6) AS key
           FROM t WHERE w > 0)
         SELECT doc_id, w, key FROM keyed
         ORDER BY key DESC, doc_id LIMIT 100""",

    "q_shard" ->
      s"""WITH t AS (SELECT doc_id,
           (CASE WHEN trim(text) = '' THEN 0 ELSE len($W) END)::BIGINT AS n_tok,
           md5(doc_id::VARCHAR) AS k FROM documents),
         c AS (SELECT doc_id, n_tok,
           sum(n_tok) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
           sum(n_tok) OVER () AS total FROM t)
         SELECT doc_id, n_tok,
           least(floor((cum - n_tok) / ceil(total / 8.0)), 7)::INT AS shard
         FROM c ORDER BY doc_id""",

    "q_stratified_sample" ->
      """WITH r AS (SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY lang) AS n
         FROM documents)
         SELECT lang, doc_id FROM r WHERE rn * 100 <= n * 10
         ORDER BY lang, doc_id""",

    "q_contaminated" ->
      s"""SELECT doc_id FROM documents d
         WHERE EXISTS (SELECT 1 FROM documents b WHERE b.doc_id < 50
           AND md5(regexp_replace(trim(lower(b.text)), '\\s+', ' ', 'g'))
             = md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')))
         ORDER BY doc_id""",

    "q_ngram_contam" ->
      s"""WITH t AS (SELECT doc_id, ${kShOf("text", 5)} AS sh FROM documents),
         b AS (SELECT DISTINCT u AS g FROM
           (SELECT unnest(sh) AS u FROM t WHERE doc_id < 50)),
         c AS (SELECT DISTINCT doc_id FROM
           (SELECT doc_id, unnest(sh) AS u FROM t)
           WHERE u IN (SELECT g FROM b))
         SELECT doc_id FROM c ORDER BY doc_id""",

    "q_bloom_decontam" ->
      s"""WITH t AS (SELECT doc_id, ${kShOf("text", 5)} AS sh FROM documents),
         b AS (SELECT DISTINCT u AS g FROM
           (SELECT unnest(sh) AS u FROM t WHERE doc_id < 50)),
         c AS (SELECT DISTINCT doc_id FROM
           (SELECT doc_id, unnest(sh) AS u FROM t)
           WHERE u IN (SELECT g FROM b))
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM c) ORDER BY doc_id""",

    "q_pipeline_e2e" ->
      s"""WITH RECURSIVE base AS (SELECT doc_id, lang, text,
           floor((least(n_tokens / 100.0, 1.0) * 0.5
             + (1.0 - n_stop / greatest(n_tokens, 1)) * 0.3
             + (1.0 - n_punct / greatest(len_nws, 1)) * 0.2) * 10000 + 0.5)
             / 10000 AS quality
           FROM (SELECT doc_id, lang, text,
             (CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END)::BIGINT AS n_tokens,
             len(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE AS len_nws,
             len(list_filter($W, t -> list_contains(['a','the','and','of','to','is','in'], t)))::DOUBLE AS n_stop,
             len(regexp_replace(regexp_replace(lower(text), '\\s+', '', 'g'), '[a-z0-9]', '', 'g'))::DOUBLE AS n_punct
             FROM documents)),
         qual AS (SELECT doc_id, lang, text FROM base WHERE quality >= 0.6),
         fp AS (SELECT *, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fpv
                FROM qual),
         keepers AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fpv),
         ex AS (SELECT fp.* FROM fp JOIN keepers USING (doc_id)),
         s AS (SELECT doc_id, lang, text, fpv, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM ex),
         pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
             AND (a.m0 = b.m0 OR a.m1 = b.m1 OR a.m2 = b.m2 OR a.m3 = b.m3)
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT src AS id, src AS label FROM edges
           UNION
           SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
         losers AS (SELECT id FROM (SELECT id, min(label) AS keep_id
                    FROM reach GROUP BY 1) WHERE id != keep_id),
         nd AS (SELECT * FROM ex WHERE doc_id NOT IN (SELECT id FROM losers)),
         clean AS (SELECT * FROM nd d WHERE NOT EXISTS (
           SELECT 1 FROM documents b WHERE b.doc_id < 50
             AND md5(regexp_replace(trim(lower(b.text)), '\\s+', ' ', 'g')) = d.fpv)),
         r AS (SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
           FROM clean)
         SELECT lang, doc_id FROM r WHERE rn * 100 <= n * 50
         ORDER BY lang, doc_id""",

    "q_decontaminate" ->
      s"""SELECT doc_id FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM documents b WHERE b.doc_id < 50
           AND md5(regexp_replace(trim(lower(b.text)), '\\s+', ' ', 'g'))
             = md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g')))
         ORDER BY doc_id""",

    "q_contam_fuzzy" ->
      s"""WITH s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents)
         SELECT a.doc_id AS id_l, b.doc_id AS id_r,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
         FROM s a JOIN s b ON a.doc_id % 10 = 0 AND b.doc_id % 10 != 0
           AND (a.m0 = b.m0 OR a.m1 = b.m1 OR a.m2 = b.m2 OR a.m3 = b.m3)
         WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
         ORDER BY 1, 2""",

    "q_dedup_exact" ->
      s"""SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY 1 ORDER BY 1""",

    "q_minhash" ->
      s"""SELECT doc_id, ${mhSql(0)} AS mh0, ${mhSql(1)} AS mh1,
         ${mhSql(2)} AS mh2, ${mhSql(3)} AS mh3
         FROM documents ORDER BY doc_id""",

    "q_near_dup" ->
      s"""WITH s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
         FROM s a JOIN s b ON a.doc_id < b.doc_id
           AND (a.m0 = b.m0 OR a.m1 = b.m1 OR a.m2 = b.m2 OR a.m3 = b.m3)
         WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
         ORDER BY 1, 2""",

    "q_incremental_dedup" ->
      s"""WITH s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents),
         b AS (SELECT * FROM s WHERE doc_id % 5 = 0),
         c AS (SELECT * FROM s WHERE doc_id % 5 <> 0)
         SELECT b.doc_id AS id_batch, c.doc_id AS id_corpus,
           round(len(list_intersect(b.sh, c.sh))::DOUBLE /
             (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))), 4) AS jaccard
         FROM b JOIN c ON (b.m0 = c.m0 OR b.m1 = c.m1 OR b.m2 = c.m2 OR b.m3 = c.m3)
         WHERE len(list_intersect(b.sh, c.sh))::DOUBLE /
             (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))) >= 0.8
         ORDER BY 1, 2""",

    "q_incremental_drop" ->
      s"""WITH s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents),
         b AS (SELECT * FROM s WHERE doc_id % 5 = 0),
         c AS (SELECT * FROM s WHERE doc_id % 5 <> 0),
         dup AS (
           SELECT DISTINCT b.doc_id
           FROM b JOIN c ON (b.m0 = c.m0 OR b.m1 = c.m1 OR b.m2 = c.m2 OR b.m3 = c.m3)
           WHERE len(list_intersect(b.sh, c.sh))::DOUBLE /
               (len(b.sh) + len(c.sh) - len(list_intersect(b.sh, c.sh))) >= 0.8)
         SELECT doc_id FROM b WHERE doc_id NOT IN (SELECT doc_id FROM dup)
         ORDER BY doc_id""",

    // the daily-admission loop recomputed from scratch: token gate →
    // first-id-per-fingerprint → banded+verified near-dup drop vs the
    // corpus — composition parity for q_incremental_e2e
    "q_incremental_e2e" ->
      s"""WITH s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents),
         tok AS (
           SELECT doc_id,
             CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len($W) END AS n_tokens,
             md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
           FROM documents),
         b0 AS (SELECT doc_id, fp FROM tok
                WHERE doc_id % 5 = 0 AND n_tokens >= 5),
         b1 AS (SELECT min(doc_id) AS doc_id FROM b0 GROUP BY fp),
         c AS (SELECT * FROM s WHERE doc_id % 5 <> 0),
         bb AS (SELECT s.* FROM s JOIN b1 USING (doc_id)),
         dup AS (
           SELECT DISTINCT bb.doc_id
           FROM bb JOIN c ON (bb.m0 = c.m0 OR bb.m1 = c.m1 OR bb.m2 = c.m2 OR bb.m3 = c.m3)
           WHERE len(list_intersect(bb.sh, c.sh))::DOUBLE /
               (len(bb.sh) + len(c.sh) - len(list_intersect(bb.sh, c.sh))) >= 0.8)
         SELECT doc_id FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM dup)
         ORDER BY doc_id""",

    // the delta path must equal a from-scratch rebuild: DuckDB computes
    // batch1's survivors, admits them, and re-pairs batch2 against the
    // grown corpus directly — graft answers the same question through
    // index ∪ delta without touching the persisted index
    "q_incremental_refresh" ->
      s"""WITH s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents),
         b2 AS (SELECT * FROM s WHERE doc_id % 5 = 0),
         b1 AS (SELECT * FROM s WHERE doc_id % 5 = 1),
         c0 AS (SELECT * FROM s WHERE doc_id % 5 NOT IN (0, 1)),
         dup1 AS (
           SELECT DISTINCT b1.doc_id
           FROM b1 JOIN c0 ON (b1.m0 = c0.m0 OR b1.m1 = c0.m1 OR b1.m2 = c0.m2 OR b1.m3 = c0.m3)
           WHERE len(list_intersect(b1.sh, c0.sh))::DOUBLE /
               (len(b1.sh) + len(c0.sh) - len(list_intersect(b1.sh, c0.sh))) >= 0.8),
         c1 AS (SELECT * FROM c0
                UNION ALL
                SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM dup1))
         SELECT b2.doc_id AS id_batch, c1.doc_id AS id_corpus,
           round(len(list_intersect(b2.sh, c1.sh))::DOUBLE /
             (len(b2.sh) + len(c1.sh) - len(list_intersect(b2.sh, c1.sh))), 4) AS jaccard
         FROM b2 JOIN c1 ON (b2.m0 = c1.m0 OR b2.m1 = c1.m1 OR b2.m2 = c1.m2 OR b2.m3 = c1.m3)
         WHERE len(list_intersect(b2.sh, c1.sh))::DOUBLE /
             (len(b2.sh) + len(c1.sh) - len(list_intersect(b2.sh, c1.sh))) >= 0.8
         ORDER BY 1, 2""",

    // connected components in SQL: recursive reachability closure over
    // the symmetric pair graph, then min reachable id per node — small
    // graphs only (oracle ceremony; the Spark side iterates min-label
    // propagation instead)
    "q_near_dup_groups" ->
      s"""WITH RECURSIVE s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
             AND (a.m0 = b.m0 OR a.m1 = b.m1 OR a.m2 = b.m2 OR a.m3 = b.m3)
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT src AS id, src AS label FROM edges
           UNION
           SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id)
         SELECT id AS doc_id, min(label) AS keep_id
         FROM reach GROUP BY 1 ORDER BY 1""",

    "q_drop_near_dups" ->
      s"""WITH RECURSIVE s AS (
           SELECT doc_id, list_distinct($SH) AS sh,
             ${mhSql(0)} AS m0, ${mhSql(1)} AS m1, ${mhSql(2)} AS m2, ${mhSql(3)} AS m3
           FROM documents),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM s a JOIN s b ON a.doc_id < b.doc_id
             AND (a.m0 = b.m0 OR a.m1 = b.m1 OR a.m2 = b.m2 OR a.m3 = b.m3)
           WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
               (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
         edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                   UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           SELECT src AS id, src AS label FROM edges
           UNION
           SELECT e.src AS id, r.label FROM edges e JOIN reach r ON e.dst = r.id),
         losers AS (SELECT id FROM (SELECT id, min(label) AS keep_id
                    FROM reach GROUP BY 1) WHERE id != keep_id)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT id FROM losers)
         ORDER BY doc_id""",

    // passage replica: token windows rebuilt in SQL, then the banded
    // EQUI-join candidate shape (one hash join per minhash lane,
    // UNION-dedup'd) — the same plan family Spark runs, and hash-joinable
    // for DuckDB where the OR-join formulation would nested-loop
    "q_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         p0 AS (SELECT doc_id, w,
           unnest(range(0, (len(w) + 9) // 10))::BIGINT AS para_idx FROM t),
         p AS (SELECT doc_id, para_idx,
           array_to_string(w[para_idx * 10 + 1 : para_idx * 10 + 10], ' ') AS pt
           FROM p0)
         SELECT md5(pt) AS p_hash, count(*)::BIGINT AS n_total
         FROM p GROUP BY 1 HAVING count(*) >= 2 ORDER BY p_hash""",

    "q_boilerplate_scrub" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         p0 AS (SELECT doc_id, w,
           unnest(range(0, (len(w) + 9) // 10))::BIGINT AS para_idx FROM t),
         p AS (SELECT doc_id, para_idx,
           array_to_string(w[para_idx * 10 + 1 : para_idx * 10 + 10], ' ') AS pt
           FROM p0),
         freq AS (SELECT md5(pt) AS h FROM p GROUP BY 1 HAVING count(*) >= 2),
         kept AS (SELECT doc_id, para_idx, pt FROM p
           WHERE md5(pt) NOT IN (SELECT h FROM freq)),
         re AS (SELECT doc_id, string_agg(pt, ' ' ORDER BY para_idx) AS clean
           FROM kept GROUP BY doc_id)
         SELECT d.doc_id, md5(coalesce(re.clean, '')) AS clean_hash
         FROM documents d LEFT JOIN re USING (doc_id) ORDER BY doc_id""",

    "q_passage_near_dup" ->
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
         p0 AS (SELECT doc_id, w,
           unnest(range(0, (len(w) + 19) // 20))::BIGINT AS para_idx FROM t),
         p AS (SELECT doc_id * 1000 + para_idx AS pid,
           array_to_string(w[para_idx * 20 + 1 : para_idx * 20 + 20], ' ') AS para_text
           FROM p0),
         s AS (SELECT pid, list_distinct(${shOf("para_text")}) AS sh,
           ${mhSqlOf("para_text", 0)} AS m0, ${mhSqlOf("para_text", 1)} AS m1,
           ${mhSqlOf("para_text", 2)} AS m2, ${mhSqlOf("para_text", 3)} AS m3
           FROM p),
         cand AS (
           SELECT a.pid AS id_a, b.pid AS id_b FROM s a JOIN s b
             ON a.m0 = b.m0 AND a.pid < b.pid
           UNION
           SELECT a.pid, b.pid FROM s a JOIN s b ON a.m1 = b.m1 AND a.pid < b.pid
           UNION
           SELECT a.pid, b.pid FROM s a JOIN s b ON a.m2 = b.m2 AND a.pid < b.pid
           UNION
           SELECT a.pid, b.pid FROM s a JOIN s b ON a.m3 = b.m3 AND a.pid < b.pid)
         SELECT id_a, id_b,
           round(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
             (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 4) AS jaccard
         FROM cand JOIN s sa ON sa.pid = id_a JOIN s sb ON sb.pid = id_b
         WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
             (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.8
         ORDER BY 1, 2""",

    "q_simhash" ->
      s"SELECT doc_id, $simhashSql AS simhash FROM documents ORDER BY doc_id",

    // oracle may use the quadratic scan: pigeonhole banding makes the
    // Spark plan's candidate set lossless within the radius
    "q_simhash_neardup" ->
      s"""WITH s AS (SELECT doc_id, $simhashSql AS sig FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.sig, b.sig))::BIGINT AS hamming_dist
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sig, b.sig)) <= 3
         ORDER BY 1, 2""",

    "q_incremental_simhash" ->
      s"""WITH s AS (SELECT doc_id, $simhashSql AS sig FROM documents),
         b AS (SELECT * FROM s WHERE doc_id % 5 = 0),
         c AS (SELECT * FROM s WHERE doc_id % 5 <> 0)
         SELECT b.doc_id AS id_batch, c.doc_id AS id_corpus,
           bit_count(xor(b.sig, c.sig))::BIGINT AS hamming_dist
         FROM b JOIN c ON bit_count(xor(b.sig, c.sig)) <= 3
         ORDER BY 1, 2""",

    // unrolled left-associative sums so the summation order is
    // bit-identical to the kernel's ascending-dim loop; the md5 CASE
    // per (j,i) is a constant expression DuckDB folds once
    "q_random_proj" -> {
      val dims = (0 until 8).map { j =>
        val terms = (0 until 64).map { i =>
          s"embedding[${i + 1}]::DOUBLE * (CASE WHEN substring(md5('jl1:$j:$i'), 1, 1) " +
            "BETWEEN '0' AND '7' THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)"
        }.mkString(" + ")
        s"(($terms) / sqrt(8))::REAL AS p$j"
      }.mkString(", ")
      s"""SELECT vec_id, $dims FROM embeddings ORDER BY vec_id"""
    },

    "q_embed_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nn
           FROM embeddings),
         sims AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CASE WHEN sqrt(q.nn) * sqrt(c.nn) > 0
             THEN list_dot_product(q.v, c.v) / (sqrt(q.nn) * sqrt(c.nn))
             ELSE 0.0 END AS sim
           FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id != q.vec_id)
         SELECT query_id, rank, neighbor_id, round(sim, 4) AS sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY round(sim, 6) DESC, neighbor_id) AS rank FROM sims)
         WHERE rank <= 3 ORDER BY query_id, rank""",

    "q_embed_neardup_exact" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nn
           FROM embeddings)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)), 4) AS sim
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)) >= 0.4
         ORDER BY 1, 2""",

    // IVF replica: centroid components rounded to 6 decimals on both
    // sides so aggregation order can't perturb assignments; all
    // similarity ranks tie-break on round(sim, 6) then id, matching the
    // Spark windows exactly
    "q_ivf_pq_topk" -> {
      val d2 = (0 until pqSubDim).map(i =>
        s"(em.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}]) * " +
          s"(em.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}])")
        .mkString(" + ")
      val ip = (0 until pqSubDim).map(i =>
        s"p.qv[b.s*8+${i + 1}] * cb.cv[${i + 1}]").mkString(" + ")
      s"""WITH cb(s, c, cv) AS (VALUES
         $pqCbValuesSql),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings),
         cent AS (SELECT label::BIGINT AS cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT label, pos, avg(x) AS m FROM (
             SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings)
             GROUP BY 1, 2) GROUP BY 1),
         centn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
         assign AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn c) WHERE rk = 1),
         probes AS (SELECT query_id, cid, qv FROM (
           SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(CASE WHEN e.n * c.cn > 0
                 THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
                 c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id < 8) WHERE rk <= 2),
         pd AS (SELECT em.vec_id, cb.s, cb.c, $d2 AS d2
           FROM embeddings em CROSS JOIN cb),
         best AS (SELECT vec_id, s, c FROM (
           SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
             ORDER BY d2, c) AS rn FROM pd) WHERE rn = 1),
         ips AS (SELECT p.query_id, a.vec_id AS neighbor_id, b.s, $ip AS ip
           FROM probes p JOIN assign a USING (cid)
           JOIN best b ON b.vec_id = a.vec_id
           JOIN cb ON cb.s = b.s AND cb.c = b.c
           WHERE a.vec_id != p.query_id),
         adc AS (SELECT query_id, neighbor_id,
           round(list_sum(list(ip ORDER BY s)), 6) AS sim
           FROM ips GROUP BY 1, 2)
         SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rank FROM adc)
         WHERE rank <= 4 ORDER BY query_id, rank"""
    },

    // the ivf_pq oracle with the corpus restricted to the indexed
    // 4/5ths, queries vec_id < 10, rk <= 2 probes, top-4 — the
    // serving-against-persisted-index replica (codes/assignment
    // re-derived from the same pinned literals)
    "q_ann_serve" -> {
      val d2 = (0 until pqSubDim).map(i =>
        s"(em.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}]) * " +
          s"(em.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}])")
        .mkString(" + ")
      val ip = (0 until pqSubDim).map(i =>
        s"p.qv[b.s*8+${i + 1}] * cb.cv[${i + 1}]").mkString(" + ")
      s"""WITH cb(s, c, cv) AS (VALUES
         $pqCbValuesSql),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings),
         cent AS (SELECT label::BIGINT AS cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT label, pos, avg(x) AS m FROM (
             SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings)
             GROUP BY 1, 2) GROUP BY 1),
         centn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
         assign AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id % 5 <> 0) WHERE rk = 1),
         probes AS (SELECT query_id, cid, qv FROM (
           SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(CASE WHEN e.n * c.cn > 0
                 THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
                 c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id < 10) WHERE rk <= 2),
         pd AS (SELECT em.vec_id, cb.s, cb.c, $d2 AS d2
           FROM embeddings em CROSS JOIN cb WHERE em.vec_id % 5 <> 0),
         best AS (SELECT vec_id, s, c FROM (
           SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
             ORDER BY d2, c) AS rn FROM pd) WHERE rn = 1),
         ips AS (SELECT p.query_id, a.vec_id AS neighbor_id, b.s, $ip AS ip
           FROM probes p JOIN assign a USING (cid)
           JOIN best b ON b.vec_id = a.vec_id
           JOIN cb ON cb.s = b.s AND cb.c = b.c
           WHERE a.vec_id != p.query_id),
         adc AS (SELECT query_id, neighbor_id,
           round(list_sum(list(ip ORDER BY s)), 6) AS sim
           FROM ips GROUP BY 1, 2)
         SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rank FROM adc)
         WHERE rank <= 4 ORDER BY query_id, rank"""
    },

    // the q_ann_serve machinery + the refine stage: ADC rank <= 8
    // (topK=4 x refineFactor=2) shortlists, exact cosine re-ranks
    "q_ann_serve_refined" -> {
      val d2 = (0 until pqSubDim).map(i =>
        s"(em.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}]) * " +
          s"(em.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}])")
        .mkString(" + ")
      val ip = (0 until pqSubDim).map(i =>
        s"p.qv[b.s*8+${i + 1}] * cb.cv[${i + 1}]").mkString(" + ")
      s"""WITH cb(s, c, cv) AS (VALUES
         $pqCbValuesSql),
         e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings),
         cent AS (SELECT label::BIGINT AS cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT label, pos, avg(x) AS m FROM (
             SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings)
             GROUP BY 1, 2) GROUP BY 1),
         centn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
         assign AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id % 5 <> 0) WHERE rk = 1),
         probes AS (SELECT query_id, cid, qv FROM (
           SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(CASE WHEN e.n * c.cn > 0
                 THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
                 c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id < 10) WHERE rk <= 2),
         pd AS (SELECT em.vec_id, cb.s, cb.c, $d2 AS d2
           FROM embeddings em CROSS JOIN cb WHERE em.vec_id % 5 <> 0),
         best AS (SELECT vec_id, s, c FROM (
           SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
             ORDER BY d2, c) AS rn FROM pd) WHERE rn = 1),
         ips AS (SELECT p.query_id, a.vec_id AS neighbor_id, b.s, $ip AS ip
           FROM probes p JOIN assign a USING (cid)
           JOIN best b ON b.vec_id = a.vec_id
           JOIN cb ON cb.s = b.s AND cb.c = b.c
           WHERE a.vec_id != p.query_id),
         adc AS (SELECT query_id, neighbor_id,
           round(list_sum(list(ip ORDER BY s)), 6) AS sim
           FROM ips GROUP BY 1, 2),
         short AS (SELECT query_id, neighbor_id FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rank FROM adc)
           WHERE rank <= 8),
         refined AS (SELECT s.query_id, s.neighbor_id,
             CASE WHEN eq.n * ec.n > 0
               THEN list_dot_product(eq.v, ec.v) / (eq.n * ec.n)
               ELSE 0 END AS sim
           FROM short s
           JOIN e eq ON eq.vec_id = s.query_id
           JOIN e ec ON ec.vec_id = s.neighbor_id)
         SELECT query_id, rank::BIGINT AS rank, neighbor_id,
           round(sim, 4) AS sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY round(sim, 6) DESC, neighbor_id) AS rank
           FROM refined)
         WHERE rank <= 4 ORDER BY query_id, rank"""
    },

    "q_pq_topk" -> {
      val d2 = (0 until pqSubDim).map(i =>
        s"(e.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}]) * " +
          s"(e.embedding[cb.s*8+${i + 1}]::DOUBLE - cb.cv[${i + 1}])")
        .mkString(" + ")
      val ip = (0 until pqSubDim).map(i =>
        s"q.embedding[b.s*8+${i + 1}]::DOUBLE * cb.cv[${i + 1}]")
        .mkString(" + ")
      s"""WITH cb(s, c, cv) AS (VALUES
         $pqCbValuesSql),
         e AS (SELECT vec_id, embedding FROM embeddings),
         d AS (SELECT e.vec_id, cb.s, cb.c, $d2 AS d2 FROM e CROSS JOIN cb),
         best AS (SELECT vec_id, s, c FROM (
           SELECT vec_id, s, c, row_number() OVER (PARTITION BY vec_id, s
             ORDER BY d2, c) AS rn FROM d) WHERE rn = 1),
         q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           WHERE vec_id < 10),
         ips AS (SELECT q.query_id, b.vec_id AS neighbor_id, b.s, $ip AS ip
           FROM q CROSS JOIN best b
           JOIN cb ON cb.s = b.s AND cb.c = b.c),
         adc AS (SELECT query_id, neighbor_id,
           round(list_sum(list(ip ORDER BY s)), 6) AS sim
           FROM ips GROUP BY 1, 2),
         ranked AS (SELECT query_id, neighbor_id, sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id) AS rank
           FROM adc WHERE query_id <> neighbor_id)
         SELECT query_id, rank::BIGINT AS rank, neighbor_id, sim
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
    },

    "q_cluster_sample" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings),
         cent AS (SELECT label::BIGINT AS cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT label, pos, avg(x) AS m FROM (
             SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings)
             GROUP BY 1, 2) GROUP BY 1),
         centn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
         assign AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn c) WHERE rk = 1),
         r AS (SELECT cid, vec_id,
           ROW_NUMBER() OVER (PARTITION BY cid
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn,
           COUNT(*) OVER (PARTITION BY cid) AS n
         FROM assign)
         SELECT cid, vec_id FROM r WHERE rn * 100 <= n * 20
         ORDER BY cid, vec_id""",

    "q_ivf_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings),
         cent AS (SELECT label::BIGINT AS cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT label, pos, avg(x) AS m FROM (
             SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings)
             GROUP BY 1, 2) GROUP BY 1),
         centn AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent),
         assign AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn c) WHERE rk = 1),
         probes AS (SELECT query_id, cid, qv, qn FROM (
           SELECT e.vec_id AS query_id, e.v AS qv, e.n AS qn, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(CASE WHEN e.n * c.cn > 0
                 THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
                 c.cid) AS rk
           FROM e CROSS JOIN centn c WHERE e.vec_id < 20) WHERE rk <= 2),
         sims AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             CASE WHEN p.qn * e.n > 0
               THEN list_dot_product(p.qv, e.v) / (p.qn * e.n) ELSE 0 END AS sim
           FROM probes p JOIN assign a USING (cid)
           JOIN e ON e.vec_id = a.vec_id
           WHERE a.vec_id != p.query_id)
         SELECT query_id, rank, neighbor_id, round(sim, 4) AS sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY round(sim, 6) DESC, neighbor_id) AS rank FROM sims)
         WHERE rank <= 3 ORDER BY query_id, rank""",

    "q_embed_centroids" ->
      """SELECT label, pos, round(avg(e), 4) AS mean FROM (
           SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
             unnest(embedding)::DOUBLE AS e FROM embeddings)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // one Lloyd round replicated: assign to label-seeded centroids,
    // recompute rounded means, then the probe-limited search of
    // q_ivf_topk against the refined table
    "q_ivf_refined_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
           FROM embeddings),
         cent0 AS (SELECT label::BIGINT AS cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT label, pos, avg(x) AS m FROM (
             SELECT label, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings)
             GROUP BY 1, 2) GROUP BY 1),
         centn0 AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent0),
         assign0 AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn0 c) WHERE rk = 1),
         cent1 AS (SELECT cid,
           list_transform(list(m ORDER BY pos), x -> round(x, 6)) AS cv
           FROM (SELECT a.cid, u.pos, avg(u.x) AS m FROM (
             SELECT vec_id, (generate_subscripts(embedding, 1) - 1)::BIGINT AS pos,
               unnest(embedding)::DOUBLE AS x FROM embeddings) u
             JOIN assign0 a USING (vec_id) GROUP BY 1, 2) GROUP BY 1),
         centn1 AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM cent1),
         assign AS (SELECT vec_id, cid FROM (
           SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(CASE WHEN e.n * c.cn > 0
               THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
               c.cid) AS rk
           FROM e CROSS JOIN centn1 c) WHERE rk = 1),
         probes AS (SELECT query_id, cid, qv, qn FROM (
           SELECT e.vec_id AS query_id, e.v AS qv, e.n AS qn, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY round(CASE WHEN e.n * c.cn > 0
                 THEN list_dot_product(e.v, c.cv) / (e.n * c.cn) ELSE 0 END, 6) DESC,
                 c.cid) AS rk
           FROM e CROSS JOIN centn1 c WHERE e.vec_id < 20) WHERE rk <= 2),
         sims AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             CASE WHEN p.qn * e.n > 0
               THEN list_dot_product(p.qv, e.v) / (p.qn * e.n) ELSE 0 END AS sim
           FROM probes p JOIN assign a USING (cid)
           JOIN e ON e.vec_id = a.vec_id
           WHERE a.vec_id != p.query_id)
         SELECT query_id, rank, neighbor_id, round(sim, 4) AS sim FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY round(sim, 6) DESC, neighbor_id) AS rank FROM sims)
         WHERE rank <= 3 ORDER BY query_id, rank""")
}
