package graft

import org.apache.spark.sql.SparkSession

/** Re-prove the JSONL ingest conservation law at the 100× probe scale
  * with the r13 cache-free reader (r12 verdict #2's "Done" clause):
  * generate `files` JSONL shards of `linesPerFile` lines with a
  * deterministic 1% malformed rate, read with Ingest.readJsonl, and
  * assert docs + quarantine == total lines and quarantine == planted.
  *
  * Usage: runMain graft.IngestScaleProbe <scratchDir> [files] [linesPerFile]
  */
object IngestScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val files = if (args.length > 1) args(1).toInt else 8
    val linesPerFile = if (args.length > 2) args(2).toInt else 250000
    java.nio.file.Files.createDirectories(dir)
    var planted = 0L
    for (f <- 0 until files) {
      val sb = new StringBuilder(linesPerFile * 64)
      var i = 0
      while (i < linesPerFile) {
        val id = f.toLong * linesPerFile + i
        if (id % 100 == 37) {
          sb.append(s"this line $id is not json at all\n"); planted += 1
        } else if (id % 100 == 73) {
          sb.append(s"""{"doc_id": $id, "text": "truncated\n"""); planted += 1
        } else {
          sb.append(s"""{"doc_id": $id, "text": "alpha beta doc $id", """)
          sb.append(s""""lang": "en", "source": "s${id % 7}"}\n""")
        }
        i += 1
      }
      java.nio.file.Files.writeString(dir.resolve(s"part$f.jsonl"),
        sb.toString)
    }
    val total = files.toLong * linesPerFile
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val r = graft.sources.Ingest.readJsonl(spark, dir.toString)
    val nDocs = r.docs.count()
    val nQuar = r.quarantine.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[ingest100x] lines=$total docs=$nDocs quarantine=$nQuar " +
      f"planted=$planted wall=$secs%.1f s")
    assert(nDocs + nQuar == total,
      s"conservation violated: $nDocs + $nQuar != $total")
    assert(nQuar == planted, s"quarantine $nQuar != planted $planted")
    println("[ingest100x] conservation law holds at scale, cache-free")
    spark.stop()
  }
}
