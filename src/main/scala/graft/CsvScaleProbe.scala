package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for readCsvMultiline's two declared claims:
  *
  *  1. CONSERVATION at probe scale — docs + quarantine == records,
  *     with quoted embedded newlines (so records ≠ lines) and a
  *     deterministic 1% malformed rate;
  *  2. the NON-SPLITTABILITY cost is real and priced — multiLine
  *     record boundaries need the quote parser, so one file = one
  *     task: the same records read as ONE big file vs `shards` files
  *     should differ by roughly the task-parallelism factor, which is
  *     the "keep shards modest at write time" advice with a number
  *     attached.
  *
  * Usage: runMain graft.CsvScaleProbe <scratchDir> [shards] [recordsPerShard]
  */
object CsvScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val shards = if (args.length > 1) args(1).toInt else 16
    val perShard = if (args.length > 2) args(2).toInt else 250000
    val shardDir = dir.resolve("sharded")
    val oneDir = dir.resolve("onefile")
    java.nio.file.Files.createDirectories(shardDir)
    java.nio.file.Files.createDirectories(oneDir)
    val hdr = "doc_id,text,lang,source\n"
    var planted = 0L
    val one = java.nio.file.Files.newBufferedWriter(oneDir.resolve("all.csv"))
    one.write(hdr)
    for (f <- 0 until shards) {
      val sb = new StringBuilder(perShard * 72)
      sb.append(hdr)
      var i = 0
      while (i < perShard) {
        val id = f.toLong * perShard + i
        if (id % 100 == 37) {
          sb.append(s"notanumber,oops $id,en,web\n"); planted += 1
        } else {
          // every record carries a quoted embedded newline + comma +
          // doubled quote: records != lines everywhere, not just on a
          // planted few
          sb.append(s"""$id,"alpha beta $id""").append('\n')
            .append(s"""second line, ""q"" $id",en,s${id % 7}""").append('\n')
        }
        i += 1
      }
      val s = sb.toString
      java.nio.file.Files.writeString(shardDir.resolve(s"part$f.csv"), s)
      one.write(s.substring(hdr.length)) // single file: one header total
    }
    one.close()
    val total = shards.toLong * perShard

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      r
    }
    val sharded = graft.sources.Ingest.readCsvMultiline(spark, shardDir.toString)
    val nq = sharded.quarantine.count()
    val nd = sharded.docs.count() // cold pass: page cache + codegen warm
    println(s"[probe] conservation: docs=$nd quarantine=$nq records=$total " +
      (if (nd + nq == total && nq == planted) "OK" else "VIOLATED"))
    require(nd + nq == total && nq == planted, "conservation violated")
    val onef = graft.sources.Ingest.readCsvMultiline(spark, oneDir.toString)
    val nd1 = onef.docs.count() // cold pass for the single file too
    require(nd1 == nd, s"single-file docs $nd1 != sharded $nd")
    // warm, like-for-like: one docs.count() each
    time(s"sharded docs pass ($shards tasks)") { sharded.docs.count() }
    time("single-file docs pass (1 task)") { onef.docs.count() }
    println("[probe] the gap above IS the declared multiLine " +
      "non-splittability cost: one file = one task")
    spark.stop()
  }
}
