package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query constant-floor decomposition (r12 verdict lead item):
  * split a query's wall time into build (query-fn call, incl. any
  * driver-side training collects), plan (analysis+optimization+
  * physical planning), and exec (noop write), and report job/stage/
  * task counts plus summed executor task time so wall − taskTime/cpus
  * exposes the scheduling/barrier overhead. Temporary diagnostic, not
  * part of the library surface.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val repeat = 3
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskMs = new AtomicLong
    val jobSpans = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val jobStartMs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); jobStartMs.put(j.jobId, j.time); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = jobStartMs.get(j.jobId)
        if (s != null) { jobSpans.add((j.jobId, s.longValue, j.time)); () }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) { taskMs.addAndGet(t.taskMetrics.executorRunTime); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[floor] warmup: $e") }
    for (n <- args; r <- 1 to repeat) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      jobSpans.clear(); jobStartMs.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      Thread.sleep(400) // let listener events drain
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
      println(s"[floor] $n run$r wall=${s(t0, t3)} build=${s(t0, t1)} " +
        s"plan=${s(t1, t2)} exec=${s(t2, t3)} jobs=${jobs.get} " +
        s"stages=${stages.get} tasks=${tasks.get} " +
        f"taskSec=${taskMs.get / 1e3}%.2f")
      if (r == repeat) {
        import scala.jdk.CollectionConverters._
        val spans = jobSpans.asScala.toSeq.sortBy(_._2)
        val inJob = spans.map(x => x._3 - x._2).sum
        val gaps = spans.sliding(2).collect {
          case Seq(a, b) => math.max(0L, b._2 - a._3) }.sum
        println(f"[floor]   jobs-timeline: inJob=${inJob / 1e3}%.3f " +
          f"gapsBetween=${gaps / 1e3}%.3f " +
          spans.map(x => s"${x._1}:${x._3 - x._2}ms").mkString(" "))
      }
    }
    spark.stop()
  }
}
