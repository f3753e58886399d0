package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (r21): price the external-Row conversion that
  * GlobalScan's two RDD passes pay, at 60M rows — the decisive
  * datapoint for the "InternalRow rewrite" r22 candidate.
  *
  * Methodology: the same range-parted, checkpointed 60M-row frame is
  * traversed (a) via df.rdd (InternalRow → external Row conversion per
  * row — what GlobalScan's passes do today, minus their per-row
  * arithmetic), and (b) via queryExecution.toRdd (no conversion).
  * The delta is the ceiling of what an InternalRow rewrite could save
  * per pass. Also times the real prefixSum end-to-end for context.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = spark.read.parquet("/tmp/scale100/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"))
    val parted = li
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
        col("l_orderkey"), col("l_partkey"))
      .sortWithinPartitions(col("l_orderkey"), col("l_partkey"))
      .localCheckpoint()
    println(s"[probe] rows = ${parted.count()}")
    for (r <- 1 to 3) {
      t(s"run$r toRdd traversal (InternalRow, no conversion)") {
        val n = parted.queryExecution.toRdd
          .mapPartitions(it => { var c = 0L; it.foreach(_ => c += 1); Iterator(c) })
          .collect().sum
        require(n > 0)
      }
      t(s"run$r df.rdd traversal (external Row conversion)") {
        val n = parted.rdd
          .mapPartitions(it => { var c = 0L; it.foreach(_ => c += 1); Iterator(c) })
          .collect().sum
        require(n > 0)
      }
      t(s"run$r df.rdd traversal + getLong (GlobalScan pass-1 shape)") {
        val n = parted.rdd
          .mapPartitions { it =>
            var s = 0L
            it.foreach(r0 => s = Math.addExact(s, r0.getLong(0)))
            Iterator(s)
          }.collect().length
        require(n > 0)
      }
    }
    t("prefixSum end-to-end at 60M rows (both passes + exchange)") {
      graft.api.GlobalScan.prefixSum(li,
        Seq(col("l_orderkey"), col("l_partkey")), col("l_quantity"), "ps")
        .write.format("noop").mode("overwrite").save()
    }
    // decompose: where do the end-to-end seconds go?
    val staged = li.withColumn("__v", coalesce(col("l_quantity").cast("long"), lit(0L)))
    val parted2 = t("decomp: range exchange + sort + localCheckpoint") {
      val p = staged
        .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
          col("l_orderkey"), col("l_partkey"))
        .sortWithinPartitions(col("l_orderkey"), col("l_partkey"))
        .localCheckpoint()
      p.count(); p
    }
    val vIdx = staged.schema.length - 1
    t("decomp: pass-1 (totals per partition)") {
      parted2.rdd.mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r0 => s = Math.addExact(s, r0.getLong(vIdx)))
        Iterator((pid, s))
      }.collect()
    }
    // interleaved same-JVM A/B of the two pass-2 shapes (r22): the old
    // external-Row rebuild vs the InternalRow projection rewrite —
    // 3 rounds each, alternating, so box drift hits both sides alike
    for (r <- 1 to 3) {
      t(s"decomp round$r: pass-2 OLD (Row.fromSeq + createDataFrame re-encode + noop)") {
        val outRdd = parted2.rdd.mapPartitionsWithIndex { (pid, it) =>
          var run = 0L
          it.map { r0 =>
            run = Math.addExact(run, r0.getLong(vIdx))
            org.apache.spark.sql.Row.fromSeq(r0.toSeq.updated(vIdx, run))
          }
        }
        spark.createDataFrame(outRdd, parted2.schema)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"decomp round$r: pass-2 NEW (InternalRow proj + internalCreateDataFrame + noop)") {
        val fields = parted2.schema.fields
        val outRdd = parted2.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
          import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
          val exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
            fields.zipWithIndex.map { case (f, idx) =>
              BoundReference(idx, f.dataType, f.nullable)
            }.toSeq.updated(vIdx,
              BoundReference(fields.length,
                org.apache.spark.sql.types.LongType, nullable = false))
          val proj = UnsafeProjection.create(exprs)
          val joined = new JoinedRow
          val extra = new GenericInternalRow(1)
          var run = 0L
          it.map { r0 =>
            run = Math.addExact(run, r0.getLong(vIdx))
            extra.update(0, run)
            proj(joined(r0, extra)): org.apache.spark.sql.catalyst.InternalRow
          }
        }
        org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(
          spark, outRdd, parted2.schema)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
