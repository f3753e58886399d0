package graft

import org.apache.spark.sql.functions._
import graft.ops.Dsir

/** DSIR importance resampling (Xie 2023): model/ratio laws, the
  * join-path == local-kernel law, domain preference, determinism. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 64

  // "formal" target corpus vs a raw mix of formal + casual docs
  private val target = Seq(
    "the committee shall review the annual report",
    "the report shall state the findings of the committee",
    "members of the committee review the annual findings").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }
  private val raw = Seq(
    (10L, "the committee shall review the report"),   // formal-like
    (11L, "findings of the annual report committee"), // formal-like
    (12L, "lol cat memes go brrr haha"),              // casual
    (13L, "omg so funny lol wow much meme"),          // casual
    (14L, "the annual findings shall state members"), // formal-like
    (15L, ""))                                        // no features

  test("logRatios: complete dim-row table, smoothed models normalize") {
    val rt = Dsir.logRatios(target.toDF("id", "text"),
      raw.toDF("id", "text"), "text", dim)
    val rows = rt.collect()
    assert(rows.length === dim)
    assert(rows.map(_.getInt(0)).sorted.toSeq === (0 until dim))
    // kernel law: the fused count-vector path == the explode/featureIdx
    // formulation (same top-60-md5-bits bucket)
    val tc = Dsir.bucketCounts(target.toDF("id", "text"), "text", dim)
      .as[(Int, Long)].collect().toMap
    val explodePath = target.toDF("id", "text")
      .select(explode(Dsir.featureStrings(col("text"))).as("t"))
      .select(graft.ops.QualityClassifier.featureIdx(col("t"), dim).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(tc === explodePath)
    // add-1 smoothing: sum_b (c_b+1)/(total+dim) = 1 exactly per corpus
    val total = tc.values.sum
    val pSum = (0 until dim).map(b =>
      (tc.getOrElse(b, 0L) + 1.0) / (total + dim)).sum
    assert(math.abs(pSum - 1.0) < 1e-12)
  }

  test("join-path logw == local LinearBagScoreExpr fold on the same ratios") {
    val rawDf = raw.toDF("id", "text")
    val ratios = Dsir.logRatios(target.toDF("id", "text"), rawDf, "text", dim)
    val joinPath = Dsir.logImportance(rawDf, ratios, dim, "text", "id")
      .select(col("id"), col("logw")).as[(Long, Double)].collect().toMap
    // same ratio vector as a local weight array: the streaming
    // map-only scoring shape
    val w = ratios.as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    val localPath = Dsir.logImportanceLocal(rawDf, w.toSeq, dim, "text", "id")
      .as[(Long, Double)].collect().toMap
    assert(joinPath.keySet === localPath.keySet) // doc 15 absent from both
    joinPath.foreach { case (id, lw) =>
      assert(math.abs(lw - localPath(id)) < 1e-9, s"doc $id") }
  }

  test("resampling prefers docs from the target domain") {
    val rawDf = raw.toDF("id", "text")
    val ratios = Dsir.logRatios(target.toDF("id", "text"), rawDf, "text", dim)
    val lw = Dsir.logImportance(rawDf, ratios, dim, "text", "id")
      .select(col("id"), col("logw")).as[(Long, Double)].collect().toMap
    val formal = Seq(10L, 11L, 14L).map(lw)
    val casual = Seq(12L, 13L).map(lw)
    assert(formal.min > casual.max,
      s"formal $formal should all outweigh casual $casual")
    // top-2 resample picks formal-like docs (weights dominate the noise)
    val picked = Dsir.resample(rawDf, target.toDF("id", "text"),
      "text", "id", dim, k = 2).select("id").as[Long].collect().toSet
    assert(picked.subsetOf(Set(10L, 11L, 14L)))
  }

  test("resample is deterministic across runs and seeds change the draw") {
    val rawDf = raw.toDF("id", "text")
    val tgtDf = target.toDF("id", "text")
    def run(seed: Int) = Dsir.resample(rawDf, tgtDf, "text", "id", dim,
      k = 3, seed = seed).select("id").as[Long].collect().toSeq
    assert(run(7) === run(7))
    // different seed may reorder the marginal picks; keys must differ
    val k7 = Dsir.resample(rawDf, tgtDf, "text", "id", dim, 3, 7)
      .select("key").as[Double].collect().toSet
    val k8 = Dsir.resample(rawDf, tgtDf, "text", "id", dim, 3, 8)
      .select("key").as[Double].collect().toSet
    assert(k7 !== k8)
  }
}
