package graft

import org.apache.spark.sql.functions._
import graft.ops.QualityClassifier

/** fastText-style hashed-bag logistic classifier vs a plain-Scala
  * local reference: identical feature hashing (md5 60-bit bucket),
  * identical drop rules (zero-token docs), full-batch GD with the
  * same hyperparameters. Distributed gradient sums differ from the
  * local reference only in FP summation order, so weights compare
  * under a tight tolerance while hard predictions compare exactly. */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def refFeatIdx(tok: String, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % dim).toInt
  }

  private def refTokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  private def refTrain(docs: Seq[(String, Double)], dim: Int,
                       iters: Int, lr: Double): Array[Double] = {
    val feats = docs
      .map { case (t, y) => (refTokens(t).map(refFeatIdx(_, dim)) :+ dim, y) }
      .filter(_._1.length > 1)
    val n = feats.length.toDouble
    val w = Array.fill(dim + 1)(0.0)
    for (_ <- 0 until iters) {
      val g = Array.fill(dim + 1)(0.0)
      feats.foreach { case (fs, y) =>
        val m = fs.map(w(_)).sum
        val r = 1.0 / (1.0 + math.exp(-m)) - y
        fs.foreach(f => g(f) += r)
      }
      for (f <- 0 to dim) w(f) -= lr * g(f) / n
    }
    w
  }

  private val planted: Seq[(Long, String, Int)] = (0 until 40).map { i =>
    val noise = Seq("the", "a", "of")(i % 3)
    if (i % 2 == 0) (i.toLong, s"$noise excellent prose $noise clear", 1)
    else (i.toLong, s"$noise spammy junk $noise noisy", 0)
  }

  test("featureIdx matches the local md5-bucket reference (multibyte included)") {
    val toks = Seq("the", "excellent", "中文", "😀", "a-b_c", "<PHONE>")
    for (dim <- Seq(16, 64, 128)) {
      val got = toks.toDF("t")
        .select(QualityClassifier.featureIdx(col("t"), dim)).as[Int].collect()
      assert(got.toSeq === toks.map(refFeatIdx(_, dim)), s"dim=$dim")
    }
  }

  test("train separates a planted corpus; margins clear the boundary") {
    val df = planted.toDF("id", "text", "y")
    val w = QualityClassifier.train(df, "text", "id", "y",
      dim = 64, iters = 200, lr = 1.0)
    val scored = QualityClassifier.scoreDocs(df, w.toSeq, 64, "text", "id")
      .join(df.select(col("id"), col("y")), Seq("id"))
      .select(col("id"), col("margin"), col("y")).as[(Long, Double, Int)]
      .collect()
    assert(scored.length === planted.length)
    scored.foreach { case (id, m, y) =>
      assert((m >= 0) === (y == 1), s"doc $id margin $m label $y")
      assert(math.abs(m) > 0.1, s"doc $id margin $m too close to the boundary")
    }
  }

  test("distributed training equals the local reference up to FP summation order") {
    val df = planted.toDF("id", "text", "y")
    val got = QualityClassifier.train(df, "text", "id", "y",
      dim = 32, iters = 60, lr = 0.8)
    val want = refTrain(planted.map(p => (p._2, p._3.toDouble)), 32, 60, 0.8)
    val maxDiff = got.zip(want).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 1e-9, s"max weight diff $maxDiff")
  }

  test("training is deterministic run-to-run") {
    val df = planted.toDF("id", "text", "y")
    val w1 = QualityClassifier.train(df, "text", "id", "y", dim = 32, iters = 30)
    val w2 = QualityClassifier.train(df, "text", "id", "y", dim = 32, iters = 30)
    assert(w1.toSeq === w2.toSeq)
  }

  test("NaN labels are refused LOUDLY; null labels skip gradients but count in n (r21 ADVICE)") {
    // null label: the row contributes NO gradient yet still counts in n
    // (the old Catalyst sum()-skips-null semantics) — training must
    // succeed and differ from training without the row only through n
    val base = planted.toDF("id", "text", "y")
    val withNull = base.unionByName(
      Seq((9999L, "filler words here", 1)).toDF("id", "text", "y")
        .withColumn("y", lit(null).cast("int")))
    val wNull = QualityClassifier.train(withNull, "text", "id", "y",
      dim = 32, iters = 5)
    assert(wNull.forall(v => !v.isNaN), "null label must not poison weights")
    // a genuine NaN label is OUT OF CONTRACT: must throw, not train
    val withNaN = base.select(col("id"), col("text"),
      when(col("id") === 0L, lit(Double.NaN)).otherwise(col("y").cast("double"))
        .as("y"))
    val e = intercept[org.apache.spark.SparkException] {
      QualityClassifier.train(withNaN, "text", "id", "y", dim = 32, iters = 2)
    }
    assert(e.getMessage.contains("NaN") ||
      Option(e.getCause).exists(_.getMessage.contains("NaN")))
  }

  test("codegen'd margin kernel equals the HOF formulation bit-exactly") {
    import org.apache.spark.sql.Column
    val dim = 32
    val rng = new scala.util.Random(77)
    val w = Array.fill(dim + 1)(math.rint(rng.nextGaussian() * 1e6) / 1e6)
    // the pre-kernel formulation: filter+transform+aggregate HOFs
    def hofMargin(text: Column): Column = {
      val wl = typedLit(w.toSeq)
      aggregate(
        transform(
          filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0),
          t => QualityClassifier.featureIdx(t, dim)),
        lit(w.last), (acc, f) => acc + element_at(wl, f + 1))
    }
    val docs = Seq(
      (1L, "the quick brown fox 中文 😀 jumps"),
      (2L, "a a a a a a a a a a a a"),
      (3L, "mixed 123 !punct? and-dashes x"),
      (4L, "singleton")).toDF("id", "text")
    val got = QualityClassifier.scoreDocs(docs, w.toSeq, dim, "text", "id")
      .select("id", "margin").as[(Long, Double)].collect().toSeq.sortBy(_._1)
    val want = docs.select(col("id"), hofMargin(col("text")).as("m"))
      .as[(Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gi, gm), (wi, wm)) =>
      assert(gi === wi)
      assert(java.lang.Double.doubleToRawLongBits(gm) ===
        java.lang.Double.doubleToRawLongBits(wm), s"doc $gi: $gm vs $wm")
    }
  }

  test("scoreDocs drops zero-token docs; prob is the sigmoid of the margin; filter agrees") {
    val w = Array.fill(17)(0.0); w(16) = 0.3 // bias-only model, dim 16
    val df = Seq((1L, "some words"), (2L, "   "), (3L, "")).toDF("id", "text")
    val got = QualityClassifier.scoreDocs(df, w.toSeq, 16, "text", "id")
      .select("id", "margin", "prob").as[(Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(1L))
    assert(math.abs(got(0)._2 - 0.3) < 1e-12)
    assert(math.abs(got(0)._3 - 1.0 / (1.0 + math.exp(-0.3))) < 1e-12)
    val kept = QualityClassifier.filterByQuality(df, w.toSeq, 16, "text", cut = 0.0)
      .select("id").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }
}
