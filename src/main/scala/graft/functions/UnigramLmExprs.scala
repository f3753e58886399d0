package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for unigram-LM (SentencePiece-style, Kudo 2018) tokenizer
  * training and segmentation. Both take the piece table as a LOCAL map
  * (tokenizer-sized by definition — the localModel convention) and run
  * inside whole-stage codegen via `addReferenceObj`; the corpus-scale
  * side stays a map over the distinct-token table (E-step) or the
  * documents (segmentation).
  */
object UnigramLmKernels {

  /** Forward-backward expected piece counts for ONE token under piece
    * probabilities `p` (prob space, not log): returns (piece, c) pairs
    * with c = expected number of times the piece is used in a random
    * segmentation of this token, pieces limited to length ≤ maxLen.
    * Tokens with no full segmentation (a char missing from the vocab)
    * contribute nothing — the trainer seeds all single chars, so this
    * only happens on foreign input. */
  def expectedCounts(tok: UTF8String,
                     p: java.util.HashMap[String, java.lang.Double],
                     maxLen: Int): ArrayData = {
    val s = tok.toString
    // codepoint boundaries: cps(i) = char index of codepoint i
    val bounds = codepointBounds(s)
    val n = bounds.length - 1
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      var a = 0.0
      while (j < i) {
        if (alpha(j) != 0.0) {
          val pr = p.get(s.substring(bounds(j), bounds(i)))
          if (pr != null) a += alpha(j) * pr.doubleValue()
        }
        j += 1
      }
      alpha(i) = a
      i += 1
    }
    val z = alpha(n)
    if (z == 0.0) return new GenericArrayData(Array.empty[Any])
    beta(n) = 1.0
    i = n - 1
    while (i >= 0) {
      var k = math.min(n, i + maxLen)
      var b = 0.0
      while (k > i) {
        if (beta(k) != 0.0) {
          val pr = p.get(s.substring(bounds(i), bounds(k)))
          if (pr != null) b += pr.doubleValue() * beta(k)
        }
        k -= 1
      }
      beta(i) = b
      i -= 1
    }
    val acc = new java.util.HashMap[String, Double]()
    var j = 0
    while (j < n) {
      if (alpha(j) != 0.0) {
        var k = j + 1
        val kMax = math.min(n, j + maxLen)
        while (k <= kMax) {
          val piece = s.substring(bounds(j), bounds(k))
          val pr = p.get(piece)
          if (pr != null && beta(k) != 0.0) {
            val c = alpha(j) * pr.doubleValue() * beta(k) / z
            if (c != 0.0) acc.merge(piece, c, (a: Double, b: Double) => a + b)
          }
          k += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](acc.size)
    var idx = 0
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(idx) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue.doubleValue()))
      idx += 1
    }
    new GenericArrayData(out)
  }

  /** Viterbi segmentation of every token in the array under LOG piece
    * probabilities; subwords emitted in order. Ties prefer the longer
    * piece (deterministic). Unsegmentable tokens fall back to their
    * raw codepoints (full coverage contract — foreign chars pass
    * through as singletons). Empty tokens are skipped. */
  def viterbi(arr: ArrayData,
              logp: java.util.HashMap[String, java.lang.Double],
              maxLen: Int): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n0 = arr.numElements()
    var t = 0
    while (t < n0) {
      val s = arr.getUTF8String(t).toString
      if (s.nonEmpty) {
        val bounds = codepointBounds(s)
        val n = bounds.length - 1
        val best = Array.fill(n + 1)(Double.NegativeInfinity)
        val back = new Array[Int](n + 1)
        best(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxLen)
          while (j < i) {
            if (best(j) != Double.NegativeInfinity) {
              val lp = logp.get(s.substring(bounds(j), bounds(i)))
              if (lp != null) {
                val sc = best(j) + lp.doubleValue()
                // ties -> longer piece (smaller j) wins: strict > keeps
                // the first (smallest-j) maximum because j ascends
                if (sc > best(i)) { best(i) = sc; back(i) = j }
              }
            }
            j += 1
          }
          i += 1
        }
        if (best(n) == Double.NegativeInfinity) {
          // coverage fallback: raw codepoints
          var c = 0
          while (c < n) {
            out += UTF8String.fromString(s.substring(bounds(c), bounds(c + 1)))
            c += 1
          }
        } else {
          val pieces = scala.collection.mutable.ArrayBuffer.empty[Any]
          var i2 = n
          while (i2 > 0) {
            pieces += UTF8String.fromString(s.substring(bounds(back(i2)), bounds(i2)))
            i2 = back(i2)
          }
          out ++= pieces.reverse
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def codepointBounds(s: String): Array[Int] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    b += 0
    while (i < s.length) {
      i += Character.charCount(s.codePointAt(i))
      b += i
    }
    b.toArray
  }
}

/** Expected piece counts of one token (see
  * [[UnigramLmKernels.expectedCounts]]) — the E-step projection over
  * the distinct-token table. */
case class UnigramExpectedCountsExpr(child: Expression,
                                     probs: java.util.HashMap[String, java.lang.Double],
                                     maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("c", DoubleType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnigramLmKernels.expectedCounts(
      input.asInstanceOf[UTF8String], probs, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("ulmProbs", probs, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramLmKernels.expectedCounts($c, $p, $maxLen)")
  }

  override protected def withNewChildInternal(c: Expression): UnigramExpectedCountsExpr =
    copy(child = c)
}

/** Viterbi segmentation of a token array (see
  * [[UnigramLmKernels.viterbi]]) — the inference projection over
  * documents. */
case class UnigramViterbiExpr(child: Expression,
                              logp: java.util.HashMap[String, java.lang.Double],
                              maxLen: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    UnigramLmKernels.viterbi(input.asInstanceOf[ArrayData], logp, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("ulmLogp", logp, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramLmKernels.viterbi($c, $p, $maxLen)")
  }

  override protected def withNewChildInternal(c: Expression): UnigramViterbiExpr =
    copy(child = c)
}
