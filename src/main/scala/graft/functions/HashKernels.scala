package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for MinHashMd5 — also called from generated code. */
object HashKernels {

  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  /** min over elements of md5(prefix ++ element), as lowercase hex.
    * The min is taken on the raw 16-byte digests (unsigned byte order
    * == hex string order, hex being monotone in the bytes), so only the
    * single winning digest is hex-encoded. Null for an empty array —
    * array_min semantics. */
  def minHashMd5(arr: ArrayData, prefix: Array[Byte]): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return null
    val digest = digests.get()
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      digest.reset()
      if (prefix.length > 0) digest.update(prefix)
      digest.update(s.getBytes)
      val h = digest.digest()
      if (min == null || unsignedLess(h, min)) min = h
      i += 1
    }
    toHex(min)
  }

  /** Fused shingle+minhash: min over k-token shingles of
    * md5(prefix || tokens[i..i+k-1] joined by ' '). The shingle strings
    * are never materialized — token bytes and separators stream into
    * the digest — which removes the interpreted `transform` pass that
    * dominates the expression formulation (HOF lambdas run outside
    * whole-stage codegen). Null when fewer than k tokens, matching
    * array_min over an empty shingle array. */
  def minHashMd5Shingles(arr: ArrayData, k: Int,
                         prefix: Array[Byte]): UTF8String = {
    val n = arr.numElements()
    if (n < k) return null
    val digest = digests.get()
    var min: Array[Byte] = null
    var i = 0
    while (i <= n - k) {
      digest.reset()
      if (prefix.length > 0) digest.update(prefix)
      var j = 0
      while (j < k) {
        digest.update(arr.getUTF8String(i + j).getBytes)
        if (j < k - 1) digest.update(' '.toByte)
        j += 1
      }
      val h = digest.digest()
      if (min == null || unsignedLess(h, min)) min = h
      i += 1
    }
    toHex(min)
  }

  private def toHex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HEX((bytes(j) >> 4) & 0xf)
      out(2 * j + 1) = HEX(bytes(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  private val SPACE = UTF8String.fromString(" ")

  /** tokens -> array of space-joined k-gram UTF8Strings (empty if < k). */
  def shingleArray(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val out = new Array[AnyRef](n - k + 1)
    val window = new Array[UTF8String](2 * k - 1)
    var j = 1
    while (j < 2 * k - 1) { window(j) = SPACE; j += 2 }
    var i = 0
    while (i <= n - k) {
      var t = 0
      while (t < k) { window(2 * t) = arr.getUTF8String(i + t); t += 1 }
      out(i) = UTF8String.concat(window: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

/** Codegen'd k-token shingling: tokens -> array of space-joined k-grams
  * in one pass. Bit-identical to the transform/concat_ws formulation
  * (TextAnalysis.shingles' original HOF), which ran interpreted and
  * dominated every operator that materializes shingle sets (near-dup
  * Jaccard verify). Fewer than k tokens -> empty array. */
case class ShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.shingleArray(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.shingleArray($a, $k);")

  override protected def withNewChildInternal(c: Expression): ShinglesExpr =
    copy(child = c)
}

/** One-pass MinHash lane: min over shingles of md5(prefix || shingle),
  * bit-identical to `array_min(transform(shingles, s => md5(concat(
  * lit(prefix), s))))` but without materializing the mapped array, the
  * per-element concat/hex strings, or a fresh MessageDigest per call
  * (Spark's Md5 goes through DigestUtils.md5Hex, which allocates one
  * every invocation — this kernel holds a thread-local).
  */
case class MinHashMd5(child: Expression, prefix: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minHashMd5(input.asInstanceOf[ArrayData], prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pref = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
      val r = ctx.freshName("minhash")
      s"""
         |UTF8String $r = graft.functions.HashKernels.minHashMd5($a, $pref);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashMd5 =
    copy(child = c)
}

/** Fused k-shingle MinHash lane over a TOKEN array: bit-identical to
  * building the shingle strings first and feeding them to MinHashMd5
  * (UTF-8 bytes of "a b c" == bytes of a ++ ' ' ++ b ++ ' ' ++ c), but
  * the shingles never exist as objects — the whole lane is one streamed
  * digest pass per row. */
case class MinHashMd5Tokens(child: Expression, k: Int, prefix: String)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(input: Any): Any =
    HashKernels.minHashMd5Shingles(input.asInstanceOf[ArrayData], k, prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pref = ctx.addReferenceObj("prefix", prefixBytes, "byte[]")
      val r = ctx.freshName("minhash")
      s"""
         |UTF8String $r = graft.functions.HashKernels.minHashMd5Shingles($a, $k, $pref);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashMd5Tokens =
    copy(child = c)
}
