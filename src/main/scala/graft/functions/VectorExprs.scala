package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd vector kernel.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are
  * interpreted — fine for per-row feature extraction, fatal inside an
  * O(n²) similarity join where the dot product IS the hot loop. This
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen (preference order from SURVEY.md §7: custom Expression
  * before mapPartitions). Callers must pass array<double> columns.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorExprs {

  private val registered =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Register the kernel in the session's function registry (idempotent).
    * Keyed on the session object's identity hash — `sessionUUID` is
    * `private[sql]` in Spark 4.1 and must not be touched here. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (registered.add(System.identityHashCode(spark).toString)) {
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    }

  /** Codegen'd dot product of two array<double> columns. The executing
    * session must have been touched by `ensureRegistered` before the
    * plan is analyzed — graft.ops.Similarity's DataFrame entry points
    * do this on their input's session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
