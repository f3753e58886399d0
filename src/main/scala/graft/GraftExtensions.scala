package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The library's `spark.sql.extensions` entry point — makes graft a
  * properly INSTALLABLE Spark extension instead of a
  * register-on-first-use library:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * installs (1) every graft kernel/aggregate as a SQL function in every
  * session built over the config (`SELECT graft_dot(a, b) FROM ...`
  * works in plain SQL with zero imports), and (2) the
  * [[graft.plans.RangeJoinRewrite]] optimizer rule, which turns naive
  * keyless interval joins — the BroadcastNestedLoopJoin trap — into
  * the bucketed equi-join plan automatically. The Scala Column API is
  * unaffected (it registers lazily per session either way); this is
  * the SQL-user and cluster-deployment surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.VectorExprs.functionBuilders.foreach {
      case (name, builder) =>
        ext.injectFunction((FunctionIdentifier(name),
          new ExpressionInfo("graft", name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
