package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr.{FixedDotExpr, PortableHashExpr}

/** Library integration point: inject the engine's native expressions
  * into any session via configuration —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * — the standard way a Spark library ships catalog surface (no code
  * change in the host application; functions resolve in plain SQL).
  * [[graft.expr.GraftFunctions.ensureRegistered]] remains as the
  * programmatic per-session alternative; both routes bind the same
  * expressions, so plans and results are identical.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hash"),
      new ExpressionInfo(classOf[PortableHashExpr].getName, "graft_hash"),
      (exprs: Seq[Expression]) => PortableHashExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_fixed_dot"),
      new ExpressionInfo(classOf[FixedDotExpr].getName, "graft_fixed_dot"),
      (exprs: Seq[Expression]) => FixedDotExpr(exprs.head, exprs(1))))
  }
}
