package graft

import graft.plans.{FloatDotProduct, TokenizeGenerator}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for the standard extensions mechanism:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the custom Catalyst expressions (`graft_dot`,
  * `graft_tokenize`) into every session built from that config — no
  * user code required, the way a deployed library ships its functions.
  * `GraftSession.registerFunctions` remains the programmatic equivalent
  * for sessions built in code (it registers the same builders as temp
  * functions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // analysis-time arity check: a wrong-arity SQL call must surface as a
  // comprehensible error, not an IndexOutOfBoundsException from the builder
  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        arity("graft_dot", 2, exprs); FloatDotProduct(exprs(0), exprs(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[TokenizeGenerator].getName, "graft_tokenize"),
      (exprs: Seq[Expression]) => {
        arity("graft_tokenize", 1, exprs); TokenizeGenerator(exprs.head)
      }))
  }
}
