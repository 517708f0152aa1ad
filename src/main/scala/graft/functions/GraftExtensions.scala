package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injector — the config-driven deployment path for the
  * engine's native functions (SURVEY.md §2.9):
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions …
  * }}}
  *
  * registers every graft expression on session build, so `spark.sql` users
  * get them without code. In-process callers can instead use
  * [[Fnv1a64Expr.register]] on a live session (same registry, idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[Fnv1a64Expr].getName, "fnv1a64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "fnv1a64 takes exactly one argument")
        Fnv1a64Expr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim takes exactly two arguments")
        CosineSimExpr(args.head, args(1))
      }))
  }
}
