package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-driven session integration: build sessions with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and graft's SQL functions
  * are injected at session construction — the standard library entry point
  * when the application controls the builder. For sessions that arrive
  * pre-built (this repo's driver contract), the runtime equivalent is
  * [[org.apache.spark.sql.graft.Bridge.registerCosineMilli]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_milli"),
      new ExpressionInfo("graft.functions.CosineMilliExpr", "cosine_milli"),
      (exprs: Seq[Expression]) =>
        graft.functions.CosineMilliExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo("graft.functions.PolyHashExpr", "poly_hash"),
      (exprs: Seq[Expression]) =>
        graft.functions.PolyHashExpr(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft.functions.SimHash64Expr", "simhash64"),
      (exprs: Seq[Expression]) =>
        graft.functions.SimHash64Expr(exprs(0))))
  }
}
