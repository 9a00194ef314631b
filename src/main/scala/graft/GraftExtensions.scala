package graft

import graft.functions.CosineSim
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Production wiring for the engine's native functions: register via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) so every session — including
  * SQL-only clients — sees `cosine_sim` without imperative registration.
  * (`CosineSim.register` remains as the per-session fallback used when
  * the driver constructs the session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSim].getName,
        null,
        "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float vectors (codegen'd single pass)",
        ""),
      exprs => CosineSim(exprs(0), exprs(1))))
  }
}
