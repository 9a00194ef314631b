package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point registering the engine's native
  * expressions session-wide — the idiomatic injection path for a
  * library (SURVEY.md §7.4): users opt in with
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * and `cosine_sim` / `minhash_longs` resolve in SQL and `expr(...)`
  * without any per-query registration call. The queries themselves
  * also self-register via the temp-function registry so they work on
  * vanilla sessions (e.g. the driver's).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_longs"),
      new ExpressionInfo(classOf[MinHashLongs].getName, "minhash_longs"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashLongs.fromExprs(exprs)))
    ext.injectFunction((
      FunctionIdentifier("pct_decode_unreserved"),
      new ExpressionInfo(classOf[PctDecodeUnreserved].getName, "pct_decode_unreserved"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PctDecodeUnreserved.fromExprs(exprs)))
    // whole-operator extension: plans the AsOfMergeJoin logical node
    // (graft.plans.AsOfMerge also self-registers on live sessions),
    // plus the left-filter pushdown rule through the opaque node
    ext.injectPlannerStrategy(_ => graft.plans.AsOfMergeStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsOfMergePushdown)
  }
}
