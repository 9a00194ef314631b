package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * A codegen'd single-pass loop (dot + both norms fused) that stays
  * inside whole-stage codegen — measured well ahead of the
  * `aggregate(zip_with(...))` higher-order-function formulation, which
  * allocates an intermediate array per row and interprets the lambdas.
  * Accumulation order is the same left-to-right fold, so results are
  * bit-identical with the HOF form (and with the DuckDB oracle's
  * ordered sums) — including the edge cases: length-mismatched vectors
  * yield NULL (like zip_with's null padding) and zero-norm vectors
  * yield NaN (IEEE 0/0, same in both forms).
  *
  * This is the hot inner loop of the ANN scale path
  * ([[graft.ops.AnnIndex]]): at 100 TB the candidate stream after LSH
  * bucketing is billions of rows and per-row interpretation overhead
  * dominates — exactly the case where a custom `Expression` with
  * `doGenCode` is warranted (SURVEY.md §7.4).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Length-mismatched inputs yield NULL (exactly what the HOF form
  // produces: zip_with pads the shorter vector with nulls and the sum
  // goes null), so the expression is result-nullable even when both
  // children are non-nullable. Zero-norm vectors yield NaN (IEEE
  // 0.0/0.0) in BOTH forms — identical, and documented here rather
  // than special-cased.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var i = 0
    var dot = 0.0; var na = 0.0; var nb = 0.0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: with non-nullable inputs this code is pasted at
      // method scope, so fixed local names would collide when two
      // cosine_sim calls share one codegen scope
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double x$i = (double) $a.getFloat($i);
            double y$i = (double) $b.getFloat($i);
            $dot += x$i * y$i; $na += x$i * x$i; $nb += y$i * y$i;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Register `cosine_sim(a, b)` for SQL/expr use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
}
