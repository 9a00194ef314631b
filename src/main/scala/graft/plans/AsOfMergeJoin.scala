package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** A WHOLE-OPERATOR custom plan (SURVEY.md §7.4 preference (c), the
  * step past composed operators and custom expressions): a sort-merge
  * as-of join. Both sides hash-partition on the key and sort by
  * (key, time[, ties...]); one co-partitioned merge pass then gives
  * every left row the LATEST right row with the same key and
  * right.time <= left.time — no per-key history array (q39's packed
  * form caps history at row size) and no |left_k|x|right_k|
  * intermediate (q65's range-join form materializes it before its
  * window prunes). State per partition is ONE buffered right row.
  *
  * This is the operator the composed forms approximate: Catalyst
  * inserts the exchanges/sorts from the declared requirements, so the
  * plan is exactly two shuffles + two sorts + a streaming merge,
  * whatever the per-key history size. Left-outer semantics: unmatched
  * left rows keep NULL right columns.
  */
case class AsOfMergeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfMergeJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfMergeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression]) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both children on their keys (Catalyst adds the
    * exchanges; AQE coalesces all sibling shuffles consistently). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Left by (key, time); right by (key, time, ties...) so "last
    * qualifying row" is the deterministic (time, ties)-max — the same
    * tiebreak as the packed-history sort and the window's DESC rank. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTies.map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKey
    val lTime = leftTime
    val rKey = rightKey
    val rTime = rightTime
    val lOut = left.output
    val rOut = right.output
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nRight = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lKey, lTime), lOut)
      val rProj = UnsafeProjection.create(Seq(rKey, rTime), rOut)
      // downstream operators (shuffle writers in particular) require
      // UnsafeRow — flatten the JoinedRow through a result projection
      // built from the NULLABLE right attributes (projecting through
      // the originals would write 0 instead of null for unmatched rows)
      val outAttrs = lOut ++ rOut.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      var curKey: Any = null
      var curRight: InternalRow = null
      lIter.map { lRow =>
        val lv = lProj(lRow)
        if (lv.isNullAt(0) || lv.isNullAt(1)) {
          resultProj(joined(lRow, nullRight))
        } else {
          val lk = lv.get(0, lKey.dataType)
          val lt = lv.get(1, lTime.dataType)
          // new left key -> the buffered match belongs to an older key.
          // curKey must be a COPY: buffer-backed values (UTF8String,
          // Binary, large Decimal) returned by the reused projection
          // are overwritten on the next left row, and a stale view
          // would make the key-change check compare garbage.
          if (curKey == null || keyOrd.compare(curKey, lk) != 0) {
            curKey = InternalRow.copyValue(lk)
            curRight = null
          }
          // advance the right side up to (key, time): the last
          // qualifying row wins; rows past the time stay buffered for
          // later (larger-time) left rows of the same key
          var continue = true
          while (continue && rBuf.hasNext) {
            val rv = rProj(rBuf.head)
            if (rv.isNullAt(0)) rBuf.next() // null keys never match
            else {
              val c = keyOrd.compare(rv.get(0, rKey.dataType), lk)
              if (c < 0) rBuf.next()
              else if (c > 0) continue = false
              else if (rv.isNullAt(1)) rBuf.next() // null times never match
              else if (timeOrd.compare(rv.get(1, rTime.dataType), lt) <= 0) {
                curRight = rBuf.next().copy()
              } else continue = false
            }
          }
          resultProj(joined(lRow, if (curRight == null) nullRight else curRight))
        }
      }
    }
  }
}

/** Optimizer rule completing the §7.4 ladder: a custom logical node is
  * opaque to Catalyst's PushDownPredicates, so a Filter sitting on top
  * of AsOfMergeJoin would otherwise run AFTER the join. Predicates
  * that reference only LEFT columns are sound to push (every output
  * row corresponds to exactly one left row — left-outer shape), and
  * once pushed they sit directly over the scan where FileSourceStrategy
  * turns them into PushedFilters. Right-side predicates stay put: they
  * filter the MATCH, not the right input (dropping unmatched-right
  * rows early would change which row is "latest").
  */
object AsOfMergePushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfMergeJoin) =>
      val (leftOnly, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans the logical node; everything below it goes back to Catalyst. */
object AsOfMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfMergeJoin =>
      AsOfMergeJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.leftTime, j.rightKey, j.rightTime, j.rightTies) :: Nil
    case _ => Nil
  }
}

/** Public entry: as-of join two frames with the custom operator.
  * Output = left columns ++ right columns (right NULL when no match).
  * Registers the planner strategy on the live session (idempotent);
  * `graft.functions.GraftExtensions` also injects it for sessions wired
  * by `spark.sql.extensions` config.
  */
object AsOfMerge {

  /** Fully resolve a Column against its frame: Spark 4 Columns carry a
    * lazy ColumnNode that only standard operators resolve, so a custom
    * logical node must be handed the analyzed expression — obtained
    * from a throwaway select's analyzed projection (which shares the
    * frame's attribute ids).
    */
  def resolve(df: DataFrame, c: Column): Expression =
    df.select(c).queryExecution.analyzed.expressions.head match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }

  def join(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightTies: Seq[Column] = Nil): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, AsOfMergeStrategy)
    GraftSqlBridge.addOptimization(spark, AsOfMergePushdown)
    GraftSqlBridge.ofRows(spark, AsOfMergeJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      resolve(left, leftKey), resolve(left, leftTime),
      resolve(right, rightKey), resolve(right, rightTime),
      rightTies.map(resolve(right, _))))
  }
}
