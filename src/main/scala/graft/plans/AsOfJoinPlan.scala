package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftExprBridge, SparkSession}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class operator: custom `LogicalPlan` node +
  * planner `Strategy` + `BinaryExecNode` (SURVEY.md §2.4 J6 done at the
  * (c) level of the custom-operator ladder). Each left row matches the
  * single right row with the greatest right-time <= left-time for the
  * same key; ties on right-time resolve to the greatest tiebreak value.
  *
  * Physical shape: both children hash-clustered on the key and sorted
  * (key, time[, tiebreak]) — EnsureRequirements inserts the exchanges and
  * sorts — then ONE streaming merge pass per partition pair
  * (`zipPartitions`), holding O(1) state: the last right row seen for the
  * current key. Against the union+window formulation this avoids
  * materializing the combined sorted run and the window carry column;
  * against a range join it is O(n log n) instead of O(n·m).
  *
  * Keys and times are pre-normalized to LONG by the public wrapper
  * (`asOfNative`), which keeps the merge loop primitive and branch-cheap.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightVals: Seq[Attribute],
    rightTiebreak: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv, tb) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightVals: Seq[Attribute],
    rightTiebreak: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val rightValsLocal = rightVals
    val lk = leftKey; val rk = rightKey
    val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) extractors — long-typed by the wrapper's contract
      val lKeyProj = UnsafeProjection.create(Seq(lk, lt), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk, rt), rightOut)
      val rValProj = UnsafeProjection.create(rightValsLocal, rightOut)
      val nullRight = new GenericInternalRow(rightValsLocal.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _      // lookahead right row
        private var rHeadKey = 0L
        private var rHeadTime = 0L
        private var rHeadValid = false
        private var lastVals: InternalRow = _   // projected vals of last right row
        private var lastKey = 0L
        private var lastValid = false

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            val row = rIter.next()
            val kt = rKeyProj(row)
            if (kt.isNullAt(0) || kt.isNullAt(1)) advanceRight() // null keys never match
            else {
              rHead = row
              rHeadKey = kt.getLong(0)
              rHeadTime = kt.getLong(1)
              rHeadValid = true
            }
          } else {
            rHeadValid = false
          }
        }

        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val kt = lKeyProj(lRow)
          if (kt.isNullAt(0) || kt.isNullAt(1)) {
            joined(lRow, nullRight)
          } else {
            val k = kt.getLong(0)
            val t = kt.getLong(1)
            // consume right rows at or before (k, t)
            while (rHeadValid &&
              (rHeadKey < k || (rHeadKey == k && rHeadTime <= t))) {
              if (rHeadKey == k) {
                lastVals = rValProj(rHead).copy()
                lastKey = k
                lastValid = true
              }
              advanceRight()
            }
            if (lastValid && lastKey == k) joined(lRow, lastVals)
            else joined(lRow, nullRight)
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** Registers the strategy once per session (idempotent). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Public wrapper mirroring `operators.AsOfJoin.asOf`: left columns +
    * requested right value columns (null when no right row precedes).
    * Key and time columns are normalized to LONG (key cast, time →
    * epoch micros) before planting the node.
    */
  def asOfNative(
      spark: SparkSession,
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      rightTiebreak: String): DataFrame = {
    ensureStrategy(spark)
    import org.apache.spark.sql.functions.unix_micros
    val lNorm = leftDf
      .withColumn("_k", col(leftKey).cast(LongType))
      .withColumn("_t", unix_micros(col(leftTime).cast("timestamp")))
    val rNorm = rightDf
      .withColumn("_k", col(rightKey).cast(LongType))
      .withColumn("_t", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("_tb", col(rightTiebreak).cast(LongType))
    val lPlan = GraftExprBridge.logicalPlan(lNorm)
    val rPlan = GraftExprBridge.logicalPlan(rNorm)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, "_k"), attr(rPlan, "_k"),
      attr(lPlan, "_t"), attr(rPlan, "_t"),
      rightVals.map(attr(rPlan, _)),
      attr(rPlan, "_tb"))
    GraftExprBridge.ofRows(spark, node)
      .select(leftDf.columns.map(col) ++ rightVals.map(col): _*)
  }
}
