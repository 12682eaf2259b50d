package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.execution.SparkStrategy

/** As-of join — a whole-operator extension (SURVEY §4 preference (c):
  * LogicalPlan + Strategy + SparkPlan).
  *
  * For every left row (k, t), attach the single right row with the same
  * key and the greatest right-time ≤ t (or nulls — left-outer
  * semantics). Spark's Scala API has no as-of join (only the pandas API
  * layer does); the composed alternatives (range join + window, or
  * union-sort tricks) either build O(n·m) intermediates or lose the
  * single-pass property.
  *
  * Physical execution declares `ClusteredDistribution` on the keys and
  * requires (key, time) ordering, so Catalyst inserts exactly one
  * hash-partition exchange + per-partition sort on each side; the
  * operator itself is a streaming two-pointer merge with O(1) state (one
  * buffered right row) — the shape that survives 100 TB: no per-key
  * materialization, no skew beyond what the exchange already handles.
  *
  * Correctness oracle: DuckDB's native `ASOF LEFT JOIN` (inequality
  * `right.t <= left.t`, latest match wins) — same semantics.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Option[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Option[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // the optional right tie-break column joins the required ordering so
  // that among right rows sharing (key, time) the kept match (the last
  // one the merge passes over) is the MAX tie-break value — stable
  // across runs and partitionings, not sort-order luck
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak.toSeq))
      .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val lSchema = left.output
    val rSchema = right.output
    val out = output
    val keyTypes = lKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      import org.apache.spark.sql.catalyst.expressions.{BindReferences, RowOrdering}
      val lKeyProj = UnsafeProjection.create(lKeys, lSchema)
      val rKeyProj = UnsafeProjection.create(rKeys, rSchema)
      val lTimeBound = BindReferences.bindReference(lTime, lSchema)
      val rTimeBound = BindReferences.bindReference(rTime, rSchema)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // bind against the NULLABLE view of the right schema: left-outer
      // emits nullRight, and a non-nullable input attr would codegen
      // without the null check (reading 0 instead of null)
      val outProj = UnsafeProjection.create(out, lSchema ++ rSchema.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rSchema.length)
      val joined = new JoinedRow

      val rBuf = rIt.buffered
      var matchedKey: InternalRow = null
      var matchedRow: InternalRow = null

      lIt.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeVal = lTimeBound.eval(lRow)
        if (lTimeVal == null) {
          // DuckDB ASOF semantics: a null left time never matches (the
          // naive asInstanceOf would unbox null to epoch-0 and match)
          outProj(joined(lRow, nullRight))
        } else {
          val lT = lTimeVal.asInstanceOf[Long]
          // advance the right side while it is still <= (key, t); O(1) state
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val hKey = rKeyProj(head)
            val cmp = keyOrd.compare(hKey, lKey)
            if (cmp < 0) {
              rBuf.next()   // right key behind: no remaining left row needs it
            } else if (cmp == 0) {
              val rTimeVal = rTimeBound.eval(head)
              if (rTimeVal == null) {
                rBuf.next() // null right time can never be an as-of match
              } else if (rTimeVal.asInstanceOf[Long] <= lT) {
                matchedRow = rBuf.next().copy()
                matchedKey = hKey.copy()
              } else {
                continue = false
              }
            } else {
              continue = false
            }
          }
          val useMatch = matchedRow != null && keyOrd.compare(matchedKey, lKey) == 0
          outProj(joined(lRow, if (useMatch) matchedRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. Column names must be disjoint between the two
  * sides (rename the right side first, as with any self-ish join).
  * `rightTieBreak` names a right-side column that decides which of
  * several equal-(key, time) right rows wins (the max value) — without
  * it the winner is whatever physical row order the sort happened to
  * produce.
  */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTimeCol: String, rightTimeCol: String,
           rightTieBreak: Option[String] = None): DataFrame = {
    val spark: SparkSession = leftDf.sparkSession
    GraftStrategies.ensure(spark, AsOfJoinStrategy)
    val lPlan = GraftColumnBridge.analyzedPlan(leftDf)
    val rPlan = GraftColumnBridge.analyzedPlan(rightDf)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
      rightTieBreak.map(attr(rPlan, _)))
    GraftColumnBridge.ofRows(spark, node)
  }
}

/** Idempotent, thread-safe registration of graft's planner strategies on
  * sessions built without `GraftExtensions` (e.g. an already-running
  * session where `withExtensions` no longer applies). The synchronized
  * check-then-act prevents the double-registration race two concurrent
  * query constructors could hit.
  */
object GraftStrategies {
  def ensure(spark: SparkSession, strategy: SparkStrategy): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ strategy
    }
  }
}
