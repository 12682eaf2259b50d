package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.GraftColumnBridge

/** Group-wise top-k as a first-class physical operator (SURVEY §7
  * round-2 item 4).
  *
  * The composed form — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k` — must SORT every partition (O(n log n) over
  * all rows, full materialization in the window buffer). This operator
  * keeps one bounded heap per key (O(n log k), O(keys·k) memory) after
  * the same single hash exchange, and emits each key's rows in rank
  * order. At 100 TB the difference is a full sort of the fact table vs
  * a streaming pass.
  */
case class TopKPerKeyPlan(child: LogicalPlan, keys: Seq[Expression],
                          order: Seq[SortOrder], k: Int,
                          rank: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rank
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class TopKPerKeyExec(child: SparkPlan, keys: Seq[Expression],
                          order: Seq[SortOrder], k: Int,
                          partial: Boolean = false,
                          rank: Option[Attribute] = None) extends UnaryExecNode {
  // rank (the row_number the window form would have produced) is
  // appended by the FINAL phase only — the partial phase ships plain
  // child rows, since a map-side rank is meaningless before the merge
  override def output: Seq[Attribute] = child.output ++ rank

  // partial mode runs before the exchange (map-side top-k per key: only
  // k rows per key per partition shuffle); final mode demands
  // co-location and produces the exact answer
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keysL = keys
    val orderL = order
    val kL = k
    val schema = child.output
    val withRank = rank.isDefined
    val outAttrs = output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keysL, schema)
      val ord = RowOrdering.create(orderL, schema)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // reverse ordering: heap head = currently-worst kept row
          heap = new java.util.PriorityQueue[InternalRow](kL, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kL) heap.add(row.copy())
        else if (ord.lt(row, heap.peek())) { heap.poll(); heap.add(row.copy()) }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      if (withRank) {
        // row_number() semantics: 1-based position within the key group
        // under the operator ordering (rows drain in exactly that order)
        val proj = UnsafeProjection.create(outAttrs, schema ++ rank)
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        heaps.forEach { (_, heap) =>
          val rows = new Array[InternalRow](heap.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
          i = 0
          while (i < rows.length) {
            rankRow.update(0, i + 1)
            out += proj(joined(rows(i), rankRow)).copy()
            i += 1
          }
        }
      } else heaps.forEach { (_, heap) =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 }   // drain worst-first → rank order
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(child, keys, order, k, rank) =>
      // two-phase: map-side partial heaps (shuffle only k rows per key
      // per partition), exact final heaps after the exchange
      TopKPerKeyExec(
        TopKPerKeyExec(planLater(child), keys, order, k, partial = true),
        keys, order, k, partial = false, rank = rank) :: Nil
    case _ => Nil
  }
}

/** DataFrame API: rows ranking in the top k of their key group under
  * the given ordering (name, ascending) — equivalent to
  * `row_number over (partition by keys order by ...) <= k` minus the
  * partition sort.
  */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    GraftStrategies.ensure(spark, TopKPerKeyStrategy)
    val plan = GraftColumnBridge.analyzedPlan(df)
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftColumnBridge.ofRows(spark, TopKPerKeyPlan(plan, keyCols.map(attr), order, k))
  }
}
