package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd bloom-filter membership probe over a long key column — the
  * runtime-filter / semi-join-reduction shape: a KB-MB filter built from
  * the (small, filtered) dimension key set prunes the fact scan
  * MAP-SIDE, before any shuffle, with zero false negatives. Spark's own
  * `InjectRuntimeFilter` applies the same idea internally but is
  * private and heuristic-gated; this expression makes the pattern an
  * explicit library surface (see operators.BloomPrune).
  *
  * The serialized filter rides the expression into the task binary
  * (one copy per executor via plan broadcast) and is deserialized
  * lazily per JVM.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  def test(v: Long): Boolean = bf.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.test($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object BloomProbe {
  def mightContain(c: Column, filterBytes: Array[Byte]): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(c), filterBytes))
}
