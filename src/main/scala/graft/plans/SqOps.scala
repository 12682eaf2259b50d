package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Scalar-quantization expressions (SURVEY §2.5): the FAISS
  * `IndexScalarQuantizer` (SQ8) shape. Each dimension is quantized
  * INDEPENDENTLY to a signed 8-bit code against a per-dimension scale
  * learned from the bounded training sample — 64-dim float → 64 bytes,
  * a 4× scan reduction with far higher per-dim fidelity than PQ's 8
  * bytes (the classic SQ-vs-PQ tradeoff: SQ wins when recall matters
  * more than the last byte of compression; at 100 TB both paths exist
  * because the corpus READ is the bottleneck either way).
  *
  * The scoring trick that makes this the catalog's first FULL-ORACLE
  * accelerated path: the candidate stage ranks by an all-INTEGER
  * surrogate `Σ codeQ[d]·codeC[d]·w[d]` where `w[d] =
  * floor(scale[d]²·1e12 + 0.5)` — i.e. the dot product of the
  * dequantized vectors in fixed-point micro-pico units. Integer adds
  * are exact ⇒ associative ⇒ partitioning-independent, and the
  * candidate CUT compares integers (the repo's selection-key doctrine),
  * so DuckDB reproduces the candidate set — and therefore the exact
  * rerank output — cell-exactly. No other ANN variant's first stage is
  * oracle-expressible; SQ8's is, by construction.
  *
  * Scales are plan-time constants (64 doubles), shipped as codegen
  * reference objects like the PQ codebook.
  */

/** vec(float[d]) → codes(byte[d]): per-dim symmetric quantization
  * `clamp(floor(x/scale + 0.5), -127, 127)` — the engine-portable
  * floor-shift round (half always toward +∞, identical in DuckDB's
  * `floor`; library `round` is BigDecimal HALF_UP, which rounds
  * negative halves AWAY from zero — engine-divergent — so it is
  * ruled out here). A zero scale (the dimension is constant 0 in the
  * sample) encodes to 0.
  */
case class SqEncode(child: Expression, scales: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_sq_encode"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), scales.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val s = scales(i)
      out(i) =
        if (s == 0.0) 0
        else {
          val r = math.floor(v.getFloat(i).toDouble / s + 0.5)
          (if (r > 127.0) 127 else if (r < -127.0) -127 else r.toInt).toByte
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scRef = ctx.addReferenceObj("graftSqScales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int graftN = Math.min($in.numElements(), $scRef.length);
         |byte[] graftOut = new byte[graftN];
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  double graftS = $scRef[graftI];
         |  if (graftS == 0.0) { graftOut[graftI] = 0; continue; }
         |  double graftR = Math.floor(((double) $in.getFloat(graftI)) / graftS + 0.5);
         |  graftOut[graftI] = (byte) (graftR > 127.0 ? 127 : (graftR < -127.0 ? -127 : (int) graftR));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftOut);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** codes(byte[d]) × codes(byte[d]) → Σ a[d]·b[d]·w[d] as a BIGINT —
  * the fixed-point dequantized dot product. Max magnitude is
  * 127²·max(w)·d; with unit-normish embeddings w[d] ≈ 6e7 that is
  * ~6e13, leaving >5 decimal orders of headroom in a long (overflow
  * would need per-dim magnitudes > 300).
  */
case class SqDotW(left: Expression, right: Expression, w: Array[Long])
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sq_dot_w"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(math.min(a.numElements(), b.numElements()), w.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a.getByte(i).toLong * b.getByte(i).toLong * w(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("graftSqW", w, "long[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftN = Math.min(Math.min($a.numElements(), $b.numElements()), $wRef.length);
         |long graftS = 0L;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  graftS += ((long) $a.getByte(graftI)) * ((long) $b.getByte(graftI)) * $wRef[graftI];
         |}
         |${ev.value} = graftS;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level entry points (classic-mode Expression→Column bridge). */
object SqOps {
  def encode(v: Column, scales: Array[Double]): Column =
    GraftColumnBridge.column(SqEncode(GraftColumnBridge.expression(v), scales))
  def dotW(a: Column, b: Column, w: Array[Long]): Column =
    GraftColumnBridge.column(SqDotW(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), w))
}
