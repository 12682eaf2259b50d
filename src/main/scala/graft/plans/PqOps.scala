package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization expressions (SURVEY §2.5): the corpus half of a
  * PQ ANN index. A d-dim float vector is split into `m` subspaces of
  * `dsub` dims; each subspace is quantized to the nearest of `k`
  * codebook centroids, so the stored representation shrinks from
  * d×4 bytes to m small codes (64-dim float → 8 codes: 32× less to
  * scan). At 100 TB the corpus READ is the bottleneck, so scanning
  * codes instead of raw vectors is the scale lever; the asymmetric
  * scoring (full-precision query against reconstructed corpus) plus an
  * exact rerank of the top candidates recovers accuracy.
  *
  * The flat codebook layout is `cb[((mi * k) + ki) * dsub + d]` —
  * centroid ki of subspace mi. Codebooks are plan-time constants
  * (KB-sized), shipped as codegen reference objects.
  */

/** vec(float[d]) → codes(int[m]): per-subspace argmin-L2 centroid, ties
  * to the lower code.
  */
case class PqEncode(child: Expression, cb: Array[Float], m: Int, k: Int, dsub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        var dist = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getFloat(mi * dsub + d).toDouble - cb(((mi * k) + ki) * dsub + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int[] graftCodes = new int[$m];
         |for (int graftM = 0; graftM < $m; graftM++) {
         |  int graftBest = 0; double graftBestD = Double.MAX_VALUE;
         |  for (int graftK = 0; graftK < $k; graftK++) {
         |    double graftDist = 0.0;
         |    for (int graftD = 0; graftD < $dsub; graftD++) {
         |      double graftDiff = (double) $in.getFloat(graftM * $dsub + graftD)
         |        - (double) $cbRef[((graftM * $k) + graftK) * $dsub + graftD];
         |      graftDist += graftDiff * graftDiff;
         |    }
         |    if (graftDist < graftBestD) { graftBestD = graftDist; graftBest = graftK; }
         |  }
         |  graftCodes[graftM] = graftBest;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftCodes);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (query float[d], codes int[m]) → asymmetric inner product between the
  * full-precision query and the RECONSTRUCTED corpus vector (sequential
  * double accumulation, subspace-major — deterministic).
  */
case class PqAdcDot(left: Expression, right: Expression,
                    cb: Array[Float], m: Int, k: Int, dsub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val base = ((mi * k) + codes.getInt(mi)) * dsub
      var d = 0
      while (d < dsub) {
        s += q.getFloat(mi * dsub + d).toDouble * cb(base + d)
        d += 1
      }
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, (q, codes) =>
      s"""
         |double graftS = 0.0;
         |for (int graftM = 0; graftM < $m; graftM++) {
         |  int graftBase = ((graftM * $k) + $codes.getInt(graftM)) * $dsub;
         |  for (int graftD = 0; graftD < $dsub; graftD++) {
         |    graftS += ((double) $q.getFloat(graftM * $dsub + graftD))
         |      * ((double) $cbRef[graftBase + graftD]);
         |  }
         |}
         |${ev.value} = graftS;
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** query(float[d]) → ADC lookup table (double[m×k]):
  * `table[mi*k + ki] = Σ_d q[mi*dsub+d] · cb[((mi*k)+ki)*dsub+d]` — the
  * classic FAISS ADC shape. Built ONCE per query row on the (bounded)
  * query side of the join, so the per-candidate score collapses to `m`
  * array lookups ([[PqAdcLookup]]) instead of `m×dsub` multiplies: at
  * 100 TB the candidate stream is the corpus, and 8 reads beat 64
  * fused multiply-adds per row. The table is m×k doubles (16 KB at
  * m=8, k=256) per query — metadata-scale on a driver-known query set.
  */
case class PqAdcTable(child: Expression, cb: Array[Float], m: Int, k: Int, dsub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_adc_table"

  override def nullSafeEval(in: Any): Any = {
    val q = in.asInstanceOf[ArrayData]
    val out = new Array[Double](m * k)
    var i = 0
    while (i < m * k) {
      val mi = i / k
      var s = 0.0
      var d = 0
      while (d < dsub) {
        s += q.getFloat(mi * dsub + d).toDouble * cb(i * dsub + d)
        d += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("graftPqCb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, q =>
      s"""
         |double[] graftT = new double[$m * $k];
         |for (int graftI = 0; graftI < $m * $k; graftI++) {
         |  int graftM = graftI / $k;
         |  double graftS = 0.0;
         |  for (int graftD = 0; graftD < $dsub; graftD++) {
         |    graftS += ((double) $q.getFloat(graftM * $dsub + graftD))
         |      * ((double) $cbRef[graftI * $dsub + graftD]);
         |  }
         |  graftT[graftI] = graftS;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftT);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (table double[m×k], codes int[m]) → Σ_mi table[mi*k + codes[mi]]:
  * the per-candidate half of the ADC split. Accumulates per-subspace
  * partial dots, which differs from [[PqAdcDot]]'s single running sum
  * only in float association order (spec-bounded ≤ 1e-9); the rerank
  * by exact cosine makes the final rows identical.
  */
case class PqAdcLookup(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_lookup"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val table = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    var s = 0.0
    var mi = 0
    while (mi < m) { s += table.getDouble(mi * k + codes.getInt(mi)); mi += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (table, codes) =>
      s"""
         |double graftS = 0.0;
         |for (int graftM = 0; graftM < $m; graftM++) {
         |  graftS += $table.getDouble(graftM * $k + $codes.getInt(graftM));
         |}
         |${ev.value} = graftS;
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** vec(float[d]) → R·vec (float[d]) for a plan-time orthogonal rotation
  * R (flat row-major d×d) — the OPQ pre-rotation (Ge et al. 2013).
  * Map-side, codegen'd, one matvec per corpus row; R ships once as a
  * codegen reference object (32 KB at d=64). Double accumulation per
  * output coordinate, identical to Opq.rotate so training and encoding
  * see the same floats.
  */
case class PqRotate(child: Expression, r: Array[Double], d: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_rotate"

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      var j = 0
      val base = i * d
      while (j < d) { s += r(base + j) * v.getFloat(j).toDouble; j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("graftPqRot", r, "double[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |float[] graftRv = new float[$d];
         |for (int graftI = 0; graftI < $d; graftI++) {
         |  double graftS = 0.0;
         |  for (int graftJ = 0; graftJ < $d; graftJ++) {
         |    graftS += $rRef[graftI * $d + graftJ] * (double) $in.getFloat(graftJ);
         |  }
         |  graftRv[graftI] = (float) graftS;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftRv);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** codes(int[m]) → L2 norm of the reconstructed vector, via per-centroid
  * squared-norm lookup tables precomputed at plan time (m×k doubles).
  */
case class PqReconNorm(child: Expression, cb: Array[Float], m: Int, k: Int, dsub: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_recon_norm"

  @transient private lazy val normsq: Array[Double] = {
    val out = new Array[Double](m * k)
    var i = 0
    while (i < m * k) {
      var s = 0.0
      var d = 0
      while (d < dsub) { val c = cb(i * dsub + d).toDouble; s += c * c; d += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  override def nullSafeEval(in: Any): Any = {
    val codes = in.asInstanceOf[ArrayData]
    var s = 0.0
    var mi = 0
    while (mi < m) { s += normsq(mi * k + codes.getInt(mi)); mi += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("graftPqNormsq", normsq, "double[]")
    nullSafeCodeGen(ctx, ev, codes =>
      s"""
         |double graftS = 0.0;
         |for (int graftM = 0; graftM < $m; graftM++) {
         |  graftS += $nsRef[graftM * $k + $codes.getInt(graftM)];
         |}
         |${ev.value} = Math.sqrt(graftS);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqOps {
  def encode(vec: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    GraftColumnBridge.column(PqEncode(GraftColumnBridge.expression(vec), cb, m, k, dsub))
  def adcDot(q: Column, codes: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    GraftColumnBridge.column(PqAdcDot(
      GraftColumnBridge.expression(q), GraftColumnBridge.expression(codes), cb, m, k, dsub))
  def reconNorm(codes: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    GraftColumnBridge.column(PqReconNorm(GraftColumnBridge.expression(codes), cb, m, k, dsub))
  def adcTable(q: Column, cb: Array[Float], m: Int, k: Int, dsub: Int): Column =
    GraftColumnBridge.column(PqAdcTable(GraftColumnBridge.expression(q), cb, m, k, dsub))
  def adcLookup(table: Column, codes: Column, m: Int, k: Int): Column =
    GraftColumnBridge.column(PqAdcLookup(
      GraftColumnBridge.expression(table), GraftColumnBridge.expression(codes), m, k))
  def rotate(vec: Column, r: Array[Double], d: Int): Column =
    GraftColumnBridge.column(PqRotate(GraftColumnBridge.expression(vec), r, d))
}
