package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Zero-shuffle IVF cell assignment (SURVEY §2.5, round-4 item 1).
  *
  * The composed form — `corpus.join(broadcast(centroids), true)` followed
  * by a `row_number` window argmin — shuffles the full n×cells expansion
  * (Θ(n²/√n) rows once cells grow with the corpus) just to keep one row
  * per vector. The centroid set is bounded metadata (capped at ~√n cells
  * × dim floats — 8 MB at 10⁹ vectors), so it ships as a codegen
  * reference object instead, and the argmin runs inside whole-stage
  * codegen over the scan: assignment costs ZERO shuffled rows at any
  * corpus size.
  *
  * Scoring matches the window form bit-for-bit: score_i =
  * dot(e, cent_i) / (nrm · cnorm_i) with the same sequential double
  * accumulation as [[FloatArrayDot]], ranked (score desc, cent_id asc) —
  * strict-greater insertion over ids pre-sorted ascending reproduces the
  * row_number tie-break exactly. Pass unit norms (and `nrm = lit(1.0)`;
  * x/1.0 == x in IEEE754) for plain dot-product scoring (Lloyd steps).
  */
case class NearestCentroids(left: Expression, right: Expression,
                            ids: Array[Int], mat: Array[Float],
                            norms: Array[Double], dim: Int, k: Int)
    extends BinaryExpression {
  require(ids.length == norms.length && ids.length * dim == mat.length && k >= 1)
  require(ids.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "centroid ids must be strictly ascending (tie-break order)")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cents"

  // left = embedding float[dim], right = its L2 norm (double)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val e = l.asInstanceOf[ArrayData]
    val nrm = r.asInstanceOf[Double]
    val nc = ids.length
    val kk = math.min(k, nc)
    val bestS = new Array[Double](kk)
    val bestI = new Array[Int](kk)
    var filled = 0
    var i = 0
    while (i < nc) {
      var d = 0.0
      var j = 0
      val base = i * dim
      while (j < dim) { d += e.getFloat(j).toDouble * mat(base + j).toDouble; j += 1 }
      val score = d / (nrm * norms(i))
      if (filled < kk) {
        var p = filled
        while (p > 0 && score > bestS(p - 1)) {
          bestS(p) = bestS(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestS(p) = score; bestI(p) = ids(i); filled += 1
      } else if (score > bestS(kk - 1)) {
        var p = kk - 1
        while (p > 0 && score > bestS(p - 1)) {
          bestS(p) = bestS(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestS(p) = score; bestI(p) = ids(i)
      }
      i += 1
    }
    new GenericArrayData(bestI)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("graftCentIds", ids, "int[]")
    val matRef = ctx.addReferenceObj("graftCentMat", mat, "float[]")
    val nrmRef = ctx.addReferenceObj("graftCentNorms", norms, "double[]")
    val kk = math.min(k, ids.length)
    // ctx.freshName, not fixed names: two NearestCentroids instances fused
    // into one whole-stage-codegen function would otherwise declare
    // duplicate Java locals and trip Janino into interpreted fallback.
    val nc = ctx.freshName("nc"); val bestS = ctx.freshName("bestS")
    val bestI = ctx.freshName("bestI"); val filled = ctx.freshName("filled")
    val i = ctx.freshName("i"); val d = ctx.freshName("d")
    val base = ctx.freshName("base"); val j = ctx.freshName("j")
    val score = ctx.freshName("score"); val p = ctx.freshName("p")
    nullSafeCodeGen(ctx, ev, (e, nrm) =>
      s"""
         |int $nc = $idsRef.length;
         |double[] $bestS = new double[$kk];
         |int[] $bestI = new int[$kk];
         |int $filled = 0;
         |for (int $i = 0; $i < $nc; $i++) {
         |  double $d = 0.0;
         |  int $base = $i * $dim;
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $d += ((double) $e.getFloat($j)) * ((double) $matRef[$base + $j]);
         |  }
         |  double $score = $d / ($nrm * $nrmRef[$i]);
         |  if ($filled < $kk) {
         |    int $p = $filled;
         |    while ($p > 0 && $score > $bestS[$p - 1]) {
         |      $bestS[$p] = $bestS[$p - 1];
         |      $bestI[$p] = $bestI[$p - 1];
         |      $p--;
         |    }
         |    $bestS[$p] = $score; $bestI[$p] = $idsRef[$i];
         |    $filled++;
         |  } else if ($score > $bestS[$kk - 1]) {
         |    int $p = $kk - 1;
         |    while ($p > 0 && $score > $bestS[$p - 1]) {
         |      $bestS[$p] = $bestS[$p - 1];
         |      $bestI[$p] = $bestI[$p - 1];
         |      $p--;
         |    }
         |    $bestS[$p] = $score; $bestI[$p] = $idsRef[$i];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestI);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column entry points over a driver-local centroid set. */
object CentroidOps {
  /** Top-k nearest centroid ids by cosine score (dot/(nrm·cnorm) desc,
    * id asc). `cents` = (id, vector, norm), any order; sorted here.
    */
  def nearest(e: Column, nrm: Column, cents: Seq[(Int, Array[Float], Double)],
              k: Int): Column = {
    require(cents.nonEmpty,
      "CentroidOps.nearest: empty centroid set (empty training corpus?)")
    val sorted = cents.sortBy(_._1)
    val dim = sorted.head._2.length
    val mat = new Array[Float](sorted.size * dim)
    for ((c, i) <- sorted.zipWithIndex) System.arraycopy(c._2, 0, mat, i * dim, dim)
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(e), GraftColumnBridge.expression(nrm),
      sorted.map(_._1).toArray, mat, sorted.map(_._3).toArray, dim, k))
  }

  /** Single nearest cell id. */
  def cell(e: Column, nrm: Column, cents: Seq[(Int, Array[Float], Double)]): Column =
    org.apache.spark.sql.functions.element_at(nearest(e, nrm, cents, 1), 1)
}
