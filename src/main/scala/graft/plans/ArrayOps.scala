package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the vector/hash hot paths
  * (SURVEY §4/§5).
  *
  * The declarative HOF forms (`zip_with` + `aggregate`) are semantically
  * right but interpreted: every element pays a lambda dispatch and
  * intermediate arrays are materialized per row. These expressions keep
  * IDENTICAL arithmetic (sequential left-to-right double accumulation —
  * oracle parity is bit-exact) in a tight generated loop, and stay inside
  * whole-stage codegen.
  *
  * Bench (sf0.1, local[32]): embedding pair-dedup 57.5s → ~2s once the
  * dot product compiles to a fused loop.
  */

/** Dot product over two float-array columns, double accumulation. */
case class FloatArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  // AbstractDataType is private[sql] so ExpectsInputTypes is unavailable
  // outside Spark's packages; all call sites are ours and typed.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_f"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftN = Math.min($a.numElements(), $b.numElements());
         |double graftS = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  graftS += ((double) $a.getFloat(graftI)) * ((double) $b.getFloat(graftI));
         |}
         |${ev.value} = graftS;
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over two double-array columns. */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_d"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int graftN = Math.min($a.numElements(), $b.numElements());
         |double graftS = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  graftS += $a.getDouble(graftI) * $b.getDouble(graftI);
         |}
         |${ev.value} = graftS;
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass k-function MinHash signature over a long-array column:
  * `sig[j] = min over h of (a(j)*h + b(j)) mod p`. Replaces k separate
  * `array_min(transform(...))` HOF evaluations (k passes + k lambda
  * dispatches per element) with a single fused loop.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  private val k = a.length

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (a(j) * h + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("graftMhA", a.toArray, "long[]")
    val bRef = ctx.addReferenceObj("graftMhB", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int graftN = $in.numElements();
         |long[] graftMins = new long[$k];
         |java.util.Arrays.fill(graftMins, Long.MAX_VALUE);
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  long graftH = $in.getLong(graftI);
         |  for (int graftJ = 0; graftJ < $k; graftJ++) {
         |    long graftV = ($aRef[graftJ] * graftH + $bRef[graftJ]) % ${p}L;
         |    if (graftV < graftMins[graftJ]) graftMins[graftJ] = graftV;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftMins);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass 64-bit SimHash over a long-array column of token hashes:
  * per-bit vote counts (+1/-1 with multiplicity), sign → bit. The low
  * 32 bits vote from the token hash itself; the high 32 bits vote from
  * TWO independent 16-bit universal-hash remixes — bits 32-47 from the
  * low 16 bits of `h2 = (a2·h + b2) mod p`, bits 48-63 from the low 16
  * bits of `h3 = (a3·h + b3) mod p`. (A single remix mod p ≈ 2^30 would
  * pin its bits 30-31 constant, leaving the top band only 14 effective
  * bits.) Portable integer arithmetic that the DuckDB oracle reproduces
  * term-for-term; replaces 64 separate `aggregate` HOF folds with a
  * fused loop.
  *
  * 64 bits matter at scale: with a 32-bit signature a byte-band
  * partitions the corpus into only 256 buckets, making the band
  * self-join Θ(n²/256); 16-bit bands over 64 bits give 65,536 buckets
  * (all 16 bits effective in every band) while keeping the 4-band
  * pigeonhole complete for hamming ≤ 3.
  */
case class SimHash64(child: Expression, a2: Long, b2: Long, a3: Long, b3: Long, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val h2 = (a2 * h + b2) % p
      val h3 = (a3 * h + b3) % p
      var j = 0
      while (j < 32) {
        counts(j) += (((h >> j) & 1L) * 2 - 1).toInt
        j += 1
      }
      j = 0
      while (j < 16) {
        counts(j + 32) += (((h2 >> j) & 1L) * 2 - 1).toInt
        counts(j + 48) += (((h3 >> j) & 1L) * 2 - 1).toInt
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int graftN = $in.numElements();
         |int[] graftCounts = new int[64];
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  long graftH = $in.getLong(graftI);
         |  long graftH2 = (${a2}L * graftH + ${b2}L) % ${p}L;
         |  long graftH3 = (${a3}L * graftH + ${b3}L) % ${p}L;
         |  for (int graftJ = 0; graftJ < 32; graftJ++) {
         |    graftCounts[graftJ] += (int) (((graftH >> graftJ) & 1L) * 2 - 1);
         |  }
         |  for (int graftJ = 0; graftJ < 16; graftJ++) {
         |    graftCounts[graftJ + 32] += (int) (((graftH2 >> graftJ) & 1L) * 2 - 1);
         |    graftCounts[graftJ + 48] += (int) (((graftH3 >> graftJ) & 1L) * 2 - 1);
         |  }
         |}
         |long graftSim = 0L;
         |for (int graftJ = 0; graftJ < 64; graftJ++) {
         |  if (graftCounts[graftJ] > 0) graftSim |= (1L << graftJ);
         |}
         |${ev.value} = graftSim;
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-level entry points (classic-mode Expression→Column bridge). */
object ArrayOps {
  def dotF(a: Column, b: Column): Column =
    GraftColumnBridge.column(FloatArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def dotD(a: Column, b: Column): Column =
    GraftColumnBridge.column(DoubleArrayDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def minhashSig(sh: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(sh), a, b, p))
  def simhash64(th: Column, a2: Long, b2: Long, a3: Long, b3: Long, p: Long): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(th), a2, b2, a3, b3, p))
  def tokenHashes(tokens: Column, p: Long): Column =
    GraftColumnBridge.column(TokenHashes(GraftColumnBridge.expression(tokens), p))
  def wordShingleHashes(tokens: Column, n: Int, p: Long): Column =
    GraftColumnBridge.column(WordShingleHashes(GraftColumnBridge.expression(tokens), n, p))
  def wordShingleHashesPos(tokens: Column, n: Int, p: Long): Column =
    GraftColumnBridge.column(WordShingleHashesPos(GraftColumnBridge.expression(tokens), n, p))
  def wordShingleStrings(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingleStrings(GraftColumnBridge.expression(tokens), n))
}

/** Portable charFold hash of each string token: array<string> →
  * array<long>, `h = fold((31*h + byte) mod p)` per token. Tokens are
  * ASCII ([a-z0-9]+ by construction), so UTF8 bytes == codepoints and
  * this matches the `aggregate(split(tok,''))` HOF and the DuckDB
  * `list_reduce(string_split(...))` oracle exactly.
  */
case class TokenHashes(child: Expression, p: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var h = 0L
      var k = 0
      val nb = s.numBytes()
      while (k < nb) { h = (h * 31 + (s.getByte(k) & 0xff)) % p; k += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int graftN = $in.numElements();
         |long[] graftOut = new long[graftN];
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  org.apache.spark.unsafe.types.UTF8String graftS = $in.getUTF8String(graftI);
         |  long graftH = 0L;
         |  int graftNb = graftS.numBytes();
         |  for (int graftK = 0; graftK < graftNb; graftK++) {
         |    graftH = (graftH * 31 + (graftS.getByte(graftK) & 0xff)) % ${p}L;
         |  }
         |  graftOut[graftI] = graftH;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftOut);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-gram shingle STRINGS from a token array — the
  * codegen'd twin of `array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(toks, i+1, n))))`, which pays interpreted
  * lambda dispatch plus a slice copy and a concat per shingle. One
  * fused loop, first-occurrence distinct order, identical values.
  * array<string> → array<string>.
  */
case class WordShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings"

  @transient private lazy val sp = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= t - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = arr.getUTF8String(i + k); k += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sp, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int graftT = $in.numElements();
         |java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String> graftSeen =
         |  new java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String>();
         |org.apache.spark.unsafe.types.UTF8String graftSp =
         |  org.apache.spark.unsafe.types.UTF8String.fromString(" ");
         |for (int graftI = 0; graftI + $n <= graftT; graftI++) {
         |  org.apache.spark.unsafe.types.UTF8String[] graftParts =
         |    new org.apache.spark.unsafe.types.UTF8String[$n];
         |  for (int graftK = 0; graftK < $n; graftK++) {
         |    graftParts[graftK] = $in.getUTF8String(graftI + graftK);
         |  }
         |  graftSeen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(graftSp, graftParts));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftSeen.toArray());
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct hashes of word n-gram shingles, computed directly from the
  * token array: the hash of "tok_i tok_{i+1} ... tok_{i+n-1}" folded
  * byte-by-byte with ' ' (32) between tokens — identical to
  * charFoldHash(concat_ws(" ", slice(...))) without materializing any
  * shingle strings. array<string> → array<long> (first-occurrence order).
  */
case class WordShingleHashes(child: Expression, n: Int, p: Long) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= t - n) {
      var h = 0L
      var k = 0
      while (k < n) {
        val s = arr.getUTF8String(i + k)
        var b = 0
        val nb = s.numBytes()
        while (b < nb) { h = (h * 31 + (s.getByte(b) & 0xff)) % p; b += 1 }
        if (k < n - 1) h = (h * 31 + 32) % p
        k += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int graftT = $in.numElements();
         |java.util.LinkedHashSet<Long> graftSeen = new java.util.LinkedHashSet<Long>();
         |for (int graftI = 0; graftI + $n <= graftT; graftI++) {
         |  long graftH = 0L;
         |  for (int graftK = 0; graftK < $n; graftK++) {
         |    org.apache.spark.unsafe.types.UTF8String graftS = $in.getUTF8String(graftI + graftK);
         |    int graftNb = graftS.numBytes();
         |    for (int graftB = 0; graftB < graftNb; graftB++) {
         |      graftH = (graftH * 31 + (graftS.getByte(graftB) & 0xff)) % ${p}L;
         |    }
         |    if (graftK < $n - 1) graftH = (graftH * 31 + 32) % ${p}L;
         |  }
         |  graftSeen.add(graftH);
         |}
         |long[] graftOut = new long[graftSeen.size()];
         |int graftJ = 0;
         |for (Long graftV : graftSeen) { graftOut[graftJ++] = graftV.longValue(); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(graftOut);
       """.stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONAL word-shingle hashes: same space-joined charFold as
  * [[WordShingleHashes]] but one hash PER STARTING POSITION, duplicates
  * kept and array index == token position — the form span-level dedup
  * needs (a duplicated gram's position locates the duplicated span;
  * the deduped set form cannot). `posexplode` over the result yields
  * (position, hash) pairs map-side.
  */
case class WordShingleHashesPos(child: Expression, n: Int, p: Long) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_pos"

  override def nullSafeEval(in: Any): Any = {
    val arr = in.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val m = math.max(t - n + 1, 0)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var k = 0
      while (k < n) {
        val s = arr.getUTF8String(i + k)
        var b = 0
        val nb = s.numBytes()
        while (b < nb) { h = (h * 31 + (s.getByte(b) & 0xff)) % p; b += 1 }
        if (k < n - 1) h = (h * 31 + 32) % p
        k += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName locals: two instances fused into one whole-stage-codegen
    // function must not collide (see CentroidOps' Janino lesson)
    val t = ctx.freshName("t"); val m = ctx.freshName("m")
    val out = ctx.freshName("out"); val i = ctx.freshName("i")
    val h = ctx.freshName("h"); val k = ctx.freshName("k")
    val s = ctx.freshName("s"); val b = ctx.freshName("b")
    val nb = ctx.freshName("nb")
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |int $t = $in.numElements();
         |int $m = $t - $n + 1; if ($m < 0) $m = 0;
         |long[] $out = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = 0L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $in.getUTF8String($i + $k);
         |    int $nb = $s.numBytes();
         |    for (int $b = 0; $b < $nb; $b++) {
         |      $h = ($h * 31 + ($s.getByte($b) & 0xff)) % ${p}L;
         |    }
         |    if ($k < $n - 1) $h = ($h * 31 + 32) % ${p}L;
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
