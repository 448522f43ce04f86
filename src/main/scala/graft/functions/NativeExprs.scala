package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the similarity/dedup hot kernels.
 *
 * Spark's array higher-order functions (`transform`/`aggregate`/
 * `zip_with`) are interpreted — each call allocates closures and boxes
 * elements, which dominates all-pairs similarity and signature
 * computation. These expressions generate tight Java loops over the
 * unsafe array representation (`doGenCode`), keeping the kernels inside
 * whole-stage codegen; the interpreted `eval` path mirrors the same
 * arithmetic exactly.
 *
 * ELEMENT-NULL CONTRACT: a null ARGUMENT yields null, but array
 * ELEMENTS are read without per-element null checks — the hot loops
 * assume dense numeric arrays, and an unsafe-array null slot reads as
 * 0. Every in-repo producer satisfies this (parquet embeddings are
 * dense by generation; shingle/token hashes come from split/transform
 * over non-null strings); callers feeding user data with nullable
 * elements must pre-clean (e.g. `array_compact`, or the null-skipping
 * aggregate in [[graft.ops.Similarity.centroids]]) — a per-element
 * branch in these kernels would put the check on every iteration of
 * exactly the loops this file exists to keep tight.
 */
object native {

  /** dot(a, b) over array<double>; null if either side is null. */
  def dotD(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductDouble(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** MinHash signature over pre-hashed shingles (array<long> → array<long>). */
  def minhashSig(hashes: Column, numHashes: Int, seed: Long): Column =
    GraftColumnBridge.column(MinHashSigExpr(
      GraftColumnBridge.expression(hashes), numHashes, seed))

  /** 64-bit SimHash over pre-hashed tokens (array<long> → long). */
  def simhash(hashes: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(hashes)))

  /** Sorted-distinct n-gram shingle hashes over a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(tokens), n))

  /** Sorted-distinct char k-gram shingle hashes DIRECTLY over a string
    * (string → array<long>), value-identical to
    * `shingleHashes(split(s, ""), k)`. */
  def charShingleHashes(str: Column, k: Int): Column =
    GraftColumnBridge.column(CharShingleHashes(GraftColumnBridge.expression(str), k))

  /** |A ∩ B| over two SORTED-DISTINCT array<long> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Ordered (index-parallel) dot product of two double arrays. */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two array<double> args")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * MinHash signature: for each of `numHashes` universal-hash functions
 * h_j(x) = (a_j·(x'+1) + b_j) mod P (P = 2038074743, same prime as
 * MLlib's MinHashLSH; x' = x mod P ≥ 0), the min over the input hash
 * array. Coefficients derive deterministically from `seed`. Empty or
 * null input → null.
 */
/** K-permutation MinHash over pre-hashed shingles: one multiply-shift
  * permutation per (shingle, hash) — O(m·K) but branch-free and
  * codegen'd. Known scale path beyond ~10⁹ docs: one-permutation
  * hashing with optimal densification (Shrivastava & Li 2014;
  * Shrivastava 2017) drops this to O(m) per row; the banding and
  * exact-verification stages above it are unchanged. Not swapped in
  * here because the catalog's candidate-set oracles were calibrated
  * against K-permutation escape probabilities. */
case class MinHashSigExpr(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  final val Prime = 2038074743L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<long>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  @transient lazy val (coeffA: Array[Long], coeffB: Array[Long]) = {
    val r = new scala.util.Random(seed)
    (Array.fill(numHashes)(1L + r.nextInt((Prime - 1).toInt)),
      Array.fill(numHashes)(r.nextInt(Prime.toInt).toLong))
  }

  private def compute(in: ArrayData): Array[Long] = {
    val m = in.numElements()
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var mn = Long.MaxValue
      val a = coeffA(j); val b = coeffB(j)
      var i = 0
      while (i < m) {
        val h = ((in.getLong(i) % Prime) + Prime) % Prime
        val v = (a * (h + 1L) + b) % Prime
        if (v < mn) mn = v
        i += 1
      }
      sig(j) = mn; j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    if (in.numElements() == 0) null else new GenericArrayData(compute(in))
  }

  // empty array must yield null, which nullSafeCodeGen can't express — custom gen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val aRef = ctx.addReferenceObj("minhashA", coeffA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coeffB, "long[]")
    val in = childGen.value
    val m = ctx.freshName("m"); val sig = ctx.freshName("sig")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val h = ctx.freshName("h"); val v = ctx.freshName("v"); val mn = ctx.freshName("mn")
    val code =
      s"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  int $m = $in.numElements();
         |  if ($m > 0) {
         |    long[] $sig = new long[$numHashes];
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $mn = Long.MAX_VALUE;
         |      for (int $i = 0; $i < $m; $i++) {
         |        long $h = (($in.getLong($i) % ${Prime}L) + ${Prime}L) % ${Prime}L;
         |        long $v = ($aRef[$j] * ($h + 1L) + $bRef[$j]) % ${Prime}L;
         |        if ($v < $mn) $mn = $v;
         |      }
         |      $sig[$j] = $mn;
         |    }
         |    ${ev.isNull} = false;
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
         |  }
         |}
       """.stripMargin
    ev.copy(code = org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
      new StringContext(code)).code())
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash: per-bit ±1 votes of each input hash; sign → bit.
  * Empty input → 0L (no evidence), null input → null. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<long>")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val m = in.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      val h = in.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val m = ctx.freshName("m"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $m = $in.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $m; $i++) {
         |  long $h = $in.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Intersection SIZE of two sorted-distinct long arrays — the exact-
 * verification kernel of the set-similarity joins: every surviving
 * candidate pair pays one |A∩B|, and `size(array_intersect(a, b))`
 * pays a per-row hash-set build plus a materialized result array the
 * caller immediately reduces to its length. This is one allocation-free
 * two-pointer sweep inside whole-stage codegen.
 *
 * PRECONDITION: both inputs ascending-sorted and duplicate-free — the
 * representation [[ShingleHashes]] emits. Unsorted input UNDERCOUNTS
 * silently; the OpsSpec law pins equality with array_intersect on the
 * real producer.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects two array<long> args")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Distinct word n-gram shingle hashes: tokens → per-token XXH64, then
 * each shingle's hash chains its n token hashes (the same mixing
 * xxhash64(col1..coln) uses) — no shingle strings are ever materialized.
 * Output is sorted-distinct array<long>, ready for MinHash / set
 * intersection. Replaces transform+concat_ws+array_distinct, which
 * dominate shingling cost as interpreted higher-order functions.
 */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val in = input.asInstanceOf[ArrayData]
    val m = in.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = in.getUTF8String(i)
      th(i) = if (s == null) 42L
        else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(ShingleHashes.chainSortDedup(th, n))
  }

  // was CodegenFallback (r14): the per-row fallback evaluates through
  // an InternalRow + boxed GenericArrayData on the hot path of every
  // shingle-based dedup operator — this is the same loop emitted as
  // straight-line Java inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val m = ctx.freshName("m"); val th = ctx.freshName("th")
      val i = ctx.freshName("i"); val s = ctx.freshName("s")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val helper = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $m = $in.numElements();
         |if ($m < $n) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $th = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $in.getUTF8String($i);
         |    $th[$i] = ($s == null) ? 42L
         |      : $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |    $helper.chainSortDedup($th, $n));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {
  /** Chain n consecutive element hashes per gram (same mixing as
    * xxhash64(col1..coln)), then sort + dedup — the shared tail of the
    * word and char shingle kernels. Called from generated code. */
  def chainSortDedup(th: Array[Long], n: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val m = th.length
    val hs = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      var h = 42L; var k = 0
      while (k < n) { h = XXH64.hashLong(th(i + k), h); k += 1 }
      hs(i) = h; i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1; i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == hs.length) hs else java.util.Arrays.copyOf(hs, w)
  }

  /** Per-code-point hashes of a string — each code point's hash is
    * XXH64 over its UTF-8 bytes, exactly what hashing the 1-char
    * tokens of `split(s, "")` produces (Java's empty-pattern split
    * cuts between code points, keeping surrogate pairs whole, and a
    * UTF8String slice of one code point is its UTF-8 byte run).
    * Called from generated code. */
  def codePointHashes(s: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val base = s.getBaseObject; val off = s.getBaseOffset; val nb = s.numBytes
    val th = new Array[Long](nb)
    var m = 0; var i = 0
    while (i < nb) {
      val l0 = org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      val l = if (i + l0 > nb) nb - i else l0
      th(m) = XXH64.hashUnsafeBytes(base, off + i, l, 42L)
      m += 1; i += l
    }
    if (m == nb) th else java.util.Arrays.copyOf(th, m)
  }
}

/**
 * Sorted-distinct char k-gram shingle hashes DIRECTLY over the string —
 * value-identical to `ShingleHashes(split(s, ""), k)` (law-pinned) but
 * with no regex split, no array of one-char UTF8Strings, and no
 * CodegenFallback: the empty-pattern split materialized one string
 * object per code point and dominated char-shingling cost (r14,
 * guide §4 — prefer tight codegen'd loops in scan-side kernels).
 * k >= 2 so the two forms agree on the empty string (split("") yields
 * [""], one sub-k token either way).
 */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 2, "char shingle width must be >= 2")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val th = ShingleHashes.codePointHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    if (th.length < k) new GenericArrayData(Array.emptyLongArray)
    else new GenericArrayData(ShingleHashes.chainSortDedup(th, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val th = ctx.freshName("th")
      val helper = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |long[] $th = $helper.codePointHashes($in);
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |  ($th.length < $k) ? new long[0] : $helper.chainSortDedup($th, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
