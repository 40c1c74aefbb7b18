package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED-ascending distinct long arrays as a
  * single merge scan — the hot kernel of candidate-pair verification in
  * the near-dup pipelines (d51/d53: per-pair shingle-set overlap).
  *
  * Why not `size(array_intersect(a, b))`: array_intersect builds a hash
  * set per invocation (per candidate pair) with boxed longs — allocation
  * and hashing dominate. Two pre-sorted primitive arrays intersect in one
  * branch-predictable O(n+m) pass with zero allocation, inside
  * whole-stage codegen. Callers must pass arrays sorted ascending and
  * deduplicated (array_sort . array_distinct); the result then equals
  * size(array_intersect) exactly, so DuckDB oracles are unchanged.
  */
case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_overlap requires two array<bigint> arguments, " +
        s"got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // Null elements null the result out (matching zip_with-style semantics
  // and QCosine): getLong on a null slot would silently read 0. The scan
  // is gated on containsNull, statically known — d51/d53's arrays are
  // containsNull=false, so the hot path pays nothing.
  private lazy val leftMayHaveNulls =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val rightMayHaveNulls =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = xa.numElements(); val m = xb.numElements()
    var i = 0
    if (leftMayHaveNulls) {
      while (i < n) { if (xa.isNullAt(i)) return null; i += 1 }
    }
    if (rightMayHaveNulls) {
      i = 0
      while (i < m) { if (xb.isNullAt(i)) return null; i += 1 }
    }
    i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = xa.getLong(i); val y = xb.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val c = ctx.freshName("c"); val k = ctx.freshName("k")
      val leftScan = if (leftMayHaveNulls) s"""
        for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
          if ($a.isNullAt($k)) ${ev.isNull} = true;
        }""" else ""
      val rightScan = if (rightMayHaveNulls) s"""
        for (int $k = 0; $k < $m && !${ev.isNull}; $k++) {
          if ($b.isNullAt($k)) ${ev.isNull} = true;
        }""" else ""
      s"""
        final int $n = $a.numElements();
        final int $m = $b.numElements();
        $leftScan
        $rightScan
        if (!${ev.isNull}) {
          int $i = 0; int $j = 0; long $c = 0L;
          while ($i < $n && $j < $m) {
            final long $x = $a.getLong($i);
            final long $y = $b.getLong($j);
            if ($x < $y) { $i++; }
            else if ($x > $y) { $j++; }
            else { $c++; $i++; $j++; }
          }
          ${ev.value} = $c;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlap =
    copy(left = l, right = r)
}

object SortedOverlap {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedOverlap(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** All K MinHash values of a hashed-shingle array in ONE pass.
  *
  * Semantics (exact-integer, engine-portable — must stay bit-identical to
  * the declarative form and the DuckDB oracle in DedupQueries d51):
  * sig[i] = min over h in hs of (h * (2i+1) + (1000003*i + 12345)) mod p,
  * the universal-hash family over 32-bit fingerprints h (products stay
  * < 2^38, exact in long on any engine). Null for null or empty input
  * (min of nothing is undefined; d51 filters size >= n upstream).
  *
  * Input contract, ENFORCED at runtime: every element must be a 32-bit
  * fingerprint, 0 <= h < 2^32. Outside that range h*(2i+1) can overflow
  * long and Java's % yields negative values — a silently wrong signature.
  * Internal callers shift 60-bit hashes down to 32 bits; the guard exists
  * for SQL callers of the registered `minhash_sig`, and costs one
  * branch-predictable comparison per element.
  *
  * Why an Expression: the declarative spelling is K independent
  * array_min(transform(hs, ...)) columns — higher-order functions are
  * CodegenFallback, so that's 12 interpreted passes with a lambda-variable
  * bind per element. This is one fused primitive loop inside whole-stage
  * codegen.
  */
case class MinHashSig(child: Expression, k: Int, p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires an array<bigint> argument, got ${t.simpleString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // Null for null/empty input OR any null element (getLong on a null
  // slot would fold a phantom 0-hash into the signature). The element
  // scan is gated on containsNull, statically known.
  private lazy val mayHaveNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    if (mayHaveNulls) {
      var chk = 0
      while (chk < n) { if (hs.isNullAt(chk)) return null; chk += 1 }
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      if ((h >>> 32) != 0L) throw new IllegalArgumentException(
        s"minhash_sig: element $h is not a 32-bit fingerprint (need 0 <= h < 2^32)")
      var i = 0
      while (i < k) {
        val x = (h * (2L * i + 1L) + (1000003L * i + 12345L)) % p
        if (x < mins(i)) mins(i) = x
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val x = ctx.freshName("x")
      s"""
        final int $n = $a.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        }${if (mayHaveNulls) s""" else {
          for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
            if ($a.isNullAt($j)) ${ev.isNull} = true;
          }
        }""" else ""}
        if (!${ev.isNull}) {
          final long[] $mins = new long[$k];
          java.util.Arrays.fill($mins, Long.MAX_VALUE);
          for (int $j = 0; $j < $n; $j++) {
            final long $h = $a.getLong($j);
            if (($h >>> 32) != 0L) throw new IllegalArgumentException(
              "minhash_sig: element " + $h + " is not a 32-bit fingerprint (need 0 <= h < 2^32)");
            for (int $i = 0; $i < $k; $i++) {
              final long $x = ($h * (2L * $i + 1L) + (1000003L * $i + 12345L)) % ${p}L;
              if ($x < $mins[$i]) $mins[$i] = $x;
            }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  def apply(hs: Column, k: Int, p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), k, p))
}

/** Longest run of equal ADJACENT elements in a string array — on a
  * sorted array this is the max multiplicity of any element, which is
  * t47's top-bigram count computed per row with NO (doc_id, gram) tally
  * shuffle.
  *
  * Why an Expression: the same fold as a declarative
  * `aggregate(...)` HOF is CodegenFallback and allocates a
  * (prev, run, best) struct with a string copy per element — measured
  * 2.4x SLOWER than even the two-shuffle groupBy tally at sf0.1
  * (9.6s vs 4.1s). This compiled zero-allocation scan runs at parity
  * with the tally locally (4.6s; shingle evaluation dominates both) —
  * the win is structural: it removes both corpus-wide shuffles, the
  * term that grows with corpus size, so per-doc repetition scoring
  * stays embarrassingly parallel at 100 TB.
  * Empty array → 0; null element → null (gated on containsNull,
  * statically known).
  */
case class MaxRun(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"max_run requires an array<string> argument, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val mayHaveNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (mayHaveNulls) {
      var i = 0
      while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    }
    var best = 0L; var run = 0L; var i = 0
    var prev: UTF8String = null
    while (i < n) {
      val cur = arr.getUTF8String(i)
      run = if (prev != null && cur.equals(prev)) run + 1 else 1L
      if (run > best) best = run
      prev = cur
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val run = ctx.freshName("run"); val best = ctx.freshName("best")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val nullScan = if (mayHaveNulls) s"""
        for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
          if ($a.isNullAt($k)) ${ev.isNull} = true;
        }""" else ""
      s"""
        final int $n = $a.numElements();
        $nullScan
        if (!${ev.isNull}) {
          long $best = 0L; long $run = 0L;
          $u $prev = null;
          for (int $i = 0; $i < $n; $i++) {
            final $u $cur = $a.getUTF8String($i);
            $run = ($prev != null && $cur.equals($prev)) ? $run + 1L : 1L;
            if ($run > $best) $best = $run;
            $prev = $cur;
          }
          ${ev.value} = $best;
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): MaxRun =
    copy(child = c)
}

object MaxRun {
  def apply(a: Column): Column =
    ColumnBridge.column(MaxRun(ColumnBridge.expression(a)))
}

/** Max multiplicity over the ADJACENT word pairs (bigrams) of a string
  * array, computed per row with no bigram materialization at all:
  * each word hashes once (XXH64 over its bytes), each pair is the
  * 64-bit chain hashLong(wordHash[i+1], seed = wordHash[i]), and the
  * pair hashes — a primitive long[] — are sorted and run-scanned.
  * Equals MaxRun(array_sort(shingles(w, 2))) (ArrayKernelsSpec pins the
  * equivalence) but skips what dominates that pipeline's cost: n
  * concat_ws string allocations, the gram array, and an O(n log n)
  * STRING sort with per-comparison byte scans — here the sort is over
  * primitive longs.
  *
  * Collision caveat (why t47 may still choose the string path): two
  * DISTINCT bigrams colliding in 64 bits would merge their counts and
  * overcount the max — probability ~m²/2⁶⁵ per doc (~1e-13 at m=1000),
  * and unlike the dedup family's md5 hashing the DuckDB oracle does NOT
  * hash the same way, so a collision would surface as an oracle
  * mismatch rather than agree by construction. Fewer than 2 words → 0;
  * null element → null (gated on containsNull, statically known). */
case class MaxPairMultiplicity(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"max_pair_multiplicity requires an array<string> argument, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val mayHaveNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (mayHaveNulls) {
      var k = 0
      while (k < n) { if (arr.isNullAt(k)) return null; k += 1 }
    }
    if (n < 2) return 0L
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val ph = new Array[Long](n - 1)
    i = 0
    while (i < n - 1) { ph(i) = XXH64.hashLong(wh(i + 1), wh(i)); i += 1 }
    java.util.Arrays.sort(ph)
    var best = 1L; var run = 1L; i = 1
    while (i < n - 1) {
      run = if (ph(i) == ph(i - 1)) run + 1 else 1L
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val wh = ctx.freshName("wh"); val ph = ctx.freshName("ph")
      val run = ctx.freshName("run"); val best = ctx.freshName("best")
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val nullScan = if (mayHaveNulls) s"""
        for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
          if ($a.isNullAt($k)) ${ev.isNull} = true;
        }""" else ""
      s"""
        final int $n = $a.numElements();
        $nullScan
        if (!${ev.isNull}) {
          if ($n < 2) {
            ${ev.value} = 0L;
          } else {
            final long[] $wh = new long[$n];
            for (int $i = 0; $i < $n; $i++) {
              $wh[$i] = $xxh.hashUTF8String($a.getUTF8String($i), 42L);
            }
            final long[] $ph = new long[$n - 1];
            for (int $i = 0; $i < $n - 1; $i++) {
              $ph[$i] = $xxh.hashLong($wh[$i + 1], $wh[$i]);
            }
            java.util.Arrays.sort($ph);
            long $best = 1L; long $run = 1L;
            for (int $i = 1; $i < $n - 1; $i++) {
              $run = ($ph[$i] == $ph[$i - 1]) ? $run + 1L : 1L;
              if ($run > $best) $best = $run;
            }
            ${ev.value} = $best;
          }
        }
      """
    })

  override protected def withNewChildInternal(c: Expression): MaxPairMultiplicity =
    copy(child = c)
}

object MaxPairMultiplicity {
  def apply(a: Column): Column =
    ColumnBridge.column(MaxPairMultiplicity(ColumnBridge.expression(a)))
}
