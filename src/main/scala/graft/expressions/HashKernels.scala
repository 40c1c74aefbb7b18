package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** The 60-bit md5 prefix as a long — bit-identical to the portable
  * hashing idiom used across the dedup/contamination family,
  *
  *   `conv(substring(md5(x), 1, 15), 16, 10).cast("long")`
  *
  * (and to DuckDB's replay of the same expression), but computed
  * directly from the digest bytes: the first 15 hex digits of an md5
  * are the top 60 bits of its first 8 bytes, so the value is one
  * big-endian load and a `>>> 4` — no 32-char hex string allocation,
  * no substring copy, no base-16 string parse. The MessageDigest
  * instance is reused across rows (Spark's own `md5` allocates one per
  * value via DigestUtils), and the whole scan stays inside whole-stage
  * codegen.
  *
  * Used under `transform(...)` over shingle arrays, where it runs once
  * per shingle — the hot inner loop of d51/d53/d56/d57 candidate
  * generation. Oracle compatibility is the design constraint: the DuckDB
  * twin keeps hashing via hex text, so this must (and does — spec-pinned
  * against the Spark idiom on random strings) produce the identical
  * long. Null input → null.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 requires a string argument, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    Md5Prefix60.top60(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5Digest",
      v => s"""
        try {
          $v = java.security.MessageDigest.getInstance("MD5");
        } catch (java.security.NoSuchAlgorithmException e) {
          throw new RuntimeException(e);
        }""")
    nullSafeCodeGen(ctx, ev, in => {
      val d = ctx.freshName("digest")
      s"""
        $md.reset();
        final byte[] $d = $md.digest($in.getBytes());
        ${ev.value} = (((($d[0] & 0xffL) << 56) | (($d[1] & 0xffL) << 48)
          | (($d[2] & 0xffL) << 40) | (($d[3] & 0xffL) << 32)
          | (($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16)
          | (($d[6] & 0xffL) << 8) | ($d[7] & 0xffL)) >>> 4);
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): Md5Prefix60 =
    copy(child = c)
}

object Md5Prefix60 {
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(c)))

  private[expressions] def top60(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40)
      | ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16)
      | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
}

/** 16-bit SimHash of a token array in ONE fused pass — the d52 kernel.
  *
  * Semantics (bit-identical to the declarative explode + 16-vote
  * aggregate form, and to the DuckDB oracle): for each token, vote
  * ±1 per bit b from the parity of hex digit b of md5(token) (hex digit
  * b is nibble b of the digest: high nibble of byte b/2 for even b, low
  * for odd); bit b of the result is set iff its vote sum is positive.
  *
  * Why an Expression: the declarative form is an explode of every
  * token plus a 16-aggregate groupBy — a full corpus-wide (doc_id,
  * token-hash) SHUFFLE whose only purpose is to sum per-doc votes that
  * a single row-local loop computes exactly. This kernel makes d52 a
  * pure projection: zero shuffles at any scale, like t47's repetition
  * kernel. Callers pass the DISTINCT token array
  * (`array_distinct(split(text, ' '))`), matching the aggregate form's
  * `explode(array_distinct(...))` input.
  *
  * Null input or null element → null; EMPTY array → null (the aggregate
  * form produces no row for a doc with no tokens; `split` never yields
  * an empty array, so this is unreachable from d52 — the gate exists
  * for direct SQL callers). MessageDigest reused across rows.
  */
case class SimHash16(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash16 requires an array<string> argument, got ${t.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val mayHaveNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    if (mayHaveNulls) {
      var k = 0
      while (k < n) { if (arr.isNullAt(k)) return null; k += 1 }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    SimHash16.compute(md, arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "simhashDigest",
      v => s"""
        try {
          $v = java.security.MessageDigest.getInstance("MD5");
        } catch (java.security.NoSuchAlgorithmException e) {
          throw new RuntimeException(e);
        }""")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val nullScan = if (mayHaveNulls) s"""
        for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
          if ($in.isNullAt($k)) ${ev.isNull} = true;
        }""" else ""
      s"""
        final int $n = $in.numElements();
        if ($n == 0) ${ev.isNull} = true;
        $nullScan
        if (!${ev.isNull}) {
          ${ev.value} = graft.expressions.SimHash16.compute($md, $in);
        }
      """
    })
  }

  override protected def withNewChildInternal(c: Expression): SimHash16 =
    copy(child = c)
}

object SimHash16 {
  def apply(c: Column): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(c)))

  /** The fused vote loop, shared by interpreted eval and codegen (the
    * per-row work is digest-bound; one static call per row keeps the
    * generated method small). Caller guarantees non-empty, null-free. */
  def compute(md: java.security.MessageDigest,
              arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 16) {
        val nibble =
          if ((b & 1) == 0) (d(b >> 1) >>> 4) & 0xf else d(b >> 1) & 0xf
        votes(b) += ((nibble & 1) << 1) - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
