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
