package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Cosine similarity of two quantized (integer) embedding vectors as a
  * native Catalyst expression with whole-stage codegen.
  *
  * Semantics (must stay bit-identical to the declarative form used by the
  * d54/s60 oracles): dot = sum(a_i * b_i), na = sum(a_i^2),
  * nb = sum(b_i^2) in exact long arithmetic, then
  * `dot / (sqrt(na) * sqrt(nb))` in IEEE double. Null if either input is
  * null or lengths differ.
  *
  * Why an Expression and not a UDF: the generated code runs inside the
  * whole-stage-codegen loop — one fused pass, primitive arrays, no
  * boxing, no Scala-closure call per row. On the brute-force ANN path
  * (pairs x 64 dims) this is the hot kernel; a Scala UDF pays
  * serialization per call and blocks codegen for the whole stage.
  */
case class QCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  // Strict input typing: SQL callers writing qcosine(array(1,2,3), ...)
  // pass array<int>, and ArrayData.getLong on int-backed arrays would
  // silently read wrong bytes — fail at analysis time instead. (Spark 4
  // hides AbstractDataType/ExpectsInputTypes from external packages, so
  // the check is hand-rolled. Cast to array<bigint> at the call site.)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qcosine requires two array<bigint> arguments " +
        s"(e.g. Similarity.quantize output), got ${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Null-element arrays null out (matching the declarative
  // zip_with/aggregate form, which propagates element nulls). Zero-norm
  // vectors yield NaN in both forms (0/0 in IEEE double).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    var dot = 0L; var na = 0L; var nb = 0L; var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      val x = xa.getLong(i); val y = xb.getLong(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $dot = 0L; long $na = 0L; long $nb = 0L;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            final long $x = $a.getLong($i);
            final long $y = $b.getLong($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          if (!${ev.isNull}) {
            ${ev.value} = ((double) $dot) /
              (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
          }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QCosine =
    copy(left = l, right = r)
}

object QCosine {
  /** Column-level entry point: `qcosine(quantA, quantB)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      QCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
