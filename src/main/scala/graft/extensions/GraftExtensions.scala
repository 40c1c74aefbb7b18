package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{MinHashSig, QCosine, SortedOverlap}

/** Session extensions: registers the engine's native expressions in the
  * SQL function registry, so `spark.sql("... qcosine(a, b) ...")` and the
  * Column API hit the same codegen'd kernel.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.extensions.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  *
  * Per SURVEY.md §7.3 this is the whole custom-Catalyst surface the
  * engine needs: the reference's operator inventory is covered by stock
  * DataFrame/SQL calls, and no custom logical plans, optimizer rules, or
  * strategies are warranted — injecting them anyway would only take plan
  * shapes away from Catalyst/AQE.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("qcosine"),
      new ExpressionInfo(classOf[QCosine].getName, "qcosine"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"qcosine expects 2 arguments, got ${children.length}")
        QCosine(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_overlap"),
      new ExpressionInfo(classOf[SortedOverlap].getName, "sorted_overlap"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"sorted_overlap expects 2 arguments, got ${children.length}")
        SortedOverlap(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        // minhash_sig(hs, k, p): k and p must be foldable integer literals.
        require(children.length == 3,
          s"minhash_sig expects 3 arguments (array, k, p), got ${children.length}")
        val k = children(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
          case e => throw new IllegalArgumentException(s"k must be a literal, got $e")
        }
        val p = children(2) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].longValue()
          case e => throw new IllegalArgumentException(s"p must be a literal, got $e")
        }
        MinHashSig(children(0), k, p)
      }))
  }
}
