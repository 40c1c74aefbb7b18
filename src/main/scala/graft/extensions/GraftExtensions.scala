package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.QCosine

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
  }
}
