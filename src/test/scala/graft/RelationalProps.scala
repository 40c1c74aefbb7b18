package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

import graft.operators.Relational._

/** Property-based checks over the relational operator library (SURVEY.md §5
  * item 3). Small generated tables, few cases — each case runs Spark jobs. */
object RelationalProps extends Properties("Relational") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val rows: Gen[List[(String, Int)]] =
    Gen.listOfN(20, Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.chooseNum(-100, 100)))

  property("dedupByKey is idempotent") = Prop.forAll(rows) { xs =>
    val df = xs.toDF("id", "v")
    val once = dedupByKey(df, Seq("id"))
    dedupByKey(once, Seq("id")).count() == once.count()
  }

  property("dedupFirstWins survivor = groupBy-min under asc order") = Prop.forAll(rows) { xs =>
    val df = xs.toDF("id", "v")
    val got = dedupFirstWins(df, Seq("id"), Seq(col("v").asc, col("id").asc))
      .select("id", "v").as[(String, Int)].collect().toSet
    val want = xs.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).min) }.toSet
    got == want
  }

  property("unionAll row count is additive") = Prop.forAll(rows, rows) { (xs, ys) =>
    unionAll(Seq(xs.toDF("id", "v"), ys.toDF("id", "v"))).count() == xs.size + ys.size
  }

  property("topK is the k-prefix of the total order") = Prop.forAll(rows, Gen.chooseNum(0, 25)) { (xs, k) =>
    val df = xs.toDF("id", "v")
    val got = topK(df, k, Seq(col("v").desc, col("id").asc))
      .select("v", "id").as[(Int, String)].collect().toSeq
    val want = xs.map { case (id, v) => (v, id) }
      .sortBy { case (v, id) => (-v, id) }.take(k)
    got == want
  }

  property("unionDedup keys = union of key sets") = Prop.forAll(rows, rows) { (xs, ys) =>
    val got = unionDedup(Seq(xs.toDF("id", "v"), ys.toDF("id", "v")), Seq("id")).count()
    got == (xs.map(_._1) ++ ys.map(_._1)).distinct.size
  }
}
