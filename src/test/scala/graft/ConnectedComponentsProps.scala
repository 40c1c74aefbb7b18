package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Test.Parameters

import graft.operators.ConnectedComponents

/** Property check for the alternating large-star/small-star resolver
  * against a plain-Scala union-find oracle. The algorithm's emission
  * rules (which endpoint keys each star, when a self-edge is dropped)
  * are exactly the kind of code a fixture can silently under-test —
  * random graphs cover chains, stars, cycles, parallel/reversed edges,
  * and disjoint components in one property. Few cases: each runs a full
  * multi-round Spark iteration. */
object ConnectedComponentsProps extends Properties("ConnectedComponents") {

  override def overrideParameters(p: Parameters): Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = SparkSpec.session

  /** Plain union-find with path compression; labels = component min —
    * the contract the DuckDB recursive-CTE oracles also check. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(n => n -> find(n)).toMap
  }

  // node ids with deliberate collisions (small domain) so cycles and
  // parallel/reversed edges are common; self-loops included to prove
  // they're ignored
  private val edgeList: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)))

  property("labels match a union-find oracle (component-min contract)") =
    Prop.forAll(edgeList) { es =>
      import spark.implicits._
      val real = es.filter { case (a, b) => a != b }
      val got = ConnectedComponents.run(es.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      got == unionFind(real)
    }
}
