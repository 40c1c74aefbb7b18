package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k per group as a typed `Aggregator` with O(k) state.
  *
  * The window-function spelling (`row_number` over partition order) must
  * materialize and SORT every group; this aggregator keeps only the k
  * best rows per group in its buffer, combines map-side before the
  * shuffle, and merges k-lists pairwise — per-group state is O(k)
  * regardless of group size, so a billion-row skewed group costs the
  * same shuffle bytes as a small one. That is the 100 TB shape for
  * "top-k per key"; the window form exists as the correctness oracle.
  *
  * Ordering: value desc, then id asc — total and deterministic, so
  * results are engine-reproducible.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  require(k > 0, s"TopKAgg requires k > 0, got $k")

  // Buffers are maintained sorted (value desc, id asc): zero, reduce, and
  // merge all return sorted output, so reduce is an O(1) reject for rows
  // that can't enter a full buffer (the overwhelmingly common case) and an
  // O(k) sorted insert otherwise — no per-row re-sort. `beats` uses the
  // SAME total order as merge's sortBy (Scala 2.13 Ordering.Double.
  // TotalOrdering == java Double.compare): NaN sorts as the worst value
  // on both paths, so results can't depend on partitioning.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(-a._1, -b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def best(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    if (b.length >= k && !beats(a, b.last)) b
    else {
      val (better, worse) = b.span(beats(_, a))
      (better ++ (a +: worse)).take(k)
    }
  }
  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(x ++ y)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
