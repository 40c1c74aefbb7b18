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

  private def best(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    best(a +: b)
  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    best(x ++ y)
  override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
