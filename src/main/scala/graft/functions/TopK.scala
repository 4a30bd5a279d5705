package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded top-k typed Aggregator: per group, the k orderkeys with the
  * highest (price DESC, key ASC) rank.
  *
  * Why an Aggregator and not `slice(sort_array(collect_list(...)))`:
  * collect_list buffers the ENTIRE group on the reduce side — at 100 TB
  * a hot group OOMs the executor. An Aggregator participates in partial
  * aggregation: every map task keeps at most k entries per group,
  * partials merge associatively in the shuffle tree, and the reduce side
  * only ever sees k-sized buffers. This is preference (b) of SURVEY §7.3
  * (typed aggregation) — no RDD drop-down, codegen'd surroundings.
  *
  * Input binds positionally: `udaf(new TopKOrders(k))(price, key)`.
  * Ordering: price DESC, key ASC — ties on price are broken by the
  * unique key, so results are deterministic and engine-independent
  * (pure comparisons on the raw column values, no arithmetic).
  */
class TopKOrders(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
  require(k >= 1)

  private def ord: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    // k is tiny (single digits): re-sorting a (k+1)-element seq per row
    // is cheaper than a heap below ~100 entries and keeps the buffer a
    // plain encodable Seq
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.sorted(ord).map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Bounded top-k neighbor-label Aggregator for the kNN audits (q271's
  * tail): per group, the labels of the k candidates with the highest
  * (rank_key DESC, cid ASC) order — the same partial-aggregation
  * argument as [[TopKOrders]] (map-side buffers never exceed k), which
  * replaces a row_number window over the full N·(N−1) candidate
  * relation with one partial-aggregable groupBy: no global sort of the
  * pair stream, and the shuffle moves ≤ k entries per vector. */
class TopKLabels(k: Int)
    extends Aggregator[(Long, Long, Long), Seq[(Long, Long, Long)], Seq[Long]] {
  require(k >= 1)

  private def ord: Ordering[(Long, Long, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def zero: Seq[(Long, Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long, Long)], in: (Long, Long, Long)): Seq[(Long, Long, Long)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Long, Long)]): Seq[Long] =
    buf.sorted(ord).map(_._3)

  override def bufferEncoder: Encoder[Seq[(Long, Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
