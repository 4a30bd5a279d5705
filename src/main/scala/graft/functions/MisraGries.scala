package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries heavy-hitters summary as a typed Aggregator: at most `k`
  * (key → count) counters, with the mergeable-summaries guarantee
  * (Agarwal et al., PODS 2012): after any tree of partial merges the
  * final summary still (a) retains every key whose true frequency
  * exceeds n/(k+1), and (b) estimates with
  * `true − n/(k+1) ≤ est ≤ true`.
  *
  * Why this operator at 100 TB: the exact per-key groupBy this
  * engine's q-series uses as oracle shuffles every distinct key; the
  * MG summary is O(k) PER MAP TASK, merges associatively in the
  * shuffle tree, and finds the heavy keys with ONE narrow pass — the
  * standard first stage before a targeted exact count of the few
  * surviving candidates (and the principled version of q59/q87's
  * "know your hot keys" prerequisite for salting).
  *
  * reduce() is the textbook step: increment a present key, insert if
  * below capacity, otherwise decrement ALL counters (dropping zeros) —
  * the O(k) decrement amortizes to O(1) per row because each
  * decrement event removes k+1 prior increments. merge() sums the two
  * maps, then if over capacity subtracts the (k+1)-th largest count
  * from every counter and drops the non-positive remainder — exactly
  * the offset that preserves the error bound.
  *
  * The immutable-Map buffer keeps the encoder trivial (ExpressionEncoder
  * derives Map[Long, Long]); a production build would swap in a mutable
  * OpenHashMap behind the same algebra.
  */
class MisraGries(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1)

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], key: Long): Map[Long, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1L)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(buf: Map[Long, Long]): Map[Long, Long] = buf

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
