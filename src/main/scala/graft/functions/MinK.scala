package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded k-minimum-values buffer: per group, the k smallest DISTINCT
  * longs — the state of a KMV distinct-count sketch (q147). Like
  * [[TopKOrders]], this exists because `slice(array_sort(collect_set
  * (...)))` buffers the whole distinct set per group on the reduce
  * side; this Aggregator participates in partial aggregation, so every
  * map task holds at most k longs per group and the shuffle tree merges
  * k-sized sorted buffers associatively — the mergeability that makes
  * KMV a one-pass distributed sketch.
  *
  * Duplicates are absorbed by the buffer itself (KMV is defined over
  * distinct hash values): no upstream `distinct()` pass is needed, so
  * the sketch rides the raw occurrence stream.
  *
  * The buffer is a sorted distinct Vector; the common case (value ≥
  * current k-th minimum) is rejected in O(1), inserts use binary
  * search. Output is the sorted buffer; callers read the k-th value
  * with `try_element_at` (null when the group has < k distinct values).
  */
class MinKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1)

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], in: Long): Seq[Long] = {
    if (buf.length == k && in >= buf.last) buf // reject path: most rows
    else {
      val i = insertPos(buf, in)
      if (i >= 0) (buf.take(i) :+ in) ++ buf.drop(i).take(k - i - 1)
      else buf // already present
    }
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    // merge of two sorted distinct seqs, dedup, first k
    val out = Vector.newBuilder[Long]
    var (i, j, n) = (0, 0, 0)
    var last: Option[Long] = None
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (!last.contains(v)) { out += v; last = Some(v); n += 1 }
    }
    out.result()
  }

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  /** Insertion index keeping the buffer sorted-distinct, or -1 if `in`
    * is already present. */
  private def insertPos(buf: Seq[Long], in: Long): Int = {
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) == in) return -1
      else if (buf(mid) < in) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
