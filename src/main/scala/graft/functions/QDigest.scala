package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** q-digest: a mergeable ε-approximate QUANTILE sketch over a bounded
  * integer universe [0, 2^depth) — the fourth sketch dimension in the
  * family (distinct = KMV [[MinKLongs]], heavy hitters = [[MisraGries]],
  * frequency = Count-Min q127, quantiles = this). Shrivastava et al.,
  * "Medians and Beyond" (SenSys'04).
  *
  * State: a sparse counter map over the implicit binary tree on the
  * universe (heap numbering: root = 1, leaf of value v = 2^depth + v).
  * Inserts land on leaves; `compress` walks bottom-up merging any node
  * whose (self + sibling + parent) mass is below n/k into its parent,
  * which caps the digest at O(k) entries while guaranteeing every
  * query path holds < depth·n/k misplaced mass — the classic
  * ε = depth/k rank-error bound.
  *
  * Mergeability is the point: `merge` is counter addition + compress,
  * fully associative, so the Aggregator participates in partial
  * aggregation — every map task ships ≤ ~3k counters per group and
  * the shuffle reduces k-sized digests, never the value stream. That
  * is what an exact per-group percentile (q57's global sort per group)
  * cannot do on 100 TB, and why warehouses store per-partition digests
  * and merge at query time (q148's pattern, for ranks).
  *
  * Unlike KMV the compressed state depends on arrival order (compress
  * points are data-split dependent), so the oracle contract is q54/
  * q58-style: exact columns + the rank-error bound evaluated exactly
  * and pinned TRUE — the bound holds for EVERY merge order, which is
  * precisely the theorem the pin checks.
  *
  * `finish` reports, for each requested basis-point rank φ, the upper
  * bound of the node where the cumulative count (nodes ordered by
  * interval upper bound, narrower first) first reaches ⌈φ·n/10⁴⌉.
  */
class QDigestQuantiles(depth: Int, k: Int, phisBp: Seq[Int])
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
  require(depth >= 1 && depth <= 40 && k >= 8 && phisBp.nonEmpty)
  private val leafBase = 1L << depth
  // compress once the sparse map outgrows 3k: q-digest's steady-state
  // size bound, so per-task memory stays O(k) regardless of input size
  private val sizeTrigger = 3 * k

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], v: Long): Map[Long, Long] = {
    // clamp into the universe rather than throw: a 100 TB scan must not
    // die on one out-of-range outlier (it lands on the extreme leaf and
    // costs ≤ its own mass of rank error)
    val leaf = leafBase + math.min(math.max(v, 0L), leafBase - 1L)
    val b = buf.updated(leaf, buf.getOrElse(leaf, 0L) + 1L)
    if (b.size > sizeTrigger) compress(b) else b
  }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val (small, big) = if (a.size < b.size) (a, b) else (b, a)
    val m = small.foldLeft(big) { case (acc, (id, c)) =>
      acc.updated(id, acc.getOrElse(id, 0L) + c)
    }
    if (m.size > sizeTrigger) compress(m) else m
  }

  override def finish(buf: Map[Long, Long]): Seq[Long] = {
    if (buf.isEmpty) return phisBp.map(_ => -1L)
    val n = buf.valuesIterator.sum
    // postorder rank walk: ascending interval upper bound, narrower
    // (deeper, larger id) first on ties so a leaf is consumed before
    // the ancestors that contain it
    val nodes = buf.toArray.sortBy { case (id, _) => (hiOf(id), -id) }
    phisBp.map { bp =>
      val target = math.max(1L, math.ceil(n.toDouble * bp / 10000.0).toLong)
      var cum = 0L; var i = 0; var out = hiOf(nodes.last._1)
      var found = false
      while (i < nodes.length && !found) {
        cum += nodes(i)._2
        if (cum >= target) { out = hiOf(nodes(i)._1); found = true }
        i += 1
      }
      out
    }
  }

  /** Largest universe value covered by node `id`. */
  private def hiOf(id: Long): Long = {
    var span = 1L; var top = id
    while (top < leafBase) { top = (top << 1) | 1L; span <<= 1 }
    top - leafBase
  }

  private def compress(m0: Map[Long, Long]): Map[Long, Long] = {
    val n = m0.valuesIterator.sum
    val tau = math.max(1L, n / k)
    val m = scala.collection.mutable.HashMap.empty[Long, Long]
    m0.foreach { case (id, c) => m(id) = c }
    // descending id = deepest level first, so freed mass cascades up
    val ids = m.keys.toArray
    java.util.Arrays.sort(ids)
    var i = ids.length - 1
    while (i >= 0) {
      val id = ids(i)
      if (id > 1L && m.contains(id)) {
        val c = m.getOrElse(id, 0L) + m.getOrElse(id ^ 1L, 0L) +
          m.getOrElse(id >> 1, 0L)
        if (c < tau) {
          m.remove(id); m.remove(id ^ 1L)
          m(id >> 1) = c
        }
      }
      i -= 1
    }
    m.toMap
  }

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
