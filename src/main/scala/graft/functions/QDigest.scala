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
  * State: a bag of (node, count) pairs over the implicit binary tree on
  * the universe (heap numbering: root = 1, leaf of value v = 2^depth+v).
  * Inserts land on leaves; `compress` walks bottom-up merging any node
  * whose (self + sibling + parent) mass is below n/k into its parent,
  * which caps the digest at O(k) entries while guaranteeing every
  * query path holds < depth·n/k misplaced mass — the classic
  * ε = depth/k rank-error bound.
  *
  * Mergeability is the point: `merge` is counter addition + compress,
  * fully associative, so the Aggregator participates in partial
  * aggregation — every map task ships O(k) counters per group and
  * the shuffle reduces k-sized digests, never the value stream. That
  * is what an exact per-group percentile (q57's global sort per group)
  * cannot do on 100 TB, and why warehouses store per-partition digests
  * and merge at query time (q148's pattern, for ranks).
  *
  * Representation: a flat `Array[Long]` — slot 0 the used pair count,
  * then (id, count) pairs — used as an APPEND LOG. Per-row cost is two
  * primitive array stores; duplicates are folded (and the q-digest
  * compression run, when the fold leaves more than 3k distinct nodes)
  * only when the log fills, so consolidation cost amortizes to O(1)
  * per row with ZERO boxing on the hot path. The first version of this
  * sketch kept an immutable `Map[Long, Long]` buffer — boxing two
  * Longs and path-copying a trie per input row put q149 at 8 s on the
  * sf0.1 bench; this layout is ~10× cheaper and is also what the
  * buffer looks like on the wire (UnsafeArrayData, no per-element
  * object graph) when partials ship through the shuffle.
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
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(depth >= 1 && depth <= 40 && k >= 8 && phisBp.nonEmpty)
  private val leafBase = 1L << depth
  // compress once the folded digest outgrows 3k: q-digest's steady-state
  // size bound, so per-task memory stays O(k) regardless of input size
  private val sizeTrigger = 3 * k

  // initial log capacity: small enough that short groups stay cheap,
  // grown by consolidate() (which always leaves >= 50% headroom)
  override def zero: Array[Long] = new Array[Long](1 + 2 * 512)

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    // clamp into the universe rather than throw: a 100 TB scan must not
    // die on one out-of-range outlier (it lands on the extreme leaf and
    // costs ≤ its own mass of rank error)
    val leaf = leafBase + math.min(math.max(v, 0L), leafBase - 1L)
    append(buf, leaf, 1L)
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (small, big) = if (a(0) < b(0)) (a, b) else (b, a)
    var out = big
    val p = small(0).toInt
    var i = 0
    while (i < p) {
      out = append(out, small(1 + 2 * i), small(2 + 2 * i))
      i += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Seq[Long] = {
    val m = fold(buf)
    if (m.isEmpty) return phisBp.map(_ => -1L)
    var n = 0L
    m.foreachValue(n += _)
    // postorder rank walk: ascending interval upper bound, narrower
    // (deeper, larger id) first on ties so a leaf is consumed before
    // the ancestors that contain it
    val nodes = m.toArray.sortBy { case (id, _) => (hiOf(id), -id) }
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

  /** O(1) append; consolidates (fold + maybe compress + repack with
    * headroom) only when the log is full. */
  private def append(buf0: Array[Long], id: Long, c: Long): Array[Long] = {
    var buf = buf0
    var p = buf(0).toInt
    if (2 + 2 * p >= buf.length) { buf = consolidate(buf); p = buf(0).toInt }
    buf(1 + 2 * p) = id
    buf(2 + 2 * p) = c
    buf(0) = p + 1
    buf
  }

  private def fold(buf: Array[Long]): scala.collection.mutable.LongMap[Long] = {
    val p = buf(0).toInt
    val m = new scala.collection.mutable.LongMap[Long](math.max(8, p))
    var i = 0
    while (i < p) {
      val id = buf(1 + 2 * i)
      m(id) = m.getOrElse(id, 0L) + buf(2 + 2 * i)
      i += 1
    }
    m
  }

  private def consolidate(buf: Array[Long]): Array[Long] = {
    val m = fold(buf)
    if (m.size > sizeTrigger) compress(m)
    // repack with at least 2× headroom so the next consolidation is
    // ≥ size appends away (amortized O(1) per append)
    val out = new Array[Long](1 + 4 * math.max(512, m.size))
    var p = 0
    m.foreach { case (id, c) =>
      out(1 + 2 * p) = id; out(2 + 2 * p) = c; p += 1
    }
    out(0) = p
    out
  }

  /** Largest universe value covered by node `id`. */
  private def hiOf(id: Long): Long = {
    var top = id
    while (top < leafBase) { top = (top << 1) | 1L }
    top - leafBase
  }

  /** In-place bottom-up q-digest compression of the folded counter map.
    * Light nodes merge into their parent; a parent CREATED by such a
    * merge may itself be light, so freed mass must cascade — the
    * worklist re-queues new parents until no merge applies (≤ depth
    * rounds, each strictly one level up). */
  private def compress(m: scala.collection.mutable.LongMap[Long]): Unit = {
    var n = 0L
    m.foreachValue(n += _)
    val tau = math.max(1L, n / k)
    // descending id = deepest level first within each round
    var ids = m.keys.toArray
    java.util.Arrays.sort(ids)
    var lo = 0
    var hi = ids.length // process ids[lo, hi) descending
    while (hi > lo) {
      val next = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = hi - 1
      while (i >= lo) {
        val id = ids(i)
        if (id > 1L && m.contains(id)) {
          val c = m.getOrElse(id, 0L) + m.getOrElse(id ^ 1L, 0L) +
            m.getOrElse(id >> 1, 0L)
          if (c < tau) {
            m.subtractOne(id); m.subtractOne(id ^ 1L)
            m(id >> 1) = c
            next += (id >> 1)
          }
        }
        i -= 1
      }
      ids = next.distinct.sorted.toArray
      lo = 0; hi = ids.length
    }
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
