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
  * primitive array stores; consolidation (sort + adjacent fold + maybe
  * compress + repack with headroom) runs only when the log fills, so it
  * amortizes to O(1) per row with ZERO boxing on the hot path.
  *
  * Consolidation is ALL primitive dual-array work: a pair quicksort on
  * (ids, counts), an in-place adjacent-duplicate fold, and a level-walk
  * compression over the sorted arrays. Two earlier versions were each
  * an order of magnitude slower on the sf0.1 bench: an immutable
  * `Map[Long, Long]` buffer (boxing two Longs per row — q149 at 8 s)
  * and a `mutable.LongMap` fold whose compression cascaded through
  * per-level `ArrayBuffer.distinct.sorted` round-trips and LongMap
  * tombstone repacks (q149 at 2.2 s; jstack sampling put ~90% of the
  * aggregate time inside `distinctBy`/`LongMap.repack`). The sorted-
  * array walk does the same bottom-up cascade with two linear merges
  * per level and zero per-node allocation (q149 ≈ 0.9 s, r13).
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
    // fold the log without compressing (ranking wants all retained mass)
    val p = buf(0).toInt
    if (p == 0) return phisBp.map(_ => -1L)
    val ids = new Array[Long](p)
    val cs = new Array[Long](p)
    unpack(buf, ids, cs)
    val m = foldSorted(ids, cs, p)
    var n = 0L
    var i = 0
    while (i < m) { n += cs(i); i += 1 }
    // postorder rank walk: ascending interval upper bound, narrower
    // (deeper, larger id) first on ties so a leaf is consumed before
    // the ancestors that contain it
    val order = Array.range(0, m).map(Integer.valueOf)
    java.util.Arrays.sort(order, (x: Integer, y: Integer) => {
      val hx = hiOf(ids(x)); val hy = hiOf(ids(y))
      if (hx != hy) java.lang.Long.compare(hx, hy)
      else java.lang.Long.compare(ids(y), ids(x))
    })
    phisBp.map { bp =>
      val target = math.max(1L, math.ceil(n.toDouble * bp / 10000.0).toLong)
      var cum = 0L; var i = 0; var out = hiOf(ids(order(m - 1)))
      var found = false
      while (i < m && !found) {
        cum += cs(order(i))
        if (cum >= target) { out = hiOf(ids(order(i))); found = true }
        i += 1
      }
      out
    }
  }

  /** O(1) append; consolidates (sort-fold + maybe compress + repack with
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

  private def unpack(buf: Array[Long], ids: Array[Long], cs: Array[Long]): Unit = {
    val p = buf(0).toInt
    var i = 0
    while (i < p) { ids(i) = buf(1 + 2 * i); cs(i) = buf(2 + 2 * i); i += 1 }
  }

  /** Sort (ids, cs)[0, p) ascending by id, fold adjacent duplicates in
    * place, return the folded size. */
  private def foldSorted(ids: Array[Long], cs: Array[Long], p: Int): Int = {
    sortPairs(ids, cs, 0, p - 1)
    var w = -1
    var i = 0
    while (i < p) {
      if (w >= 0 && ids(w) == ids(i)) cs(w) += cs(i)
      else { w += 1; ids(w) = ids(i); cs(w) = cs(i) }
      i += 1
    }
    w + 1
  }

  private def consolidate(buf: Array[Long]): Array[Long] = {
    val p = buf(0).toInt
    val ids = new Array[Long](p)
    val cs = new Array[Long](p)
    unpack(buf, ids, cs)
    var m = foldSorted(ids, cs, p)
    if (m > sizeTrigger) m = compress(ids, cs, m)
    // repack with at least 2× headroom so the next consolidation is
    // ≥ size appends away (amortized O(1) per append)
    val out = new Array[Long](1 + 4 * math.max(512, m))
    var i = 0
    while (i < m) { out(1 + 2 * i) = ids(i); out(2 + 2 * i) = cs(i); i += 1 }
    out(0) = m
    out
  }

  /** Largest universe value covered by node `id`. */
  private def hiOf(id: Long): Long = {
    var top = id
    while (top < leafBase) { top = (top << 1) | 1L }
    top - leafBase
  }

  /** Bottom-up q-digest compression over id-sorted parallel arrays.
    * Light nodes (self + sibling + parent mass < n/k) merge into their
    * parent; a parent CREATED by such a merge may itself be light, so
    * freed mass cascades — merged parents join the next-shallower
    * level's walk, at most `depth` level rounds total.
    *
    * Level L's ids occupy [2^L, 2^(L+1)), so the ascending sort makes
    * each level a contiguous range; cascaded parents arrive in
    * ascending order too (child pairs are walked ascending), so each
    * level's working set is a LINEAR MERGE of two sorted runs. A
    * consumed original parent (its mass moved into a cascade entry) is
    * tombstoned with count −1 and skipped by the merge. Survivors are
    * appended deep-level-first and re-sorted once at the end — one
    * O(s log s) pass, allocation-free per node.
    *
    * Returns the compressed size; (ids, cs)[0, size) is ascending. */
  private def compress(ids: Array[Long], cs: Array[Long], m: Int): Int = {
    var n = 0L
    var i = 0
    while (i < m) { n += cs(i); i += 1 }
    val tau = math.max(1L, n / k)
    // level boundaries: levStart(L) = first index with id >= 2^L
    val maxLev = 63 - java.lang.Long.numberOfLeadingZeros(ids(m - 1))
    val levStart = new Array[Int](maxLev + 2)
    levStart(maxLev + 1) = m
    var lev = maxLev
    var idx = m
    while (lev >= 0) {
      // walk left while ids belong to level >= lev
      while (idx > 0 && ids(idx - 1) >= (1L << lev)) idx -= 1
      levStart(lev) = idx
      lev -= 1
    }
    // survivors collected here (deep levels first; ascending within a
    // level run), re-sorted once at the end
    val outIds = new Array[Long](m)
    val outCs = new Array[Long](m)
    var outN = 0
    // cascade buffers (parents created at the level below; ascending)
    var pendIds = new Array[Long](math.min(m, 1 + m / 2 + 8))
    var pendCs = new Array[Long](pendIds.length)
    var pendN = 0
    // scratch working set for one level (original ∪ cascade)
    val wkIds = new Array[Long](m + pendIds.length)
    val wkCs = new Array[Long](wkIds.length)
    lev = maxLev
    while (lev >= 0) {
      val lo = levStart(lev); val hi = levStart(lev + 1)
      // linear merge of original [lo, hi) (skipping tombstones) with the
      // cascade run; ids never collide (a consumed parent is tombstoned
      // before its cascade twin is created)
      var a = lo; var b = 0; var w = 0
      while (a < hi || b < pendN) {
        if (a < hi && cs(a) < 0) a += 1 // tombstone
        else if (b >= pendN || (a < hi && ids(a) < pendIds(b))) {
          wkIds(w) = ids(a); wkCs(w) = cs(a); a += 1; w += 1
        } else {
          wkIds(w) = pendIds(b); wkCs(w) = pendCs(b); b += 1; w += 1
        }
      }
      pendN = 0
      if (lev == 0) {
        // root level: nothing merges further; emit as-is
        var j = 0
        while (j < w) {
          outIds(outN) = wkIds(j); outCs(outN) = wkCs(j); outN += 1; j += 1
        }
      } else {
        val pLo = levStart(lev - 1); val pHi = levStart(lev)
        var j = 0
        while (j < w) {
          val id = wkIds(j)
          // sibling pair = adjacent (even, even|1) entries
          val hasSib = (id & 1L) == 0L && j + 1 < w && wkIds(j + 1) == (id | 1L)
          var c = wkCs(j)
          if (hasSib) c += wkCs(j + 1)
          val parent = id >> 1
          // parent's original entry, if present (binary search the
          // parent level's range; cascade can't hold it yet — parents
          // are created in ascending order and this one would be new)
          var pIdx = -1
          var blo = pLo; var bhi = pHi - 1
          while (blo <= bhi) {
            val mid = (blo + bhi) >>> 1
            if (ids(mid) < parent) blo = mid + 1
            else if (ids(mid) > parent) bhi = mid - 1
            else { pIdx = mid; blo = bhi + 1 }
          }
          val pOrig = if (pIdx >= 0 && cs(pIdx) >= 0) cs(pIdx) else 0L
          if (c + pOrig < tau) {
            // merge children (and the parent's own mass) into the parent
            if (pIdx >= 0) cs(pIdx) = -1L // tombstone: mass moves below
            if (pendN == pendIds.length) {
              pendIds = java.util.Arrays.copyOf(pendIds, pendN * 2)
              pendCs = java.util.Arrays.copyOf(pendCs, pendN * 2)
            }
            pendIds(pendN) = parent; pendCs(pendN) = c + pOrig; pendN += 1
          } else {
            outIds(outN) = wkIds(j); outCs(outN) = wkCs(j); outN += 1
            if (hasSib) {
              outIds(outN) = wkIds(j + 1); outCs(outN) = wkCs(j + 1); outN += 1
            }
          }
          j += (if (hasSib) 2 else 1)
        }
      }
      lev -= 1
    }
    System.arraycopy(outIds, 0, ids, 0, outN)
    System.arraycopy(outCs, 0, cs, 0, outN)
    sortPairs(ids, cs, 0, outN - 1)
    outN
  }

  /** Dual-pivot-free in-place quicksort of parallel long arrays by
    * ids[lo..hi] ascending (median-of-three pivot, insertion sort for
    * short runs) — the primitive-array replacement for boxing sorts. */
  private def sortPairs(ids: Array[Long], cs: Array[Long], lo0: Int, hi0: Int): Unit = {
    var lo = lo0; var hi = hi0
    while (hi - lo > 12) {
      val mid = (lo + hi) >>> 1
      // median-of-three to the pivot position
      if (ids(mid) < ids(lo)) swap(ids, cs, mid, lo)
      if (ids(hi) < ids(lo)) swap(ids, cs, hi, lo)
      if (ids(hi) < ids(mid)) swap(ids, cs, hi, mid)
      val pivot = ids(mid)
      var i = lo; var j = hi
      while (i <= j) {
        while (ids(i) < pivot) i += 1
        while (ids(j) > pivot) j -= 1
        if (i <= j) { swap(ids, cs, i, j); i += 1; j -= 1 }
      }
      // recurse on the smaller side, loop on the larger
      if (j - lo < hi - i) {
        if (lo < j) sortPairs(ids, cs, lo, j)
        lo = i
      } else {
        if (i < hi) sortPairs(ids, cs, i, hi)
        hi = j
      }
    }
    // insertion sort for the short tail
    var i = lo + 1
    while (i <= hi) {
      val vi = ids(i); val vc = cs(i)
      var j = i - 1
      while (j >= lo && ids(j) > vi) {
        ids(j + 1) = ids(j); cs(j + 1) = cs(j); j -= 1
      }
      ids(j + 1) = vi; cs(j + 1) = vc
      i += 1
    }
  }

  @inline private def swap(ids: Array[Long], cs: Array[Long], a: Int, b: Int): Unit = {
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val tc = cs(a); cs(a) = cs(b); cs(b) = tc
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
