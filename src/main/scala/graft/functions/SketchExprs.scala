package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column wrappers over Spark's internal bloom-filter expressions —
  * the same machinery Catalyst's InjectRuntimeFilter uses for runtime
  * join pruning, exposed for explicit membership-sketch pipelines
  * (bloom-prefiltered decontamination, q49).
  *
  * `bloom_filter_agg` builds a `org.apache.spark.util.sketch
  * .BloomFilter` over a long column (one pass, fixed memory, partials
  * merge associatively — the agg is a TypedImperativeAggregate, so it
  * scales like any two-phase aggregation); `might_contain` probes one.
  * The probe side requires a CONSTANT bloom (literal or subquery
  * result) — build once, embed, probe everywhere, which is exactly the
  * broadcast-artifact shape a 100 TB scan wants.
  */
object SketchExprs {

  /** Aggregate: build a bloom filter over a BIGINT column.
    * `numBits` controls the false-positive rate (~items·15 bits →
    * ≲1% FP). */
  def bloom_filter_agg(c: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(c),
        Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: membership test of a BIGINT value against a bloom-filter
    * binary (must be a literal/constant — pass `lit(bytes)`). */
  def might_contain(bloom: Column, v: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(v)))
}
