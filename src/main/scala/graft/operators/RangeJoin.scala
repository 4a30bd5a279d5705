package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Range (interval) join: points `p.ts` against intervals `[start, end)`,
  * with NO equi-key — the case Spark's planner can only express as a
  * broadcast-nested-loop / cartesian product, which is O(|P|·|W|) and
  * falls over at scale.
  *
  * Strategy (the standard distributed interval-join shape, cf. Flink's
  * interval join and the bucketed variants in warehouse engines): pick a
  * bucket granularity `g`, explode every interval into the buckets it
  * covers (bounded fan-out: ≤ ⌈len/g⌉+1 rows per interval), map every
  * point to its single bucket, equi-join on the bucket id, and re-check
  * the exact predicate. Each (point, interval) pair meets in EXACTLY one
  * bucket — the point's — so the join is duplicate-free by construction
  * (no post-dedup pass). The shuffle is hash on bucket id: both sides
  * partition by time, co-located, skew bounded by events-per-bucket.
  *
  * At 100 TB: choose g near the median interval length (fan-out ~2×),
  * and the plan is scan → hash-shuffle → hash-join — no nested loop
  * anywhere. `.explain` shows SortMergeJoin/ShuffledHashJoin on `_rj_b`
  * with the range predicate as a post-join Filter.
  */
object RangeJoin {

  /** Bucketized range join (inner). `pointTs ∈ [start, end)`; `bucketUs`
    * is the bucket width in microseconds. Output: all columns of
    * `points` then all columns of `intervals`. Interval bounds must be
    * µs-aligned (e.g. second-granularity) for cross-engine parity. */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointTs: Column, start: Column, end: Column,
               bucketUs: Long): DataFrame = {
    // `div`, not `/`: Column./ is floating division, and µs epochs are
    // big enough that exactness matters at bucket boundaries.
    // end is exclusive: last covered bucket is the one holding end-1µs;
    // guard degenerate (empty) intervals out rather than exploding to a
    // negative-length sequence.
    val w = intervals
      .filter(end > start)
      .withColumn("_rj_s", unix_micros(start))
      .withColumn("_rj_e", unix_micros(end))
      .withColumn("_rj_b",
        explode(expr(s"sequence(_rj_s div $bucketUs, (_rj_e - 1) div $bucketUs)")))
      .drop("_rj_s", "_rj_e")
    val p = points
      .withColumn("_rj_p", unix_micros(pointTs))
      .withColumn("_rj_b", expr(s"_rj_p div $bucketUs"))
      .drop("_rj_p")
    p.join(w, p("_rj_b") === w("_rj_b") && pointTs >= start && pointTs < end)
      .drop("_rj_b")
  }

  /** q64: pure (un-keyed) range join — global promo windows derived from
    * a deterministic sample of purchase events (4/8/12-hour windows,
    * second-aligned starts; hour-scale so the sparse sf0.001 probe still
    * yields pairs) joined against all click events that fall inside
    * them. Window bounds are second-granularity so the µs-floored Spark
    * timestamps and DuckDB's native-precision timestamps compare
    * identically (flooring to µs never crosses a µs-aligned bound).
    * Bucket = 4 h ≈ the min window length → interval fan-out ≤ 4. */
  def q64RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val windows = ev
      .filter($"event_type" === "purchase" && $"event_id" % 13 === 0)
      .select($"event_id".as("w_id"),
        date_trunc("second", $"ts").as("w_start"),
        expr("timestampadd(HOUR, 4 * (1 + event_id % 3), date_trunc('second', ts))")
          .as("w_end"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("p_id"), $"ts", $"user_id")
    bucketed(clicks, windows, $"ts", $"w_start", $"w_end",
        bucketUs = 4L * 3600 * 1000000)
      .select($"w_id", $"p_id", $"user_id")
      .orderBy($"w_id", $"p_id")
  }

  val q64Oracle: String =
    """WITH w AS (
         SELECT event_id AS w_id,
           date_trunc('second', ts) AS w_start,
           date_trunc('second', ts) + to_hours(4 * (1 + event_id % 3)) AS w_end
         FROM events WHERE event_type = 'purchase' AND event_id % 13 = 0),
       p AS (
         SELECT event_id AS p_id, ts, user_id
         FROM events WHERE event_type = 'click')
       SELECT w_id, p_id, user_id
       FROM p JOIN w ON p.ts >= w.w_start AND p.ts < w.w_end
       ORDER BY w_id, p_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_range_join" -> q64RangeJoin,
  )

  val oracles: Map[String, String] = Map(
    "q64_range_join" -> q64Oracle,
  )
}
