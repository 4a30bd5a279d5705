package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.Fns._

/** Behavioral-analytics operators over the events stream: marketing
  * attribution and Markov transition profiling. (North-star extension —
  * the reference has no event surface; these are the standard
  * product-analytics queries a clickstream warehouse runs, built on the
  * same primitives as q63's as-of join and q23's sessionization.)
  *
  * Scale design:
  *  - q113 rides the custom AsOfJoin operator (graft.plans.AsOfJoin):
  *    one clustered-distribution shuffle per side on user_id, then a
  *    sorted streaming merge — per-user state is one row, so a hot user
  *    costs memory O(1), unlike the naive "join all clicks before each
  *    purchase then argmax" which is quadratic per user. The 1-hour
  *    attribution window is a post-filter on the single matched row.
  *  - q114 is lead() over (user_id) partitions — one shuffle of events
  *    by user — followed by a partial-agg groupBy on the (src,dst) pair
  *    (25 cells). The probability readout divides in integer ppm so the
  *    matrix is bit-identical cross-engine.
  */
object Behavior {

  /** Last-touch attribution: each purchase is attributed to the same
    * user's most recent click at-or-before it, iff within 1 hour.
    * Daily report: purchases, attributed purchases, attributed value. */
  def q113Attribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"ts".as("c_ts"))
    graft.plans.AsOf.join(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
      .withColumn("attributed",
        $"click_id".isNotNull &&
          (unix_micros($"ts") - unix_micros($"c_ts") <= lit(3600000000L)))
      .groupBy(to_date($"ts").as("day"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when($"attributed", 1L).otherwise(0L)).as("n_attributed"),
        coalesce(sum(when($"attributed", $"value").cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)")).cast("double").as("attributed_value"))
      .orderBy($"day")
  }

  val q113Oracle: String =
    """WITH p AS (
         SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts, value
         FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id AS c_user, event_id AS click_id,
           make_timestamp(epoch_us(ts)) AS c_ts
         FROM events WHERE event_type = 'click'),
       j AS (
         SELECT p.user_id, p.ts, p.value, c.click_id, c.c_ts
         FROM p ASOF LEFT JOIN c ON p.user_id = c.c_user AND p.ts >= c.c_ts),
       a AS (
         SELECT *, COALESCE(click_id IS NOT NULL
           AND epoch_us(ts) - epoch_us(c_ts) <= 3600000000, FALSE) AS attributed
         FROM j)
       SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases,
         CAST(sum(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
         CAST(COALESCE(sum(CASE WHEN attributed
           THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS attributed_value
       FROM a GROUP BY 1 ORDER BY 1"""

  /** First-order Markov transition matrix of event types: per user,
    * consecutive event pairs in (time, event_id) order; per (src, dst)
    * cell the count and row-conditional probability in integer ppm. */
  def q114Transitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("us"))
      .withColumn("dst", lead($"event_type", 1).over(byUser))
      .filter($"dst".isNotNull)
      .groupBy($"event_type".as("src"), $"dst")
      .agg(count(lit(1)).as("n"))
      .withColumn("src_total", sum($"n").over(Window.partitionBy($"src")))
      .withColumn("p_ppm", expr("(1000000 * n) div src_total"))
      .select($"src", $"dst", $"n", $"src_total", $"p_ppm")
      .orderBy($"src", $"dst")
  }

  val q114Oracle: String =
    """WITH e AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       x AS (
         SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS dst
         FROM e),
       p AS (
         SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         FROM x WHERE dst IS NOT NULL GROUP BY 1, 2)
       SELECT src, dst, n,
         CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS src_total,
         (1000000 * n) // CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
       FROM p ORDER BY 1, 2"""

  /** Next-event baseline evaluation: predict each user's next event
    * type as the argmax of q114's transition row (ties to the
    * lexicographically smaller type) and report the accuracy that
    * baseline achieves per source state — the sanity floor any
    * sequence model must beat, computed from the same matrix. */
  def q125NextEventBaseline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    q114Transitions(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"src").orderBy($"n".desc, $"dst")))
      .filter($"rn" === 1)
      .select($"src", $"dst".as("predicted_dst"), $"n".as("n_correct"),
        $"src_total", expr("(1000000 * n) div src_total").as("acc_ppm"))
      .orderBy($"src")
  }

  val q125Oracle: String =
    """WITH e AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
       x AS (
         SELECT event_type AS src,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS dst
         FROM e),
       p AS (
         SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         FROM x WHERE dst IS NOT NULL GROUP BY 1, 2),
       t AS (
         SELECT src, dst, n,
           CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS src_total,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst) AS rn
         FROM p)
       SELECT src, dst AS predicted_dst, n AS n_correct, src_total,
         (1000000 * n) // src_total AS acc_ppm
       FROM t WHERE rn = 1 ORDER BY src"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q113_attribution" -> q113Attribution,
    "q114_transitions" -> q114Transitions,
    "q125_next_event_baseline" -> q125NextEventBaseline,
  )

  val oracles: Map[String, String] = Map(
    "q113_attribution" -> q113Oracle,
    "q114_transitions" -> q114Oracle,
    "q125_next_event_baseline" -> q125Oracle,
  )
}
