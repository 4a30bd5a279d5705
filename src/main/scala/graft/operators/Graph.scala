package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Graph-analytics operators beyond connected components (q71):
  * power-iteration scoring over an edge list. No reference analogue
  * (the reference has no graph surface — SURVEY.md §2 maps its data as
  * strictly tabular); this is north-star scale machinery for the
  * dedup-graph / citation-graph shapes a corpus pipeline produces.
  */
object Graph {

  /** One PageRank power-iteration step over the part→supplier supply
    * graph (distinct (l_partkey, l_suppkey) edges — a real bipartite
    * graph in the testdata at every scale). Uniform source rank,
    * damping 0.85, FIXED-POINT micro-units: each part contributes
    * `850000 div outdeg` to every supplier it ships to, plus the
    * 150000 teleport base — integer `div` truncates toward zero
    * identically in both engines, so one step is bit-exact
    * cross-engine (the full iterate-to-convergence loop repeats this
    * block under q71's localCheckpoint driver loop).
    *
    * Shape at scale: `distinct` is one shuffle on the edge pair;
    * out-degrees group by the SAME key the edges are now partitioned
    * on (ReusedExchange, no second shuffle of the edge list); the
    * contribution join is equi on that key; only the rank aggregation
    * re-shuffles, on the destination key. Top-20 is a TakeOrdered —
    * no global sort. */
  def q82PagerankStep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = Tables.lineitem(s, d)
      .select($"l_partkey".as("src"), $"l_suppkey".as("dst"))
      .distinct()
    // out-degree as a window over the edge list itself (partitioned on
    // src) instead of a groupBy + self-join: one fewer shuffle of the
    // edge list, and no join at all
    edges
      .withColumn("outdeg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"src")))
      .groupBy($"dst")
      .agg(count(lit(1)).as("n_in"),
        sum(expr("850000 div outdeg")).as("flow"))
      .select($"dst".as("node"), $"n_in",
        (lit(150000L) + $"flow").as("rank_micro"))
      .orderBy($"rank_micro".desc, $"node")
      .limit(20)
  }

  val q82Oracle: String =
    """WITH edges AS (
         SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
       deg AS (
         SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       flow AS (
         SELECT dst AS node, CAST(count(*) AS BIGINT) AS n_in,
           CAST(sum(850000 // outdeg) AS BIGINT) AS flow
         FROM edges JOIN deg USING (src) GROUP BY dst)
       SELECT node, n_in, 150000 + flow AS rank_micro
       FROM flow ORDER BY rank_micro DESC, node LIMIT 20"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_pagerank_step" -> q82PagerankStep,
  )

  val oracles: Map[String, String] = Map(
    "q82_pagerank_step" -> q82Oracle,
  )
}
