package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshape operators: the typed bounded top-k Aggregator vs an
  * independent window-rank rewrite; unpivot∘pivot round-trip. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("TopKOrders aggregator == window-rank rewrite; partials stay bounded") {
    val topk = udaf(new graft.functions.TopKOrders(3))
    val ord = graft.io.Tables.orders(spark, sf)
      // force many partitions so partial buffers actually merge across
      // map tasks (the associativity path, not one local sort)
      .repartition(8)
    val got = ord.groupBy($"o_orderpriority")
      .agg(topk($"o_totalprice", $"o_orderkey").as("top3"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val expect = ord
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .groupBy($"o_orderpriority")
      .agg(collect_list(struct($"rn", $"o_orderkey")).as("ks"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).sortBy(_.getInt(0)).map(_.getLong(1)))
      .toMap
    assert(got == expect)
    // the aggregate must be partial-capable (hash/objecthash agg with a
    // partial_ mode), i.e. NOT forced through a single reduce
    val plan = ord.groupBy($"o_orderpriority")
      .agg(topk($"o_totalprice", $"o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkorders"), s"no partial aggregation in:\n$plan")
  }

  test("unpivot is the inverse of pivot") {
    val wide = Seq(("A", 1L, 2L), ("B", 3L, 4L)).toDF("k", "m1", "m2")
    val long = wide.unpivot(Array($"k"), Array($"m1", $"m2"), "metric", "n")
    assert(long.count() == 4)
    val back = long.groupBy($"k").pivot("metric", Seq("m1", "m2")).agg(first($"n"))
      .select($"k", $"m1", $"m2")
      .collect().map(_.toSeq).toSet
    assert(back == wide.collect().map(_.toSeq).toSet)
  }

  test("q124: SCD2 intervals chain per customer with exactly one open version") {
    val d = "/root/testdata/sf0.001"
    val rows = operators.Reshape.q124Scd2Build(spark, d)
      .select($"o_custkey", $"version", $"valid_from", $"valid_to", $"is_current")
      .as[(Long, Long, String, String, Boolean)].collect()
      .groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (ck, vs) =>
      val ord = vs.sortBy(_._2)
      assert(ord.map(_._2).toSeq == (1L to ord.length), s"versions not dense: $ck")
      ord.zip(ord.tail).foreach { case (a, b) =>
        assert(a._4 == b._3, s"interval chain broken at $ck v${a._2}")
        assert(!a._5, s"non-final version marked current: $ck v${a._2}")
      }
      assert(ord.last._5 && ord.last._4 == "9999-12-31")
      ord.foreach(v => assert(v._3 <= v._4))
    }
  }
}
