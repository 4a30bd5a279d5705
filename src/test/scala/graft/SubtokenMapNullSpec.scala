package graft

import org.apache.spark.sql.functions._

/** q152 (regex sub-tokenizer), q153 (MapType algebra), q154 (null
  * semantics): invariants that don't depend on the DuckDB oracle. */
class SubtokenMapNullSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q152: subtoken classes partition each name; chars re-concatenate") {
    // The three alternatives are disjoint and jointly cover every
    // non-space char, so summed token length == non-space name length.
    val names = graft.io.Tables.customer(spark, sf)
      .select(sum(length(regexp_replace($"c_name", " ", ""))).as("chars"))
      .as[Long].head()
    val toks = operators.TextAnalysis.q152SubtokenProfile(spark, sf)
      .agg(sum($"n_chars")).as[Long].head()
    assert(toks == names, s"token chars $toks != non-space name chars $names")

    val classes = operators.TextAnalysis.q152SubtokenProfile(spark, sf)
      .select($"tok_class").distinct().as[String].collect().toSet
    assert(classes.subsetOf(Set("letters", "digits", "symbols")))
  }

  test("q153: map algebra matches the plain relational rewrite") {
    val got = operators.Reshape.q153MapAlgebra(spark, sf)
      .as[(String, String, Long)].collect().toSet
    val want = graft.io.Tables.documents(spark, sf)
      .groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
      .withColumn("total", sum($"n").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      .filter($"n" >= 3)
      .select($"source", $"lang", ($"n" * 1000 / $"total").cast("long"))
      .as[(String, String, Long)].collect().toSet
    assert(got == want)
    // permille shares per source must sum to at most 1000
    val over = operators.Reshape.q153MapAlgebra(spark, sf)
      .groupBy($"source").agg(sum($"permille").as("p"))
      .filter($"p" > 1000).count()
    assert(over == 0)
  }

  test("q163: fingerprint ignores partitioning/order, catches a lost row") {
    val d = "/root/testdata/sf0.001"
    def fp(df: org.apache.spark.sql.DataFrame): Long = df
      .select(graft.functions.Fns
        .hash60(concat_ws("|", $"c_custkey", $"c_name")).as("h"))
      .agg(expr("bit_xor(h)")).as[Long].head()
    val cust = graft.io.Tables.customer(spark, d)
    val a = fp(cust)
    assert(a == fp(cust.repartition(17)), "partitioning changed the fingerprint")
    assert(a == fp(cust.orderBy($"c_name".desc)), "row order changed the fingerprint")
    val victim = cust.select($"c_custkey").as[Long].head()
    assert(a != fp(cust.filter($"c_custkey" =!= victim)),
      "dropping a row left the fingerprint unchanged")
  }

  test("q168: counting division == textbook double-anti-join division") {
    val d = "/root/testdata/sf0.01"
    val supRegion = graft.io.Tables.supplier(spark, d)
      .select($"s_suppkey", $"s_nationkey")
      .join(graft.io.Tables.nation(spark, d)
        .select($"n_nationkey", $"n_regionkey"),
        $"s_nationkey" === $"n_nationkey")
      .join(graft.io.Tables.region(spark, d)
        .select($"r_regionkey", $"r_name"),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"r_name")
    val pairs = graft.io.Tables.lineitem(spark, d)
      .select($"l_partkey", $"l_suppkey")
      .join(supRegion, $"l_suppkey" === $"s_suppkey")
      .select($"l_partkey".as("part"), $"r_name").distinct()
      .localCheckpoint()
    val divisor = supRegion.select($"r_name").distinct()
    val nDiv = divisor.count()
    // textbook: parts with NO region missing (anti-join of the
    // part×divisor cross against the observed pairs)
    val missing = pairs.select($"part").distinct().crossJoin(divisor)
      .join(pairs, Seq("part", "r_name"), "left_anti")
    val divided = pairs.select($"part").distinct()
      .join(missing.select($"part").distinct(), Seq("part"), "left_anti")
      .as[Long].collect().toSet
    // counting form (the query's n_regions == |divisor| bucket)
    val counted = pairs.groupBy($"part").agg(count(lit(1)).as("n"))
      .filter($"n" === nDiv).select($"part").as[Long].collect().toSet
    assert(divided == counted)
    // and the profile's top bucket agrees on cardinality
    val top = operators.Relational.q168DivisionProfile(spark, d)
      .filter($"n_regions" === nDiv).select($"n_parts")
      .as[Long].collect().headOption.getOrElse(0L)
    assert(top == counted.size, s"profile bucket $top != ${counted.size}")
  }

  test("q154: NULL-key group counts rows but no values") {
    val rows = operators.Relational.q154NullSemantics(spark, sf)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val nP = graft.io.Tables.orders(spark, sf)
      .filter($"o_orderstatus" === "P").count()
    val (_, pRows, pNonnull, pDistinct) = rows("pending")
    assert(pRows == nP)        // count(*) counts NULL-key rows
    assert(pNonnull == 0L)     // count(col) skips NULLs
    assert(pDistinct == 0L)    // count(distinct col) skips NULLs
    val (_, fRows, fNonnull, fDistinct) = rows("finished")
    assert(fRows == fNonnull && fDistinct == 1L)
    // all orders land in exactly one group (null-safe join is total)
    assert(rows.values.map(_._2).sum ==
      graft.io.Tables.orders(spark, sf).count())
  }

  test("q279: VARIANT typed paths — nested extraction exact, wrong-shape paths null") {
    // direct round-trip on a literal heterogeneous pair
    val got = spark.sql(
      """SELECT try_variant_get(v, '$.profile.plan', 'string') AS plan,
                try_variant_get(v, '$.amount_cents', 'bigint') AS amount
         FROM VALUES (parse_json('{"profile": {"plan": "p2"}}')),
                     (parse_json('{"amount_cents": 12345}')) AS t(v)""")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSet == Set(("p2", -1L), (null, 12345L)))

    // per-type shape exclusivity on the real table: each event type
    // populates ONLY its own field family
    val rows = operators.Scalars.q279VariantExtract(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("purchase").getAs[Long]("n_amount") ==
      rows("purchase").getAs[Long]("n"))
    assert(rows("purchase").getAs[Long]("n_targets") == 0)
    assert(rows("click").getAs[Long]("n_amount") == 0)
    assert(rows("click").getAs[Long]("n_targets") <= 10)
    assert(rows("signup").getAs[Long]("n_plans") <= 3 &&
      rows("signup").getAs[Long]("n_plans") >= 1)
    Seq("view", "error").foreach { t =>
      assert(rows(t).getAs[Long]("n_amount") == 0 &&
        rows(t).getAs[Long]("n_targets") == 0 && rows(t).getAs[Long]("n_plans") == 0)
    }
  }
}
