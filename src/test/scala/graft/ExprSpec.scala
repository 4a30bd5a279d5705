package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fns, TextExprs, VectorExprs}

/** Equivalence tests for the custom Catalyst expressions against their
  * composable (slow) built-in formulations, property-style over seeded
  * random inputs. */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("DotQ == aggregate(zip_with(a,b,*),0,+) on seeded random long arrays") {
    val rnd = new scala.util.Random(42)
    val cases = (1 to 25).map { _ =>
      (Seq.fill(16)(rnd.nextLong() % 1000), Seq.fill(16)(rnd.nextLong() % 1000))
    }
    val df = cases.toDF("a", "b")
    val custom = df.select(VectorExprs.dot_q($"a", $"b")).as[Long].collect()
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L),
        (acc, v) => acc + v)).as[Long].collect()
    val expected = cases.map { case (a, b) =>
      a.zip(b).map { case (x, y) => x * y }.sum }
    assert(custom.toSeq == hof.toSeq)
    assert(custom.toSeq == expected)
  }

  test("CosGateQ == composed dot-product threshold on seeded random vectors") {
    val rnd = new scala.util.Random(7)
    // mix of passing/failing pairs, incl. negative dot products
    val cases = (1 to 50).map { _ =>
      (Seq.fill(8)(rnd.nextLong() % 50), Seq.fill(8)(rnd.nextLong() % 50))
    }
    val df = cases.toDF("a", "b")
      .withColumn("d1", VectorExprs.dot_q($"a", $"a"))
      .withColumn("d2", VectorExprs.dot_q($"b", $"b"))
    val gate = df.select(
      VectorExprs.cos_gate_q($"a", $"b", $"d1", $"d2", 100L, 16L))
      .as[Boolean].collect()
    val composed = df
      .withColumn("num", VectorExprs.dot_q($"a", $"b"))
      .select($"num" > 0 &&
        lit(100) * $"num" * $"num" >= lit(16) * $"d1" * $"d2")
      .as[Boolean].collect()
    assert(gate.toSeq == composed.toSeq)
    assert(gate.contains(true) && gate.contains(false)) // non-degenerate
  }

  test("DotQ participates in whole-stage codegen (no fallback)") {
    // non-literal input so the optimizer can't constant-fold the plan
    // into a LocalTableScan
    val df = spark.range(3)
      .select(array($"id", $"id" + 1).as("a"))
      .select(VectorExprs.dot_q($"a", $"a").as("d"))
    assert(df.as[Long].collect().toSeq == Seq(1L, 5L, 13L))
    // '*(n)' prefixes mark whole-stage-codegen'd operators; dotq must
    // sit INSIDE one (a CodegenFallback child would split the span)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dotq"))
  }

  test("DotQ is null when a touched element is null (eval + codegen)") {
    // interpreted path: local relation
    val df = Seq(
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 1L, 1L)),
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 1L, null)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L, null))
    ).toDF("a", "b")
    val got = df.select(VectorExprs.dot_q($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    // row 3: the null element at b(2) is beyond min(len)=2 — untouched
    assert(got.toSeq == Seq(null, null, java.lang.Long.valueOf(11L)))
    // codegen path: range-derived input can't constant-fold
    val cg = spark.range(2)
      .select(array(when($"id" === 1, $"id")).as("a")) // [null], [1]
      .select(VectorExprs.dot_q($"a", $"a").as("d"))
    val cgGot = cg.collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    assert(cgGot.toSeq == Seq(null, java.lang.Long.valueOf(1L)))
  }

  test("ShingleHashes == distinct md5-prefix hashes of word 3-grams") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", // < 3 tokens -> empty
      "  leading   and   trailing   spaces  ",
      "x y z", // exactly one shingle
      "r r r r r r") // repeated tokens -> duplicate shingles dedup'd
    val df = texts.toDF("text")
    val custom = df.select(TextExprs.shingle_hashes($"text", 3, 15).as("h"))
      .as[Seq[Long]].collect().map(_.toSet)
    val reference = df.select(
      transform(Fns.shingles3(Fns.tokens($"text")),
        x => Fns.hash60(x)).as("h"))
      .as[Seq[Long]].collect().map(_.toSet)
    assert(custom.toSeq == reference.toSeq)
  }

  test("ShingleHashes participates in whole-stage codegen (no fallback)") {
    // range-derived (non-literal) input so the plan can't constant-fold
    val df = spark.range(3)
      .select(concat(lit("a b c d e f"), $"id".cast("string")).as("text"))
      .select(TextExprs.shingle_hashes($"text", 3, 15).as("h"))
    assert(df.as[Seq[Long]].collect().forall(_.nonEmpty))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [shinglehashes"),
      s"shinglehashes not inside a whole-stage-codegen span:\n$plan")
  }

  test("SimHash60 == explode + 60-vote-aggregate declarative formulation") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one",                                    // single token
      "r r r r r r",                            // repeated tokens all vote
      "  leading   and   trailing   spaces  ",
      "mixed CASE Tokens and punct-uation, too!")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val custom = df
      .select($"doc_id", TextExprs.simhash60($"text").as("simhash"))
      .orderBy($"doc_id").as[(Long, Long)].collect()
    // the pre-round-3 declarative form q43 used (explode token hashes,
    // 60 parallel majority-vote aggregates, bit-pack)
    val voteCols = (0 until 60).map { j =>
      sum(when(expr(s"(h div ${1L << j}L) % 2") === 1, 1L).otherwise(-1L))
        .as(s"v$j")
    }
    val pack = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val reference = df
      .select($"doc_id", explode(Fns.tokens($"text")).as("tok"))
      .select($"doc_id", Fns.hash60($"tok").as("h"))
      .groupBy($"doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select($"doc_id", pack.as("simhash"))
      .orderBy($"doc_id").as[(Long, Long)].collect()
    assert(custom.toSeq == reference.toSeq)
  }

  test("SimHash60 is null on token-less text and codegen'd otherwise") {
    val df = Seq("", "   ", "a b").toDF("text")
      .select(TextExprs.simhash60($"text").as("s"))
    val got = df.collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    assert(got(0) == null && got(1) == null && got(2) != null)
    // codegen placement on non-foldable input
    val cg = spark.range(3)
      .select(concat(lit("w x y "), $"id".cast("string")).as("text"))
      .select(TextExprs.simhash60($"text").as("s"))
    assert(cg.as[Long].collect().length == 3)
    val plan = cg.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [simhash60"),
      s"simhash60 not inside a whole-stage-codegen span:\n$plan")
  }

  test("hash60 equals the documented md5-prefix construction") {
    // md5('hello') = 5d41402abc4b2a76b9719d911017c592
    // first 15 nibbles: 5d41402abc4b2a7 = 420138792274482855
    val got = Seq("hello").toDF("x")
      .select(Fns.hash60($"x")).as[Long].head()
    assert(got == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("HashPrefix == the conv/substr/md5 string tree (string + binary + nulls)") {
    // the r14 native expression must be bit-identical to the 4-step
    // string formulation it replaced, at every nibble width used
    val rows = Seq("hello", "", "a b c", "Ünïcode £", "1234567")
      .toDF("x")
    for (nib <- Seq(7, 14, 15)) {
      val pairs = rows.select(
        TextExprs.md5_prefix($"x", nib).as("native"),
        conv(substring(md5($"x"), 1, nib), 16, 10).cast("long").as("tree"))
        .collect()
      pairs.foreach(r => assert(r.getLong(0) == r.getLong(1), s"nib=$nib $r"))
    }
    // binary input hashes the raw bytes, like md5(binary)
    val bin = Seq(Array[Byte](1, 2, 3, -5)).toDF("b")
      .select(TextExprs.md5_prefix($"b", 15).as("native"),
        conv(substring(md5($"b"), 1, 15), 16, 10).cast("long").as("tree"))
      .head()
    assert(bin.getLong(0) == bin.getLong(1))
    // NULL in, NULL out
    val n = Seq[Option[String]](None).toDF("x")
      .select(TextExprs.md5_prefix($"x", 15)).head()
    assert(n.isNullAt(0))
    // SQL surface
    graft.functions.GraftExtensions.register(spark)
    assert(spark.sql("SELECT md5_prefix('hello', 15) AS h").head().getLong(0)
      == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("SQL registration: dot_q and shingle_hashes callable from spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    val d = spark.sql(
      "SELECT dot_q(array(1L, 2L), array(3L, 4L)) AS d").head().getLong(0)
    assert(d == 11L)
    val sh = spark.sql(
      "SELECT size(shingle_hashes('a b c d', 3, 7)) AS n").head().getInt(0)
    assert(sh == 2)
  }

  test("quantize1000 floors toward -inf (matches DuckDB floor)") {
    val got = Seq(Seq(0.0549f, -0.0375f, 1.9999f)).toDF("e")
      .select(Fns.quantize1000($"e")).as[Seq[Long]].head()
    assert(got == Seq(54L, -38L, 1999L))
  }

  test("bloom sketch: no false negatives, bounded false positives") {
    import graft.functions.SketchExprs
    import org.apache.spark.sql.functions._
    val members = spark.range(1000).select(($"id" * 7919L).as("v"))
    val bloom = members
      .agg(SketchExprs.bloom_filter_agg($"v", 1000L, 16384L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // every member must probe true — bloom filters cannot false-negative
    val misses = members
      .filter(!SketchExprs.might_contain(lit(bloom), $"v")).count()
    assert(misses == 0L, s"$misses false negatives — bloom contract broken")
    // non-members: FP rate should be small at ~16 bits/item
    val fps = spark.range(1000)
      .select(($"id" * 7919L + 1L).as("v"))
      .filter(SketchExprs.might_contain(lit(bloom), $"v")).count()
    assert(fps < 50L, s"FP rate ${fps / 10.0}% — way above the sized bound")
  }

  test("RepetitionStats == declarative explode/groupBy formulation; null on empty") {
    val df = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val custom = df
      .select($"doc_id", TextExprs.repetition_stats($"text").as("r"))
      .filter($"r".isNotNull)
      .select($"doc_id", $"r.n_tokens", $"r.n_distinct", $"r.top_c",
        $"r.n_bigrams", $"r.dup_occ")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // pre-round-5 declarative pipeline (explode → tf → per-doc aggs;
    // lead() bigrams → per-doc aggs; join)
    val tok = df.select($"doc_id",
      posexplode(Fns.tokens($"text")).as(Seq("pos", "tok")))
    val uni = tok.groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max($"c").as("top_c"))
    val bs = tok
      .withColumn("nxt", lead($"tok", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"pos")))
      .filter($"nxt".isNotNull)
      .select($"doc_id", concat_ws(" ", $"tok", $"nxt").as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("bc"))
      .groupBy($"doc_id")
      .agg(sum($"bc").as("n_bigrams"),
        sum(when($"bc" > 1, $"bc").otherwise(0L)).as("dup_occ"))
    val reference = uni.join(bs, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"top_c",
        coalesce($"n_bigrams", lit(0L)), coalesce($"dup_occ", lit(0L)))
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(custom == reference && custom.nonEmpty)

    val nulls = Seq("", "   ", "a").toDF("text")
      .select(TextExprs.repetition_stats($"text").as("r")).collect()
    assert(nulls(0).isNullAt(0) && nulls(1).isNullAt(0) && !nulls(2).isNullAt(0))
  }
}
