package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Curation, Dedup, Quality, Retrieval, Similarity, Stats}

/** Invariant tests for the round-5 operators: the two power-law fits
  * (Zipf slope, Heaps growth), sorted-neighborhood dedup adjacency,
  * margin-based bitext mining, and the median/MAD outlier audit. The
  * cross-engine value parity is the driver's DuckDB gate; these pin the
  * semantic claims the hash compare can't express. */
class FitSpec extends SparkSpec {
  import spark.implicits._

  val d = "/root/testdata/sf0.001"

  test("q134: Zipf negated slope is positive and roughly power-law-like") {
    val rows = Corpus.q134ZipfSlope(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("negslope_bp")
      // frequency non-increasing in rank ⇒ fitted slope strictly negative;
      // any token corpus lands well inside (0, 3) in magnitude
      assert(bp > 0L && bp < 30000L, s"negslope_bp out of range: $r")
      assert(r.getAs[Long]("n_terms") <= 500L)
    }
  }

  test("q135: vocabulary curve is monotone and beta in (0,1)") {
    val rows = Corpus.q135HeapsLaw(spark, d).orderBy($"ckpt").collect()
    assert(rows.length == 10)
    val vocab = rows.map(_.getAs[Long]("vocab"))
    val ntok = rows.map(_.getAs[Long]("n_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b },
      "vocab must be non-decreasing in corpus prefix")
    assert(ntok.zip(ntok.tail).forall { case (a, b) => a <= b })
    val beta = rows.head.getAs[Long]("heaps_beta_bp")
    // sublinear growth: 0 < beta < 1 (in bp); identical on every row
    assert(beta > 0L && beta < 10000L, s"beta_bp=$beta")
    assert(rows.forall(_.getAs[Long]("heaps_beta_bp") == beta))
  }

  test("q136: SNM pairs are sort-adjacent, thresholded, and no self-pairs") {
    val rows = Dedup.q136SortedNeighborhood(spark, d).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc1") != r.getAs[Long]("doc2"))
      assert(Set(1L, 2L).contains(r.getAs[Long]("gap")))
      val dist = r.getAs[Long]("dist")
      assert(dist >= 0L && dist <= 8L, s"dist out of band: $r")
    }
    // neighbors must be adjacent in the (lang, n_chars, doc_id) order:
    // recompute ranks and check every pair differs by exactly `gap`
    val rk = graft.io.Tables.documents(spark, d)
      .select($"doc_id", $"lang",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"n_chars", $"doc_id")).as("rk"))
      .as[(Long, String, Int)].collect()
      .map { case (id, lang, r) => (id, lang) -> r }.toMap
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val (a, b) = (r.getAs[Long]("doc1"), r.getAs[Long]("doc2"))
      assert(rk((b, lang)) - rk((a, lang)) == r.getAs[Long]("gap"),
        s"pair not sort-adjacent: $r")
    }
  }

  test("q137: mined pairs cross the halves and clear the margin bar") {
    val rows = Similarity.q137BitextMargin(spark, d).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("sid") % 2 == 0 && r.getAs[Long]("tid") % 2 == 1,
        s"pair must be source-half x target-half: $r")
      assert(r.getAs[Long]("margin_bp") >= 15000L)
      val rk = r.getAs[Long]("best_rk")
      assert(rk > 0L && rk <= 10000L, s"rank key out of cos2-bp range: $r")
    }
  }

  test("q138: MAD audit is internally consistent per segment") {
    val rows = Stats.q138MadOutliers(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val out = r.getAs[Long]("n_outliers")
      assert(out >= 0L && out < n, s"outliers must be a strict minority: $r")
      assert(r.getAs[Double]("mad_cents") >= 0.0)
      assert(r.getAs[Double]("med_cents") > 0.0)
    }
    // robustness claim: the flag rate is small (median/MAD shouldn't
    // mark more than a quarter of any segment at 5 MADs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_outliers") * 4 <= r.getAs[Long]("n"), s"$r")
    }
  }

  test("q139: contingency cells partition the corpus; kappa within [-1,1]") {
    val r = Quality.q139RaterAgreement(spark, d).head()
    val n = r.getAs[Long]("n")
    val cells = Seq("n11", "n10", "n01", "n00").map(r.getAs[Long])
    assert(cells.sum == n && cells.forall(_ >= 0L), s"cells must partition: $r")
    val k = r.getAs[Long]("kappa_bp")
    assert(k >= -10000L && k <= 10000L, s"kappa_bp out of range: $k")
  }

  test("q140: every doc wins exactly one shard; loads roughly balance") {
    val rows = Curation.q140RendezvousShards(spark, d).collect()
    assert(rows.map(_.getAs[Long]("shard")).sorted.toSeq == (0L to 7L))
    val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = graft.io.Tables.documents(spark, d).count()
    assert(nTotal == nDocs, "shard counts must partition the corpus")
    // HRW over a 60-bit hash: no shard should be pathologically loaded
    // (500 docs over 8 shards -> expect ~125 permille each)
    rows.foreach { r =>
      val pm = r.getAs[Long]("load_permille")
      assert(pm >= 50L && pm <= 250L, s"shard load far off balance: $r")
    }
  }

  test("q140: rendezvous stability — shard-7 removal only moves shard-7 docs") {
    import spark.implicits._
    // recompute the argmax over shards 0..6 and compare with 0..7: every
    // doc NOT won by shard 7 must keep its assignment (the HRW property
    // that makes incremental re-layout affordable)
    def assign(k: Int) = graft.io.Tables.documents(spark, d)
      .select($"doc_id", explode(sequence(lit(0), lit(k - 1))).as("shard"))
      .withColumn("h", graft.functions.Fns.hash60(
        concat($"doc_id", lit(":"), $"shard")))
      .groupBy($"doc_id")
      .agg(max(struct($"h", $"shard")).getField("shard").as("shard"))
      .as[(Long, Int)].collect().toMap
    val with8 = assign(8)
    val with7 = assign(7)
    with8.foreach { case (doc, s8) =>
      if (s8 != 7) assert(with7(doc) == s8, s"doc $doc moved $s8 -> ${with7(doc)}")
    }
  }

  test("q141: bigram surprisal is finite and unigram-distinct") {
    val rows = Corpus.q141BigramLm(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("bigram_surprisal_micro")
      // -ln p in micro-nats: p<=1 => s>=0; p >= 1/(4T) bounds s above
      assert(s >= 0L && s < 30000000L, s"surprisal out of band: $r")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
  }

  test("q142: runs only where q99-style duplication exists; lengths bounded") {
    val rows = Retrieval.q142DupRuns(spark, d).collect()
    val withRuns = rows.filter(_.getAs[Long]("n_dup_pos") > 0)
    assert(withRuns.nonEmpty, "synthetic corpus plants duplicated passages")
    rows.foreach { r =>
      val (nsp, ndp, run) = (r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_dup_pos"), r.getAs[Long]("max_run_tokens"))
      assert(ndp <= nsp)
      // an island of L duplicated 8-spans spans L+7 tokens; L <= n_dup_pos
      if (ndp == 0) assert(run == 0L)
      else assert(run >= 8L && run <= ndp + 7L, s"run bound violated: $r")
    }
  }

  test("q143: weight bias is visible — sampled docs are longer on average") {
    val rows = Curation.q143WeightedSample(spark, d).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 50L))
    val sampleMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / 50
    val corpusMean = graft.io.Tables.documents(spark, d)
      .agg(avg($"n_chars")).head().getDouble(0)
    // P(include) ∝ n_chars: the sample mean must sit above the corpus mean
    assert(sampleMean > corpusMean,
      s"no length bias: sample=$sampleMean corpus=$corpusMean")
  }

  test("q144: card fields are mutually consistent") {
    val r = Corpus.q144DatasetCard(spark, d).head()
    val nDocs = r.getAs[Long]("n_docs")
    assert(nDocs == graft.io.Tables.documents(spark, d).count())
    assert(r.getAs[Long]("n_uniq_texts") <= nDocs)
    assert(r.getAs[Long]("dup_permille") >= 0L
      && r.getAs[Long]("dup_permille") < 1000L)
    assert(r.getAs[Long]("mean_doc_tokens") * nDocs <= r.getAs[Long]("n_tokens"))
    assert(r.getAs[Long]("n_langs") >= 1L && r.getAs[Long]("n_sources") >= 1L)
  }

  test("q146: grouping sets emit exactly the requested slices") {
    val rows = Stats.q146GroupingSets(spark, d).collect()
    val nDocs = graft.io.Tables.documents(spark, d).count()
    // gid 1 = (lang), gid 2 = (source), gid 3 = () — and NO gid 0
    // (lang, source) cross cells, the thing cube would have added
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(1L, 2L, 3L))
    assert(byGid(3L).length == 1
      && byGid(3L).head.getAs[Long]("n_docs") == nDocs)
    Seq(1L, 2L).foreach { g =>
      assert(byGid(g).map(_.getAs[Long]("n_docs")).sum == nDocs,
        s"slice gid=$g must partition the corpus")
    }
  }

  test("plan shapes: q140 hash-aggregates, q143 takes ordered, q142 broadcasts residue") {
    // q140's packed argmax must stay a HashAggregate — max(struct(..))
    // regressed to SortAggregate (per-partition sorts) before the
    // h*8+shard encoding
    val p140 = Curation.q140RendezvousShards(spark, d)
      .queryExecution.executedPlan.toString
    assert(!p140.contains("SortAggregate"), "q140 argmax fell back to SortAggregate")
    // q143's top-50 must reduce via per-partition heaps, not a global sort
    val p143 = Curation.q143WeightedSample(spark, d)
      .queryExecution.executedPlan.toString
    assert(p143.contains("TakeOrderedAndProject"), "q143 lost its top-k reduction")
    // q142's dup set must reach the probe as a broadcast semi-join (the
    // corpus-sized span relation never reshuffles for the probe). AQE
    // makes this decision at runtime, so execute first and inspect the
    // FINAL adaptive plan
    val df142 = Retrieval.q142DupRuns(spark, d)
    df142.collect()
    val p142 = df142.queryExecution.executedPlan.toString
    assert(p142.contains("LeftSemi") && p142.contains("BroadcastHashJoin"),
      s"q142 residue probe is not a broadcast semi-join:\n$p142")
  }

  test("MinKLongs: buffer algebra — dedup, bound, and merge == global sort") {
    val agg = new graft.functions.MinKLongs(5)
    val xs = Seq(9L, 3L, 9L, 7L, 1L, 3L, 8L, 2L, 11L, 2L, 6L)
    // sequential reduce == sorted distinct take-k
    val seqBuf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(seqBuf == xs.distinct.sorted.take(5))
    // any split point merges to the same buffer (mergeability)
    (0 to xs.length).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == seqBuf, s"cut=$cut")
    }
    // under-filled groups keep everything (try_element_at(k) → null upstream)
    val small = Seq(4L, 4L, 2L).foldLeft(agg.zero)(agg.reduce)
    assert(small == Seq(2L, 4L))
  }

  test("q147: KMV estimate brackets the exact distinct count loosely") {
    val rows = Stats.q147KmvDistinct(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct")
      if (!r.isNullAt(r.fieldIndex("kth_min"))) {
        val est = r.getAs[Long]("est_distinct")
        // k=64 ⇒ relative σ ≈ 1/√62 ≈ 13%; allow 3σ either way
        assert(est > exact * 6 / 10 && est < exact * 14 / 10,
          s"KMV estimate far off: $r")
      } else assert(exact < 64, s"kth_min null but >= k distinct values: $r")
    }
  }

  test("q145: grid covers the full margin cross product; totals consistent") {
    val rows = Quality.q145Chi2Independence(spark, d).collect()
    val langs = rows.map(_.getAs[String]("lang")).distinct.length
    val srcs = rows.map(_.getAs[String]("source")).distinct.length
    assert(rows.length == langs * srcs,
      "every (lang, source) cell must appear, observed or not")
    val chi2 = rows.head.getAs[Long]("chi2_micro")
    assert(rows.forall(_.getAs[Long]("chi2_micro") == chi2))
    assert(chi2 >= rows.map(_.getAs[Long]("contrib_micro")).max)
    assert(rows.head.getAs[Long]("n_cells") == rows.length)
    // observed counts must reproduce the corpus size
    val nDocs = graft.io.Tables.documents(spark, d).count()
    assert(rows.map(_.getAs[Long]("o")).sum == nDocs)
  }
}
