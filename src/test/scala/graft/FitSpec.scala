package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Similarity, Stats}

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
}
