package graft

import org.apache.spark.sql.functions._

/** Crafted-input tests for the evaluation-analytics family (q465–q471):
  * the oracle hash-compare proves engine equality on real data; these
  * prove the STATISTICS are the ones claimed, on inputs with known
  * answers. */
class EvalSpec extends SparkSpec {
  import spark.implicits._
  private val d = "/root/testdata/sf0.001"

  test("Bradley–Terry: beating strong opponents out-ranks beating weak ones") {
    // players 1, 2 both have 2 wins / 4 games (identical round-1
    // strength = win rate), but player 1's wins are against player 2
    // (strong) while player 2's are against player 4 (weak, 0 wins
    // elsewhere): the MM reweighting must rank 1 above 2 in round 2.
    val pairs = Seq(
      (1L, 2L, 1L), (1L, 2L, 1L), (1L, 3L, 0L), (1L, 3L, 0L), // 1 beats 2 twice, loses to 3 twice
      (2L, 4L, 1L), (2L, 4L, 1L), // 2 beats 4 twice
      (3L, 4L, 1L), (3L, 4L, 1L)  // 3 beats 4 twice (3: 4-0, 4: 0-4)
    ).toDF("lo", "hi", "lo_win")
    val r = operators.Eval.bradleyTerry(pairs)
      .collect().map(x => x.getLong(0) -> (x.getLong(3), x.getLong(4))).toMap
    assert(r(1)._1 == r(2)._1, "round 1 is pure win rate: 2/4 for both")
    assert(r(1)._2 > r(2)._2,
      s"round 2 must reward strength of schedule: ${r(1)._2} vs ${r(2)._2}")
    assert(r(3)._2 > r(1)._2, "undefeated player 3 tops everyone")
    assert(r(4)._2 < r(2)._2, "winless player 4 bottoms out")
  }

  test("pass@k ladder: known combinatorial values, exact in milli") {
    // n=10, c=5: pass@1 = 1 - 5/10 = .5; pass@5 = 1 - C(5,5)/C(10,5)
    // = 1 - 1/252 = .99603...; pass@10 = 1 (n-c < 10 zeroes the chain)
    val df = Seq((10L, 5L)).toDF("n", "c").select(
      expr(operators.Eval.passAtK(1, "div")).as("p1"),
      expr(operators.Eval.passAtK(5, "div")).as("p5"),
      expr(operators.Eval.passAtK(10, "div")).as("p10"))
    val r = df.collect()(0)
    assert(r.getAs[Any]("p1").toString.toLong == 500L)
    assert(r.getAs[Any]("p5").toString.toLong == 997L) // floor dust: 1e9-chain truncation
    assert(r.getAs[Any]("p10").toString.toLong == 1000L)
    // c = 0 → every pass@k is exactly 0
    val z = Seq((10L, 0L)).toDF("n", "c").select(
      expr(operators.Eval.passAtK(5, "div")).as("p5")).collect()(0)
    assert(z.getAs[Any]("p5").toString.toLong == 0L)
  }

  test("bootstrap CI brackets the point estimate; AUC/Gini invariants hold") {
    val ci = operators.Eval.q467BootstrapCi(spark, d).collect()(0)
    val (pt, lo, hi) = (ci.getAs[Long]("point_milli"),
      ci.getAs[Long]("lo_milli"), ci.getAs[Long]("hi_milli"))
    assert(lo <= hi, "interval must be ordered")
    assert(lo <= pt && pt <= hi,
      s"94% bootstrap interval [$lo, $hi] should bracket the point $pt")
    val auc = operators.Eval.q471RocAuc(spark, d).collect()(0)
    val a = auc.getAs[Long]("auc_micro")
    assert(a >= 0L && a <= 1000000L)
    assert(auc.getAs[Long]("gini_micro") == 2 * a - 1000000L)
  }

  test("permutation p-value respects the add-one bounds; McNemar cells partition n") {
    val p = operators.Eval.q468PermutationTest(spark, d).collect()(0)
    val pm = p.getAs[Long]("p_milli")
    assert(pm >= 1000L / 61 && pm <= 1000L, s"p_milli $pm outside (1/61, 1]")
    val m = operators.Eval.q469McNemar(spark, d).collect()(0)
    assert(m.getAs[Long]("both_pos") + m.getAs[Long]("a_only") +
      m.getAs[Long]("b_only") + m.getAs[Long]("neither") == m.getAs[Long]("n"))
  }

  test("MDE grows with power; Wilson bound is below the raw rate and in range") {
    val mde = operators.Eval.q472MdePlanner(spark, d).collect()
      .groupBy(_.getAs[String]("event_type"))
    mde.foreach { case (et, rows) =>
      val byP = rows.map(r => r.getAs[Long]("power_pct") ->
        r.getAs[Long]("mde_centi_e4")).toMap
      assert(byP(90L) > byP(80L), s"$et: 90% power needs a larger MDE")
      rows.foreach(r => assert(r.getAs[Long]("sigma_centi_e4") >= 0L))
    }
    operators.Eval.q473WilsonLeaderboard(spark, d).collect().foreach { r =>
      val (wr, wl) = (r.getAs[Long]("winrate_milli"),
        r.getAs[Long]("wilson_lo_micro"))
      assert(wl >= 0L && wl <= 1000000L)
      assert(wl <= wr * 1000,
        s"Wilson lower bound $wl must not exceed the raw rate ${wr * 1000}")
    }
  }

  test("advantage buckets clamp to ±4σ; best-of-n payoff is monotone in n") {
    val adv = operators.Eval.q474GrpoAdvantage(spark, d).collect()
    adv.foreach { r =>
      assert(math.abs(r.getAs[Long]("bkt")) <= 8L)
      assert(r.getAs[Long]("cnt") >= r.getAs[Long]("n_groups"))
    }
    val bon = operators.Eval.q475BestOfN(spark, d).collect()
      .map(r => r.getAs[Long]("n_samples") -> r.getAs[Long]("e_max_milli"))
      .toMap
    assert(bon(1L) <= bon(4L) && bon(4L) <= bon(16L),
      s"E[max of n] must be monotone in n: $bon")
    assert(bon(16L) <= 50000L, "expected max cannot exceed the top score")
    assert(bon(1L) >= 1000L, "E[max of 1] is the plain mean, at least 1")
  }

  test("Borda: points bounded by ballots·(max ballot size − 1); top-20 ordered") {
    val r = operators.Eval.q470BordaCount(spark, d).collect()
    assert(r.length <= 20)
    val pts = r.map(_.getAs[Long]("borda_points"))
    assert(pts.sameElements(pts.sorted.reverse), "must be descending")
    r.foreach(x => assert(x.getAs[Long]("borda_points") >= 0L))
  }

  test("position bias: a position-follower reads 1000/0, a position-blind judge 500/1000") {
    // "biased" always picks whatever sits in position 1: position-1
    // win rate 1000‰ and every swap-tested pair FLIPS verdicts →
    // consistency 0. "solid" always prefers the same item regardless
    // of presentation: pos-1 rate at the coin-flip 500‰ and every
    // swap-tested pair agrees → consistency 1000.
    val jm = Seq(
      ("biased", 1L, 2L, 1L, 1L), ("biased", 1L, 2L, 0L, 0L),
      ("biased", 1L, 3L, 1L, 1L), ("biased", 1L, 3L, 0L, 0L),
      ("solid", 1L, 2L, 1L, 1L), ("solid", 1L, 2L, 0L, 1L),
      ("solid", 2L, 3L, 1L, 0L), ("solid", 2L, 3L, 0L, 0L),
    ).toDF("judge", "lo", "hi", "lo_first", "lo_win")
    val r = operators.Eval.positionBias(jm).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toMap
    assert(r("biased") == ((4L, 1000L, 2L, 0L)), s"biased: ${r("biased")}")
    assert(r("solid") == ((4L, 500L, 2L, 1000L)), s"solid: ${r("solid")}")
    // and on real data the audit rates stay in [0, 1000]
    operators.Eval.q476PositionBias(spark, d).collect().foreach { x =>
      assert(x.getAs[Long]("pos1_win_milli") >= 0L &&
        x.getAs[Long]("pos1_win_milli") <= 1000L)
      assert(x.getAs[Long]("swap_consistent_milli") >= 0L &&
        x.getAs[Long]("swap_consistent_milli") <= 1000L)
    }
  }

  test("Elo: expected-score table is exactly antisymmetric; fold matches hand-computed updates; ratings are zero-sum") {
    import operators.Eval.{eloExpected, eloFoldExpr}
    // e(d) + e(-d) = 1000 across every bucket boundary and interior
    val diffs = Seq(-500000L, -400000L, -399999L, -200000L, -150000L,
      -100000L, -50000L, 0L, 50000L, 100000L, 150000L, 200000L,
      399999L, 400000L, 500000L)
    diffs.toDF("dd")
      .selectExpr("dd", s"${eloExpected("dd")} AS e", s"${eloExpected("-dd")} AS en")
      .collect().foreach { r =>
        assert(r.getInt(1) + r.getInt(2) == 1000,
          s"antisymmetry broken at d=${r.getLong(0)}")
      }
    // two players, two rating periods, A beats B twice (K = 32):
    // period 1 from even ratings: e = 500 → A +16000, B −16000;
    // period 2 at d = 32000: e = 560 → A +14080, B −14080
    val rs = Seq(1).toDF("x").selectExpr(
      """array(named_struct('t', 1L, 'gs',
           array(named_struct('a', 0L, 'b', 1L, 'awin', 1L))),
         named_struct('t', 2L, 'gs',
           array(named_struct('a', 0L, 'b', 1L, 'awin', 1L)))) AS ms""")
      .selectExpr(eloFoldExpr("ms", 2) + " AS rs")
      .collect()(0).getSeq[Long](0)
    assert(rs == Seq(1530080L, 1469920L), s"fold gave $rs")
    // real data: the antisymmetric table makes ratings exactly
    // zero-sum, and every nation appears once
    val elo = operators.Eval.q477OnlineElo(spark, d).collect()
    assert(elo.length == 25)
    assert(elo.map(_.getAs[Long]("elo_milli")).sum == 25L * 1500000L,
      "Elo updates must conserve the rating pool")
    val sorted = elo.map(_.getAs[Long]("elo_milli"))
    assert(sorted.sameElements(sorted.sorted.reverse), "descending order")
  }
}
