package graft

import org.apache.spark.sql.functions._
import graft.operators.Lexicon

/** Crafted-corpus tests for the lexical operators: BPE merge-scan
  * boundary semantics (the part the synthetic tables only exercise in
  * aggregate), Neyman allocation arithmetic, and ROUGE clipping. */
class LexiconSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("lexicon").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def merge(syms: Seq[String], pair: String): Seq[String] =
    Seq(syms).toDF("syms")
      .select(Lexicon.mergeSyms($"syms", lit(pair)).as("m"))
      .as[Seq[String]].head()

  test("mergeSyms: greedy non-overlapping left-to-right, like reference BPE") {
    assert(merge(Seq("a", "a", "a", "a"), "a a") == Seq("aa", "aa"))
    assert(merge(Seq("a", "a", "a"), "a a") == Seq("aa", "a"))
    assert(merge(Seq("b", "a", "a", "c"), "a a") == Seq("b", "aa", "c"))
  }

  test("mergeSyms: no cross-symbol false match on shared characters") {
    // pair "x y" must not fire inside symbols ("ax","y") or ("x","ya")
    assert(merge(Seq("ax", "y"), "x y") == Seq("ax", "y"))
    assert(merge(Seq("x", "ya"), "x y") == Seq("x", "ya"))
    assert(merge(Seq("x", "y"), "x y") == Seq("xy"))
    // merged multi-char symbols participate in later merges
    assert(merge(Seq("ab", "cd"), "ab cd") == Seq("abcd"))
  }

  test("q280: merge counts non-increasing; symbol count telescopes") {
    val d = "/root/testdata/sf0.001"
    val rows = Lexicon.q280BpeMergeLoop(spark, d)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(rows.length == 4)
    val Seq(sum0, m1, m2, m3) = rows.toSeq
    // classic BPE invariant: the best pair frequency never increases
    assert(m1._4 >= m2._4 && m2._4 >= m3._4)
    // each merge occurrence removes exactly one symbol: final symbol
    // count == total word chars − Σ merge counts
    val chars = spark.read.parquet(s"$d/documents.parquet")
      .select(explode(graft.functions.Fns.tokens($"text")).as("w"))
      .agg(sum(length($"w"))).as[Long].head()
    assert(sum0._4 == chars - m1._4 - m2._4 - m3._4)
    // merged symbol is the pair with the space removed
    assert(m1._3 == m1._2.replace(" ", ""))
  }

  test("q281: allocations sum to the budget; Neyman proportionality") {
    val rows = Lexicon.q281NeymanAllocation(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._5).sum == 10000L)
    val wTot = rows.map(_._4).sum
    rows.foreach { case (_, _, _, w, alloc) =>
      // largest-remainder: within 1 of the exact proportional share
      val exact = 10000.0 * w / wTot
      assert(math.abs(alloc - exact) <= 1.0 + 1e-9)
    }
  }

  test("q282: clipped overlap bounded by the smaller side; F1 between P and R") {
    val rows = Lexicon.q282RougePairs(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length % 2 == 0) // n=1 and n=2 per pair
    rows.foreach { case (_, _, _, ov, sz1, sz2, p, r, f1) =>
      assert(ov <= math.min(sz1, sz2))
      assert(p <= 10000 && r <= 10000)
      // harmonic mean lies between min and max (±1 for integer floors)
      assert(f1 >= math.min(p, r) - 1 && f1 <= math.max(p, r) + 1)
    }
  }

  test("q282: identical texts score 10000 across the board") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val d = docsDir(Seq(
      (1L, t, "en", "s", t.length.toLong),
      (2L, t, "en", "s", t.length.toLong),
      (3L, "unrelated words entirely disjoint from the pair corpus", "en", "s", 1L)))
    val rows = Lexicon.q282RougePairs(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).distinct.toSeq == Seq((1L, 2L)))
    rows.foreach { case (_, _, _, ov, sz1, sz2, p, r, f1) =>
      assert(sz1 == sz2 && ov == sz1)
      assert(p == 10000 && r == 10000 && f1 == 10000)
    }
  }

  test("q284: fertility floor is one subtoken per word; merges reduce it") {
    val rows = Lexicon.q284BpeFertility(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nw, ns, f) =>
      assert(ns >= nw)          // a word is at least one subtoken
      assert(f >= 10000L)       // fertility_bp ≥ 1.0
      assert(f == 10000 * ns / nw)
    }
  }

  test("q285: Good-Turing identities on a crafted frequency profile") {
    // lang "en": 4 hapax, 2 doubletons, 1 tripleton, 1 four-count
    val text = "a b c d e e f f g g g h h h h"
    val d = docsDir(Seq((1L, text, "en", "s", 1L)))
    val r = Lexicon.q285GoodTuring(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Option[Long], Option[Long], Option[Long])].collect()
    assert(r.length == 1)
    val (_, t, v, n1, n2, n3, n4, p0, r1, r2, r3) = r.head
    assert((t, v, n1, n2, n3, n4) == (15L, 8L, 4L, 2L, 1L, 1L))
    assert(p0 == 10000 * 4 / 15)
    assert(r1.contains(2000L * 2 / 4))  // r*=1 → 2·N2/N1 milli
    assert(r2.contains(3000L * 1 / 2))
    assert(r3.contains(4000L * 1 / 1))
    // zero-N_r guard: all-hapax slice → r*1 = 0 (N2=0 numerator) but
    // r*2 NULL (N2=0 divisor)
    val d2 = docsDir(Seq((1L, "x y z", "de", "s", 1L)))
    val r2null = Lexicon.q285GoodTuring(spark, d2)
      .as[(String, Long, Long, Long, Long, Long, Long, Long,
        Option[Long], Option[Long], Option[Long])].collect().head
    assert(r2null._9.contains(0L) && r2null._10.isEmpty)
  }

  test("q286: sliding windows catch shifted copies; aligned-only chunking would not") {
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8" // one 8-gram
    // doc 2 repeats the passage at offset 1 — a slid copy
    val d = docsDir(Seq(
      (1L, passage + " t1 t2", "en", "s", 1L),
      (2L, "zz " + passage, "en", "s", 1L),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "en", "s", 1L)))
    val rows = Lexicon.q286DupSpanCoverage(spark, d)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // docs 1 and 2 each have their 8 passage tokens covered; doc 3 clean
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    assert(rows.map(_._3).toSeq == Seq(8L, 8L))
    assert(rows.head._4 == 10000 * 8 / 10)
  }

  test("q286: coverage union merges overlapping duplicate windows") {
    // 9-token duplicated passage → two overlapping dup 8-grams whose
    // union must count 9 tokens, not 16
    val p9 = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    val d = docsDir(Seq(
      (1L, p9 + " a1 a2", "en", "s", 1L),
      (2L, p9 + " b1 b2", "en", "s", 1L)))
    val rows = Lexicon.q286DupSpanCoverage(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 2)
    rows.foreach { case (_, n, dup, _) => assert(n == 11 && dup == 9) }
  }

  test("q287: exclusive rare pair out-ranks frequent independent pair") {
    // "aa bb" always co-occur (5×, never apart); "cc" pairs with many
    // different successors, so (cc, *) has high marginals and low PMI
    val fill = (1 to 5).map(i => s"cc d$i cc e$i").mkString(" ")
    val d = docsDir(Seq(
      (1L, ("aa bb " * 5).trim + " " + fill + " " + ("cc ff " * 5).trim,
        "en", "s", 1L)))
    val rows = Lexicon.q287PmiCollocations(spark, d)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert((rows.head._1, rows.head._2) == ("aa", "bb"))
    assert(rows.forall(_._3 >= 5))
    // output is ordered by PMI descending
    assert(rows.map(_._4).toSeq == rows.map(_._4).sortBy(-_).toSeq)
  }

  test("q283: JSD bounded by ln 2; identical slices sit at zero") {
    // two languages with IDENTICAL word multisets → JSD exactly 0 for
    // both (every per-term odds ratio is exactly 1, ln floors to 0)
    val t = "one two three two one"
    val d = docsDir(Seq(
      (1L, t, "en", "s", 1L), (2L, t, "de", "s", 1L)))
    val rows = Lexicon.q283JsdSlices(spark, d)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("de", "en"))
    rows.foreach { case (_, _, _, jsd) => assert(jsd == 0L) }
    // disjoint-vocabulary slices approach the ln 2 ceiling
    val d2 = docsDir(Seq(
      (1L, "aa bb cc aa bb", "en", "s", 1L),
      (2L, "xx yy zz xx yy", "de", "s", 1L)))
    val far = Lexicon.q283JsdSlices(spark, d2)
      .as[(String, Long, Long, Long)].collect()
    far.foreach { case (_, _, _, jsd) =>
      assert(jsd >= 693146L && jsd <= 693148L) // ln 2 in micro-nats ±1
    }
    // real corpus: strictly inside (0, ln 2)
    val real = Lexicon.q283JsdSlices(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long)].collect()
    assert(real.nonEmpty)
    real.foreach { case (_, _, _, jsd) =>
      assert(jsd >= 0L && jsd < 693147L)
    }
  }

  test("q317: tie-break comparator is UTF-8 byte order, not UTF-16") {
    // U+10000 (surrogate pair D800 DC00; UTF-8 F0 90 80 80) vs U+E000
    // (UTF-8 EE 80 80): Java String order puts the surrogate FIRST
    // (0xD800 < 0xE000), UTF-8 byte order puts it LAST (F0 > EE) — the
    // exact divergence ADVICE r6 flagged against DuckDB's collation
    val supp = "\uD800\uDC00" // U+10000
    val pua = "\uE000"
    assert(supp < pua)                       // Java order: diverges...
    assert(!Lexicon.utf8Lt(supp, pua))       // ...UTF-8 order: corrected
    assert(Lexicon.utf8Lt(pua, supp))
    // ASCII order and the prefix rule are unchanged
    assert(Lexicon.utf8Lt("a|b", "a|c") && !Lexicon.utf8Lt("a|c", "a|b"))
    assert(Lexicon.utf8Lt("ab", "abc") && !Lexicon.utf8Lt("abc", "ab"))
    assert(!Lexicon.utf8Lt("ab", "ab"))
  }

  test("q317: an oversized piece vocabulary fails fast, not collect-and-hope") {
    val d = docsDir(Seq((1L, "aa bb aa cc", "en", "s", 1L)))
    val e = intercept[IllegalArgumentException] {
      Lexicon.unigramViterbi(spark, d, vocabCap = 2).collect()
    }
    assert(e.getMessage.contains("above the"))
    assert(e.getMessage.contains("broadcast"))
    // same corpus under the real cap segments fine
    assert(Lexicon.q317UnigramViterbi(spark, d).count() == 3)
  }

  test("q317: Viterbi segmentation matches an independent DP replay") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val got = Lexicon.q317UnigramViterbi(spark, d)
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    // independent replay: vocab, costs, and DP recomputed in Scala
    val words = graft.io.Tables.documents(spark, d)
      .select(explode(graft.functions.Fns.tokens($"text")).as("w"))
      .as[String].collect()
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    words.foreach { case (w, cnt) =>
      for (l <- 1 to 4; s <- 0 to w.length - l)
        freq(w.substring(s, s + l)) += cnt
    }
    val multi = freq.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(40)
    val vocab = freq.filter(_._1.length == 1).toSeq ++ multi
    val tot = vocab.map(_._2).sum
    val cost = vocab.map { case (p, f) =>
      p -> math.floor(math.log(tot * 1.0 / f) * 1000000.0).toLong }.toMap
    def viterbi(w: String): (Long, String) = {
      val best = Array.fill[(Long, String)](w.length + 1)((Long.MaxValue, ""))
      best(0) = (0L, "")
      for (i <- 1 to w.length) {
        var cands = List.empty[(Long, String)]
        for (j <- math.max(0, i - 4) until i if best(j)._1 != Long.MaxValue) {
          val piece = w.substring(j, i)
          cost.get(piece).foreach { pc =>
            cands ::= (best(j)._1 + pc, best(j)._2 + "|" + piece)
          }
        }
        if (cands.nonEmpty)
          best(i) = cands.minBy(identity)((Ordering.Tuple2[Long, String]))
      }
      (best(w.length)._1, best(w.length)._2.drop(1))
    }
    got.foreach { case (w, cnt, wlen, nPieces, costMicro, seg) =>
      assert(cnt == words(w) && wlen == w.length)
      val (expCost, expSeg) = viterbi(w)
      assert(costMicro == expCost, s"word $w")
      assert(seg == expSeg && nPieces == seg.split("\\|").length)
      // optimality sanity: never worse than the all-singles segmentation
      assert(expCost <= w.map(c => cost(c.toString)).sum)
    }
  }

  test("q324: OOV is charged to the source that carries the rare types") {
    import spark.implicits._
    // source b: one token 100x -> tops the vocab; source a: 20 types,
    // one hit each -> only the 15 alphabetically-smallest join "zz" in
    // the top-16 vocab (count desc, token asc tie-break)
    val aTok = (1 to 20).map(i => f"w$i%02d")
    val d = docsDir(Seq(
      (1L, aTok.mkString(" "), "en", "a", 100L),
      (2L, Seq.fill(100)("zz").mkString(" "), "en", "b", 300L)))
    val r = graft.operators.Lexicon.q324VocabCoverage(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      ("a", 20L, 15L, 7500L, 20L, 15L),
      ("b", 100L, 100L, 10000L, 1L, 1L)))
  }

  test("q334: the 3/4 power flattens — shares sit between uniform and unigram") {
    import spark.implicits._
    val r = graft.operators.Lexicon.q334NegativeSampling(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.nonEmpty && r.size <= 20)
    r.foreach { case (_, cnt, w, share, uni, draws) =>
      assert(w == math.floor(math.sqrt(cnt * math.sqrt(cnt.toDouble)) * 1000.0).toLong)
      assert(draws == share / 10)
      // for an above-average-frequency token the 3/4 power can only
      // shrink its share relative to raw unigram
      if (uni > 35000) assert(share <= uni)
    }
  }

  test("q350: planted stopword tops the table with near-zero idf") {
    import spark.implicits._
    // "filler" appears in all 10 docs; content words in one each
    val docs = (1 to 10).map(i => (i.toLong, s"filler w$i x$i", "en", "s", 20L))
    val d = docsDir(docs)
    val r = graft.operators.Lexicon.q350StopwordDiscovery(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val top = r.head
    assert(top._1 == "filler" && top._3 == 10L && top._4 == 10000L)
    assert(top._5 == 0L && top._6 == 1L) // ln(10/10) = 0, flagged
    assert(r.tail.forall(x => x._6 == 0L && x._4 == 1000L))
  }

  test("q396: a bigram-predictable corpus prefers the largest lambda") {
    import spark.implicits._
    // train and held-out share one deterministic cycle -> the bigram
    // model is near-perfect, so surprisal must fall as lambda rises
    val cyc = "p q r s t"
    val docs = (0L until 20L).map(i => (i, cyc, "en", "s", 11L))
    val d = docsDir(docs)
    val r = graft.operators.Lexicon.q396LmInterpolation(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r.map(_._1) == Seq(250L, 500L, 750L))
    assert(r.map(_._2).distinct == Seq(4L * 4))  // 4 bigrams x 4 held-out docs
    assert(r.map(_._3) == r.map(_._3).sorted.reverse) // more bigram = less surprisal
    r.foreach { case (_, n, tot, avg) => assert(avg == tot / n) }
  }
}
