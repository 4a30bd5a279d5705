package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.functions.Fns._

/** Training-data preparation operators: context-window chunking, PII
  * scrubbing, equi-depth quality binning, and per-dimension embedding
  * standardization. (Reference scope: the reference pipeline stops at
  * flat per-row frames — `app/team_utilities.py` builds fixed-width
  * match rows and loads them verbatim; these are the prep stages a
  * training pipeline needs downstream of such ingestion.)
  *
  * Scale design:
  *  - q91 chunking is scan → generate → explode → project: zero
  *    shuffles, so chunking 100 TB costs one read and one write. The
  *    stride arithmetic (`sequence(1, n, stride)`) keeps every chunk
  *    row derivable from its document row alone — no window, no join.
  *  - q92 scrubbing is a pure per-row expression chain (3 regex counts
  *    + 3 sequential masks), fully codegen'd, no shuffle. Mask ORDER is
  *    part of the contract: emails first, then IDs, then bare digit
  *    runs, each counted on the text the previous stage produced (a
  *    digit run inside an email must not double-count).
  *  - q93 equi-depth bins WITHOUT a global sort: aggregate per distinct
  *    value (shuffle ~ |distinct values|, not |rows|), cumulative-sum
  *    over that small value domain, then bin by integer rank share.
  *    The single-partition window is over distinct values only — the
  *    row-level path a naive `ntile(10) OVER (ORDER BY v)` would take
  *    funnels ALL rows through one task at 100 TB; this shape funnels
  *    only the value histogram (bounded domain) and broadcasts back.
  *  - q94 standardization: exact integer moments per dimension (n, Σq,
  *    Σq²) from the quantized embeddings, then the outlier test
  *    |z| > 2 is evaluated as the INTEGER inequality
  *    (n·q − Σq)² > 4·(n·Σq² − (Σq)²) — no doubles anywhere, so the
  *    result is bit-deterministic at any partition count on both
  *    engines. Int64 bound: |q| ≤ 1000 (unit-norm inputs) keeps
  *    n·Σq² < 9.2e18 up to n ≈ 3e6 vectors per aggregation scope;
  *    beyond that the moments move to decimal(38,0) (q80's pattern).
  */
object Prep {

  /** Context-window chunking: overlapping 32-token windows at stride 24
    * (8-token overlap). One output row per chunk with its token count
    * and a 60-bit content hash; the last chunk may be short. */
  /** The chunking transform itself — stateless per-row fan-out, shared
    * verbatim by the batch query and the streaming twin
    * ([[graft.streaming.DocStreams.chunkStream]]): no window, no join,
    * no aggregation, so the same plan runs append-mode on an unbounded
    * stream with no state store. */
  def chunkTransform(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val chunkLen = 32
    val stride = 24
    docs
      .select($"doc_id", tokens($"text").as("tk"))
      .withColumn("n", size($"tk"))
      .filter($"n" > 0)
      .select($"doc_id", $"n", $"tk",
        posexplode(sequence(lit(1), $"n", lit(stride))).as(Seq("pos", "start_i")))
      .withColumn("chunk", slice($"tk", $"start_i", lit(chunkLen)))
      .select(
        $"doc_id",
        $"pos".cast("long").as("chunk_id"),
        $"start_i".cast("long").as("start_tok"),
        size($"chunk").cast("long").as("n_tok"),
        hash60(concat_ws(" ", $"chunk")).as("chunk_hash"))
  }

  def q91DocChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    chunkTransform(Tables.documents(s, d)).orderBy($"doc_id", $"chunk_id")
  }

  val q91Oracle: String =
    """WITH tk AS (
         SELECT doc_id, list_filter(string_split_regex(text,'\s+'), t -> t <> '') AS tk
         FROM documents),
       nz AS (SELECT doc_id, tk, len(tk) AS n FROM tk WHERE len(tk) > 0),
       st AS (SELECT doc_id, n, tk, unnest(generate_series(1, n, 24)) AS start_i FROM nz)
       SELECT doc_id,
         CAST((start_i - 1) // 24 AS BIGINT) AS chunk_id,
         CAST(start_i AS BIGINT) AS start_tok,
         CAST(len(tk[start_i : start_i + 31]) AS BIGINT) AS n_tok,
         ('0x' || substr(md5(array_to_string(tk[start_i : start_i + 31], ' ')), 1, 15))::BIGINT AS chunk_hash
       FROM st ORDER BY doc_id, chunk_id"""

  /** PII scrubbing over synthesized contact profiles (the testdata has
    * no organic PII, so — like q12's URL synthesis — the profile string
    * is derived from customer columns, then scrubbed): sequential
    * email → account-ID → digit-run masking with per-stage match
    * counts and a content hash of the scrubbed text. */
  def q92PiiScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emailRe = "[a-z]+\\.[0-9]+@[a-z.]+"
    val idRe = "Customer#[0-9]+"
    val numRe = "[0-9]{4,}"
    Tables.customer(s, d)
      .withColumn("profile",
        concat($"c_name", lit(" seg "), $"c_mktsegment", lit(" contact "),
          lower($"c_mktsegment"), lit("."), $"c_custkey".cast("string"),
          lit("@mail.example ref "),
          ($"c_custkey" * 7919 + 104729).cast("string")))
      .withColumn("s1", regexp_replace($"profile", emailRe, "<EMAIL>"))
      .withColumn("s2", regexp_replace($"s1", idRe, "<ID>"))
      .withColumn("s3", regexp_replace($"s2", numRe, "<NUM>"))
      .select(
        $"c_custkey",
        regexp_count($"profile", lit(emailRe)).cast("long").as("n_email"),
        regexp_count($"s1", lit(idRe)).cast("long").as("n_id"),
        regexp_count($"s2", lit(numRe)).cast("long").as("n_num"),
        length($"profile").cast("long").as("len_orig"),
        length($"s3").cast("long").as("len_scrub"),
        hash60($"s3").as("scrub_hash"))
      .orderBy($"c_custkey")
  }

  val q92Oracle: String =
    """WITH p AS (
         SELECT c_custkey,
           c_name || ' seg ' || c_mktsegment || ' contact ' ||
           lower(c_mktsegment) || '.' || CAST(c_custkey AS VARCHAR) ||
           '@mail.example ref ' || CAST(c_custkey * 7919 + 104729 AS VARCHAR) AS profile
         FROM customer),
       m AS (
         SELECT c_custkey, profile,
           regexp_replace(profile, '[a-z]+\.[0-9]+@[a-z.]+', '<EMAIL>', 'g') AS s1
         FROM p),
       m2 AS (
         SELECT *, regexp_replace(s1, 'Customer#[0-9]+', '<ID>', 'g') AS s2 FROM m),
       m3 AS (
         SELECT *, regexp_replace(s2, '[0-9]{4,}', '<NUM>', 'g') AS s3 FROM m2)
       SELECT c_custkey,
         CAST(len(regexp_extract_all(profile, '[a-z]+\.[0-9]+@[a-z.]+')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(s1, 'Customer#[0-9]+')) AS BIGINT) AS n_id,
         CAST(len(regexp_extract_all(s2, '[0-9]{4,}')) AS BIGINT) AS n_num,
         CAST(len(profile) AS BIGINT) AS len_orig,
         CAST(len(s3) AS BIGINT) AS len_scrub,
         ('0x' || substr(md5(s3), 1, 15))::BIGINT AS scrub_hash
       FROM m3 ORDER BY c_custkey"""

  /** Equi-depth decile binning of document length — computed from the
    * VALUE HISTOGRAM (groupBy n_chars), not a row-level ntile: bin of a
    * value v is floor(10 · rows_before(v) / N). Ties are indivisible
    * (every row of one value lands in one bin), so bins can be uneven
    * or absent under heavy ties — that is the deterministic contract. */
  def q93QualityBins(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val vc = docs.groupBy($"n_chars".as("v")).agg(count(lit(1)).as("cnt"))
    val tot = docs.agg(count(lit(1)).as("n_total"))
    val w = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    vc.withColumn("cumb", coalesce(sum($"cnt").over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("bin", expr("(10 * cumb) div n_total"))
      .groupBy($"bin")
      .agg(
        sum($"cnt").as("n_docs"),
        min($"v").as("lo_chars"),
        max($"v").as("hi_chars"))
      .orderBy($"bin")
  }

  val q93Oracle: String =
    """WITH vc AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
                   FROM documents GROUP BY 1),
       t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
       c AS (SELECT v, cnt,
               COALESCE(CAST(sum(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cumb
             FROM vc),
       b AS (SELECT v, cnt, (10 * cumb) // n_total AS bin FROM c, t)
       SELECT CAST(bin AS BIGINT) AS bin, CAST(sum(cnt) AS BIGINT) AS n_docs,
         CAST(min(v) AS BIGINT) AS lo_chars, CAST(max(v) AS BIGINT) AS hi_chars
       FROM b GROUP BY 1 ORDER BY 1"""

  /** Per-dimension embedding standardization stats + |z|>2 outlier
    * counts, all in exact integer arithmetic over the quantized
    * vectors (see object scaladoc for the inequality and its bound). */
  def q94DimStandardize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ex = Tables.embeddings(s, d)
      .select($"vec_id", posexplode(quantize1000($"embedding")).as(Seq("pos", "q")))
      .select(($"pos" + 1).cast("long").as("dim"), $"q")
    val st = ex.groupBy($"dim").agg(
      count(lit(1)).as("n"),
      sum($"q").as("sum_q"),
      sum($"q" * $"q").as("sumsq_q"))
    val outl = ex.join(broadcast(st), "dim")
      .filter(($"n" * $"q" - $"sum_q") * ($"n" * $"q" - $"sum_q") >
        lit(4L) * ($"n" * $"sumsq_q" - $"sum_q" * $"sum_q"))
      .groupBy($"dim").agg(count(lit(1)).as("n_outlier"))
    st.join(outl, Seq("dim"), "left")
      .select($"dim", $"n", $"sum_q", $"sumsq_q",
        coalesce($"n_outlier", lit(0L)).as("n_outlier"))
      .orderBy($"dim")
  }

  val q94Oracle: String =
    """WITH e AS (SELECT vec_id, embedding,
                    unnest(generate_series(1, len(embedding))) AS dim
                  FROM embeddings),
       q AS (SELECT vec_id, CAST(dim AS BIGINT) AS dim,
               CAST(floor(embedding[dim]::DOUBLE * 1000) AS BIGINT) AS q
             FROM e),
       st AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(q) AS BIGINT) AS sum_q,
                CAST(sum(q*q) AS BIGINT) AS sumsq_q
              FROM q GROUP BY 1),
       o AS (SELECT q.dim, CAST(count(*) AS BIGINT) AS n_outlier
             FROM q JOIN st ON q.dim = st.dim
             WHERE (n*q.q - sum_q)*(n*q.q - sum_q) > 4*(n*sumsq_q - sum_q*sum_q)
             GROUP BY 1)
       SELECT st.dim, n, sum_q, sumsq_q, COALESCE(n_outlier, 0) AS n_outlier
       FROM st LEFT JOIN o ON st.dim = o.dim ORDER BY st.dim"""

  /** Content-defined chunking dedup (the FastCDC/rolling-hash family):
    * chunk boundaries are decided by CONTENT (a token whose hash is
    * ≡ 0 mod 32 starts a new chunk), not position, so inserting or
    * deleting a sentence shifts only the chunks it touches — unlike
    * q91's fixed-stride windows, where one insertion re-keys every
    * downstream chunk. Identical passages in different documents
    * therefore chunk identically, and a chunk-hash groupBy finds the
    * shared content. Per doc: chunk count, cross-corpus duplicated
    * chunk count, and the dup share in permille.
    *
    * Scale: one posexplode + per-doc window (shuffle on doc_id), one
    * chunk-assembly groupBy on (doc_id, chunk_id) — same key, so AQE
    * reuses the partitioning — and a chunk_hash-sized occurrence
    * groupBy. Boundaries are scan-local expressions; mean chunk length
    * is the modulus (32 tokens), tunable per corpus. */
  def q131CdcChunks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val toks = Tables.documents(s, d)
      .select($"doc_id", posexplode(tokens($"text")).as(Seq("pos", "tok")))
      .withColumn("b", when(hash60($"tok") % 32 === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum($"b").over(byDoc))
    val chunks = toks.groupBy($"doc_id", $"chunk_id")
      .agg(sort_array(collect_list(struct($"pos", $"tok"))).as("ord"))
      .select($"doc_id",
        hash60(concat_ws(" ", expr("transform(ord, x -> x.tok)"))).as("chunk_hash"))
      .localCheckpoint() // feeds the occurrence count AND the per-doc join
    val occ = chunks.groupBy($"chunk_hash").agg(count(lit(1)).as("n_occ"))
    chunks.join(occ, "chunk_hash")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"n_occ" >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select($"doc_id", $"n_chunks", $"n_dup_chunks",
        expr("(1000 * n_dup_chunks) div n_chunks").as("dup_permille"))
      .orderBy($"doc_id")
  }

  val q131Oracle: String =
    """WITH t AS (
         SELECT doc_id,
           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
         FROM documents),
       tok AS (
         SELECT doc_id, i AS pos, tk[i] AS tok
         FROM t, unnest(generate_series(1, len(tk))) AS u(i)),
       bnd AS (
         SELECT doc_id, pos, tok,
           CASE WHEN ('0x' || substr(md5(tok), 1, 15))::BIGINT % 32 = 0
                THEN 1 ELSE 0 END AS b
         FROM tok),
       ch AS (
         SELECT doc_id,
           sum(b) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id,
           pos, tok
         FROM bnd),
       chunks AS (
         SELECT doc_id,
           ('0x' || substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 15))::BIGINT
             AS chunk_hash
         FROM ch GROUP BY doc_id, chunk_id),
       occ AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_occ
               FROM chunks GROUP BY 1)
       SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         (1000 * CAST(sum(CASE WHEN n_occ >= 2 THEN 1 ELSE 0 END) AS BIGINT))
           // CAST(count(*) AS BIGINT) AS dup_permille
       FROM chunks JOIN occ USING (chunk_hash)
       GROUP BY doc_id ORDER BY doc_id"""

  /** Distributed power-iteration step (q161): y = G·v₀ for the Gram
    * matrix G = Σ_v q_v q_vᵀ of the (milli-quantized) embedding set and
    * start vector v₀ = 1 — the core of PCA / spectral methods at
    * scale. G (64×64 here, d×d generally) is NEVER materialized: by
    * associativity y = Σ_v q_v·(q_vᵀ·v₀), so each row contributes its
    * own vector scaled by its coordinate sum — row-local arithmetic
    * (the per-row sum via `aggregate`, the scaled coordinates via
    * posexplode), then ONE d-group aggregation. No join, no shuffle of
    * anything wider than (dim, partial) pairs; overflow headroom is
    * |q|≤2¹⁰ · d=2⁶ · |q|≤2¹⁰ · n rows — exact in int64 up to ~2³⁶
    * rows. Exact integers make the step hash-comparable cross-engine
    * (q94's quantization contract).
    *
    * rayleigh = v₀ᵀGv₀ = Σ_v s_v² is emitted per dim (constant column)
    * as the iteration's convergence scalar. */
  def q161PowerIter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select(quantize1000($"embedding").as("qa"))
      .select($"qa", expr("aggregate(qa, 0L, (a, x) -> a + x)").as("sv"))
      .select($"sv", posexplode($"qa").as(Seq("pos", "q")))
      .groupBy(($"pos" + 1).cast("long").as("dim"))
      .agg(sum($"q" * $"sv").as("y"),
        sum($"sv" * $"sv").as("rayleigh"),
        count(lit(1)).as("n_vecs"))
      .orderBy($"dim")
  }

  val q161Oracle: String =
    """WITH q AS (
         SELECT list_transform(embedding,
             x -> CAST(floor(x::DOUBLE * 1000) AS BIGINT)) AS qa
         FROM embeddings),
       sv AS (SELECT qa, CAST(list_sum(qa) AS BIGINT) AS sv FROM q),
       e AS (SELECT sv, unnest(qa) AS qv,
               unnest(generate_series(1, len(qa))) AS dim
             FROM sv)
       SELECT CAST(dim AS BIGINT) AS dim,
         CAST(sum(qv * sv) AS BIGINT) AS y,
         CAST(sum(sv * sv) AS BIGINT) AS rayleigh,
         CAST(count(*) AS BIGINT) AS n_vecs
       FROM e GROUP BY 1 ORDER BY 1"""

  /** Cross-source quantile normalization (q169) — batch-effect
    * correction for heterogeneous corpora: each source's raw score
    * (here doc length) is replaced by the GLOBAL score at the same
    * within-source quantile, so a doc "long for src3" maps to what
    * "equally long for the whole corpus" looks like — the rank-based
    * calibration used when per-source score scales aren't comparable
    * (quantile normalization, Bolstad et al. '03). Both ranks are
    * deterministic (ties by doc_id); position arithmetic is pure
    * integer: bp = (rank−1)·10⁴ div (n−1), global position =
    * 1 + bp·(N−1) div 10⁴.
    *
    * Scale note: the within-source rank partitions by source (fine).
    * The GLOBAL side never sorts rows: the score at global position p
    * depends only on the score MULTISET, so it is read off the score
    * VALUE HISTOGRAM (groupBy(score), bounded — n_chars has bounded
    * cardinality) — and only the ≤ 10⁴+1 positions the bp grid can
    * ever request are looked up, via a broadcast range join of the
    * needed-position set against the histogram's cumulative ranges.
    * Identical output to the row_number formulation (position→value is
    * tiebreak-independent), zero row-level global windows. At 100 TB
    * the same map can swap to the q149 q-digest (q169b is that twin,
    * contract-checked against this exact form). */
  def q169QuantileNorm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"source",
      $"n_chars".as("score"))
    val n = docs.count()
    val srcRank = docs
      .withColumn("r", row_number().over(Window.partitionBy($"source")
        .orderBy($"score", $"doc_id")))
      .withColumn("nsrc", count(lit(1)).over(Window.partitionBy($"source")))
      .withColumn("bp", expr("(r - 1) * 10000 div (nsrc - 1)"))
      .withColumn("gpos", expr(s"1 + bp * (${n} - 1) div 10000"))
    // value histogram of the global score distribution: position p
    // falls in the value v whose cumulative range [gcumb+1, gcumb+gcnt]
    // contains p
    val wg = Window.orderBy($"gscore")
      .rowsBetween(Window.unboundedPreceding, -1)
    val gmap = docs.groupBy($"score".as("gscore"))
      .agg(count(lit(1)).as("gcnt"))
      .withColumn("gcumb", coalesce(sum($"gcnt").over(wg), lit(0L)))
    // only the grid-reachable positions are resolved (≤ 10⁴+1 rows)
    val needed = srcRank.select($"gpos").distinct()
    val globalAtPos = gmap.join(broadcast(needed),
        $"gpos" > $"gcumb" && $"gpos" <= $"gcumb" + $"gcnt")
      .select($"gpos", $"gscore")
    srcRank.join(broadcast(globalAtPos), "gpos")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"score").as("sum_raw"),
        sum($"gscore").as("sum_calibrated"),
        min($"gscore").as("min_calibrated"),
        max($"gscore").as("max_calibrated"))
      .orderBy($"source")
  }

  val q169Oracle: String =
    """WITH docs AS (
         SELECT doc_id, source, n_chars AS score FROM documents),
       nn AS (SELECT count(*) AS n FROM docs),
       sr AS (
         SELECT source, score,
           1 + ((row_number() OVER (PARTITION BY source ORDER BY score, doc_id) - 1)
                * 10000 // (count(*) OVER (PARTITION BY source) - 1))
               * (n - 1) // 10000 AS gpos
         FROM docs, nn),
       gs AS (
         SELECT row_number() OVER (ORDER BY score, doc_id) AS gpos,
           score AS gscore
         FROM docs)
       SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(sr.score) AS BIGINT) AS sum_raw,
         CAST(sum(gscore) AS BIGINT) AS sum_calibrated,
         CAST(min(gscore) AS BIGINT) AS min_calibrated,
         CAST(max(gscore) AS BIGINT) AS max_calibrated
       FROM sr JOIN gs ON sr.gpos = gs.gpos
       GROUP BY 1 ORDER BY 1"""

  /** Quantile normalization, SKETCHED global side (q169b) — the
    * at-scale twin q169's scaladoc promises: the within-source bp →
    * global-value map goes through ONE mergeable q-digest
    * ([[graft.functions.QDigestQuantiles]], depth 16 / k 2048 over the
    * n_chars universe) instead of any exact global rank structure.
    * Map tasks ship ≤3k counters, the digest answers every grid bp —
    * that is the piece that still works when the corpus is 100 TB and
    * even the value histogram is inconvenient to window over.
    *
    * Contract-checked against the exact form, q149/q54-style: for
    * each bp on a 21-point grid the query reports the EXACT global
    * value at that position (read off the value histogram, as q169
    * does) and evaluates the q-digest rank-error theorem exactly
    * against the histogram — `le_ok` (the estimate's rank reaches the
    * target) and `lt_ok` (it overshoots by ≤ εn = 2·depth·n/k + 2)
    * are pinned TRUE by the oracle. The digest's own estimates stay
    * internal (compress points are data-split dependent; only exact
    * columns and always-true bounds are cross-engine comparable).
    *
    * Shape: one scan feeds (a) the per-source ranked grid lookup
    * (windows partitioned by source), (b) the digest (partial-agg),
    * (c) the value histogram; the audit is arithmetic over two ≤21-row
    * broadcasts and the bounded histogram. */
  def q169bQuantileNormDigest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val depth = 16; val k = 2048
    val grid = (0 to 10000 by 500).toSeq
    val docs = Tables.documents(s, d).select($"doc_id", $"source",
      $"n_chars".as("score"))
    val n = docs.count()
    // per-source exact value at each grid bp (partitioned windows)
    val ranked = docs
      .withColumn("r", row_number().over(Window.partitionBy($"source")
        .orderBy($"score", $"doc_id")))
    val nsrc = docs.groupBy($"source").agg(count(lit(1)).as("n_src"))
    val srcGrid = nsrc
      .withColumnRenamed("source", "gsource")
      .withColumn("phi_bp", explode(typedLit(grid.map(_.toLong))))
      .withColumn("p_src", expr("1 + phi_bp * (n_src - 1) div 10000"))
    val srcVal = ranked.join(broadcast(srcGrid),
        $"source" === $"gsource" && $"r" === $"p_src")
      .select($"source", $"phi_bp", $"n_src", $"score".as("src_score"))
    // global value histogram (bounded) + exact value at each grid bp
    val wg = Window.orderBy($"v").rowsBetween(Window.unboundedPreceding, -1)
    val ghist = docs.groupBy($"score".as("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cumb", coalesce(sum($"cnt").over(wg), lit(0L)))
    val posn = grid.map(_.toLong).toDF("phi_bp")
      .withColumn("gpos", expr(s"1 + phi_bp * (${n} - 1) div 10000"))
    val exact = ghist.join(broadcast(posn),
        $"gpos" > $"cumb" && $"gpos" <= $"cumb" + $"cnt")
      .select($"phi_bp", $"v".as("gcal_exact"))
    // the sketch: one global q-digest, one estimate per grid bp
    val qd = udaf(new graft.functions.QDigestQuantiles(depth, k, grid.map(_.toInt)))
    val ests = docs.agg(qd($"score").as("ests"))
      .select(posexplode($"ests").as(Seq("pos", "est")))
      .select(element_at(typedLit(grid.map(_.toLong)), $"pos" + 1)
        .as("phi_bp"), $"est")
    // exact rank audit of each estimate against the histogram
    val audit = ghist.crossJoin(broadcast(ests))
      .groupBy($"phi_bp", $"est")
      .agg(sum(when($"v" <= $"est", $"cnt").otherwise(lit(0L))).as("r_le"),
        sum(when($"v" < $"est", $"cnt").otherwise(lit(0L))).as("r_lt"))
      .select($"phi_bp",
        ($"r_le" >= ceil(lit(n) * $"phi_bp" / lit(10000.0)).cast("long"))
          .as("le_ok"),
        ($"r_lt" <= (lit(n) * $"phi_bp" / lit(10000.0)).cast("long")
          + lit(2L * depth) * lit(n) / lit(k) + 2L).as("lt_ok"))
    srcVal
      .join(broadcast(exact), "phi_bp")
      .join(broadcast(audit), "phi_bp")
      .withColumn("n", lit(n))
      .select($"source", $"phi_bp", $"n_src", $"src_score",
        $"gcal_exact", $"n", $"le_ok", $"lt_ok")
      .orderBy($"source", $"phi_bp")
  }

  val q169bOracle: String =
    """WITH docs AS (
         SELECT doc_id, source, n_chars AS score FROM documents),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM docs),
       grid AS (SELECT CAST(unnest(generate_series(0, 10000, 500)) AS BIGINT) AS phi_bp),
       ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM docs GROUP BY 1),
       ranked AS (
         SELECT source, score,
           row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS r
         FROM docs),
       sv AS (
         SELECT ns.source, g.phi_bp, ns.n_src, ranked.score AS src_score
         FROM ns CROSS JOIN grid g
         JOIN ranked ON ranked.source = ns.source
           AND ranked.r = 1 + g.phi_bp * (ns.n_src - 1) // 10000),
       granked AS (
         SELECT score, row_number() OVER (ORDER BY score, doc_id) AS gr
         FROM docs),
       ge AS (
         SELECT g.phi_bp, granked.score AS gcal_exact
         FROM grid g CROSS JOIN nn
         JOIN granked ON granked.gr = 1 + g.phi_bp * (nn.n - 1) // 10000)
       SELECT sv.source, sv.phi_bp, sv.n_src, sv.src_score,
         ge.gcal_exact, nn.n AS n, TRUE AS le_ok, TRUE AS lt_ok
       FROM sv JOIN ge ON sv.phi_bp = ge.phi_bp CROSS JOIN nn
       ORDER BY sv.source, sv.phi_bp"""

  /** ChiMerge supervised discretization (q299, Kerber 1992): start
    * from 20 equal-width account-balance bins labeled with urgent-order
    * propensity and repeatedly merge the adjacent pair whose class
    * distributions are MOST similar (minimum 2×2 χ²), 5 rounds — the
    * supervised cousin of q93's equi-depth bins and the third member
    * of the discretization family (q207 scores bins, q293 smooths
    * them, this one DRAWS them). Merging the lowest-χ² pair first is
    * what keeps class-informative boundaries alive while statistical
    * noise pools.
    *
    * Determinism: bin contents are exact int64; each pair's χ² is the
    * 2×2 closed form n·(ad−bc)²/((a+c)(b+d)·n₁·n₂) evaluated once in
    * identical IEEE doubles (zero margins coalesce to 0 — such pairs
    * merge first, deterministically by position); the argmin is a
    * 1-row TakeOrdered re-entering as a broadcast, and bins renumber
    * in-plan — q280's driver-loop contract, every round vocab-sized
    * (here: ≤20 rows). */
  def q299ChiMerge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey")).distinct()
    val cust = Tables.customer(s, d)
      .select($"c_custkey",
        ($"c_acctbal".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .join(urgent.withColumn("y", lit(1L)), Seq("c_custkey"), "left")
      .select($"cents", coalesce($"y", lit(0L)).as("y"))
    val rng = cust.agg(min($"cents").as("lo"), max($"cents").as("hi"))
    var cur = cust.crossJoin(broadcast(rng))
      .select(least(expr("(20 * (cents - lo)) div (hi - lo + 1)"), lit(19L))
        .as("bid"), $"cents", $"y")
      .groupBy($"bid").agg(count(lit(1)).as("cnt"), sum($"y").as("pos"),
        min($"cents").as("lo_c"), max($"cents").as("hi_c"))
      .localCheckpoint()
    for (_ <- 1 to 5) {
      val a = cur.select($"bid".as("i"), $"cnt".as("n1"), $"pos".as("p1"))
      val b = cur.select(($"bid" - 1).as("i"), $"cnt".as("n2"), $"pos".as("p2"))
      val best = a.join(b, "i")
        .withColumn("chi", expr("""coalesce(
            (n1 + n2) * CAST((p1 * (n2 - p2) - p2 * (n1 - p1)) AS DOUBLE)
              * (p1 * (n2 - p2) - p2 * (n1 - p1))
            / nullif(CAST((p1 + p2) AS DOUBLE) * ((n1 - p1) + (n2 - p2))
                     * n1 * n2, 0.0), 0.0)"""))
        .orderBy($"chi", $"i").limit(1)
        .select($"i".as("mi"))
      cur = cur.crossJoin(broadcast(best))
        .select(when($"bid" <= $"mi", $"bid").otherwise($"bid" - 1).as("bid"),
          $"cnt", $"pos", $"lo_c", $"hi_c")
        .groupBy($"bid").agg(sum($"cnt").as("cnt"), sum($"pos").as("pos"),
          min($"lo_c").as("lo_c"), max($"hi_c").as("hi_c"))
        .localCheckpoint()
    }
    cur.select($"bid", $"lo_c", $"hi_c", $"cnt", $"pos",
        expr("(1000000 * pos) div cnt").as("rate_micro"))
      .orderBy($"bid")
  }

  val q299Oracle: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "b0" else s"m${i - 1}"
      s"""
       p$i AS (
         SELECT a.bid AS i, a.cnt AS n1, a.pos AS p1, b.cnt AS n2, b.pos AS p2
         FROM $prev a JOIN $prev b ON b.bid = a.bid + 1),
       w$i AS (
         SELECT i, COALESCE(
             (n1 + n2) * CAST((p1 * (n2 - p2) - p2 * (n1 - p1)) AS DOUBLE)
               * (p1 * (n2 - p2) - p2 * (n1 - p1))
             / nullif(CAST((p1 + p2) AS DOUBLE) * ((n1 - p1) + (n2 - p2))
                      * n1 * n2, 0.0), 0.0) AS chi
         FROM p$i),
       s$i AS (SELECT i AS mi FROM w$i ORDER BY chi, i LIMIT 1),
       m$i AS (
         SELECT CASE WHEN bid <= mi THEN bid ELSE bid - 1 END AS bid,
           CAST(sum(cnt) AS BIGINT) AS cnt, CAST(sum(pos) AS BIGINT) AS pos,
           CAST(min(lo_c) AS BIGINT) AS lo_c, CAST(max(hi_c) AS BIGINT) AS hi_c
         FROM $prev, s$i GROUP BY 1)"""
    }
    s"""WITH urgent AS (
         SELECT DISTINCT o_custkey AS c_custkey FROM orders
         WHERE o_orderpriority = '1-URGENT'),
       cust AS (
         SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS y
         FROM customer c LEFT JOIN urgent u USING (c_custkey)),
       rng AS (SELECT CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi FROM cust),
       b0 AS (
         SELECT least((20 * (cents - lo)) // (hi - lo + 1), 19) AS bid,
           CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos,
           CAST(min(cents) AS BIGINT) AS lo_c, CAST(max(cents) AS BIGINT) AS hi_c
         FROM cust, rng GROUP BY 1),${(1 to 5).map(round).mkString(",")}
       SELECT bid, lo_c, hi_c, cnt, pos, (1000000 * pos) // cnt AS rate_micro
       FROM m5 ORDER BY bid"""
  }


  /** Point-in-time feature leakage-delta audit (q360): assemble the
    * same customer features twice — correctly (history strictly
    * before the cutoff, q240's PIT discipline) and leakily (full
    * history, which CONTAINS the label window) — and measure each
    * version's correlation with the post-cutoff conversion label.
    * The delta IS the leakage: here the leaky feature correlates ~3×
    * higher, and the flag trips. This turns "did the feature store
    * leak?" from a code review into a measured number. Sufficient
    * stats exact (decimal second-order); two identical double trees
    * floored once each. */
  def q360PitLeakageDelta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1998-07-01").cast("date")
    val ordersD = Tables.orders(s, d)
      .select($"o_custkey", $"o_orderdate".cast("date").as("od"))
    val featPit = ordersD.filter($"od" < cutoff)
      .groupBy($"o_custkey".as("c_custkey"))
      .agg(count(lit(1)).as("pit_orders"))
    val featLeaky = ordersD
      .groupBy($"o_custkey".as("c_custkey"))
      .agg(count(lit(1)).as("lk_orders"))
    val label = ordersD.filter($"od" >= cutoff)
      .groupBy($"o_custkey".as("c_custkey")).agg(lit(1L).as("converted"))
    val joined = Tables.customer(s, d).select($"c_custkey")
      .join(featPit, Seq("c_custkey"), "left")
      .join(featLeaky, Seq("c_custkey"), "left")
      .join(label, Seq("c_custkey"), "left")
      .select(coalesce($"pit_orders", lit(0L)).as("p"),
        coalesce($"lk_orders", lit(0L)).as("l"),
        coalesce($"converted", lit(0L)).as("y"))
    joined.agg(
        count(lit(1)).as("n"), sum($"y").as("ny"),
        sum($"p").as("sp"), sum($"l").as("sl"),
        sum($"p" * $"y").as("spy"), sum($"l" * $"y").as("sly"),
        sum($"p".cast("decimal(12,0)") * $"p".cast("decimal(12,0)")).as("spp"),
        sum($"l".cast("decimal(12,0)") * $"l".cast("decimal(12,0)")).as("sll"),
        sum($"y".cast("decimal(12,0)") * $"y".cast("decimal(12,0)")).as("syy"))
      .selectExpr("n", "ny",
        """(CAST(n AS DOUBLE) * spy - CAST(sp AS DOUBLE) * ny)
           / sqrt((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp) * (CAST(n AS DOUBLE) * syy - CAST(ny AS DOUBLE) * ny)) AS r_pit""",
        """(CAST(n AS DOUBLE) * sly - CAST(sl AS DOUBLE) * ny)
           / sqrt((CAST(n AS DOUBLE) * sll - CAST(sl AS DOUBLE) * sl) * (CAST(n AS DOUBLE) * syy - CAST(ny AS DOUBLE) * ny)) AS r_leaky""")
      .selectExpr("n", "ny",
        "CAST(floor(r_pit * 10000.0) AS BIGINT) AS r_pit_bp",
        "CAST(floor(r_leaky * 10000.0) AS BIGINT) AS r_leaky_bp",
        "CAST(floor((r_leaky - r_pit) * 10000.0) AS BIGINT) AS leakage_delta_bp")
      .withColumn("leakage_flag", $"leakage_delta_bp" > 500L)
  }

  val q360Oracle: String =
    """WITH cutoff AS (SELECT DATE '1998-07-01' AS c),
       feat_pit AS (
         SELECT o_custkey AS c_custkey, CAST(count(*) AS BIGINT) AS pit_orders
         FROM orders, cutoff WHERE CAST(o_orderdate AS DATE) < c
         GROUP BY 1),
       feat_leaky AS (
         SELECT o_custkey AS c_custkey, CAST(count(*) AS BIGINT) AS lk_orders
         FROM orders GROUP BY 1),
       label AS (
         SELECT o_custkey AS c_custkey, CAST(1 AS BIGINT) AS converted
         FROM orders, cutoff
         WHERE CAST(o_orderdate AS DATE) >= c
         GROUP BY 1),
       joined AS (
         SELECT COALESCE(p.pit_orders, 0) AS p, COALESCE(l.lk_orders, 0) AS l,
           COALESCE(lb.converted, 0) AS y
         FROM customer cu
         LEFT JOIN feat_pit p ON cu.c_custkey = p.c_custkey
         LEFT JOIN feat_leaky l ON cu.c_custkey = l.c_custkey
         LEFT JOIN label lb ON cu.c_custkey = lb.c_custkey),
       stats AS (
         SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS ny,
           CAST(sum(p) AS BIGINT) AS sp, CAST(sum(l) AS BIGINT) AS sl,
           CAST(sum(p * y) AS BIGINT) AS spy, CAST(sum(l * y) AS BIGINT) AS sly,
           sum(CAST(p AS HUGEINT) * p) AS spp,
           sum(CAST(l AS HUGEINT) * l) AS sll,
           sum(CAST(y AS HUGEINT) * y) AS syy
         FROM joined),
       corr AS (
         SELECT n, ny,
           (CAST(n AS DOUBLE) * spy - CAST(sp AS DOUBLE) * ny)
           / sqrt((CAST(n AS DOUBLE) * spp - CAST(sp AS DOUBLE) * sp) * (CAST(n AS DOUBLE) * syy - CAST(ny AS DOUBLE) * ny)) AS r_pit,
           (CAST(n AS DOUBLE) * sly - CAST(sl AS DOUBLE) * ny)
           / sqrt((CAST(n AS DOUBLE) * sll - CAST(sl AS DOUBLE) * sl) * (CAST(n AS DOUBLE) * syy - CAST(ny AS DOUBLE) * ny)) AS r_leaky
         FROM stats)
       SELECT n, ny,
         CAST(floor(r_pit * 10000.0) AS BIGINT) AS r_pit_bp,
         CAST(floor(r_leaky * 10000.0) AS BIGINT) AS r_leaky_bp,
         CAST(floor((r_leaky - r_pit) * 10000.0) AS BIGINT) AS leakage_delta_bp,
         CAST(floor((r_leaky - r_pit) * 10000.0) AS BIGINT) > 500 AS leakage_flag
       FROM corr"""

  /** Point-in-time training-set factory (q381): the churn table every
    * retention model trains on, built with the windowing discipline
    * q360 audits — features see ONLY [cutoff−365 d, cutoff), the label
    * only [cutoff, cutoff+180 d), both half-open at the cutoff so an
    * order on cutoff day is label evidence, never a feature.
    * Population: customers active in the feature window (the
    * population a scoring run would actually see at the cutoff).
    * Features are q226's R/F/M (days since last order, order count,
    * spend cents); label churned = 1 iff NO order lands in the label
    * window. Emitted per customer — this op's output IS the training
    * table, not a report.
    *
    * Shape: one orders scan covering both windows → per-customer
    * conditional aggregates; the label is a count-=0 predicate on the
    * same pass, no second scan, no join. At 100 TB this is one
    * partial-agg shuffle on the population key. */
  def q381PitTrainingSet(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = lit("1997-01-01").cast("date")
    val featLo = date_sub(cutoff, 365)
    val labelHi = date_add(cutoff, 180)
    Tables.orders(s, d)
      .filter($"o_orderdate" >= featLo && $"o_orderdate" < labelHi)
      .groupBy($"o_custkey")
      .agg(
        max(when($"o_orderdate" < cutoff, $"o_orderdate")).as("last_d"),
        count(when($"o_orderdate" < cutoff, lit(1))).as("f"),
        sum(when($"o_orderdate" < cutoff,
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
          .otherwise(0L)).as("m_cents"),
        count(when($"o_orderdate" >= cutoff, lit(1))).as("n_label_orders"))
      .filter($"f" > 0)
      .select($"o_custkey",
        datediff(cutoff, $"last_d").cast("long").as("r_days"),
        $"f", $"m_cents",
        ($"n_label_orders" === 0).cast("long").as("churned"))
      .orderBy($"o_custkey")
  }

  val q381Oracle: String =
    """WITH w AS (
         SELECT o_custkey,
           max(CASE WHEN o_orderdate < DATE '1997-01-01' THEN o_orderdate END) AS last_d,
           CAST(count(CASE WHEN o_orderdate < DATE '1997-01-01' THEN 1 END) AS BIGINT) AS f,
           CAST(sum(CASE WHEN o_orderdate < DATE '1997-01-01'
             THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             ELSE 0 END) AS BIGINT) AS m_cents,
           CAST(count(CASE WHEN o_orderdate >= DATE '1997-01-01' THEN 1 END) AS BIGINT) AS n_label
         FROM orders
         WHERE o_orderdate >= DATE '1997-01-01' - INTERVAL 365 DAY
           AND o_orderdate < DATE '1997-01-01' + INTERVAL 180 DAY
         GROUP BY 1)
       SELECT o_custkey,
         CAST(date_diff('day', last_d, DATE '1997-01-01') AS BIGINT) AS r_days,
         f, m_cents,
         CAST(CASE WHEN n_label = 0 THEN 1 ELSE 0 END AS BIGINT) AS churned
       FROM w WHERE f > 0 ORDER BY o_custkey"""

  /** Columnar-encoding advisor (q401): per column of `lineitem`, the
    * exact byte-size model of the three classic parquet encodings —
    * PLAIN (Σ value bytes), DICTIONARY (distinct-value bytes + bit-
    * packed indexes at ceil(log2 ndv) bits/row) and RLE (one
    * (value, 4-byte run length) pair per run in the table's write
    * order (l_orderkey, l_linenumber)) — and the advisor's pick.
    * Strings cost `length(v)` bytes, numerics a fixed 8. This is the
    * planner a 100 TB lakehouse writer consults before rewriting a
    * table: sorted keys → RLE, low-cardinality flags → DICT,
    * near-unique measures → PLAIN (all three appear on lineitem).
    *
    * Scale design: run detection needs a GLOBAL order but never a
    * global sort — one `repartitionByRange` on the write order, ONE
    * per-range-partition window evaluating every column's lag in a
    * single WindowExec, and a bounded (≤ numShufflePartitions rows)
    * per-partition last-row table broadcast back to fix the runs that
    * span a partition boundary (the [[Windows.rangePrefixSum]] offset-
    * table discipline applied to lag instead of sum). The checkpoint
    * pins the range assignment both consumers must agree on. NDV
    * splits by cardinality class (VERDICT r8 #6): bounded-domain
    * columns ride the run-stats pass as map-side-merged collect_sets
    * (their whole domain fits a cell), and only the near-unique
    * columns enter the stacked distinct, which shuffles value
    * DOMAINS, not rows, and lands as a broadcast attachment. */
  def q401EncodingAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cols: Seq[(String, Boolean)] = Seq(
      ("l_orderkey", false), ("l_extendedprice", false),
      ("l_returnflag", true), ("l_linestatus", true),
      ("l_quantity", false), ("l_discount", false), ("l_suppkey", false))
    def bytesOf(c: String, isStr: Boolean): Column =
      if (isStr) length(col(c)).cast("long") else lit(8L)

    val np = s.sessionState.conf.numShufflePartitions
    val ord = Seq($"l_orderkey", $"l_linenumber")
    val part = Tables.lineitem(s, d)
      .select((Seq("l_orderkey", "l_linenumber") ++
        cols.map(_._1).filterNot(_ == "l_orderkey")).map(col): _*)
      .repartitionByRange(np, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()

    // previous partition's LAST row, keyed to the partition it precedes
    val lasts = part.groupBy($"__pid")
      .agg(max_by(struct(cols.map(c => col(c._1)): _*), struct(ord: _*))
        .as("__lastv"))
      .select(($"__pid" + 1).as("__pid"), $"__lastv")

    val w = Window.partitionBy($"__pid").orderBy(ord: _*)
    val withPrev = part.join(broadcast(lasts), Seq("__pid"), "left")
      .withColumn("__rn", row_number().over(w))
    val flagged = cols.foldLeft(withPrev) { case (df, (c, _)) =>
      val prev = when($"__rn" === 1, $"__lastv".getField(c))
        .otherwise(lag(col(c), 1).over(w))
      df.withColumn(s"__b_$c", prev.isNull || prev =!= col(c))
    }

    // bounded-domain columns (flags / small value grids): their whole
    // distinct set fits a collect_set cell, so ndv + distinct-value
    // bytes ride the SAME aggregate pass as the run stats (VERDICT r8
    // #6) — a map-side-merged set per column instead of legs in the
    // stacked-distinct shuffle. Near-unique columns stay in the
    // stacked distinct: their domains ARE the data, no set fits.
    val lowCard = Set("l_returnflag", "l_linestatus", "l_quantity", "l_discount")
    val runAggs = cols.flatMap { case (c, isStr) =>
      val b = bytesOf(c, isStr)
      Seq(
        sum(when(col(s"__b_$c"), 1L).otherwise(0L)).as(s"__runs_$c"),
        sum(b).as(s"__plain_$c"),
        sum(when(col(s"__b_$c"), b + 4).otherwise(0L)).as(s"__rle_$c"))
    } ++ cols.collect { case (c, _) if lowCard(c) =>
      collect_set(col(c)).as(s"__set_$c")
    }
    val flat = flagged.agg(count(lit(1)).as("__n"), runAggs: _*)

    // ndv + distinct-value bytes for the NEAR-UNIQUE columns in ONE
    // distinct pass: stack to (col_name, value-as-string) — string cast
    // is injective for longs/doubles, so distinctness is preserved —
    // then one shuffle over the union of the 3 value DOMAINS, not 3 jobs
    val bigCols = cols.filterNot(c => lowCard(c._1))
    val strCols = cols.filter(_._2).map(_._1)
    val stackArgs = bigCols
      .map { case (c, _) => s"'$c', cast($c as string)" }.mkString(", ")
    // read the already-materialized checkpoint, not parquet again —
    // the second pass re-decoded 7 columns for nothing (−0.5 s warm)
    val ndvStats = part
      .select(expr(s"stack(${bigCols.size}, $stackArgs)").as(Seq("col_name", "__v")))
      .distinct()
      .groupBy($"col_name")
      .agg(count(lit(1)).as("__ndv_big"),
        sum(when($"col_name".isin(strCols: _*), length($"__v").cast("long"))
          .otherwise(8L)).as("__dbytes_big"))

    // unpivot the single stats row with ONE stack — a union of per-
    // column selects would re-evaluate the aggregation per column.
    // Low-card columns emit ndv/dbytes straight from their sets; the
    // near-unique ones emit NULL and pick theirs up from the join.
    val runStack = cols
      .map { case (c, isStr) =>
        val (ndv, db) =
          if (lowCard(c)) {
            val sz = s"size(__set_$c)"
            val bytes =
              if (isStr)
                s"aggregate(__set_$c, 0L, (acc, x) -> acc + length(x))"
              else s"$sz * 8L"
            (s"cast($sz as bigint)", s"cast($bytes as bigint)")
          } else ("cast(null as bigint)", "cast(null as bigint)")
        s"'$c', __runs_$c, __plain_$c, __rle_$c, $ndv, $db"
      }
      .mkString(", ")
    val rows = flat.select($"__n".as("n_rows"),
        expr(s"stack(${cols.size}, $runStack)")
          .as(Seq("col_name", "runs", "plain_bytes", "rle_bytes",
            "__ndv_low", "__dbytes_low")))
      .join(broadcast(ndvStats), Seq("col_name"), "left")
      .withColumn("ndv", coalesce($"__ndv_low", $"__ndv_big"))
      .withColumn("__dbytes", coalesce($"__dbytes_low", $"__dbytes_big"))

    val bits = when($"ndv" <= 1, lit(1)).otherwise(length(bin($"ndv" - 1)))
    rows
      // (n·bits + 7) >> 3 == ceil-div by 8, exact in int64
      .withColumn("dict_bytes",
        $"__dbytes" + shiftright($"n_rows" * bits.cast("long") + 7L, 3))
      .select($"col_name", $"n_rows", $"ndv", $"runs", $"plain_bytes",
        $"dict_bytes", $"rle_bytes")
      .withColumn("enc_pick",
        when($"dict_bytes" <= $"rle_bytes" && $"dict_bytes" <= $"plain_bytes", "dict")
          .when($"rle_bytes" <= $"plain_bytes", "rle").otherwise("plain"))
      .orderBy($"col_name")
  }

  val q401Oracle: String = {
    val cols = Seq(
      ("l_orderkey", false), ("l_extendedprice", false),
      ("l_returnflag", true), ("l_linestatus", true),
      ("l_quantity", false), ("l_discount", false), ("l_suppkey", false))
    val frags = cols.map { case (c, isStr) =>
      val b = if (isStr) s"length($c)" else "8"
      val bv = if (isStr) "length(v)" else "8"
      s"""SELECT '$c' AS col_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT $c FROM lineitem)) AS ndv,
           CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS runs,
           CAST(sum(bts) AS BIGINT) AS plain_bytes,
           (SELECT CAST(sum($bv) AS BIGINT) FROM (SELECT DISTINCT $c AS v FROM lineitem))
             + (CAST(count(*) AS BIGINT) * (CASE WHEN (SELECT count(*) FROM (SELECT DISTINCT $c FROM lineitem)) <= 1 THEN 1
                  ELSE length(bin((SELECT CAST(count(*) AS BIGINT) FROM (SELECT DISTINCT $c FROM lineitem)) - 1)) END) + 7) // 8 AS dict_bytes,
           CAST(sum(CASE WHEN is_b THEN bts + 4 ELSE 0 END) AS BIGINT) AS rle_bytes
         FROM (
           SELECT $b AS bts,
                  (lag($c) OVER w IS NULL OR lag($c) OVER w <> $c) AS is_b
           FROM lineitem
           WINDOW w AS (ORDER BY l_orderkey, l_linenumber))"""
    }
    s"""SELECT col_name, n_rows, ndv, runs, plain_bytes, dict_bytes, rle_bytes,
         CASE WHEN dict_bytes <= rle_bytes AND dict_bytes <= plain_bytes THEN 'dict'
              WHEN rle_bytes <= plain_bytes THEN 'rle' ELSE 'plain' END AS enc_pick
       FROM (${frags.mkString("\nUNION ALL\n")})
       ORDER BY col_name"""
  }

  /** Materialized-view selection under a storage budget (q416, the
    * classic view-advisor greedy of Harinarayan/Agrawal/Ullman '96 on
    * a measured lattice slice): five candidate rollup views over
    * lineitem, each sized EXACTLY (distinct group count, all five from
    * ONE multi-distinct aggregate pass), weighted by a fixed workload
    * (queries/day the view would serve). Benefit = rows the workload
    * stops scanning = (fact_rows − view_rows)·weight; the greedy picks
    * by benefit density (benefit per stored row) under a budget of 30%
    * of fact rows, via a prefix sum over the 5-row candidate relation.
    * Deterministic: exact counts, integer density, lex tie-break.
    *
    * Scale: ONE pass over the fact table (Spark's expand-based
    * multi-distinct — 5× row fan-out into one shuffle, each leg
    * partially aggregated map-side); everything downstream is a 5-row
    * relation, so the knapsack window is bounded by the candidate
    * list, not the data. */
  def q416ViewAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = Tables.lineitem(s, d).agg(
      count(lit(1)).as("fact_rows"),
      countDistinct(concat_ws("|", $"l_returnflag", $"l_linestatus"))
        .as("v_flag_status"),
      countDistinct($"l_partkey").as("v_part"),
      countDistinct($"l_suppkey").as("v_supp"),
      countDistinct($"l_orderkey").as("v_order"),
      countDistinct($"l_shipdate").as("v_shipdate"))
    val cand = m.select($"fact_rows", explode(array(
        struct(lit("flag_status").as("view"), $"v_flag_status".as("view_rows"), lit(30L).as("weight")),
        struct(lit("shipdate").as("view"), $"v_shipdate".as("view_rows"), lit(20L).as("weight")),
        struct(lit("part").as("view"), $"v_part".as("view_rows"), lit(15L).as("weight")),
        struct(lit("supp").as("view"), $"v_supp".as("view_rows"), lit(10L).as("weight")),
        struct(lit("order").as("view"), $"v_order".as("view_rows"), lit(5L).as("weight")))).as("x"))
      .select($"fact_rows", $"x.view".as("view"), $"x.view_rows", $"x.weight",
        (($"fact_rows" - $"x.view_rows") * $"x.weight").as("benefit"))
      .withColumn("density_milli",
        expr("benefit * 1000 div greatest(view_rows, 1)"))
    val ranked = cand.withColumn("rows_cum",
      sum($"view_rows").over(Window.orderBy($"density_milli".desc, $"view")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranked.select($"view", $"view_rows", $"weight", $"benefit",
        $"density_milli", $"rows_cum",
        ($"rows_cum" <= expr("fact_rows * 3 div 10")).cast("long").as("selected"))
      .orderBy($"density_milli".desc, $"view")
  }

  val q416Oracle: String =
    """WITH m AS (
         SELECT CAST(count(*) AS BIGINT) AS fact_rows,
                CAST(count(DISTINCT l_returnflag || '|' || l_linestatus) AS BIGINT) AS v_flag_status,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS v_part,
                CAST(count(DISTINCT l_suppkey) AS BIGINT) AS v_supp,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS v_order,
                CAST(count(DISTINCT l_shipdate) AS BIGINT) AS v_shipdate
         FROM lineitem),
       cand AS (
         SELECT fact_rows, 'flag_status' AS "view", v_flag_status AS view_rows, CAST(30 AS BIGINT) AS weight FROM m
         UNION ALL SELECT fact_rows, 'shipdate', v_shipdate, 20 FROM m
         UNION ALL SELECT fact_rows, 'part', v_part, 15 FROM m
         UNION ALL SELECT fact_rows, 'supp', v_supp, 10 FROM m
         UNION ALL SELECT fact_rows, 'order', v_order, 5 FROM m),
       c2 AS (
         SELECT "view", view_rows, weight, fact_rows,
                (fact_rows - view_rows) * weight AS benefit,
                (fact_rows - view_rows) * weight * 1000 // greatest(view_rows, 1) AS density_milli
         FROM cand),
       ranked AS (
         SELECT *, CAST(sum(view_rows) OVER (ORDER BY density_milli DESC, "view"
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rows_cum
         FROM c2)
       SELECT "view", view_rows, weight, benefit, density_milli, rows_cum,
              CASE WHEN rows_cum <= fact_rows * 3 // 10 THEN 1 ELSE 0 END AS selected
       FROM ranked ORDER BY density_milli DESC, "view""""

  /** Join-cardinality estimation audit (q417, the Leis et al. "How Good
    * Are Query Optimizers, Really?" experiment in-engine): for three
    * filtered lineitem⋈orders joins, compare the textbook independence
    * estimate |σ_A|·|σ_B| / max(ndv_A(k), ndv_B(k)) against the TRUE
    * cardinality, reporting the q-error. The three predicate pairs are
    * graded by correlation — quantity×price (independent), shipdate×
    * status (correlated through order date), returnflag×status
    * (strongly correlated) — so the audit shows exactly where the
    * uniformity assumption collapses and a sampling-based estimator
    * would be needed.
    *
    * Scale: the filtered counts AND filtered join-key NDVs for all
    * three predicates come from ONE aggregate pass per side
    * (conditional count-distincts); the true cardinalities share ONE
    * orderkey-shuffled join pass with conditional sums — adding a
    * predicate pair adds columns, never passes. */
  def q417JoinCardAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d).select($"l_orderkey",
      ($"l_quantity" < 10).as("la"),
      ($"l_shipdate" < to_date(lit("1994-01-01"))).as("lb"),
      ($"l_returnflag" === "R").as("lc"))
    val or = Tables.orders(s, d).select($"o_orderkey",
      ($"o_totalprice" > 100000.0).as("oa"),
      ($"o_orderstatus" === "F").as("ob"),
      ($"o_orderstatus" === "F").as("oc"))
    def sideAgg(df: DataFrame, key: String, flags: Seq[String]) =
      df.agg(
        sum(when(col(flags(0)), 1L).otherwise(0L)).as(s"cnt_a"),
        countDistinct(when(col(flags(0)), col(key))).as(s"ndv_a"),
        sum(when(col(flags(1)), 1L).otherwise(0L)).as(s"cnt_b"),
        countDistinct(when(col(flags(1)), col(key))).as(s"ndv_b"),
        sum(when(col(flags(2)), 1L).otherwise(0L)).as(s"cnt_c"),
        countDistinct(when(col(flags(2)), col(key))).as(s"ndv_c"))
    val lm = sideAgg(li, "l_orderkey", Seq("la", "lb", "lc"))
      .select($"cnt_a".as("l_cnt_a"), $"ndv_a".as("l_ndv_a"),
        $"cnt_b".as("l_cnt_b"), $"ndv_b".as("l_ndv_b"),
        $"cnt_c".as("l_cnt_c"), $"ndv_c".as("l_ndv_c"))
    val om = sideAgg(or, "o_orderkey", Seq("oa", "ob", "oc"))
      .select($"cnt_a".as("o_cnt_a"), $"ndv_a".as("o_ndv_a"),
        $"cnt_b".as("o_cnt_b"), $"ndv_b".as("o_ndv_b"),
        $"cnt_c".as("o_cnt_c"), $"ndv_c".as("o_ndv_c"))
    val actual = li.join(or, $"l_orderkey" === $"o_orderkey")
      .agg(sum(when($"la" && $"oa", 1L).otherwise(0L)).as("act_a"),
        sum(when($"lb" && $"ob", 1L).otherwise(0L)).as("act_b"),
        sum(when($"lc" && $"oc", 1L).otherwise(0L)).as("act_c"))
    val wide = lm.crossJoin(broadcast(om)).crossJoin(broadcast(actual))
    wide.select(explode(array(
        struct(lit("a_qty_price").as("pair"),
          $"l_cnt_a".as("cnt_l"), $"o_cnt_a".as("cnt_o"),
          $"l_ndv_a".as("ndv_l"), $"o_ndv_a".as("ndv_o"),
          expr("l_cnt_a * o_cnt_a div greatest(greatest(l_ndv_a, o_ndv_a), 1)").as("est"),
          $"act_a".as("actual")),
        struct(lit("b_ship_status").as("pair"),
          $"l_cnt_b".as("cnt_l"), $"o_cnt_b".as("cnt_o"),
          $"l_ndv_b".as("ndv_l"), $"o_ndv_b".as("ndv_o"),
          expr("l_cnt_b * o_cnt_b div greatest(greatest(l_ndv_b, o_ndv_b), 1)").as("est"),
          $"act_b".as("actual")),
        struct(lit("c_flag_status").as("pair"),
          $"l_cnt_c".as("cnt_l"), $"o_cnt_c".as("cnt_o"),
          $"l_ndv_c".as("ndv_l"), $"o_ndv_c".as("ndv_o"),
          expr("l_cnt_c * o_cnt_c div greatest(greatest(l_ndv_c, o_ndv_c), 1)").as("est"),
          $"act_c".as("actual")))).as("x"))
      .select($"x.pair".as("pair"), $"x.cnt_l", $"x.cnt_o", $"x.ndv_l",
        $"x.ndv_o", $"x.est", $"x.actual",
        expr("greatest(x.est, x.actual) * 1000 div greatest(least(x.est, x.actual), 1)")
          .as("qerr_milli"))
      .orderBy($"pair")
  }

  val q417Oracle: String =
    """WITH lm AS (
         SELECT CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS l_cnt_a,
                CAST(count(DISTINCT CASE WHEN l_quantity < 10 THEN l_orderkey END) AS BIGINT) AS l_ndv_a,
                CAST(sum(CASE WHEN l_shipdate < DATE '1994-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS l_cnt_b,
                CAST(count(DISTINCT CASE WHEN l_shipdate < DATE '1994-01-01' THEN l_orderkey END) AS BIGINT) AS l_ndv_b,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS l_cnt_c,
                CAST(count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS BIGINT) AS l_ndv_c
         FROM lineitem),
       om AS (
         SELECT CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt_a,
                CAST(count(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_orderkey END) AS BIGINT) AS o_ndv_a,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt_b,
                CAST(count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS BIGINT) AS o_ndv_b,
                CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt_c,
                CAST(count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_orderkey END) AS BIGINT) AS o_ndv_c
         FROM orders),
       act AS (
         SELECT CAST(sum(CASE WHEN l.l_quantity < 10 AND o.o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS act_a,
                CAST(sum(CASE WHEN l.l_shipdate < DATE '1994-01-01' AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS act_b,
                CAST(sum(CASE WHEN l.l_returnflag = 'R' AND o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS act_c
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       rows_ AS (
         SELECT 'a_qty_price' AS pair, l_cnt_a AS cnt_l, o_cnt_a AS cnt_o,
                l_ndv_a AS ndv_l, o_ndv_a AS ndv_o,
                l_cnt_a * o_cnt_a // greatest(greatest(l_ndv_a, o_ndv_a), 1) AS est,
                act_a AS actual
         FROM lm, om, act
         UNION ALL
         SELECT 'b_ship_status', l_cnt_b, o_cnt_b, l_ndv_b, o_ndv_b,
                l_cnt_b * o_cnt_b // greatest(greatest(l_ndv_b, o_ndv_b), 1), act_b
         FROM lm, om, act
         UNION ALL
         SELECT 'c_flag_status', l_cnt_c, o_cnt_c, l_ndv_c, o_ndv_c,
                l_cnt_c * o_cnt_c // greatest(greatest(l_ndv_c, o_ndv_c), 1), act_c
         FROM lm, om, act)
       SELECT pair, cnt_l, cnt_o, ndv_l, ndv_o, est, actual,
              greatest(est, actual) * 1000 // greatest(least(est, actual), 1) AS qerr_milli
       FROM rows_ ORDER BY pair"""

  /** LSM compaction-policy planner (q415, the Dayan–Idreos
    * leveled-vs-tiered trade measured on this corpus): with flush size
    * 4096 bytes and size ratio F ∈ {4, 8, 16}, the tree needs the
    * smallest L with flush·F^L ≥ corpus bytes; then the standard
    * asymptotics — leveled write-amp ≈ L·(F+1)/2 (each byte rewritten
    * ~(F+1)/2 times per level), tiered write-amp = L (one rewrite per
    * level), point-read amp L vs L·F sorted runs, space overhead ~1/F
    * vs ~100% — fall out as exact integers (write-amp carried ×2 to
    * stay integral). The table a storage engine reads to pick a policy
    * per workload: leveled for read-heavy, tiered for ingest-heavy.
    *
    * Scale: corpus bytes is ONE aggregate scalar; the (F, L, F^L)
    * lattice is a 36-row literal grid on both engines, so everything
    * after the scan is constant-sized. */
  def q415LsmPlanner(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val total = Tables.documents(s, d).agg(sum($"n_chars").as("total_bytes"))
    val grid = (for { f <- Seq(4L, 8L, 16L); l <- 1L to 12L }
      yield (f, l, 4096L * math.pow(f.toDouble, l.toDouble).toLong))
      .toDF("f", "l", "cap")
    grid.crossJoin(broadcast(total))
      .filter($"cap" >= $"total_bytes")
      .groupBy($"f")
      .agg(min($"l").as("levels"), max($"total_bytes").as("total_bytes"))
      .select($"f", $"total_bytes", $"levels",
        ($"levels" * ($"f" + 1)).as("wa_leveled_x2"),
        $"levels".as("wa_tiered"),
        $"levels".as("ra_leveled_runs"),
        ($"levels" * $"f").as("ra_tiered_runs"),
        expr("10000 div f").as("space_over_leveled_bp"),
        lit(10000L).as("space_over_tiered_bp"))
      .orderBy($"f")
  }

  val q415Oracle: String = {
    val rows = (for { f <- Seq(4L, 8L, 16L); l <- 1L to 12L }
      yield s"($f, $l, ${4096L * math.pow(f.toDouble, l.toDouble).toLong})")
      .mkString(", ")
    s"""WITH total AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total_bytes FROM documents),
       grid AS (SELECT CAST(f AS BIGINT) AS f, CAST(l AS BIGINT) AS l, CAST(cap AS BIGINT) AS cap
                FROM (VALUES $rows) AS v(f, l, cap)),
       fit AS (
         SELECT f, min(l) AS levels, max(total_bytes) AS total_bytes
         FROM grid, total WHERE cap >= total_bytes GROUP BY 1)
       SELECT f, total_bytes, levels,
              levels * (f + 1) AS wa_leveled_x2,
              levels AS wa_tiered,
              levels AS ra_leveled_runs,
              levels * f AS ra_tiered_runs,
              10000 // f AS space_over_leveled_bp,
              CAST(10000 AS BIGINT) AS space_over_tiered_bp
       FROM fit ORDER BY f"""
  }

  /** Short-circuit predicate-ordering advisor (q425, q417's sibling:
    * there the join estimate, here the filter EVALUATION order): for
    * the three lineitem predicates (quantity, shipdate, returnflag), a
    * short-circuiting conjunction evaluates predicate 2 only on rows
    * that passed predicate 1, so the evaluation cost in
    * predicate-evaluations is n + n·sel(first) + n·sel(first∧second) —
    * dependent on the TRUE joint selectivities, not the marginals. One
    * aggregate pass measures all marginal and pairwise counts; the six
    * orders become a literal explode, each with its exact cost, rank,
    * and regret vs the best order in bp. The correlated pair (shipdate,
    * flag 'R' — returns happen on old orders) is exactly where a
    * marginals-only optimizer picks the wrong order.
    *
    * Scale: ONE scan, one 1-row aggregate (7 conditional sums); the
    * order lattice is 6 literal rows and its ranking window is bounded
    * by the lattice, not the data. */
  def q425PredicateOrder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p1 = $"l_quantity" < 10
    val p2 = $"l_shipdate" < to_date(lit("1994-01-01"))
    val p3 = $"l_returnflag" === "R"
    val m = Tables.lineitem(s, d).agg(
      count(lit(1)).as("n"),
      sum(when(p1, 1L).otherwise(0L)).as("s1"),
      sum(when(p2, 1L).otherwise(0L)).as("s2"),
      sum(when(p3, 1L).otherwise(0L)).as("s3"),
      sum(when(p1 && p2, 1L).otherwise(0L)).as("s12"),
      sum(when(p1 && p3, 1L).otherwise(0L)).as("s13"),
      sum(when(p2 && p3, 1L).otherwise(0L)).as("s23"))
    val orders = m.select(explode(array(
        struct(lit("qty,ship,flag").as("ord"), ($"n" + $"s1" + $"s12").as("cost")),
        struct(lit("qty,flag,ship").as("ord"), ($"n" + $"s1" + $"s13").as("cost")),
        struct(lit("ship,qty,flag").as("ord"), ($"n" + $"s2" + $"s12").as("cost")),
        struct(lit("ship,flag,qty").as("ord"), ($"n" + $"s2" + $"s23").as("cost")),
        struct(lit("flag,qty,ship").as("ord"), ($"n" + $"s3" + $"s13").as("cost")),
        struct(lit("flag,ship,qty").as("ord"), ($"n" + $"s3" + $"s23").as("cost")))).as("x"))
      .select($"x.ord".as("ord"), $"x.cost".as("cost"))
    orders
      .withColumn("rank", row_number().over(Window.orderBy($"cost", $"ord")))
      .crossJoin(broadcast(orders.agg(min($"cost").as("best"))))
      .select($"ord", $"cost", $"rank",
        expr("(cost - best) * 10000 div best").as("regret_bp"))
      .orderBy($"rank")
  }

  val q425Oracle: String =
    """WITH m AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                CAST(sum(CASE WHEN l_shipdate < DATE '1994-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS s2,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS s3,
                CAST(sum(CASE WHEN l_quantity < 10 AND l_shipdate < DATE '1994-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS s12,
                CAST(sum(CASE WHEN l_quantity < 10 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS s13,
                CAST(sum(CASE WHEN l_shipdate < DATE '1994-01-01' AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS s23
         FROM lineitem),
       orders_ AS (
         SELECT 'qty,ship,flag' AS ord, n + s1 + s12 AS cost FROM m
         UNION ALL SELECT 'qty,flag,ship', n + s1 + s13 FROM m
         UNION ALL SELECT 'ship,qty,flag', n + s2 + s12 FROM m
         UNION ALL SELECT 'ship,flag,qty', n + s2 + s23 FROM m
         UNION ALL SELECT 'flag,qty,ship', n + s3 + s13 FROM m
         UNION ALL SELECT 'flag,ship,qty', n + s3 + s23 FROM m),
       best AS (SELECT min(cost) AS best FROM orders_)
       SELECT ord, cost,
              CAST(row_number() OVER (ORDER BY cost, ord) AS BIGINT) AS rank,
              (cost - best) * 10000 // best AS regret_bp
       FROM orders_, best ORDER BY rank"""

  /** Runtime-filter ROI audit (q426): when a selective dimension
    * predicate (one order-month) sits on the build side of
    * lineitem⋈orders, a runtime filter (semi-join pushdown / Bloom on
    * l_orderkey) can skip probe rows BEFORE the shuffle. One pass
    * measures the true reduction — probe rows, build keys, surviving
    * probe rows — and models what a Bloom filter at 8 vs 16 bits/key
    * would actually ship: survivors plus false-positive leakage at the
    * standard fpp for k-optimal Blooms (21400 ppm at 8 b/k, 460 ppm at
    * 16 b/k — literal constants on both engines, no float pow). The
    * exact-filter row is the upper bound a perfect semi-join reaches.
    *
    * Scale: the truth is ONE left-semi-shaped join measured as a
    * conditional sum on the existing orderkey join; the Bloom model is
    * arithmetic on the 1-row aggregate — the audit costs one pass and
    * answers "is spark.sql.optimizer.runtimeFilter worth enabling for
    * this shape". */
  def q426RuntimeFilterRoi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sel = $"o_orderdate" >= to_date(lit("1994-03-01")) &&
      $"o_orderdate" < to_date(lit("1994-04-01"))
    val build = Tables.orders(s, d)
      .agg(count(lit(1)).as("orders_rows"),
        sum(when(sel, 1L).otherwise(0L)).as("build_keys"))
    val joined = Tables.lineitem(s, d).select($"l_orderkey")
      .join(Tables.orders(s, d).select($"o_orderkey", sel.as("hit")),
        $"l_orderkey" === $"o_orderkey")
      .agg(count(lit(1)).as("probe_rows"),
        sum(when($"hit", 1L).otherwise(0L)).as("survivors"))
    val m = joined.crossJoin(broadcast(build))
    m.select(explode(array(
        struct(lit("exact_semijoin").as("filter"), lit(0L).as("fpp_ppm")),
        struct(lit("bloom_8bpk").as("filter"), lit(21400L).as("fpp_ppm")),
        struct(lit("bloom_16bpk").as("filter"), lit(460L).as("fpp_ppm")))).as("x"),
        $"probe_rows", $"survivors", $"build_keys")
      .select($"x.filter".as("filter"), $"probe_rows", $"build_keys",
        $"survivors", $"x.fpp_ppm".as("fpp_ppm"),
        ($"survivors" +
          expr("(probe_rows - survivors) * x.fpp_ppm div 1000000")).as("rows_shipped"),
        expr("""(probe_rows - (survivors +
                 (probe_rows - survivors) * x.fpp_ppm div 1000000)) * 10000
                div probe_rows""").as("reduction_bp"))
      .orderBy($"filter")
  }

  val q426Oracle: String =
    """WITH build AS (
         SELECT CAST(count(*) AS BIGINT) AS orders_rows,
                CAST(sum(CASE WHEN o_orderdate >= DATE '1994-03-01'
                               AND o_orderdate < DATE '1994-04-01'
                              THEN 1 ELSE 0 END) AS BIGINT) AS build_keys
         FROM orders),
       joined AS (
         SELECT CAST(count(*) AS BIGINT) AS probe_rows,
                CAST(sum(CASE WHEN o.o_orderdate >= DATE '1994-03-01'
                               AND o.o_orderdate < DATE '1994-04-01'
                              THEN 1 ELSE 0 END) AS BIGINT) AS survivors
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       grid AS (
         SELECT 'exact_semijoin' AS filter, CAST(0 AS BIGINT) AS fpp_ppm
         UNION ALL SELECT 'bloom_8bpk', 21400
         UNION ALL SELECT 'bloom_16bpk', 460),
       m AS (SELECT * FROM joined, build, grid)
       SELECT filter, probe_rows, build_keys, survivors, fpp_ppm,
              survivors + (probe_rows - survivors) * fpp_ppm // 1000000 AS rows_shipped,
              (probe_rows - (survivors + (probe_rows - survivors) * fpp_ppm // 1000000)) * 10000
                // probe_rows AS reduction_bp
       FROM m ORDER BY filter"""

  /** Range-boundary sampling audit (q437, the RangePartitioner
    * question: "are split points computed from a sample good
    * enough?"): compute 8-way range split boundaries of the
    * order-price distribution twice — from the FULL data (exact
    * distributed ntile) and from a deterministic 10% id-sample — then
    * assign every row under each boundary set and compare the
    * resulting shard balance against hash sharding. Reports per
    * scheme the max-shard skew in bp, plus the mean absolute boundary
    * drift (cents) the sample introduced. The answer a shuffle
    * implementation banks on: sampled boundaries land within a few
    * percent of exact at a fraction of the cost, and both range
    * schemes match hash's balance while preserving order.
    *
    * Scale: boundaries come from the distributed exact-ntile engine
    * (range repartition + offset table), each reduced to a 7-VALUE
    * ARRAY — a split-point table is grid-sized by construction
    * (nTiles−1 entries, independent of fact size), so it is fetched to
    * the driver (the q490 measured-count-literal pattern) and inlined:
    * assignment is then a per-row HOF against two literal arrays, and
    * the boundary drift is driver arithmetic on 2×7 longs. All three
    * scheme aggregations ride ONE fact scan — each row explodes to its
    * 3 (scheme, shard) pairs, one map-side-combined groupBy covers the
    * 24 cells, and a second tiny agg reduces per scheme (r12's q494
    * fusion idiom; the first cut ran 3 separate skew subtrees + a
    * drift branch over crossJoined broadcast boundary relations —
    * 33 jobs and 3.0 s at sf0.1 for the same answer; this shape is
    * ~12 jobs and ~1.2 s). */
  def q437RangeSampleAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = Tables.orders(s, d).select($"o_orderkey",
      ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("v"))
    // Both populations' 7 split points from the selection engine (r14):
    // a tile max is the value at a POSITION — identical under any
    // tie-break — so the old range exchange + dual prefix-sum windows
    // (the 0.59 s + 0.55 s floor named in BENCH_NOTES r14) are replaced
    // by log_B(range) scan+histogram passes; ONE scan per level serves
    // full AND sample via conditional cells
    val tb = Windows.tileBoundaries(cents, $"v",
      Seq(("f", lit(1L)), ("s", (pmod($"o_orderkey", lit(10L)) === 0).cast("long"))), 8)
    val bFull = tb.bounds("f").take(7)
    val bSamp = tb.bounds("s").take(7)
    val driftCents = bFull.zip(bSamp).map { case (a, b) => math.abs(a - b) }.sum / 7
    def shardOf(bs: Array[Long]) =
      size(filter(typedLit(bs.toSeq), b => $"v" > b)).cast("long")
    // assignment pass as 24 conditional sums in ONE partial-agg map —
    // no 3× explode, no (scheme, shard) exchange (r14 A/B: 0.69 →
    // 0.31 s); the 24-cell matrix unstacks to the 3 scheme rows as
    // literal-array arithmetic on a single row
    val wide = cents.select(shardOf(bFull).as("sf"), shardOf(bSamp).as("ss"),
      (hash60($"o_orderkey".cast("string")) % 8).as("sh"))
    val cellAggs = (0 until 8).flatMap(i => Seq(
      sum(when($"sf" === i, 1L).otherwise(0L)).as(s"f$i"),
      sum(when($"ss" === i, 1L).otherwise(0L)).as(s"s$i"),
      sum(when($"sh" === i, 1L).otherwise(0L)).as(s"h$i")))
    def cells(p: String) = s"array(${(0 until 8).map(i => s"$p$i").mkString(",")})"
    wide.agg(cellAggs.head, cellAggs.tail: _*)
      .select(expr(
        s"""stack(3, 'range_full', ${cells("f")},
                     'range_sampled', ${cells("s")},
                     'hash', ${cells("h")})""").as(Seq("scheme", "cs")))
      .select($"scheme",
        expr("aggregate(cs, 0L, (a, x) -> a + x)").as("n_rows"),
        expr("array_max(cs)").as("max_shard"))
      .select($"scheme", $"n_rows", $"max_shard",
        expr("max_shard * 8 * 10000 div n_rows").as("skew_bp"),
        when($"scheme" === "range_full", lit(0L))
          .when($"scheme" === "range_sampled", lit(driftCents))
          .otherwise(lit(-1L)).as("boundary_drift_cents"))
      .orderBy($"scheme")
  }

  val q437Oracle: String =
    """WITH cents AS (
         SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         FROM orders),
       bf AS (
         SELECT list_sort(list(b)) AS bs FROM (
           SELECT max(v) AS b FROM (
             SELECT v, ntile(8) OVER (ORDER BY v, o_orderkey) AS tile FROM cents)
           WHERE tile < 8 GROUP BY tile)),
       bs AS (
         SELECT list_sort(list(b)) AS bs FROM (
           SELECT max(v) AS b FROM (
             SELECT v, ntile(8) OVER (ORDER BY v, o_orderkey) AS tile FROM cents
             WHERE o_orderkey % 10 = 0)
           WHERE tile < 8 GROUP BY tile)),
       assigned AS (
         SELECT CAST(len(list_filter(bf.bs, b -> v > b)) AS BIGINT) AS sh_full,
                CAST(len(list_filter(bs.bs, b -> v > b)) AS BIGINT) AS sh_samp,
                ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 8 AS sh_hash
         FROM cents, bf, bs),
       drift AS (
         SELECT CAST(list_sum(list_transform(generate_series(1, 7),
                  i -> abs(bf.bs[i] - bs.bs[i]))) AS BIGINT) // 7 AS drift_cents
         FROM bf, bs),
       s_full AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_shard FROM
                    (SELECT sh_full, CAST(count(*) AS BIGINT) AS cnt FROM assigned GROUP BY 1)),
       s_samp AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_shard FROM
                    (SELECT sh_samp, CAST(count(*) AS BIGINT) AS cnt FROM assigned GROUP BY 1)),
       s_hash AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_shard FROM
                    (SELECT sh_hash, CAST(count(*) AS BIGINT) AS cnt FROM assigned GROUP BY 1))
       SELECT 'hash' AS scheme, n_rows, max_shard,
              max_shard * 8 * 10000 // n_rows AS skew_bp,
              CAST(-1 AS BIGINT) AS boundary_drift_cents
       FROM s_hash
       UNION ALL
       SELECT 'range_full', n_rows, max_shard, max_shard * 8 * 10000 // n_rows, 0
       FROM s_full
       UNION ALL
       SELECT 'range_sampled', n_rows, max_shard, max_shard * 8 * 10000 // n_rows, drift_cents
       FROM s_samp, drift
       ORDER BY scheme"""

  /** AQE skew-split simulator (q443): for each candidate shuffle key
    * of lineitem (orderkey / suppkey / partkey), hash the rows into 32
    * partitions exactly as an exchange would, then replay Spark's AQE
    * skew-join mitigation — a partition larger than 5× the median
    * splits into ⌈size/median⌉ tasks — and report the before/after
    * task table: skew ratio, split count, and the max-task speedup.
    * This is the planner that says WHICH key needs salting before the
    * job runs (orderkey's multi-line orders vs suppkey's uniform
    * spread behave very differently under the same data).
    *
    * Determinism: partition assignment uses the engine's shared 60-bit
    * md5 primitive (`Fns.hash60`) so both engines bucket identically;
    * medians are exact lower-median rank lookups over the ≤32-row
    * per-key partition table. Scale: ONE fact pass fans each row into
    * the 3 key buckets (stack) and reduces straight to (key, pid)
    * counts — everything after is arithmetic on ≤96 rows. */
  def q443SkewSplitSim(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val keys = Seq("orderkey" -> "l_orderkey", "suppkey" -> "l_suppkey",
      "partkey" -> "l_partkey")
    // native codegen'd md5-prefix (r14): the conv/substr/md5 string
    // tree paid 4 string round-trips per hash and dominated this query
    // (1.64 s of 2.09 — BENCH_NOTES r14); bits identical
    def bucket(c: String): String =
      s"md5_prefix(CAST($c AS STRING), 15) % 32"
    val stackArgs = keys
      .map { case (n, c) => s"'$n', ${bucket(c)}" }.mkString(", ")
    val parts = Tables.lineitem(s, d)
      .select(expr(s"stack(${keys.size}, $stackArgs)").as(Seq("key_name", "pid")))
      .groupBy($"key_name", $"pid").agg(count(lit(1)).as("rows"))
    val wk = Window.partitionBy($"key_name")
    val ranked = parts
      .withColumn("rn", row_number().over(
        wk.orderBy($"rows", $"pid")))
      .withColumn("np", count(lit(1)).over(wk))
    val stats = ranked.groupBy($"key_name")
      .agg(max($"np").as("n_parts"), sum($"rows").as("total_rows"),
        max($"rows").as("max_rows"),
        greatest(max(when($"rn" === expr("(np + 1) div 2"), $"rows")), lit(1L))
          .as("med_rows"))
    parts.join(broadcast(stats), "key_name")
      .withColumn("splits",
        when($"rows" > $"med_rows" * 5, expr("(rows + med_rows - 1) div med_rows"))
          .otherwise(lit(1L)))
      .withColumn("chunk", expr("(rows + splits - 1) div splits"))
      .groupBy($"key_name", $"n_parts", $"total_rows", $"max_rows", $"med_rows")
      .agg(sum(when($"splits" > 1, 1L).otherwise(0L)).as("n_skewed"),
        sum($"splits").as("tasks_after"), max($"chunk").as("max_after"))
      .select($"key_name", $"n_parts", $"total_rows", $"max_rows", $"med_rows",
        expr("max_rows * 1000 div med_rows").as("skew_milli"),
        $"n_skewed", $"tasks_after", $"max_after",
        expr("max_rows * 1000 div max_after").as("speedup_milli"))
      .orderBy($"key_name")
  }

  val q443Oracle: String = {
    def bucket(c: String): String =
      s"('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 15))::BIGINT % 32"
    s"""WITH parts AS (
         SELECT key_name, pid, CAST(count(*) AS BIGINT) AS rows_
         FROM (
           SELECT 'orderkey' AS key_name, ${bucket("l_orderkey")} AS pid FROM lineitem
           UNION ALL
           SELECT 'suppkey', ${bucket("l_suppkey")} FROM lineitem
           UNION ALL
           SELECT 'partkey', ${bucket("l_partkey")} FROM lineitem)
         GROUP BY 1, 2),
       ranked AS (
         SELECT key_name, pid, rows_,
                row_number() OVER (PARTITION BY key_name ORDER BY rows_, pid) AS rn,
                CAST(count(*) OVER (PARTITION BY key_name) AS BIGINT) AS np
         FROM parts),
       stats AS (
         SELECT key_name, max(np) AS n_parts, CAST(sum(rows_) AS BIGINT) AS total_rows,
                max(rows_) AS max_rows,
                greatest(max(CASE WHEN rn = (np + 1) // 2 THEN rows_ END), 1) AS med_rows
         FROM ranked GROUP BY 1),
       split AS (
         SELECT p.key_name, s.n_parts, s.total_rows, s.max_rows, s.med_rows,
                CASE WHEN p.rows_ > s.med_rows * 5
                     THEN (p.rows_ + s.med_rows - 1) // s.med_rows ELSE 1 END AS splits,
                p.rows_ AS rows_
         FROM parts p JOIN stats s ON p.key_name = s.key_name)
       SELECT key_name, n_parts, total_rows, max_rows, med_rows,
              max_rows * 1000 // med_rows AS skew_milli,
              CAST(sum(CASE WHEN splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_skewed,
              CAST(sum(splits) AS BIGINT) AS tasks_after,
              CAST(max((rows_ + splits - 1) // splits) AS BIGINT) AS max_after,
              max_rows * 1000 // CAST(max((rows_ + splits - 1) // splits) AS BIGINT) AS speedup_milli
       FROM split
       GROUP BY 1, 2, 3, 4, 5 ORDER BY key_name"""
  }

  /** Predicate-independence / q-error audit (q450, the measurement at
    * the heart of "How Good Are Query Optimizers?" [Leis et al., VLDB
    * 2015]): for every pair of four canonical lineitem predicates,
    * compare the optimizer's independence estimate sel(A)·sel(B)
    * against the TRUE conjunctive selectivity, as the q-error
    * max(est,act)/min(est,act) — the factor by which a cost model
    * misjudges every join fed by that conjunction. Correlated pairs
    * (flag × date — returns concentrate in shipped history) blow up;
    * independent pairs sit at 1.0.
    *
    * Determinism/scale: ONE scan computes all four flag counts and
    * all six pair counts as conditional sums; the q-error compares
    * cA·cB against cAB·n cross-multiplied in decimal(38,0) (counts
    * are data-sized; int64 products wrap at corpus scale — q423
    * rule). Output is the 6-row pair table. */
  def q450SelectivityAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flags = Seq(
      "qty25" -> "l_quantity >= 25",
      "disc5" -> "l_discount >= 0.05",
      "flagR" -> "l_returnflag = 'R'",
      "ship95" -> "l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'")
    val fl = Tables.lineitem(s, d).select(
      flags.map { case (n, p) => expr(p).cast("long").as(n) }: _*)
    val pairs = flags.map(_._1).combinations(2).map(c => (c(0), c(1))).toSeq
    val aggs = flags.map { case (n, _) => sum(col(n)).as(s"__c_$n") } ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"__c_${a}_$b") }
    val flat = fl.groupBy().agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = pairs.map { case (a, b) =>
      s"'${a}x$b', __c_$a, __c_$b, __c_${a}_$b"
    }.mkString(", ")
    flat.select($"n", expr(s"stack(${pairs.size}, $stackArgs)")
        .as(Seq("pair", "c1", "c2", "c_both")))
      .withColumn("est_rows_milli",
        expr("CAST(CAST(c1 AS DECIMAL(38,0)) * c2 * 1000 div n AS BIGINT)"))
      .withColumn("__e", expr("CAST(c1 AS DECIMAL(38,0)) * c2"))
      .withColumn("__a", expr("CAST(c_both AS DECIMAL(38,0)) * n"))
      .select($"pair", $"n", $"c1", $"c2", $"c_both", $"est_rows_milli",
        expr("CAST(greatest(__e, __a) * 1000 div greatest(least(__e, __a), 1) AS BIGINT)")
          .as("q_error_milli"),
        when($"__a" > $"__e", "under").when($"__a" < $"__e", "over")
          .otherwise("exact").as("bias"))
      .orderBy($"pair")
  }

  val q450Oracle: String =
    """WITH fl AS (
         SELECT CAST(l_quantity >= 25 AS BIGINT) AS qty25,
                CAST(l_discount >= 0.05 AS BIGINT) AS disc5,
                CAST(l_returnflag = 'R' AS BIGINT) AS flagR,
                CAST(l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AS BIGINT) AS ship95
         FROM lineitem),
       flat AS (
         SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(qty25) AS BIGINT) AS c_qty25,
                CAST(sum(disc5) AS BIGINT) AS c_disc5,
                CAST(sum(flagR) AS BIGINT) AS c_flagR,
                CAST(sum(ship95) AS BIGINT) AS c_ship95,
                CAST(sum(qty25 * disc5) AS BIGINT) AS c_qty25_disc5,
                CAST(sum(qty25 * flagR) AS BIGINT) AS c_qty25_flagR,
                CAST(sum(qty25 * ship95) AS BIGINT) AS c_qty25_ship95,
                CAST(sum(disc5 * flagR) AS BIGINT) AS c_disc5_flagR,
                CAST(sum(disc5 * ship95) AS BIGINT) AS c_disc5_ship95,
                CAST(sum(flagR * ship95) AS BIGINT) AS c_flagR_ship95
         FROM fl),
       g AS (
         SELECT 'qty25xdisc5' AS pair, n, c_qty25 AS c1, c_disc5 AS c2, c_qty25_disc5 AS c_both FROM flat
         UNION ALL SELECT 'qty25xflagR', n, c_qty25, c_flagR, c_qty25_flagR FROM flat
         UNION ALL SELECT 'qty25xship95', n, c_qty25, c_ship95, c_qty25_ship95 FROM flat
         UNION ALL SELECT 'disc5xflagR', n, c_disc5, c_flagR, c_disc5_flagR FROM flat
         UNION ALL SELECT 'disc5xship95', n, c_disc5, c_ship95, c_disc5_ship95 FROM flat
         UNION ALL SELECT 'flagRxship95', n, c_flagR, c_ship95, c_flagR_ship95 FROM flat)
       SELECT pair, n, c1, c2, c_both,
              CAST(CAST(c1 AS HUGEINT) * c2 * 1000 // n AS BIGINT) AS est_rows_milli,
              CAST(greatest(CAST(c1 AS HUGEINT) * c2, CAST(c_both AS HUGEINT) * n) * 1000
                // greatest(least(CAST(c1 AS HUGEINT) * c2, CAST(c_both AS HUGEINT) * n), 1)
                AS BIGINT) AS q_error_milli,
              CASE WHEN CAST(c_both AS HUGEINT) * n > CAST(c1 AS HUGEINT) * c2 THEN 'under'
                   WHEN CAST(c_both AS HUGEINT) * n < CAST(c1 AS HUGEINT) * c2 THEN 'over'
                   ELSE 'exact' END AS bias
       FROM g ORDER BY pair"""

  /** Consistent-hashing rebalance planner (q449): doc_ids routed on an
    * md5 ring of 4 nodes × 16 vnodes vs the same ring grown to 5
    * nodes — the planner for "what fraction of a 100 TB keyspace
    * moves when we scale the shard fleet?". Reports the measured
    * moved share against the theoretical 1/5, plus the load spread
    * (max/min node share in bp) before and after — the two numbers
    * (movement ∧ balance) that justify vnode counts.
    *
    * Determinism: ring points are md5 of LITERAL 'n{node}#{vnode}'
    * labels, 60-bit-packed with the node id in the low 3 bits so the
    * successor lookup is a plain integer min over a constant-folded
    * 64/80-element array; key positions use the same shared hash
    * primitive. Scale: one scan, per-row bounded-array HOFs, one
    * 1-row aggregate — nothing shuffles but the final count. */
  def q449ConsistentHashing(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def point(label: String): String =
      s"CAST(conv(substr(md5('$label'), 1, 15), 16, 10) AS BIGINT)"
    def ring(n: Int): String = (0 until n).flatMap(node =>
      (0 until 16).map(v => s"${point(s"n$node#$v")} * 8 + $node"))
      .mkString("array(", ", ", ")")
    def succ(ringE: String): String =
      s"""pmod(coalesce(
            array_min(filter($ringE, x -> x >= __pos)),
            array_min($ringE)), 8)"""
    val keyed = Tables.documents(s, d)
      .select($"doc_id",
        expr("md5_prefix(CAST(doc_id AS STRING), 15) * 8 + 7")
          .as("__pos"))
      .select($"doc_id",
        expr(succ(ring(4))).as("n4"), expr(succ(ring(5))).as("n5"))
    val loadAggs =
      (0 until 4).map(i => sum(when($"n4" === i, 1L).otherwise(0L)).as(s"__l4_$i")) ++
        (0 until 5).map(i => sum(when($"n5" === i, 1L).otherwise(0L)).as(s"__l5_$i"))
    val flat = keyed.groupBy().agg(
      count(lit(1)).as("n_keys"),
      (sum(when($"n4" =!= $"n5", 1L).otherwise(0L)).as("moved") +: loadAggs): _*)
    flat.select($"n_keys", $"moved",
        expr("moved * 10000 div n_keys").as("moved_bp"),
        lit(2000L).as("expected_move_bp"),
        expr("greatest(__l4_0, __l4_1, __l4_2, __l4_3) * 10000 div n_keys")
          .as("max4_bp"),
        expr("least(__l4_0, __l4_1, __l4_2, __l4_3) * 10000 div n_keys")
          .as("min4_bp"),
        expr("greatest(__l5_0, __l5_1, __l5_2, __l5_3, __l5_4) * 10000 div n_keys")
          .as("max5_bp"),
        expr("least(__l5_0, __l5_1, __l5_2, __l5_3, __l5_4) * 10000 div n_keys")
          .as("min5_bp"))
  }

  val q449Oracle: String = {
    def point(label: String): String =
      s"('0x' || substr(md5('$label'), 1, 15))::BIGINT"
    def ring(n: Int): String = (0 until n).flatMap(node =>
      (0 until 16).map(v => s"${point(s"n$node#$v")} * 8 + $node"))
      .mkString("[", ", ", "]")
    def succ(ringE: String): String =
      s"""coalesce(
            list_min(list_filter($ringE, x -> x >= pos)),
            list_min($ringE)) % 8"""
    s"""WITH keyed AS (
         SELECT doc_id,
                ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT * 8 + 7 AS pos
         FROM documents),
       routed AS (
         SELECT doc_id, ${succ(ring(4))} AS n4, ${succ(ring(5))} AS n5 FROM keyed),
       flat AS (
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(CASE WHEN n4 <> n5 THEN 1 ELSE 0 END) AS BIGINT) AS moved,
                CAST(sum(CASE WHEN n4 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS l4_0,
                CAST(sum(CASE WHEN n4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l4_1,
                CAST(sum(CASE WHEN n4 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS l4_2,
                CAST(sum(CASE WHEN n4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS l4_3,
                CAST(sum(CASE WHEN n5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS l5_0,
                CAST(sum(CASE WHEN n5 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l5_1,
                CAST(sum(CASE WHEN n5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS l5_2,
                CAST(sum(CASE WHEN n5 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS l5_3,
                CAST(sum(CASE WHEN n5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS l5_4
         FROM routed)
       SELECT n_keys, moved, moved * 10000 // n_keys AS moved_bp,
              CAST(2000 AS BIGINT) AS expected_move_bp,
              greatest(l4_0, l4_1, l4_2, l4_3) * 10000 // n_keys AS max4_bp,
              least(l4_0, l4_1, l4_2, l4_3) * 10000 // n_keys AS min4_bp,
              greatest(l5_0, l5_1, l5_2, l5_3, l5_4) * 10000 // n_keys AS max5_bp,
              least(l5_0, l5_1, l5_2, l5_3, l5_4) * 10000 // n_keys AS min5_bp
       FROM flat"""
  }

  /** Bucketing advisor (q442): should lineitem/orders/part/customer be
    * rewritten into bucketed layout, and on WHICH key? Each candidate
    * is scored with the measured row counts under the engine's
    * literal cost model (per-row widths; a fixed weekly join workload;
    * rewrite ≈ 3× table bytes for the sort+write; maintenance ≈ 1%
    * daily ingest re-bucketed): weekly shuffle bytes saved, one-time
    * rewrite cost, weekly maintenance, net weekly gain and payback
    * weeks — the q415/q416 literal-lattice pattern pointed at layout.
    * Only the row counts come from data; everything else is the
    * declared model, so the advisor's arithmetic is exact integers.
    *
    * Scale: four count(*) scans reduced to one broadcast-joined 1-row
    * relation; the candidate table is 3 literal rows. */
  def q442BucketingAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val nl = Tables.lineitem(s, d).groupBy().agg(count(lit(1)).as("n_l"))
    val no = Tables.orders(s, d).groupBy().agg(count(lit(1)).as("n_o"))
    val nc = Tables.customer(s, d).groupBy().agg(count(lit(1)).as("n_c"))
    val np = Tables.part(s, d).groupBy().agg(count(lit(1)).as("n_p"))
    val stats = nl.crossJoin(broadcast(no)).crossJoin(broadcast(nc))
      .crossJoin(broadcast(np))
    // (key, big table bytes, small table bytes, joins/week) under the
    // literal widths l=120 o=100 c=150 p=130 bytes/row
    val cand = stats.select(explode(array(
        struct(lit("orderkey").as("key"),
          ($"n_l" * 120 + $"n_o" * 100).as("pair_bytes"), lit(12L).as("joins_wk")),
        struct(lit("partkey").as("key"),
          ($"n_l" * 120 + $"n_p" * 130).as("pair_bytes"), lit(4L).as("joins_wk")),
        struct(lit("custkey").as("key"),
          ($"n_o" * 100 + $"n_c" * 150).as("pair_bytes"), lit(8L).as("joins_wk"))))
        .as("x"))
      .select($"x.key".as("key"), $"x.pair_bytes", $"x.joins_wk")
      .withColumn("weekly_saved", $"pair_bytes" * $"joins_wk")
      .withColumn("rewrite", $"pair_bytes" * 3)
      .withColumn("weekly_maint", expr("pair_bytes * 3 * 7 div 100"))
      .withColumn("net_weekly", $"weekly_saved" - $"weekly_maint")
      .withColumn("payback_weeks",
        when($"net_weekly" > 0, expr("(rewrite + net_weekly - 1) div net_weekly"))
          .otherwise(lit(-1L)))
    val best = cand.groupBy().agg(max($"net_weekly").as("__best"))
    cand.crossJoin(broadcast(best))
      .withColumn("picked", $"net_weekly" === $"__best")
      .select($"key", $"pair_bytes", $"joins_wk", $"weekly_saved",
        $"rewrite", $"weekly_maint", $"net_weekly", $"payback_weeks", $"picked")
      .orderBy($"key")
  }

  val q442Oracle: String =
    """WITH stats AS (
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_l,
                (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_o,
                (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_c,
                (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_p),
       cand AS (
         SELECT 'orderkey' AS key, n_l * 120 + n_o * 100 AS pair_bytes,
                CAST(12 AS BIGINT) AS joins_wk FROM stats
         UNION ALL
         SELECT 'partkey', n_l * 120 + n_p * 130, 4 FROM stats
         UNION ALL
         SELECT 'custkey', n_o * 100 + n_c * 150, 8 FROM stats),
       scored AS (
         SELECT key, pair_bytes, joins_wk,
                pair_bytes * joins_wk AS weekly_saved,
                pair_bytes * 3 AS rewrite,
                pair_bytes * 3 * 7 // 100 AS weekly_maint,
                pair_bytes * joins_wk - pair_bytes * 3 * 7 // 100 AS net_weekly
         FROM cand)
       SELECT key, pair_bytes, joins_wk, weekly_saved, rewrite, weekly_maint,
              net_weekly,
              CASE WHEN net_weekly > 0 THEN (rewrite + net_weekly - 1) // net_weekly
                   ELSE -1 END AS payback_weeks,
              net_weekly = (SELECT max(net_weekly) FROM scored) AS picked
       FROM scored ORDER BY key"""

  /** System-R left-deep join-order advisor (q453, Selinger et al.
    * 1979): for the 4-table chain customer —custkey— orders
    * —orderkey— lineitem —partkey— part, enumerate every left-deep
    * order with no cross join (8 on a 4-chain) and cost each as the
    * sum of its two INTERMEDIATE result-size estimates under the
    * textbook model |A⋈B| = |A|·|B| / max(ndv_A(k), ndv_B(k)) with
    * attribute NDVs preserved through joins. The advisor's pick is
    * the plan a Selinger optimizer would emit from the same
    * statistics — next to q417, which measures how wrong those
    * estimates are, and q450, which measures why.
    *
    * Determinism/scale: ONE stats pass (4 counts + 3 key NDVs, each a
    * 1-row broadcast attachment); estimates are exact decimal
    * products floored at each extension step IN PLAN ORDER (flooring
    * is order-dependent, so both engines evaluate the identical
    * nesting); the 8-row plan lattice is literal. */
  def q453JoinOrderAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val st = Tables.customer(s, d).groupBy().agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(Tables.orders(s, d).groupBy()
        .agg(count(lit(1)).as("n_o"), countDistinct($"o_custkey").as("dv_ock"))))
      .crossJoin(broadcast(Tables.lineitem(s, d).groupBy()
        .agg(count(lit(1)).as("n_l"), countDistinct($"l_orderkey").as("dv_lok"),
          countDistinct($"l_partkey").as("dv_lpk"))))
      .crossJoin(broadcast(Tables.part(s, d).groupBy()
        .agg(count(lit(1)).as("n_p"))))
    val n = Map("C" -> "n_c", "O" -> "n_o", "L" -> "n_l", "P" -> "n_p")
    val den = Map(
      Set("C", "O") -> "greatest(n_c, dv_ock)",
      Set("O", "L") -> "greatest(n_o, dv_lok)",
      Set("L", "P") -> "greatest(n_p, dv_lpk)")
    val chain = Seq("C", "O", "L", "P")
    def contiguous(ts: Seq[String]): Boolean = {
      val idx = ts.map(chain.indexOf).sorted
      idx.last - idx.head == idx.size - 1
    }
    val orders = chain.permutations.filter(p =>
      (2 to 4).forall(k => contiguous(p.take(k)))).toSeq
    val arms = orders.map { ord =>
      // grow the span left-deep; each new table attaches through its
      // chain edge into the current span
      var expr0 = s"CAST(${n(ord.head)} AS DECIMAL(38,0))"
      val mids = (1 until 4).map { k =>
        val t = ord(k)
        val span = ord.take(k).toSet
        val edge = chain.zip(chain.tail)
          .find(e => (e._1 == t && span(e._2)) || (e._2 == t && span(e._1)))
          .map(e => Set(e._1, e._2)).get
        // re-wrap EVERY step as DECIMAL(38,0): Spark's `div` (integral
        // divide) returns BIGINT, which would collapse the chain to
        // int64 after the first extension and silently wrap where the
        // DuckDB oracle's HUGEINT keeps going (ADVICE r9 #1; same rule
        // as q423)
        expr0 = s"CAST((($expr0) * ${n(t)} div ${den(edge)}) AS DECIMAL(38,0))"
        expr0
      }
      val name = ord.mkString(">")
      s"named_struct('plan', '$name', " +
        s"'est_mid1', CAST(${mids(0)} AS BIGINT), " +
        s"'est_mid2', CAST(${mids(1)} AS BIGINT), " +
        s"'est_final', CAST(${mids(2)} AS BIGINT), " +
        s"'cost', CAST(${mids(0)} + ${mids(1)} AS BIGINT))"
    }
    st.select(explode(expr(s"array(${arms.mkString(", ")})")).as("r"))
      .select($"r.plan".as("plan"), $"r.est_mid1", $"r.est_mid2",
        $"r.est_final", $"r.cost")
      .withColumn("rank", row_number().over(
        Window.orderBy($"cost", $"plan")).cast("long"))
      .withColumn("picked", $"rank" === 1L)
      .orderBy($"plan")
  }

  val q453Oracle: String = {
    val n = Map("C" -> "n_c", "O" -> "n_o", "L" -> "n_l", "P" -> "n_p")
    val den = Map(
      Set("C", "O") -> "greatest(n_c, dv_ock)",
      Set("O", "L") -> "greatest(n_o, dv_lok)",
      Set("L", "P") -> "greatest(n_p, dv_lpk)")
    val chain = Seq("C", "O", "L", "P")
    def contiguous(ts: Seq[String]): Boolean = {
      val idx = ts.map(chain.indexOf).sorted
      idx.last - idx.head == idx.size - 1
    }
    val orders = chain.permutations.filter(p =>
      (2 to 4).forall(k => contiguous(p.take(k)))).toSeq
    val arms = orders.map { ord =>
      var expr0 = s"CAST(${n(ord.head)} AS HUGEINT)"
      val mids = (1 until 4).map { k =>
        val t = ord(k)
        val span = ord.take(k).toSet
        val edge = chain.zip(chain.tail)
          .find(e => (e._1 == t && span(e._2)) || (e._2 == t && span(e._1)))
          .map(e => Set(e._1, e._2)).get
        expr0 = s"(($expr0) * ${n(t)} // ${den(edge)})"
        expr0
      }
      val name = ord.mkString(">")
      s"""SELECT '$name' AS plan, CAST(${mids(0)} AS BIGINT) AS est_mid1,
            CAST(${mids(1)} AS BIGINT) AS est_mid2,
            CAST(${mids(2)} AS BIGINT) AS est_final,
            CAST(${mids(0)} + ${mids(1)} AS BIGINT) AS cost
          FROM st"""
    }
    s"""WITH st AS (
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_c,
                (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_o,
                (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS dv_ock,
                (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_l,
                (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS dv_lok,
                (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem) AS dv_lpk,
                (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_p),
       plans AS (${arms.mkString("\nUNION ALL\n")})
       SELECT plan, est_mid1, est_mid2, est_final, cost,
              CAST(row_number() OVER (ORDER BY cost, plan) AS BIGINT) AS rank,
              row_number() OVER (ORDER BY cost, plan) = 1 AS picked
       FROM plans ORDER BY plan"""
  }

  /** Histogram-estimator shootout (q454, Ioannidis' classic question):
    * build a 16-bucket EQUI-WIDTH and a 16-bucket EQUI-DEPTH histogram
    * of l_extendedprice (centi) and score both on the same CDF
    * workload — 8 evenly spaced cutpoints x, estimate |v ≤ x| with
    * standard partial-bucket interpolation, and report the q-error
    * against the exact count. Equi-depth's bounded per-bucket rank
    * error beats equi-width wherever the value distribution is
    * skewed; this measures BY HOW MUCH on real data — the evidence
    * behind every engine's choice of equi-depth statistics.
    *
    * Scale: equi-depth boundaries come from [[Windows.withExactNtile]]
    * (range-partitioned rank, never a global sort); both histograms
    * reduce to 16-element arrays on a 1-row relation; estimates are
    * per-cutpoint integer HOFs over the broadcast arrays (the q420
    * interpolation discipline: floor-divide per term on both engines).
    * r14 fusion (was 3 full fact scans beside the ntile machinery,
    * QTime 2.38 s / 22 jobs): the ntile tiles now also yield the
    * global stats (lo = min of tile mins, hi = max of tile maxes,
    * n = Σ tile counts — every row is in exactly one tile), deleting
    * the stats scan; the equi-width bucket counts and the 8 cutpoint
    * truths fold in ONE conditional-sum pass over a single scan
    * (truth_j = Σ_buckets |v ≤ x_j| — per-bucket partials sum to the
    * global count), deleting the separate truth scan. */
  def q454HistogramShootout(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rows = Tables.lineitem(s, d).select(
      floor($"l_extendedprice" * 100).cast("long").as("v"))
    // equi-depth boundaries + global stats from the selection engine
    // (r14): per-tile max/min/count are positional values (v at
    // positions p_{t-1}+1..p_t), identical under ANY total order
    // extending v-order — the (orderkey, linenumber) tie-break only
    // shuffles WHICH duplicate lands where, never the value at a
    // position — so the rank engine's range exchange + offset windows
    // are replaced by log_B(range) scan+histogram passes, and the
    // boundaries/stats inline as literals (split-point tables are
    // grid-sized by construction, the q437 pattern)
    val tb = Windows.tileBoundaries(rows, $"v", Seq(("all", lit(1L))), 16)
    val (lo, hi, n) = (tb.lo, tb.hi, tb.counts("all"))
    val bndsLit = tb.bounds("all").toSeq
    // equi-width counts + cutpoint truths: ONE scan, per-bucket
    // conditional sums, reduced over the ≤16-row bucket relation
    def cut(j: Int) = lo + (hi - lo) * j / 9 // driver arithmetic, exact
    val truthAggs = (1 to 8).map(j =>
      sum(when($"v" <= lit(cut(j)), 1L).otherwise(0L)).as(s"__t$j"))
    val bkt = rows
      .groupBy(expr(s"least(15L, (v - ${lo}L) * 16 div ${hi - lo + 1}L)").as("bk"))
      .agg(count(lit(1)).as("c"), truthAggs: _*)
    val one = bkt.groupBy()
      .agg(expr("map_from_arrays(collect_list(bk), collect_list(c))").as("m"),
        (1 to 8).map(j => sum(col(s"__t$j")).as(s"__t$j")): _*)
      .withColumn("cnts", expr("transform(sequence(0, 15), i -> coalesce(m[i], 0L))"))
      .withColumn("truths", expr(
        s"array(${(1 to 8).map(j => s"__t$j").mkString(", ")})"))
      .select(lit(lo).as("lo"), lit(hi).as("hi"), lit(n).as("n"),
        $"truths", $"cnts", typedLit(bndsLit).as("bnds"))
    // per cutpoint: equi-width interpolates inside the straddling
    // width-bucket; equi-depth interpolates inside the straddling tile
    // (tile sizes are exactly q+1 for the first r tiles, q after)
    val est = one.select($"lo", $"hi", $"n", $"truths", $"bnds", $"cnts",
        explode(expr("sequence(1, 8)")).as("j"))
      .withColumn("x", expr("lo + (hi - lo) * j div 9"))
      .withColumn("truth", expr("element_at(truths, CAST(j AS INT))"))
      .withColumn("bk", expr("least(15L, (x - lo) * 16 div (hi - lo + 1))"))
      .withColumn("blo", expr("lo + (bk * (hi - lo + 1) + 15) div 16"))
      .withColumn("bhi", expr("lo + ((bk + 1) * (hi - lo + 1) + 15) div 16 - 1"))
      .withColumn("est_ew", expr(
        """aggregate(slice(cnts, 1, CAST(bk AS INT)), 0L, (acc, c) -> acc + c)
           + element_at(cnts, CAST(bk + 1 AS INT)) * (x - blo + 1)
             div (bhi - blo + 1)"""))
      .withColumn("f", expr("size(filter(bnds, b -> b <= x))").cast("long"))
      .withColumn("est_ed", expr(
        """CASE WHEN f >= 16 THEN n ELSE
             f * (n div 16) + least(f, n % 16)
             + ((n div 16) + CASE WHEN f + 1 <= n % 16 THEN 1 ELSE 0 END)
               * (x - CASE WHEN f = 0 THEN lo - 1 ELSE element_at(bnds, CAST(f AS INT)) END)
               div (element_at(bnds, CAST(f + 1 AS INT))
                    - CASE WHEN f = 0 THEN lo - 1 ELSE element_at(bnds, CAST(f AS INT)) END)
           END"""))
    est.select($"j".cast("long").as("cut_idx"), $"x", $"truth",
        $"est_ew", $"est_ed",
        expr("greatest(greatest(truth, est_ew), 1) * 1000 div greatest(least(truth, est_ew), 1)")
          .as("qerr_ew_milli"),
        expr("greatest(greatest(truth, est_ed), 1) * 1000 div greatest(least(truth, est_ed), 1)")
          .as("qerr_ed_milli"))
      .orderBy($"cut_idx")
  }

  val q454Oracle: String =
    """WITH rows_ AS (
         SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
                l_orderkey, l_linenumber
         FROM lineitem),
       stats AS (SELECT CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
                        CAST(count(*) AS BIGINT) AS n FROM rows_),
       ed AS (
         SELECT list_sort(list(b)) AS bnds FROM (
           SELECT CAST(max(v) AS BIGINT) AS b FROM (
             SELECT v, ntile(16) OVER (ORDER BY v, l_orderkey, l_linenumber) AS tile
             FROM rows_)
           GROUP BY tile)),
       ewr AS (
         SELECT least(15, (v - lo) * 16 // (hi - lo + 1)) AS bk,
                CAST(count(*) AS BIGINT) AS c
         FROM rows_, stats GROUP BY 1),
       ew AS (
         SELECT list(coalesce(c, 0) ORDER BY i) AS cnts
         FROM (SELECT unnest(generate_series(0, 15)) AS i) g
         LEFT JOIN ewr ON ewr.bk = g.i),
       truth AS (
         SELECT g.j, lo, hi, n, lo + (hi - lo) * g.j // 9 AS x,
                (SELECT CAST(count(*) AS BIGINT) FROM rows_
                 WHERE v <= lo + (hi - lo) * g.j // 9) AS truth
         FROM (SELECT unnest(generate_series(1, 8)) AS j) g, stats),
       est AS (
         SELECT j, x, truth, lo, hi, n, bnds, cnts,
                least(15, (x - lo) * 16 // (hi - lo + 1)) AS bk,
                lo + (least(15, (x - lo) * 16 // (hi - lo + 1)) * (hi - lo + 1) + 15) // 16 AS blo,
                lo + ((least(15, (x - lo) * 16 // (hi - lo + 1)) + 1) * (hi - lo + 1) + 15) // 16 - 1 AS bhi,
                CAST(len(list_filter(bnds, b -> b <= x)) AS BIGINT) AS f
         FROM truth, ed, ew),
       scored AS (
         SELECT CAST(j AS BIGINT) AS cut_idx, x, truth,
                -- coalesce the empty-prefix slice: DuckDB's list_sum over
                -- [] is NULL where Spark's aggregate over an empty slice
                -- is 0 — possible only when a cutpoint lands in bucket 0
                -- (hi - lo <= 1), ADVICE r9 #5
                coalesce(list_sum(cnts[1:CAST(bk AS INTEGER)]), 0)
                  + cnts[CAST(bk + 1 AS INTEGER)] * (x - blo + 1) // (bhi - blo + 1) AS est_ew,
                CASE WHEN f >= 16 THEN n ELSE
                  f * (n // 16) + least(f, n % 16)
                  + ((n // 16) + CASE WHEN f + 1 <= n % 16 THEN 1 ELSE 0 END)
                    * (x - CASE WHEN f = 0 THEN lo - 1 ELSE bnds[CAST(f AS INTEGER)] END)
                    // (bnds[CAST(f + 1 AS INTEGER)]
                        - CASE WHEN f = 0 THEN lo - 1 ELSE bnds[CAST(f AS INTEGER)] END)
                END AS est_ed
         FROM est)
       SELECT cut_idx, x, truth,
              CAST(est_ew AS BIGINT) AS est_ew, CAST(est_ed AS BIGINT) AS est_ed,
              CAST(greatest(greatest(truth, est_ew), 1) * 1000
                // greatest(least(truth, est_ew), 1) AS BIGINT) AS qerr_ew_milli,
              CAST(greatest(greatest(truth, est_ed), 1) * 1000
                // greatest(least(truth, est_ed), 1) AS BIGINT) AS qerr_ed_milli
       FROM scored ORDER BY cut_idx"""

  /** Row-vs-block sampling audit (q455): estimate per-returnflag counts
    * and revenue from (a) a 1/16 Bernoulli ROW sample (hash of the
    * full line key) and (b) a 1/16 CLUSTER sample (hash of orderkey —
    * whole orders in or out, the shape block/file sampling takes at
    * 100 TB where reading 1/16 of ROWS still touches every file but
    * 1/16 of ORDERS can skip files). Cluster sampling is cheaper and
    * unbiased but carries the intra-cluster correlation penalty; this
    * measures that penalty as achieved error bp on real data.
    *
    * Determinism: both samples are md5-residue classes (`Fns.hash60`),
    * exactly reproducible cross-engine; estimates scale by 16 in
    * integer arithmetic; errors are cross-multiplied bp. One scan,
    * conditional sums, 3-row output. */
  def q455SamplingAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d).select($"l_returnflag".as("flag"),
      floor($"l_extendedprice" * 100).cast("long").as("v"),
      (graft.functions.Fns.hash60(
        concat($"l_orderkey".cast("string"), lit("#"),
          $"l_linenumber".cast("string"))) % 16 === 0).as("in_row"),
      (graft.functions.Fns.hash60($"l_orderkey".cast("string")) % 16 === 0)
        .as("in_clu"))
    base.groupBy($"flag")
      .agg(count(lit(1)).as("n_exact"), sum($"v").as("sum_exact"),
        sum(when($"in_row", 1L).otherwise(0L)).as("__nr"),
        sum(when($"in_row", $"v").otherwise(0L)).as("__sr"),
        sum(when($"in_clu", 1L).otherwise(0L)).as("__nc"),
        sum(when($"in_clu", $"v").otherwise(0L)).as("__sc"))
      .select($"flag", $"n_exact", $"sum_exact",
        ($"__nr" * 16).as("n_est_row"), ($"__nc" * 16).as("n_est_cluster"),
        expr("abs(__nr * 16 - n_exact) * 10000 div n_exact").as("n_err_row_bp"),
        expr("abs(__nc * 16 - n_exact) * 10000 div n_exact").as("n_err_cluster_bp"),
        expr("abs(__sr * 16 - sum_exact) * 10000 div sum_exact").as("sum_err_row_bp"),
        expr("abs(__sc * 16 - sum_exact) * 10000 div sum_exact").as("sum_err_cluster_bp"))
      .orderBy($"flag")
  }

  val q455Oracle: String =
    """WITH base AS (
         SELECT l_returnflag AS flag,
                CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
                ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '#' ||
                   CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 16 = 0 AS in_row,
                ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT
                  % 16 = 0 AS in_clu
         FROM lineitem),
       agg AS (
         SELECT flag, CAST(count(*) AS BIGINT) AS n_exact,
                CAST(sum(v) AS BIGINT) AS sum_exact,
                CAST(sum(CASE WHEN in_row THEN 1 ELSE 0 END) AS BIGINT) AS nr,
                CAST(sum(CASE WHEN in_row THEN v ELSE 0 END) AS BIGINT) AS sr,
                CAST(sum(CASE WHEN in_clu THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                CAST(sum(CASE WHEN in_clu THEN v ELSE 0 END) AS BIGINT) AS sc
         FROM base GROUP BY 1)
       SELECT flag, n_exact, sum_exact,
              nr * 16 AS n_est_row, nc * 16 AS n_est_cluster,
              abs(nr * 16 - n_exact) * 10000 // n_exact AS n_err_row_bp,
              abs(nc * 16 - n_exact) * 10000 // n_exact AS n_err_cluster_bp,
              abs(sr * 16 - sum_exact) * 10000 // sum_exact AS sum_err_row_bp,
              abs(sc * 16 - sum_exact) * 10000 // sum_exact AS sum_err_cluster_bp
       FROM agg ORDER BY flag"""

  /** Incremental-view-maintenance advisor (q456, the operational twin
    * of q416's view SELECTION): for three candidate rollup views over
    * orders — by month, by customer, by (month, priority) — measure
    * the view size, the average daily delta, and the average distinct
    * view GROUPS touched per day, then compare the daily IVM cost
    * (delta rows + touched groups) against a daily full refresh
    * (fact scan + view rewrite). Wide-group views (by month) are
    * near-free to maintain; key-grained views (by customer) touch
    * almost every group daily and approach refresh cost — the
    * gain table quantifies it.
    *
    * Scale: ONE fact pass stacks the 3 grouping keys to a
    * (view, day, group) cell relation; every readout is an aggregate
    * of that already-reduced relation. */
  def q456IvmAdvisor(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ym = "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS STRING)"
    val stackArgs = Seq(
      s"'by_month', $ym",
      "'by_cust', CAST(o_custkey AS STRING)",
      s"'by_month_prio', concat($ym, '|', o_orderpriority)").mkString(", ")
    val cells = Tables.orders(s, d)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
          .as("day"),
        expr(s"stack(3, $stackArgs)").as(Seq("view", "grp")))
      .groupBy($"view", $"day", $"grp").agg(count(lit(1)).as("c"))
    cells.groupBy($"view")
      .agg(sum($"c").as("n_fact"),
        countDistinct($"day").as("n_days"),
        countDistinct($"grp").as("view_rows"),
        count(lit(1)).as("__cells"))
      .select($"view", $"n_fact", $"view_rows", $"n_days",
        expr("n_fact div n_days").as("delta_rows_day"),
        expr("__cells div n_days").as("touched_groups_day"),
        expr("n_fact div n_days + __cells div n_days").as("ivm_cost_day"),
        ($"n_fact" + $"view_rows").as("refresh_cost_day"))
      .withColumn("gain_milli",
        expr("refresh_cost_day * 1000 div greatest(ivm_cost_day, 1)"))
      .withColumn("advise",
        when($"gain_milli" > 1000, "ivm").otherwise("refresh"))
      .orderBy($"view")
  }

  val q456Oracle: String =
    """WITH cells AS (
         SELECT view, day, grp, CAST(count(*) AS BIGINT) AS c
         FROM (
           SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
                  'by_month' AS view,
                  CAST(year(o_orderdate) * 100 + month(o_orderdate) AS VARCHAR) AS grp
           FROM orders
           UNION ALL
           SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000,
                  'by_cust', CAST(o_custkey AS VARCHAR)
           FROM orders
           UNION ALL
           SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000,
                  'by_month_prio',
                  CAST(year(o_orderdate) * 100 + month(o_orderdate) AS VARCHAR)
                    || '|' || o_orderpriority
           FROM orders)
         GROUP BY 1, 2, 3),
       agg AS (
         SELECT view, CAST(sum(c) AS BIGINT) AS n_fact,
                CAST(count(DISTINCT day) AS BIGINT) AS n_days,
                CAST(count(DISTINCT grp) AS BIGINT) AS view_rows,
                CAST(count(*) AS BIGINT) AS cells_
         FROM cells GROUP BY 1)
       SELECT view, n_fact, view_rows, n_days,
              n_fact // n_days AS delta_rows_day,
              cells_ // n_days AS touched_groups_day,
              n_fact // n_days + cells_ // n_days AS ivm_cost_day,
              n_fact + view_rows AS refresh_cost_day,
              (n_fact + view_rows) * 1000
                // greatest(n_fact // n_days + cells_ // n_days, 1) AS gain_milli,
              CASE WHEN (n_fact + view_rows) * 1000
                     // greatest(n_fact // n_days + cells_ // n_days, 1) > 1000
                   THEN 'ivm' ELSE 'refresh' END AS advise
       FROM agg ORDER BY view"""

  /** Rack-aware replica-placement audit (q461, the durability face of
    * q449's rebalance planner): doc_ids take 3 replicas on a 12-node /
    * 4-rack consistent-hash ring (replicas = first 3 DISTINCT nodes
    * clockwise — the Dynamo/Cassandra preference list, NO rack
    * awareness), and the audit measures what naive placement actually
    * buys: the share of keys with replicas on 3 distinct racks, on
    * ≥ 2, the WORST single-rack failure (keys with a 2-of-3 quorum
    * inside one rack → unavailable), and the hottest primary's load.
    * These four numbers are the case for rack-aware skip-placement —
    * or the evidence it isn't needed.
    *
    * Determinism/scale: ring points are md5 of literal labels on a
    * 56-bit ring packed as point·16+node (node in the low nibble), so
    * the three successor lookups are integer list-min HOFs over a
    * 192-element constant-folded array under circular distance
    * pmod(point − pos, 2⁵⁶) — one scan, per-row bounded work, one
    * 1-row aggregate. */
  def q461ReplicaPlacement(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def point(label: String): String =
      s"CAST(conv(substr(md5('$label'), 1, 14), 16, 10) AS BIGINT)"
    val ring = (for (node <- 0 until 12; v <- 0 until 16)
      yield s"${point(s"n$node#$v")} * 16 + $node")
      .mkString("array(", ", ", ")")
    val lim = 1L << 56
    def nearest(excl: Seq[String]): String = {
      val f =
        if (excl.isEmpty) ring
        else s"filter($ring, x -> ${excl.map(n => s"x % 16 != $n").mkString(" AND ")})"
      s"array_min(transform($f, x -> pmod((x div 16) - __pos, ${lim}L) * 16 + x % 16)) % 16"
    }
    val keyed = Tables.documents(s, d)
      .select(expr("md5_prefix(CAST(doc_id AS STRING), 14)")
        .as("__pos"))
      .withColumn("n1", expr(nearest(Nil)))
      .withColumn("n2", expr(nearest(Seq("n1"))))
      .withColumn("n3", expr(nearest(Seq("n1", "n2"))))
      .select($"n1", $"n2", $"n3",
        ($"n1" % 4).as("r1"), ($"n2" % 4).as("r2"), ($"n3" % 4).as("r3"))
    val rackAggs = (0 until 4).map(f => sum(when(
      (when($"r1" === f, 1).otherwise(0) + when($"r2" === f, 1).otherwise(0)
        + when($"r3" === f, 1).otherwise(0)) >= 2, 1L).otherwise(0L))
      .as(s"__u$f"))
    val loadAggs = (0 until 12).map(nd =>
      sum(when($"n1" === nd, 1L).otherwise(0L)).as(s"__l$nd"))
    val flat = keyed.groupBy().agg(
      count(lit(1)).as("n_keys"),
      (Seq(
        sum(when($"r1" =!= $"r2" && $"r1" =!= $"r3" && $"r2" =!= $"r3", 1L)
          .otherwise(0L)).as("__d3"),
        sum(when($"r1" =!= $"r2" || $"r1" =!= $"r3", 1L).otherwise(0L))
          .as("__d2")) ++ rackAggs ++ loadAggs): _*)
    flat.select($"n_keys",
      expr("__d3 * 10000 div n_keys").as("rack_diverse3_bp"),
      expr("__d2 * 10000 div n_keys").as("rack_diverse2_bp"),
      expr(s"greatest(${(0 until 4).map(f => s"__u$f").mkString(", ")}) * 10000 div n_keys")
        .as("worst_rack_unavail_bp"),
      expr(s"greatest(${(0 until 12).map(n => s"__l$n").mkString(", ")}) * 10000 div n_keys")
        .as("max_primary_load_bp"))
  }

  val q461Oracle: String = {
    def point(label: String): String =
      s"('0x' || substr(md5('$label'), 1, 14))::BIGINT"
    val ring = (for (node <- 0 until 12; v <- 0 until 16)
      yield s"${point(s"n$node#$v")} * 16 + $node")
      .mkString("[", ", ", "]")
    val lim = 1L << 56
    def nearest(excl: Seq[String]): String = {
      val f =
        if (excl.isEmpty) ring
        else s"list_filter($ring, x -> ${excl.map(n => s"x % 16 != $n").mkString(" AND ")})"
      s"list_min(list_transform($f, x -> ((((x // 16) - pos) % $lim + $lim) % $lim) * 16 + x % 16)) % 16"
    }
    s"""WITH keyed AS (
         SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT AS pos
         FROM documents),
       s1 AS (SELECT pos, ${nearest(Nil)} AS n1 FROM keyed),
       s2 AS (SELECT pos, n1, ${nearest(Seq("n1"))} AS n2 FROM s1),
       s3 AS (SELECT pos, n1, n2, ${nearest(Seq("n1", "n2"))} AS n3 FROM s2),
       rk AS (SELECT n1, n2, n3, n1 % 4 AS r1, n2 % 4 AS r2, n3 % 4 AS r3 FROM s3),
       flat AS (
         SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN r1 <> r2 AND r1 <> r3 AND r2 <> r3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
           CAST(sum(CASE WHEN r1 <> r2 OR r1 <> r3 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
           ${(0 until 4).map(f =>
             s"CAST(sum(CASE WHEN (CASE WHEN r1 = $f THEN 1 ELSE 0 END) + (CASE WHEN r2 = $f THEN 1 ELSE 0 END) + (CASE WHEN r3 = $f THEN 1 ELSE 0 END) >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS u$f")
             .mkString(",\n           ")},
           ${(0 until 12).map(n =>
             s"CAST(sum(CASE WHEN n1 = $n THEN 1 ELSE 0 END) AS BIGINT) AS l$n")
             .mkString(",\n           ")}
         FROM rk)
       SELECT n_keys,
              d3 * 10000 // n_keys AS rack_diverse3_bp,
              d2 * 10000 // n_keys AS rack_diverse2_bp,
              greatest(${(0 until 4).map(f => s"u$f").mkString(", ")}) * 10000 // n_keys AS worst_rack_unavail_bp,
              greatest(${(0 until 12).map(n => s"l$n").mkString(", ")}) * 10000 // n_keys AS max_primary_load_bp
       FROM flat"""
  }

  /** Merge-on-read vs copy-on-write planner (q463): the lakehouse
    * table-format decision, priced from MEASURED churn. The customer
    * dimension (n_c rows in 32 hash files) absorbs the orders stream's
    * daily upserts; the measured inputs are the average daily distinct
    * updated keys and the average daily distinct FILES those keys
    * touch (md5-bucketed, the q443 discipline). Policies: COW rewrites
    * every touched file daily (reads stay amp-1.0); MOR logs deltas
    * and compacts every T ∈ {7, 30} days (writes shrink to
    * keys + amortized base rewrite; reads pay 1 + live-delta/base,
    * averaged over the cycle). Write amplification is reported against
    * the logical churn — the factor the storage bill actually scales
    * by.
    *
    * Scale: one pass reduces orders to the (day, key) distinct
    * relation → two small aggregates; customer contributes one count;
    * the 3-row policy grid is closed-form integers. */
  def q463MorCowPlanner(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val chg = Tables.orders(s, d)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"), $"o_custkey")
      .distinct()
    val daily = chg.groupBy($"day")
      .agg(count(lit(1)).as("k"),
        countDistinct(expr(
          "md5_prefix(CAST(o_custkey AS STRING), 15) % 32"))
          .as("f"))
    val meas = daily.groupBy()
      .agg(count(lit(1)).as("n_days"), sum($"k").as("tot_k"), sum($"f").as("tot_f"))
      .select($"n_days",
        expr("tot_k div n_days").as("avg_keys"),
        expr("tot_f div n_days").as("avg_files"))
    val nc = Tables.customer(s, d).groupBy().agg(count(lit(1)).as("n_c"))
    val one = meas.crossJoin(broadcast(nc))
      .withColumn("file_rows", expr("(n_c + 31) div 32"))
    one.select($"n_days", $"avg_keys", $"avg_files", $"n_c",
        explode(expr(
          """array(
               named_struct('policy', 'cow', 'write_rows_day', avg_files * file_rows,
                 'read_amp_milli', 1000L),
               named_struct('policy', 'mor_compact_7',
                 'write_rows_day', avg_keys + n_c div 7,
                 'read_amp_milli', 1000L + avg_keys * 6 * 1000 div (2 * n_c)),
               named_struct('policy', 'mor_compact_30',
                 'write_rows_day', avg_keys + n_c div 30,
                 'read_amp_milli', 1000L + avg_keys * 29 * 1000 div (2 * n_c)))"""))
          .as("p"))
      .select($"p.policy".as("policy"), $"n_days", $"avg_keys", $"avg_files",
        $"p.write_rows_day", $"p.read_amp_milli",
        expr("p.write_rows_day * 1000 div greatest(avg_keys, 1)")
          .as("write_amp_milli"))
      .orderBy($"policy")
  }

  val q463Oracle: String =
    """WITH chg AS (
         SELECT DISTINCT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
                o_custkey
         FROM orders),
       daily AS (
         SELECT day, CAST(count(*) AS BIGINT) AS k,
                CAST(count(DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT % 32) AS BIGINT) AS f
         FROM chg GROUP BY 1),
       meas AS (
         SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(k) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_keys,
                CAST(sum(f) AS BIGINT) // CAST(count(*) AS BIGINT) AS avg_files
         FROM daily),
       nc AS (SELECT CAST(count(*) AS BIGINT) AS n_c FROM customer),
       one AS (SELECT *, (n_c + 31) // 32 AS file_rows FROM meas, nc),
       pol AS (
         SELECT 'cow' AS policy, n_days, avg_keys, avg_files, n_c,
                avg_files * file_rows AS write_rows_day,
                CAST(1000 AS BIGINT) AS read_amp_milli
         FROM one
         UNION ALL
         SELECT 'mor_compact_7', n_days, avg_keys, avg_files, n_c,
                avg_keys + n_c // 7, 1000 + avg_keys * 6 * 1000 // (2 * n_c)
         FROM one
         UNION ALL
         SELECT 'mor_compact_30', n_days, avg_keys, avg_files, n_c,
                avg_keys + n_c // 30, 1000 + avg_keys * 29 * 1000 // (2 * n_c)
         FROM one)
       SELECT policy, n_days, avg_keys, avg_files, write_rows_day,
              read_amp_milli,
              write_rows_day * 1000 // greatest(avg_keys, 1) AS write_amp_milli
       FROM pol ORDER BY policy"""

  /** Partition-layout pruning audit (q464): month- vs day-partitioned
    * orders under a literal range-scan workload (spans of 1/7/30/90
    * days ending at the newest data). Partitions and rows touched are
    * MEASURED per layout (month layout reads every month the selected
    * day range intersects, in full — partition pruning cannot split a
    * partition), files assume a 10k-row
    * target file size per partition — so the table shows the classic
    * trade in numbers: day partitioning prunes 30× sharper on short
    * scans but mints ~30× the files (the small-file problem q327
    * compacts away).
    *
    * Scale: one pass to the bounded (month, day) histogram; the 8-cell
    * (layout × span) readout is conditional sums over it. */
  def q464PartitionPruning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val days = Tables.orders(s, d)
      .groupBy(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .as("day"),
        expr("CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)")
          .as("ym"))
      .agg(count(lit(1)).as("c"))
    val mx = days.groupBy().agg(max($"day").as("dmax"), sum($"c").as("n"),
      count(lit(1)).as("n_days"), countDistinct($"ym").as("n_months"))
    val spans = Seq(1L, 7L, 30L, 90L)
    val aggs = spans.flatMap(sp => Seq(
      sum(when($"day" > $"dmax" - sp, $"c").otherwise(0L)).as(s"__dr$sp"),
      sum(when($"day" > $"dmax" - sp, 1L).otherwise(0L)).as(s"__dp$sp"),
      // month layout scans whole months: every month containing a
      // selected day is read in full
      max(when($"day" > $"dmax" - sp, $"ym")).as(s"__hi$sp"),
      min(when($"day" > $"dmax" - sp, $"ym")).as(s"__lo$sp")))
    val flat = days.crossJoin(broadcast(mx))
      .groupBy($"dmax", $"n", $"n_days", $"n_months")
      .agg(aggs.head, aggs.tail: _*)
    // second conditional pass folds month-layout rows: a month is
    // scanned iff it intersects the span
    val mrows = spans.map(sp =>
      sum(when($"ym" >= $"__lo$sp" && $"ym" <= $"__hi$sp", $"c").otherwise(0L))
        .as(s"__mr$sp"))
    val mparts = spans.map(sp =>
      (countDistinct(when($"ym" >= $"__lo$sp" && $"ym" <= $"__hi$sp", $"ym")))
        .as(s"__mp$sp"))
    val keep = Seq($"dmax", $"n", $"n_days", $"n_months") ++
      spans.flatMap(sp => Seq(col(s"__dr$sp"), col(s"__dp$sp")))
    val flat2 = days.crossJoin(broadcast(flat))
      .groupBy(keep: _*)
      .agg((mrows ++ mparts).head, (mrows ++ mparts).tail: _*)
    val stackArgs = spans.map(sp =>
      s"${sp}L, __dr$sp, __dp$sp, __mr$sp, __mp$sp").mkString(", ")
    flat2.select($"n", $"n_days", $"n_months",
        expr(s"stack(${spans.size}, $stackArgs)")
          .as(Seq("span_days", "day_rows", "day_parts", "month_rows", "month_parts")))
      .select(
        explode(expr(
          """array(
               named_struct('layout', 'by_day', 'span_days', span_days,
                 'parts_touched', day_parts, 'rows_scanned', day_rows,
                 'files_touched', day_parts,
                 'scan_bp', day_rows * 10000 div n),
               named_struct('layout', 'by_month', 'span_days', span_days,
                 'parts_touched', month_parts, 'rows_scanned', month_rows,
                 'files_touched', month_parts * ((n div n_months + 9999) div 10000),
                 'scan_bp', month_rows * 10000 div n))"""))
          .as("r"))
      .select($"r.layout".as("layout"), $"r.span_days", $"r.parts_touched",
        $"r.rows_scanned", $"r.scan_bp", $"r.files_touched")
      .orderBy($"layout", $"span_days")
  }

  val q464Oracle: String =
    """WITH days AS (
         SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
                CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
                CAST(count(*) AS BIGINT) AS c
         FROM orders GROUP BY 1, 2),
       mx AS (SELECT CAST(max(day) AS BIGINT) AS dmax, CAST(sum(c) AS BIGINT) AS n,
                     CAST(count(*) AS BIGINT) AS n_days,
                     CAST(count(DISTINCT ym) AS BIGINT) AS n_months FROM days),
       g AS (SELECT unnest([1, 7, 30, 90]) AS sp),
       sel AS (
         SELECT g.sp, n, n_days, n_months,
                CAST(sum(CASE WHEN day > dmax - g.sp THEN c ELSE 0 END) AS BIGINT) AS day_rows,
                CAST(sum(CASE WHEN day > dmax - g.sp THEN 1 ELSE 0 END) AS BIGINT) AS day_parts,
                max(CASE WHEN day > dmax - g.sp THEN ym END) AS hi,
                min(CASE WHEN day > dmax - g.sp THEN ym END) AS lo
         FROM days, mx, g GROUP BY 1, 2, 3, 4),
       msel AS (
         SELECT s.sp, s.n, s.n_days, s.n_months, s.day_rows, s.day_parts,
                CAST(sum(CASE WHEN d.ym >= s.lo AND d.ym <= s.hi THEN d.c ELSE 0 END) AS BIGINT) AS month_rows,
                CAST(count(DISTINCT CASE WHEN d.ym >= s.lo AND d.ym <= s.hi THEN d.ym END) AS BIGINT) AS month_parts
         FROM sel s, days d GROUP BY 1, 2, 3, 4, 5, 6)
       SELECT 'by_day' AS layout, CAST(sp AS BIGINT) AS span_days,
              day_parts AS parts_touched, day_rows AS rows_scanned,
              day_rows * 10000 // n AS scan_bp, day_parts AS files_touched
       FROM msel
       UNION ALL
       SELECT 'by_month', CAST(sp AS BIGINT), month_parts, month_rows,
              month_rows * 10000 // n,
              month_parts * ((n // n_months + 9999) // 10000)
       FROM msel
       ORDER BY layout, span_days"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q463_mor_cow_planner" -> q463MorCowPlanner,
    "q464_partition_pruning" -> q464PartitionPruning,
    "q461_replica_placement" -> q461ReplicaPlacement,
    "q453_join_order_advisor" -> q453JoinOrderAdvisor,
    "q454_histogram_shootout" -> q454HistogramShootout,
    "q455_sampling_audit" -> q455SamplingAudit,
    "q456_ivm_advisor" -> q456IvmAdvisor,
    "q442_bucketing_advisor" -> q442BucketingAdvisor,
    "q443_skew_split_sim" -> q443SkewSplitSim,
    "q449_consistent_hashing" -> q449ConsistentHashing,
    "q450_selectivity_audit" -> q450SelectivityAudit,
    "q437_range_sample_audit" -> q437RangeSampleAudit,
    "q426_runtime_filter_roi" -> q426RuntimeFilterRoi,
    "q425_predicate_order" -> q425PredicateOrder,
    "q415_lsm_planner" -> q415LsmPlanner,
    "q416_view_advisor" -> q416ViewAdvisor,
    "q417_join_card_audit" -> q417JoinCardAudit,
    "q401_encoding_advisor" -> q401EncodingAdvisor,
    "q381_pit_training_set" -> q381PitTrainingSet,
    "q360_pit_leakage_delta" -> q360PitLeakageDelta,
    "q169_quantile_norm" -> q169QuantileNorm,
    "q169b_quantile_norm_digest" -> q169bQuantileNormDigest,
    "q161_power_iter" -> q161PowerIter,
    "q131_cdc_chunks" -> q131CdcChunks,
    "q91_doc_chunks" -> q91DocChunks,
    "q92_pii_scrub" -> q92PiiScrub,
    "q93_quality_bins" -> q93QualityBins,
    "q299_chimerge" -> q299ChiMerge,
    "q94_dim_standardize" -> q94DimStandardize,
  )

  val oracles: Map[String, String] = Map(
    "q463_mor_cow_planner" -> q463Oracle,
    "q464_partition_pruning" -> q464Oracle,
    "q461_replica_placement" -> q461Oracle,
    "q453_join_order_advisor" -> q453Oracle,
    "q454_histogram_shootout" -> q454Oracle,
    "q455_sampling_audit" -> q455Oracle,
    "q456_ivm_advisor" -> q456Oracle,
    "q442_bucketing_advisor" -> q442Oracle,
    "q443_skew_split_sim" -> q443Oracle,
    "q449_consistent_hashing" -> q449Oracle,
    "q450_selectivity_audit" -> q450Oracle,
    "q437_range_sample_audit" -> q437Oracle,
    "q426_runtime_filter_roi" -> q426Oracle,
    "q425_predicate_order" -> q425Oracle,
    "q415_lsm_planner" -> q415Oracle,
    "q416_view_advisor" -> q416Oracle,
    "q417_join_card_audit" -> q417Oracle,
    "q401_encoding_advisor" -> q401Oracle,
    "q381_pit_training_set" -> q381Oracle,
    "q360_pit_leakage_delta" -> q360Oracle,
    "q169_quantile_norm" -> q169Oracle,
    "q169b_quantile_norm_digest" -> q169bOracle,
    "q161_power_iter" -> q161Oracle,
    "q131_cdc_chunks" -> q131Oracle,
    "q91_doc_chunks" -> q91Oracle,
    "q92_pii_scrub" -> q92Oracle,
    "q93_quality_bins" -> q93Oracle,
    "q299_chimerge" -> q299Oracle,
    "q94_dim_standardize" -> q94Oracle,
  )
}
