package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.io.Tables

/** Streaming twins of the corpus operators — documents as an unbounded
  * stream (continuous-ingest training pipelines: new crawl shards land
  * as files, each doc must be scored/filtered on arrival).
  *
  * The decontamination probe is the canonical STREAM-STATIC shape:
  * the benchmark shingle set is static and small (a benchmark suite),
  * the document stream is unbounded. The set rides in as a ONE-ROW
  * broadcast relation (array column) joined on a constant key, and
  * keeping the per-doc shingle set as one array row (the single-pass
  * ShingleHashes expression) makes the probe itself a per-row scalar
  * `array_intersect` — so the query is STATELESS: append mode, no
  * watermark, no state store, no shuffle, and no driver collect at
  * stream start. That is the only shape that survives an endless
  * stream: any formulation that explodes shingles and re-aggregates
  * per doc_id would accumulate unbounded aggregation state.
  *
  * If the benchmark set ever outgrows executor memory, swap the
  * array relation for the q49 bloom build (bloom_filter_agg once,
  * `might_contain` per row — still stateless; exactness then needs
  * the q49 two-tier verify).
  */
object DocStreams {

  /** Read-side schema of the documents parquet. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The static side: the distinct benchmark shingle hashes (source =
    * 'src0') as a ONE-ROW broadcast relation — a sorted array column,
    * never collected to the driver. The stream joins this row in via a
    * broadcast stream-static equi-join, so the benchmark set is built
    * by executors, shipped once per executor, and the stream-start
    * path is collect-free (the previous Array[Long] form materialized
    * the whole set on the driver and embedded it in every task's
    * serialized plan as a literal). */
  def benchmarkShingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter($"source" === "src0")
      .select(explode(
        graft.functions.TextExprs.shingle_hashes($"text", 3, 15)).as("sh"))
      .distinct()
      .agg(array_sort(collect_list($"sh")).as("bench_arr"))
      .withColumn("k", lit(1))
  }

  /** Shared transform: per-doc contamination against the benchmark
    * relation. Works identically on batch and streaming inputs —
    * asserted equal to the batch q78 output in DocStreamsSpec. The
    * join is stream-static on a constant key with a broadcast 1-row
    * static side (a broadcast hash join, no shuffle, no state), and
    * the probe stays a per-row scalar `array_intersect` — the whole
    * query remains stateless append-mode. */
  def decontam(docs: DataFrame, bench: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .filter($"source" =!= "src0")
      .select($"doc_id",
        graft.functions.TextExprs.shingle_hashes($"text", 3, 15).as("shs"))
      .filter(size($"shs") > 0)
      .withColumn("k", lit(1))
      .join(broadcast(bench), Seq("k"))
      .select($"doc_id",
        size($"shs").cast("long").as("n_shingles"),
        size(array_intersect($"shs", $"bench_arr")).cast("long").as("n_contam"))
      .withColumn("contam_permille", expr("n_contam * 1000 div n_shingles"))
  }

  /** Streaming entry: file-source stream over a staged documents dir,
    * decontaminated on arrival. Stateless → append mode. */
  def decontamStream(s: SparkSession, docsDir: String,
      bench: DataFrame): DataFrame =
    decontam(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir),
      bench)

  /** The static side of the streaming dup-span probe: the corpus'
    * duplicated 8-gram hashes (corpus-wide occurrence count ≥ 2, same
    * positional hashes as batch q286) as a ONE-ROW broadcast relation
    * — the [[benchmarkShingles]] shape, built by executors, never
    * collected to the driver. */
  def dupGramIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(
        graft.functions.TextExprs.shingle_hash_seq($"text", 8, 15)).as("gh"))
      .groupBy($"gh").agg(count(lit(1)).as("c"))
      .filter($"c" >= 2)
      .agg(array_sort(collect_list($"gh")).as("dup_arr"))
      .withColumn("k", lit(1))
  }

  /** Per-doc duplicate-span coverage against a static dup-gram index —
    * the streaming face of q286 for continuous ingest: each arriving
    * doc is scored for how much of it is covered by 8-token windows
    * already known to be duplicated. Everything after the broadcast
    * join is a per-row scalar computation (positional window hashes
    * from the compiled ShingleHashSeq pass, membership filter, then
    * the same telescoped interval union as the batch query), so the
    * query is STATELESS: append mode, no watermark, no state store.
    * Equality with batch q286 on the same corpus is asserted in
    * DocStreamsSpec. */
  def dupSpan(docs: DataFrame, idx: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id",
        size(graft.functions.Fns.tokens($"text")).cast("long").as("n_tokens"),
        graft.functions.TextExprs.shingle_hash_seq($"text", 8, 15).as("ghs"))
      .withColumn("k", lit(1))
      .join(broadcast(idx), Seq("k"))
      .withColumn("ss", expr(
        "filter(sequence(1, size(ghs)), i -> array_contains(dup_arr, element_at(ghs, i)))"))
      .filter(size($"ss") > 0)
      .withColumn("dup_tokens", expr("""aggregate(transform(sequence(1, size(ss)),
          i -> IF(i < size(ss),
                  least(CAST(8 AS BIGINT),
                        CAST(element_at(ss, i + 1) - element_at(ss, i) AS BIGINT)),
                  CAST(8 AS BIGINT))),
        CAST(0 AS BIGINT), (a, x) -> a + x)"""))
      .select($"doc_id", $"n_tokens", $"dup_tokens",
        expr("(10000 * dup_tokens) div n_tokens").as("dup_bp"))
  }

  /** Streaming entry: file-source stream scored on arrival. */
  def dupSpanStream(s: SparkSession, docsDir: String,
      idx: DataFrame): DataFrame =
    dupSpan(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir),
      idx)

  /** Rendezvous (HRW) shard routing as a PER-ROW projection — the
    * streaming face of q140: each arriving doc's shard is
    * greatest(hash(doc:0)·8+0, …, hash(doc:7)·8+7) mod 8, the same
    * packed argmax as the batch query but evaluated with `greatest`
    * over 8 codegen'd expressions instead of an explode+groupBy (a
    * streaming groupBy would put a shuffle and state where routing
    * needs neither). Stateless → append mode; this is the ingest
    * router that decides which shard file a crawled doc lands in. */
  def shardRoute(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val ks = (0 until 8).map { i =>
      graft.functions.Fns.hash60(concat($"doc_id", lit(":"), lit(i))) * 8 + i
    }
    docs.select($"doc_id", $"n_chars",
      (greatest(ks: _*) % 8).as("shard"))
  }

  /** Streaming entry for [[shardRoute]]: file-source doc stream routed
    * on arrival. */
  def shardRouteStream(s: SparkSession, docsDir: String): DataFrame =
    shardRoute(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir))

  /** Running per-lang corpus counters — the dataset card's (q144)
    * volume row maintained ONLINE: a global (non-windowed, watermark-
    * free) streaming aggregation whose state is bounded by |langs|,
    * not by time, so it needs no watermark and runs in UPDATE output
    * mode (each microbatch re-emits only the langs it touched).
    * Complete mode would re-emit every lang every batch — same state,
    * chattier sink; append is unavailable without a watermark. This is
    * the third output-mode point in the streaming matrix (append:
    * decontam/chunk/route; complete: windowed counts; update: here). */
  def corpusCardStream(s: SparkSession, docsDir: String): DataFrame = {
    import s.implicits._
    s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.Fns.tokens($"text"))).as("n_tokens"))
  }

  /** Streaming context-window chunking: the EXACT batch transform
    * ([[graft.operators.Prep.chunkTransform]] — q91) applied to a doc
    * stream. Chunking is a per-row fan-out (tokenize → stride starts →
    * slice), so it needs no watermark and no state: each crawl shard is
    * chunked the moment it lands, append mode end to end. */
  def chunkStream(s: SparkSession, docsDir: String): DataFrame =
    graft.operators.Prep.chunkTransform(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir))

  // ---- streaming DSIR scoring (stream-static, stateless) ----

  /** The static side of streaming DSIR (q267's model as an ingest-time
    * scorer): the 4096-bucket weight table DENSIFIED into one sorted
    * array row — index b+1 holds bucket b's micro-nat weight, with
    * buckets the training corpus never produced filled by the add-one-
    * smoothed default ln((n_r+B)/(n_t+B)) (c_t = c_r = 0), so a NEW
    * streamed document hashing into an unseen bucket is scored with
    * the model's actual probability for it, not dropped. Same 1-row
    * broadcast-relation shape as [[benchmarkShingles]]: built by
    * executors, no driver collect at stream start. */
  def dsirWeightArray(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = graft.operators.Curation.dsirModel(s, d).localCheckpoint()
    val spine = m.select($"n_t", $"n_r").limit(1)
      .select(explode(sequence(lit(0L), lit(4095L))).as("b"), $"n_t", $"n_r")
    spine.join(m.select($"b", $"w_micro"), Seq("b"), "left")
      .select($"b", coalesce($"w_micro",
        floor(log(($"n_r" + 4096).cast("double") / ($"n_t" + 4096).cast("double"))
          * 1000000.0).cast("long")).as("wm"))
      .agg(expr("transform(array_sort(collect_list(struct(b, wm))), x -> x.wm)")
        .as("w_arr"))
      .withColumn("k", lit(1))
  }

  /** Shared transform: per-doc DSIR importance score against the pinned
    * weight array — q267's scoring half in a STATELESS per-row shape
    * (batch q267 explodes bigrams and double-groupBys; a streaming
    * groupBy would put unbounded per-doc aggregation state where
    * scoring needs none). The per-row `aggregate` over the doc's own
    * bigram list is integer-exact and identical to the batch sum, so
    * DocStreamsSpec can assert score equality row-for-row and that the
    * streamed top-25 IS the q267 selection. Same interpreted-HOF
    * caveat as [[incrementalDedup]]. */
  def dsirScore(docs: DataFrame, wArr: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.filter($"lang" =!= "en")
      .select($"doc_id", $"lang", $"source",
        graft.functions.Fns.tokens($"text").as("tk"))
      .filter(size($"tk") >= 2)
      .withColumn("k", lit(1))
      .join(broadcast(wArr), Seq("k"))
      .select($"doc_id", $"lang", $"source",
        expr(
          """aggregate(
               transform(sequence(1, size(tk) - 1),
                 i -> md5_prefix(concat(element_at(tk, i), ' ',
                        element_at(tk, i + 1)), 15) % 4096),
               cast(0 as bigint),
               (acc, b) -> acc + element_at(w_arr, cast(b as int) + 1))""")
          .as("score_micro"))
  }

  /** Streaming entry: file-source doc stream scored on arrival against
    * the static DSIR model. Stateless → append mode. */
  def dsirScoreStream(s: SparkSession, docsDir: String,
      wArr: DataFrame): DataFrame =
    dsirScore(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir),
      wArr)

  // ---- streaming MinHash-LSH dedup (flatMapGroupsWithState) ----

  /** One LSH band posting: document × band, keyed by the band's
    * signature digest. */
  case class BandRow(b: Int, band_key: String, doc_id: Long, sig: Seq[Long])
  /** Band-bucket state: every (doc_id, sig) this bucket has seen. */
  case class BucketState(members: List[(Long, Seq[Long])])
  /** Candidate near-dup pair (same schema as batch q41's output). */
  case class CandPair(doc1: Long, doc2: Long, n_sig_equal: Long)

  private val NSig = 24
  private val BandRowsN = 3
  private val P = 2147483647L

  /** 24-element MinHash signature of a document — the SAME pipeline as
    * batch q41 (ShingleHashesImpl 28-bit shingle hashes, then affine
    * permutations (2i+1)·h + i mod p), evaluated per row in typed code
    * so the streaming side needs no shuffle aggregation to build
    * signatures (a streaming groupBy(doc).agg(min…) before stateful
    * dedup would stack two stateful operators). None for shingle-less
    * (< 3 token) docs, matching q41's implicit drop. */
  def minhashSig(text: String): Option[Array[Long]] = {
    val hs = graft.functions.ShingleHashesImpl
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString(text), 3, 7)
      .toLongArray()
    if (hs.isEmpty) None
    else Some(Array.tabulate(NSig) { i =>
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = ((2L * i + 1) * hs(j) + i) % P
        if (v < m) m = v
        j += 1
      }
      m
    })
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Doc stream → band postings (stateless per-row fan-out of 8). */
  def bandRows(docs: Dataset[(Long, String)]): Dataset[BandRow] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.flatMap { case (id, text) =>
      minhashSig(text).toSeq.flatMap { sig =>
        (0 until NSig / BandRowsN).map { b =>
          val key = md5Hex(
            sig.slice(b * BandRowsN, (b + 1) * BandRowsN).mkString(","))
          BandRow(b, key, id, sig.toSeq)
        }
      }
    }
  }

  /** Streaming LSH dedup: the band-bucket inverted index AS STREAMING
    * STATE. Each (band, band_key) group remembers its members across
    * microbatches; a newly arriving doc emits one candidate pair per
    * existing bucket-mate (so pairs spanning microbatches are found,
    * not just within-batch ones). The same pair can surface from
    * several bands — downstream consumers (and the spec) dedup, like
    * batch q41's `.distinct()`.
    *
    * State growth is the honest cost of EXACT streaming dedup: the
    * index grows with the corpus, as any dedup index must. Production
    * knobs, in the order a pipeline reaches for them: state-store TTL
    * (forget docs older than the dedup horizon), bucket-size caps
    * (LSH buckets beyond k members are near-certain dup families —
    * emit against the first k only), or periodic compaction to the
    * canonical-doc set per bucket. */
  def lshDedupStateful(bands: Dataset[BandRow]): Dataset[CandPair] = {
    val s = bands.sparkSession
    import s.implicits._
    bands.groupByKey(r => (r.b, r.band_key))
      .flatMapGroupsWithState[BucketState, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it: Iterator[BandRow], state: GroupState[BucketState]) =>
          // process arrivals in doc_id order for deterministic output
          val arrivals = it.map(r => (r.doc_id, r.sig)).toArray
            .sortBy(_._1).distinct
          var members = state.getOption.map(_.members).getOrElse(Nil)
          val out = List.newBuilder[CandPair]
          arrivals.foreach { case (id, sig) =>
            if (!members.exists(_._1 == id)) {
              members.foreach { case (mid, msig) =>
                val (d1, d2) = if (mid < id) (mid, id) else (id, mid)
                val eq = sig.iterator.zip(msig.iterator)
                  .count { case (x, y) => x == y }.toLong
                out += CandPair(d1, d2, eq)
              }
              members ::= (id -> sig)
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }

  /** Streaming entry: file-source doc stream → signatures → band
    * postings → stateful bucket dedup. Candidate pairs appear as soon
    * as the second member of a bucket arrives, whichever microbatch
    * brought it. */
  def lshDedupStream(s: SparkSession, docsDir: String): Dataset[CandPair] = {
    import s.implicits._
    val docs = s.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    lshDedupStateful(bandRows(docs))
  }

  // ---- incremental batch-vs-corpus dedup (streaming twin of q52) ----

  /** The static side of the incremental-dedup probe: corpus LSH band
    * index (band "b|band_key" → member doc_ids), collected once at
    * stream start from the batch [[graft.operators.Dedup.minhashBands]]
    * pipeline. At real scale this map is the maintained corpus index —
    * a broadcast (or a bloom filter over band keys when doc lists are
    * not needed) refreshed between ingest windows, never rebuilt per
    * microbatch. */
  def corpusBandIndex(s: SparkSession, d: String): Map[String, Seq[Long]] = {
    import s.implicits._
    graft.operators.Dedup.minhashBands(s, d)
      .filter($"doc_id" % 10 =!= 0)
      .select(concat($"b".cast("string"), lit("|"), $"band_key").as("k"), $"doc_id")
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
  }

  /** The per-row front half both probe shapes share: the "new batch"
    * filter, the 24-hash signature, and the 8 band keys — all computed
    * from the doc's own shingle array (identical integer arithmetic to
    * the batch minhashBands), so everything stays STATELESS: append
    * mode, no watermark, no state store. The nested higher-order
    * lambdas are interpreted (CodegenFallback) but touch only the
    * row's own ≤|shingles| array; a production build would fuse them
    * into a native Expression like ShingleHashes. */
  private def probeBandKeys(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .filter($"doc_id" % 10 === 0) // the "new batch" convention shared with q52
      .select($"doc_id",
        graft.functions.TextExprs.shingle_hashes($"text", 3, 7).as("shs"))
      .filter(size($"shs") > 0)
      .withColumn("sig", expr(
        """transform(sequence(0, 23),
             i -> array_min(transform(shs, h -> ((2*i+1)*h + cast(i as bigint)) % 2147483647)))"""))
      .withColumn("band_keys", expr(
        """transform(sequence(0, 7),
             b -> concat(cast(b as string), '|',
                         md5(concat_ws(',', transform(slice(sig, b*3+1, 3), v -> cast(v as string))))))"""))
      .select($"doc_id", $"band_keys")
  }

  /** Shared transform: per-doc incremental dedup against the pinned
    * corpus index — q52's semantics in a stateless per-row shape,
    * with the index entering as a SPARK BROADCAST (the production
    * shape VERDICT r6 #7 asked to promote): shipped to each executor
    * once, out of band, and looked up per row. The [[incrementalDedupInPlan]]
    * twin instead embeds the map into the plan as a typedLit literal —
    * fine for a spec's hundreds of keys, but a plan-embedded index is
    * re-serialized with every task and interpreted inside the
    * expression tree, which stops working long before a real corpus
    * index stops fitting executor memory. The lookup UDF is a pure
    * broadcast-map probe (no arithmetic the optimizer could have
    * fused), the one place a UDF beats any Column formulation. */
  def incrementalDedup(docs: DataFrame, idx: Map[String, Seq[Long]]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bIdx = s.sparkContext.broadcast(idx)
    val probe = udf((keys: Seq[String]) =>
      keys.flatMap(k => bIdx.value.getOrElse(k, Seq.empty[Long]))
        .distinct.sorted)
    probeBandKeys(docs)
      .select($"doc_id", probe($"band_keys").as("matched"))
      .select($"doc_id",
        size($"matched").cast("long").as("n_matches"),
        (size($"matched") > 0).as("is_dup"))
  }

  /** Test twin of [[incrementalDedup]]: the index as a plan-embedded
    * typedLit map (the pre-r7 default). Kept because it exercises the
    * pure-Column formulation the broadcast path must agree with —
    * DocStreamsSpec asserts shape equivalence. */
  def incrementalDedupInPlan(docs: DataFrame, idx: Map[String, Seq[Long]]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    probeBandKeys(docs)
      .select($"doc_id",
        array_distinct(flatten(transform($"band_keys",
          k => coalesce(element_at(typedLit(idx), k), typedLit(Seq.empty[Long])))))
          .as("matched"))
      .select($"doc_id",
        size($"matched").cast("long").as("n_matches"),
        (size($"matched") > 0).as("is_dup"))
  }

  /** Streaming entry: file-source doc stream probed against the static
    * corpus band index (broadcast) on arrival. Stateless → append
    * mode. */
  def incrementalDedupStream(s: SparkSession, docsDir: String,
      idx: Map[String, Seq[Long]]): DataFrame =
    incrementalDedup(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir),
      idx)

  // ---- per-doc repetition scoring (streaming twin of q366) ----

  /** q366's Gopher repetition scores as a STATELESS per-row transform:
    * the batch op counts gram types via explode + groupBy (the right
    * shape for a corpus rollup), but a crawl-time filter needs the
    * score per document ON ARRIVAL — so here the within-doc gram
    * counting happens inside the row with higher-order functions
    * (count each position's gram in the doc's own gram array). That
    * is O(n²) in doc length and interpreted — the row-local price of
    * no shuffle, no state store, append mode; docs are capped by the
    * tokenizer contract, and a production build would fuse the count
    * into a native Expression like ShingleHashes. Scores are
    * integer-identical to the batch op (same counts, same integer
    * division), which DocStreamsSpec asserts doc-for-doc. */
  def repetitionScore(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", $"lang",
        graft.functions.Fns.tokens($"text").as("tk"))
      .filter(size($"tk") >= 3)
      .withColumn("g2", expr(
        "transform(sequence(1, size(tk) - 1), i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"))
      .withColumn("g3", expr(
        """transform(sequence(1, size(tk) - 2),
             i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1), ' ', element_at(tk, i + 2)))"""))
      .select($"doc_id", $"lang",
        expr("""10000 * size(filter(g2, g -> size(filter(g2, h -> h = g)) >= 2))
                div size(g2)""").as("dup2_bp"),
        expr("""10000 * size(filter(g3, g -> size(filter(g3, h -> h = g)) >= 2))
                div size(g3)""").as("dup3_bp"),
        expr("""10000 * array_max(transform(g2, g -> size(filter(g2, h -> h = g))))
                div size(g2)""").as("top2_bp"))
      .withColumn("flagged", $"dup2_bp" >= 2000 || $"top2_bp" >= 800)
  }

  /** Streaming entry: score every arriving doc's repetition profile —
    * the crawl-ingest quality gate. Stateless → append mode. */
  def repetitionStream(s: SparkSession, docsDir: String): DataFrame =
    repetitionScore(
      s.readStream.schema(docSchema).option("maxFilesPerTrigger", "1")
        .parquet(docsDir))

  // ---- incremental gram-novelty (streaming twin of q392) ----

  /** Per-doc 3-gram type rows (doc_id, g), distinct within doc —
    * the shared gram shape of q392 and the novelty stream. */
  def gramTypes(docs: Dataset[(Long, String)]): Dataset[(Long, String)] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.flatMap { case (id, text) =>
      val tk = text.split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toSeq.distinct.map(g => (id, g))
    }
  }

  /** First-seen gram detection with the corpus index as INITIAL
    * STATE — the streaming half of q392's incremental novelty: the
    * seen-gram index is keyed streaming state (seeded from the batch
    * base relation, exactly how a maintained index would be loaded),
    * and each arriving gram type emits (g, first_doc) ONCE, the first
    * time any doc carries it. Within a microbatch, the smallest
    * doc_id wins (deterministic); across microbatches, state wins.
    * DocStreamsSpec proves the emitted set — and the per-doc rollup —
    * equals batch q392 doc for doc. */
  def noveltyStateful(grams: Dataset[(Long, String)],
      seed: Dataset[String]): Dataset[(String, Long)] = {
    val s = grams.sparkSession
    import s.implicits._
    val initial = seed.map(g => (g, true)).groupByKey(_._1).mapValues(_._2)
    grams.groupByKey(_._2)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout, initial) {
        (g: String, it: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((g, it.map(_._1).min))
          }
      }
  }

  /** Streaming entry: delta-doc stream → gram types → stateful
    * first-seen novelty against the seeded corpus index. */
  def noveltyStream(s: SparkSession, docsDir: String,
      seed: Dataset[String]): Dataset[(String, Long)] = {
    import s.implicits._
    val docs = s.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(docsDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    noveltyStateful(gramTypes(docs), seed)
  }
}
