package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** One raw judgment event: a rater's label for an item (round 11 —
  * the streaming side of the annotation family's judgment relation,
  * `operators/Annotation.judgments`). */
case class JudgmentRow(item: Long, rater: Long, label: String)

/** One raw judgment event with its event time — the TTL variant's
  * input ([[JudgmentStreams.voteStatefulTtl]]). */
case class TimedJudgmentRow(item: Long, rater: Long, label: String,
    ts: java.sql.Timestamp)

/** Per-item vote state: each rater's collapsed label (the batch
  * relation's min-label rule) plus a monotone arrival counter. */
case class VoteState(labels: Map[Long, String], seq: Long)

/** TTL-variant state: the vote fold plus the item's max event time,
  * which re-arms the event-time timeout each microbatch. */
case class TimedVoteState(labels: Map[Long, String], seq: Long,
    maxTsMs: Long)

/** One consensus update: the item's current majority vote after this
  * microbatch, with the tie-break (count desc, label asc) matching the
  * batch `vote` window in q480/q485/q489 exactly. `seq` is the item's
  * monotone processed-arrival count — the LAST update per item (max
  * seq) is the stream's final answer. */
case class VoteUpdate(item: Long, vlabel: String, n_raters: Long, seq: Long)

/** Streaming twin of the annotation family's majority-vote consensus
  * (round 11): a live labeling pipeline maintains each item's current
  * vote as judgments ARRIVE, rather than re-running the batch vote.
  * Matches the batch semantics exactly: multi-row raters collapse to
  * their lexicographically-smallest label (the judgment relation's
  * min-label rule, applied incrementally — a rater's collapsed label
  * only ever decreases), and the vote tie-breaks on (count desc,
  * label asc).
  *
  * Scale: state per item is a ≤|rater-pool|-entry map — bounded by
  * the pool, not the stream; items shard across the cluster by group
  * key. [[JudgmentStreams.voteStatefulTtl]] adds the event-time state
  * TTL (items whose labeling window closed drop their state), so total
  * state is bounded by the LIVE item set rather than growing with the
  * item universe forever. The batch==stream equality is
  * `JudgmentStreamsSpec`'s whole-corpus check. */
object JudgmentStreams {

  val judgmentSchema: StructType = StructType(Seq(
    StructField("item", LongType), StructField("rater", LongType),
    StructField("label", StringType)))

  /** The majority vote over a rater→label map, batch-identical:
    * highest count wins, ties to the smaller label. */
  private[streaming] def majority(labels: Map[Long, String]): String =
    labels.values.groupBy(identity).view.mapValues(_.size).toSeq
      .minBy { case (l, c) => (-c, l) }._1

  /** Default stateful consensus (r13, VERDICT r12 ask #6): the
    * EVENT-TIME-TTL fold — see [[voteStatefulTtl]], which this
    * delegates to. State is bounded by the live item set; unbounded
    * state is the explicit opt-out ([[voteStatefulUnbounded]]). The
    * timed-row signature is deliberate: choosing the default path
    * means carrying event time. */
  def voteStateful(jud: Dataset[TimedJudgmentRow],
      ttl: java.time.Duration): Dataset[VoteUpdate] =
    voteStatefulTtl(jud, ttl)

  /** EXPLICIT OPT-OUT of state expiry: each item's rater map is held
    * FOREVER (GroupStateTimeout.NoTimeout), so total state grows with
    * the item universe, not the live window. Legitimate only when the
    * item universe is provably bounded (a fixed labeling campaign, a
    * batch-parity check like `JudgmentStreamsSpec`'s whole-corpus
    * case); a 100 TB-scale live pipeline must use the TTL default —
    * this name carries the "Unbounded" warning so the choice is
    * visible at every call site. */
  def voteStatefulUnbounded(jud: Dataset[JudgmentRow]): Dataset[VoteUpdate] = {
    val s = jud.sparkSession
    import s.implicits._
    jud.groupByKey(_.item)
      .flatMapGroupsWithState[VoteState, VoteUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (item, it: Iterator[JudgmentRow], state: GroupState[VoteState]) =>
          val st = state.getOption.getOrElse(VoteState(Map.empty, 0L))
          var labels = st.labels
          var seq = st.seq
          // deterministic fold order within the microbatch
          it.toArray.sortBy(r => (r.rater, r.label)).foreach { r =>
            seq += 1
            val collapsed = labels.get(r.rater) match {
              case Some(old) if old <= r.label => old
              case _ => r.label
            }
            labels = labels.updated(r.rater, collapsed)
          }
          state.update(VoteState(labels, seq))
          Iterator.single(
            VoteUpdate(item, majority(labels), labels.size, seq))
      }
  }

  /** The event-time-TTL consensus fold — the DEFAULT since r13
    * ([[voteStateful]] delegates here; VERDICT r11 ask #5 added the
    * knob, r12 ask #6 made it the default): items whose labeling window has
    * CLOSED — no judgment for `ttl` of event time past the item's last
    * arrival — drop their state instead of holding a rater map forever,
    * so total state is bounded by the LIVE item set, not the item
    * universe. Event-time semantics:
    *
    *  - the stream carries a watermark on `ts` (set by the caller via
    *    [[voteStreamTtl]]'s `watermarkDelay`, e.g. "0 seconds" when the
    *    source is ordered);
    *  - each microbatch re-arms the item's timeout to
    *    max-event-time-seen + ttl (clamped above the current watermark —
    *    Spark rejects a timeout at or below it);
    *  - when the watermark passes the timeout, the group fires with
    *    `hasTimedOut`, removes its state and EMITS NOTHING (the item's
    *    last regular update already was its final answer);
    *  - a straggler judgment arriving after expiry re-creates FRESH
    *    state — by then the consensus was shipped, and a fresh
    *    single-rater vote is the honest restatement of what is known.
    *
    * The batch==stream contract becomes: restricted to items whose
    * history fits inside a live window, the final per-item update still
    * equals the batch vote (JudgmentStreamsSpec's TTL case). */
  def voteStatefulTtl(jud: Dataset[TimedJudgmentRow],
      ttl: java.time.Duration): Dataset[VoteUpdate] = {
    val s = jud.sparkSession
    import s.implicits._
    val ttlMs = ttl.toMillis
    jud.groupByKey(_.item)
      .flatMapGroupsWithState[TimedVoteState, VoteUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (item, it: Iterator[TimedJudgmentRow], state: GroupState[TimedVoteState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(TimedVoteState(Map.empty, 0L, 0L))
            var labels = st.labels
            var seq = st.seq
            var maxTs = st.maxTsMs
            it.toArray.sortBy(r => (r.rater, r.label)).foreach { r =>
              seq += 1
              maxTs = math.max(maxTs, r.ts.getTime)
              val collapsed = labels.get(r.rater) match {
                case Some(old) if old <= r.label => old
                case _ => r.label
              }
              labels = labels.updated(r.rater, collapsed)
            }
            state.update(TimedVoteState(labels, seq, maxTs))
            // Spark requires the timeout strictly above the watermark;
            // an item whose whole history is already behind it gets the
            // minimum legal horizon and expires on the next sweep
            state.setTimeoutTimestamp(
              math.max(maxTs + ttlMs, state.getCurrentWatermarkMs + 1))
            Iterator.single(
              VoteUpdate(item, majority(labels), labels.size, seq))
          }
      }
  }

  /** Default streaming entry: timestamped file source → TTL vote
    * (delegates to [[voteStreamTtl]]). The unbounded-state entry is
    * the explicit opt-out, [[voteStreamUnbounded]]. */
  def voteStream(s: SparkSession, judDir: String,
      ttl: java.time.Duration, watermarkDelay: String): Dataset[VoteUpdate] =
    voteStreamTtl(s, judDir, ttl, watermarkDelay)

  /** EXPLICIT OPT-OUT entry (see [[voteStatefulUnbounded]]): an
    * un-timestamped judgment stream whose per-item state never
    * expires — bounded-universe campaigns and batch-parity checks
    * only. */
  def voteStreamUnbounded(s: SparkSession, judDir: String): Dataset[VoteUpdate] = {
    import s.implicits._
    val jud = s.readStream.schema(judgmentSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(judDir)
      .select(col("item"), col("rater"), col("label")).as[JudgmentRow]
    voteStatefulUnbounded(jud)
  }

  val timedJudgmentSchema: StructType = StructType(Seq(
    StructField("item", LongType), StructField("rater", LongType),
    StructField("label", StringType), StructField("ts", TimestampType)))

  /** TTL streaming entry: timestamped file-source judgment stream with
    * a `watermarkDelay` watermark on `ts`, state dropped `ttl` of
    * event time after each item's last judgment. */
  def voteStreamTtl(s: SparkSession, judDir: String,
      ttl: java.time.Duration, watermarkDelay: String): Dataset[VoteUpdate] = {
    import s.implicits._
    val jud = s.readStream.schema(timedJudgmentSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(judDir)
      .withWatermark("ts", watermarkDelay)
      .select(col("item"), col("rater"), col("label"), col("ts"))
      .as[TimedJudgmentRow]
    voteStatefulTtl(jud, ttl)
  }
}
