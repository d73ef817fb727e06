package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input shape for streaming ops: the events table as a stream. */
final case class StreamEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Emitted when a user session closes (gap > sessionGap or watermark). */
final case class SessionSummary(user_id: Long, n_events: Long,
    start_ms: Long, end_ms: Long, total_value: Double)

private final case class SessionState(n: Long, startMs: Long, endMs: Long,
    total: Double)

/** Emitted when a user first reaches a funnel stage (1=view, 2=click
  * after view, 3=purchase after that click). */
final case class StageReached(user_id: Long, stage: Int, ts_ms: Long)

private final case class FunnelState(t1: Long, t2: Long, t3: Long)

/** Per-event anomaly verdict against the user's running mean. */
final case class ScoredEvent(event_id: Long, user_id: Long, value: Double,
    running_mean: Double, is_anomaly: Boolean)

private final case class RunningStats(n: Long, total: Double)

/** transformWithState processor (Spark 4's arbitrary-state API, successor
  * to flatMapGroupsWithState): per-user running mean in a ValueState;
  * events > factor × mean flag as anomalies once the mean has warmed up.
  * State is typed, per-key, TTL-able, and RocksDB-backed. */
class AnomalyProcessor(factor: Double, warmup: Long)
    extends StatefulProcessor[Long, StreamEvent, ScoredEvent] {
  @transient private var stats: ValueState[RunningStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stats = getHandle.getValueState[RunningStats]("stats",
      Encoders.product[RunningStats], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[ScoredEvent] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var s = if (stats.exists()) stats.get() else RunningStats(0L, 0.0)
    val out = sorted.map { e =>
      val mean = if (s.n == 0) e.value else s.total / s.n
      val anomaly = s.n >= warmup && e.value > factor * mean
      s = RunningStats(s.n + 1, s.total + e.value)
      ScoredEvent(e.event_id, key, e.value, mean, anomaly)
    }
    stats.update(s)
    out.iterator
  }
}

/** transformWithState processor for the live funnel: per-user (t1, t2, t3)
  * earliest-conversion timestamps (0 = not reached), advanced by the same
  * strict-ordering rule as the batch operator (ops.Analytics.funnel): a
  * stage-n event converts only strictly after the stored stage-(n-1) time.
  * Emits one StageReached per first conversion.
  *
  * State is three longs per user — bounded regardless of event volume.
  * Within a batch events are sorted by event time; across batches the
  * state machine is monotone, so it equals the batch funnel whenever
  * events arrive batch-ordered (the spec proves this on the real events
  * table). Under heavy cross-batch reordering a conversion can be missed
  * (never invented) — the replayable batch query is the reconciliation
  * path, exactly how production funnel pipelines pair live + batch. */
class FunnelProcessor
    extends StatefulProcessor[Long, StreamEvent, StageReached] {
  @transient private var st: ValueState[FunnelState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FunnelState]("funnel",
      Encoders.product[FunnelState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[StageReached] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var s = if (st.exists()) st.get() else FunnelState(0L, 0L, 0L)
    val out = Seq.newBuilder[StageReached]
    sorted.foreach { e =>
      val t = e.ts.getTime
      e.event_type match {
        case "view" if s.t1 == 0L =>
          s = s.copy(t1 = t); out += StageReached(key, 1, t)
        case "click" if s.t1 != 0L && s.t2 == 0L && t > s.t1 =>
          s = s.copy(t2 = t); out += StageReached(key, 2, t)
        case "purchase" if s.t2 != 0L && s.t3 == 0L && t > s.t2 =>
          s = s.copy(t3 = t); out += StageReached(key, 3, t)
        case _ => ()
      }
    }
    st.update(s)
    out.result().iterator
  }
}

/** One admitted doc from the streaming source-quota gate. */
final case class QuotaAdmit(doc_id: Long, source: String, seq: Long)

/** One (src → dst) event-type transition observed for a user — the
  * streaming bigram row [[StreamingOps.transitionEdges]] emits. */
final case class TransitionEdge(user_id: Long, src: String, dst: String)

/** Last-event linker for the streaming Markov matrix: state is the
  * user's latest (event-time, id, type); each event in batch order emits
  * the edge from its predecessor — including the cross-batch edge from
  * the stored state to the batch's first event. */
class TransitionProcessor
    extends StatefulProcessor[Long, StreamEvent, TransitionEdge] {
  @transient private var st: ValueState[LastEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[LastEvent]("last",
      Encoders.product[LastEvent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[TransitionEdge] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var last = if (st.exists()) Option(st.get()) else None
    val out = Seq.newBuilder[TransitionEdge]
    sorted.foreach { e =>
      last.foreach(p => out += TransitionEdge(key, p.typ, e.event_type))
      last = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
    }
    last.foreach(st.update)
    out.result().iterator
  }
}

final case class LastEvent(t: Long, id: Long, typ: String)

/** CDC observation for the streaming SCD2 twin: `key` re-observed with
  * `value` at logical time `batch`. */
final case class ScdObservation(key: Long, value: Long, batch: Int)

/** A CLOSED validity interval — the only thing the streaming side can
  * finalize (the open interval lives in state until its closing change
  * arrives; the batch query is the source of open-interval truth). */
final case class ScdClosed(key: Long, value: Long, valid_from: Int, valid_to: Int)

private final case class ScdCurrent(value: Long, since: Int)

/** Streaming SCD2 (twin of ops.Analytics.scd2History): one ScdCurrent per
  * key in state; a changed observation closes the standing interval at
  * batch−1 and opens a new one; a same-value re-observation is collapsed
  * exactly like the batch lag() filter. Emits only finalized intervals —
  * append-mode clean. */
class Scd2Processor
    extends StatefulProcessor[Long, ScdObservation, ScdClosed] {
  @transient private var cur: ValueState[ScdCurrent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[ScdCurrent]("scd_current",
      Encoders.product[ScdCurrent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[ScdObservation],
      timerValues: TimerValues): Iterator[ScdClosed] = {
    val sorted = rows.toSeq.sortBy(_.batch)
    var s = if (cur.exists()) Option(cur.get()) else None
    val out = Seq.newBuilder[ScdClosed]
    sorted.foreach { o =>
      s match {
        case None => s = Some(ScdCurrent(o.value, o.batch))
        case Some(c) if c.value != o.value =>
          out += ScdClosed(key, c.value, c.since, o.batch - 1)
          s = Some(ScdCurrent(o.value, o.batch))
        case Some(_) => () // idempotent re-observation collapses
      }
    }
    s.foreach(cur.update)
    out.result().iterator
  }
}

/** Structured Streaming surface: the streaming twins of the batch operators
  * (windowed aggregation with watermark; stateful sessionization via
  * flatMapGroupsWithState). The reference declares spark-streaming but never
  * uses it (SURVEY §2.11); these are the extensions a live events pipeline
  * needs, built on the engine's own semantics so the batch queries in
  * Relational are their replayable equivalents.
  *
  * Scale notes: state is partitioned by user_id (keyed state store);
  * watermark bounds state size — late data beyond 1 h is dropped rather
  * than accumulating unbounded state. Output is append-mode so sinks see
  * only finalized windows/sessions.
  */
object StreamingOps {

  /** Tumbling-window per-type counts with a 1 h watermark. */
  def windowedTypeCounts(events: DataFrame, window_ : String = "10 minutes")
      : DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stateful sessionization: sessions close after `gapMinutes` of event-time
    * inactivity. Event-time timeouts (not processing-time) make emission
    * deterministic and replay-safe: a session closes either in-batch (a later
    * event arrives past the gap) or when the watermark passes its end + gap.
    * The batch analog is Relational.sessionize. */
  def sessionize(events: Dataset[StreamEvent], gapMinutes: Int = 30)
      : Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[StreamEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.n, s.startMs, s.endMs, s.total))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionSummary]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(SessionState(s.n + 1, s.startMs, t, s.total + e.value))
                case Some(s) =>
                  closed += SessionSummary(userId, s.n, s.startMs, s.endMs, s.total)
                  cur = Some(SessionState(1, t, t, e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming intake source-quota gate: admit at most `cap` documents
    * per source ACROSS THE WHOLE STREAM, by arrival order — the online
    * complement of [[graft.ops.Corpus.sourceCap]]'s hash-ordered batch
    * cap (a stream cannot know the corpus-global hash order, so a live
    * quota admits first-come; within a micro-batch ties break by doc_id
    * so crash-replay re-emits identical rows). State per source is ONE
    * counter — KiB total at any source cardinality — and overflow docs
    * drop at intake, which is the point: the quota bounds what
    * downstream ever stores or shuffles. `seq` is the per-source
    * admission index (1..cap), contiguous across micro-batches. */
  def sourceQuota(docs: Dataset[(Long, String)],
      cap: Int): Dataset[QuotaAdmit] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[Long, QuotaAdmit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (src: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[QuotaAdmit]
          it.map(_._1).toSeq.sorted.foreach { id =>
            if (n < cap) { n += 1; out += QuotaAdmit(id, src, n) }
          }
          state.update(n)
          out.result().iterator
      }
  }

  /** Running-mean anomaly detection via transformWithState — requires the
    * RocksDB state store provider (set by `requireRocksDb`). */
  def anomalies(events: Dataset[StreamEvent], factor: Double = 3.0,
      warmup: Long = 3L): Dataset[ScoredEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor(factor, warmup),
        TimeMode.None(), OutputMode.Append())
  }

  /** Live conversion funnel — the streaming twin of ops.Analytics.funnel:
    * emits a StageReached row the moment a user first converts each stage,
    * with three longs of state per user. Requires RocksDB (see
    * [[requireRocksDb]]), like all transformWithState operators. */
  def funnelStages(events: Dataset[StreamEvent]): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming twin of [[graft.ops.Analytics.transitionsOf]]'s bigram
    * stream: per-user last-event state links consecutive events ACROSS
    * micro-batches, so each arriving event emits exactly one (src → dst)
    * edge once a predecessor exists; aggregate downstream and the counts
    * equal the batch window's when batches respect event-time order (the
    * funnel/SCD2 caveat: cross-batch reordering reconciles via the batch
    * query). State per user is ONE (ts, event_id, type) triple — bounded
    * and TTL-able; the edge stream is the same wordcount shape the batch
    * op aggregates. Requires [[requireRocksDb]]. */
  def transitionEdges(events: Dataset[StreamEvent]): Dataset[TransitionEdge] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Streaming SCD2 — the CDC-to-dimension-history twin of
    * ops.Analytics.scd2History: closed validity intervals stream out the
    * moment their closing change arrives; one small ScdCurrent per key in
    * RocksDB state. Requires [[requireRocksDb]]. */
  def scd2Closed(obs: Dataset[ScdObservation]): Dataset[ScdClosed] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.key)
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }

  /** transformWithState only runs on the RocksDB state store. */
  def requireRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Stream-stream inner join: match each error event to the same user's
    * preceding activity within `windowMinutes` — the streaming twin of
    * ops.RangeJoin.errorContext. Both sides are watermarked so the join
    * state is bounded: a buffered row can be evicted once the other
    * stream's watermark passes its match window. */
  def errorContextJoin(errors: DataFrame, activity: DataFrame,
      windowMinutes: Int = 5): DataFrame = {
    val e = errors.withWatermark("ts", "1 hour")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("err_ts"))
    val a = activity.withWatermark("ts", "1 hour")
      .select(col("event_id").as("ctx_id"), col("user_id").as("ctx_user"),
        col("ts").as("ctx_ts"), col("value").as("ctx_value"))
    e.join(a,
      col("user_id") === col("ctx_user") &&
        col("ctx_ts") >= col("err_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("ctx_ts") <= col("err_ts") &&
        col("ctx_id") =!= col("err_id"),
      "inner")
      .select(col("err_id"), col("user_id"), col("ctx_id"), col("ctx_value"))
  }

  /** Streaming dedup: drop events whose key was already seen inside the
    * watermark horizon (`dropDuplicatesWithinWatermark` — bounded state). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** Stream-static dedup triage — the streaming face of
    * ops.Dedup.incrementalDedup's exact stage: each incoming document
    * (stream) is checked against the STANDING corpus's digest set (a
    * static frame). No streaming state at all: the static side IS the
    * state, re-planned per micro-batch and broadcast when small — the
    * standard shape for enriching/filtering a stream against a curated
    * reference table. Emits (doc_id, is_dup). */
  def dedupAgainstStatic(incoming: DataFrame,
      standing: DataFrame): DataFrame = {
    val digests = standing
      .select(md5(col("text")).as("fp")).distinct()
      .withColumn("__hit", lit(1))
    incoming
      .withColumn("fp", md5(col("text")))
      .join(digests, Seq("fp"), "left_outer")
      .select(col("doc_id"), col("__hit").isNotNull.as("is_dup"))
  }

  /** Streaming curation front door — the streaming face of the batch
    * intake chain [[graft.ops.Redaction]] → canonical-digest triage
    * ([[graft.ops.Dedup.canonicalGroups]]'s fingerprint) against the
    * STANDING corpus. Redaction is a stateless codegen projection, so it
    * streams for free; the dup check is the stream-static join shape of
    * [[dedupAgainstStatic]] (the static side is the state). The standing
    * digests are computed over REDACTED canonical text so an incoming
    * near-copy whose only difference is maskable PII still triages as a
    * duplicate. Emits (doc_id, red_text, n_term_hits, is_dup). */
  def curationFrontDoor(incoming: DataFrame,
      standing: DataFrame): DataFrame = {
    import graft.ops.Redaction
    curationFrontDoorWithDigests(incoming,
      standing.select(Redaction.curationFp(col("text")).as("fp")))
  }

  /** [[curationFrontDoor]] against a PRECOMPUTED digest table — the form
    * an intake pipeline runs at scale, with the digests read from the
    * persisted [[graft.sources.IndexStore]] curation index (appended per
    * accepted batch) instead of recomputed from the standing corpus on
    * every stream start. `digests` needs one `fp` column of
    * [[graft.ops.Redaction.curationFp]] values. */
  def curationFrontDoorWithDigests(incoming: DataFrame,
      digests: DataFrame): DataFrame = {
    import graft.ops.{Dedup, Redaction}
    val hits = digests.select(col("fp")).distinct()
      .withColumn("__hit", lit(1))
    incoming
      .withColumn("red_text", Redaction.redacted(col("text")))
      .withColumn("n_term_hits",
        Redaction.termHits(Redaction.piiMasked(col("text"))).cast("int"))
      .withColumn("fp", md5(Dedup.canonicalText(col("red_text"))))
      .join(hits, Seq("fp"), "left_outer")
      .select(col("doc_id"), col("red_text"), col("n_term_hits"),
        col("__hit").isNotNull.as("is_dup"))
  }

  /** Self-maintaining intake sink — the closed loop of the curation front
    * door: each micro-batch of incoming docs is triaged against the
    * PERSISTED curation-digest index ([[graft.sources.IndexStore]]),
    * accepted (non-duplicate) docs land in `acceptedPath`, and their
    * digests are APPENDED to the index inside the same foreachBatch — so
    * batch N+1 deduplicates against everything accepted through batch N
    * without any rescan. Per-batch cost is O(batch + collisions): the
    * probe join reads the index, the appends are delta-proportional
    * parquet writes. Exactly-once effect by the versioned-segment
    * discipline ([[graft.sources.IndexStore.writeDeltaSegment]]): the
    * triage reads the standing index plus only delta segments with id <
    * batchId — never the batch's own, possibly half-landed, segment — so
    * a crash-replay recomputes IDENTICAL verdicts and both writes are
    * `b=<batchId>`-keyed overwrites that rewrite the same bytes. (The
    * naive append ordering is not recoverable by ordering alone: digests
    * first loses the accepted docs on replay, accepted docs first
    * duplicates them.) The accepted output is therefore partitioned by
    * micro-batch (`b=<id>` directories) — per-batch lineage for free. */
  def intakeSink(incoming: DataFrame, indexPath: String,
      acceptedPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        intakeBatch(batch, batchId, indexPath, acceptedPath)
      }
      .start()

  /** One [[intakeSink]] micro-batch — exposed so the spec can replay a
    * batch id and assert the crash-recovery contract (same bytes, no
    * duplicates, no verdict flips). */
  def intakeBatch(batch: DataFrame, batchId: Long, indexPath: String,
      acceptedPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    val triaged = curationFrontDoorWithDigests(batch,
      IndexStore.readWithDeltasBefore(s, indexPath, batchId))
      .localCheckpoint(true) // pin: consumed by both writes below
    val acceptedIds = triaged.filter(!col("is_dup")).select(col("doc_id"))
    val accepted = batch.join(acceptedIds, "doc_id").localCheckpoint(true)
    accepted.write.mode("overwrite").parquet(s"$acceptedPath/b=$batchId")
    IndexStore.appendCurationDigestsVersioned(accepted, indexPath, batchId)
    ()
  }

  /** Full-strength streaming triage sink — [[intakeSink]]'s exact-digest
    * gate widened to the complete intake policy: each micro-batch is
    * triaged exact AND near (MinHash band probe + exact-Jaccard verify)
    * against the persisted [[graft.sources.IndexStore]] dedup index, the
    * per-doc verdicts land in `verdictPath`, and NOVEL docs append to all
    * three index tables inside the same foreachBatch — so batch N+1 both
    * exact- and near-deduplicates against everything accepted through
    * batch N. Per-batch cost is O(batch × collisions); the standing
    * corpus is never rescanned. Same exactly-once recipe as
    * [[intakeSink]]: the triage reads index segments with id < batchId
    * only, so a crash-replay recomputes identical verdicts (no
    * novel→exact flips from seeing its own landed segment) and the
    * verdict write is a `b=<batchId>`-keyed overwrite. */
  def triageSink(incoming: DataFrame, indexRoot: String,
      verdictPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        triageBatch(batch, batchId, indexRoot, verdictPath)
      }
      .start()

  /** Exact-recall streaming intake — the prefix-join twin of
    * [[triageSink]]: each micro-batch probes the persisted PREFIX index
    * ([[graft.ops.Dedup.prefixProbe]] — lossless candidates, exact
    * Jaccard verify, no banding probability) and then appends its own
    * sets + prefixes under the FROZEN dictionary inside the same
    * foreachBatch, so batch N+1 exact-dedups against everything through
    * batch N. Emitted pairs are (standing doc_a, batch doc_b, jaccard).
    *
    * Same exactly-once recipe as the other sinks: the probe reads index
    * segments with id < batchId only and both writes are
    * `b=<batchId>`-keyed overwrites — a crash-replay recomputes identical
    * pairs and rewrites the same bytes. The dictionary stays frozen
    * across batches (stale df blunts pruning, never recall), refreshed
    * only by [[graft.sources.IndexStore.rebuildPrefix]] maintenance. */
  def prefixIntakeSink(incoming: DataFrame, indexRoot: String,
      pairsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        prefixIntakeBatch(batch, batchId, indexRoot, pairsPath)
      }
      .start()

  /** One [[prefixIntakeSink]] micro-batch — exposed for the replay spec. */
  def prefixIntakeBatch(batch: DataFrame, batchId: Long, indexRoot: String,
      pairsPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    val idx = IndexStore.readPrefixBefore(s, indexRoot, batchId)
    // prefixProbe materializes its pairs (localCheckpoint) before return,
    // so the index append below can't change what the write sees
    val pairs = graft.ops.Dedup.prefixProbe(batch, idx)
    pairs.write.mode("overwrite").parquet(s"$pairsPath/b=$batchId")
    IndexStore.appendPrefixVersioned(batch, indexRoot, batchId)
    ()
  }

  /** Streaming vector intake over the persisted ANN standing index — the
    * vector twin of [[prefixIntakeSink]]: each micro-batch of embeddings
    * first PROBES the index for its top-k nearest standing neighbors
    * (flat-IVF gate under the index's FROZEN centroids — the arriving-data
    * shape of similarity triage: near-dup flagging, semantic routing),
    * then appends its own cell + PQ-code rows inside the same
    * foreachBatch, so batch N+1 probes against everything through batch N.
    *
    * Same exactly-once recipe as the other intake sinks: the probe reads
    * cells segments with id < batchId only, neighbor output and index
    * segments are `b=<batchId>`-keyed overwrites — a crash-replay
    * recomputes identical rows and rewrites the same bytes. Quantizers
    * stay frozen across batches (stale centroids cost cell balance, never
    * correctness); periodic re-fits are offline maintenance, like
    * [[graft.sources.IndexStore.rebuildPrefix]]. */
  def annIntakeSink(incoming: DataFrame, indexRoot: String,
      neighborsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        annIntakeBatch(batch, batchId, indexRoot, neighborsPath)
      }
      .start()

  /** Streaming embedding NEAR-DUP intake over the persisted wide-band
    * signature index — the near-dup twin of [[annIntakeSink]] (which
    * answers top-k similarity; this answers "is the arriving vector a
    * near-duplicate of anything standing"): each micro-batch of raw
    * embeddings is triaged against the signature segments with id <
    * batchId (bipartite band gate + exact cosine verify, the same
    * dataflow as the `emb_dup_intake` queries), its per-vector
    * near/novel verdicts land as a `b=<batchId>` overwrite, and the
    * batch's own signatures append inside the same foreachBatch — so
    * batch N+1 catches near-dups of batch N. Exactly-once by the family
    * recipe: reads bounded to segments < batchId, both writes
    * batch-keyed overwrites, signatures under seeded-constant planes
    * deterministic — a crash-replay rewrites identical bytes. */
  def sigIntakeSink(incoming: DataFrame, indexPath: String,
      verdictsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sigIntakeBatch(batch, batchId, indexPath, verdictsPath)
      }
      .start()

  /** Frozen-model DSIR intake sink: each micro-batch of documents is
    * scored against the PERSISTED standing importance model
    * ([[graft.sources.IndexStore.standingDsirModel]]) and gated by its
    * frozen per-source thresholds; verdicts land batch-keyed. Unlike the
    * dedup/signature sinks the model never changes inside the stream
    * (refit is offline maintenance, like BPE's), so the sink is
    * STATELESS and trivially exactly-once: a crash-replay rescoring of
    * batch N recomputes identical verdicts and rewrites the same b=N
    * bytes. */
  def dsirIntakeSink(incoming: DataFrame, modelRoot: String,
      verdictsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dsirIntakeBatch(batch, batchId, modelRoot, verdictsPath)
      }
      .start()

  /** One [[dsirIntakeSink]] micro-batch — exposed for the replay spec. */
  def dsirIntakeBatch(batch: DataFrame, batchId: Long, modelRoot: String,
      verdictsPath: String): Unit = {
    val s = batch.sparkSession
    val (lam, thr) = graft.sources.IndexStore.readDsirModel(s, modelRoot)
    graft.ops.Corpus.dsirGate(batch, lam, thr)
      .write.mode("overwrite").parquet(s"$verdictsPath/b=$batchId")
    ()
  }

  /** Frozen perplexity-gate intake sink: each micro-batch of documents is
    * scored under the PERSISTED standing LM and bucketed by its frozen
    * per-language tercile thresholds
    * ([[graft.sources.IndexStore.buildPpl]]) — the streaming form of
    * [[graft.ops.TermScoring.pplIntakeIndexed]]. Like the DSIR sink the
    * model never changes inside the stream (re-freeze is offline
    * maintenance, triggered by
    * [[graft.sources.IndexStore.pplBackoffDrift]]), so the sink is
    * STATELESS and trivially exactly-once: a crash-replay rescoring of
    * batch N recomputes identical verdicts and rewrites the same b=N
    * bytes. */
  def pplIntakeSink(incoming: DataFrame, modelRoot: String,
      verdictsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        pplIntakeBatch(batch, batchId, modelRoot, verdictsPath)
      }
      .start()

  /** Streaming FRONT DOOR: each micro-batch of crawl documents runs the
    * full composed admission gate — exact/near dedup triage, benchmark
    * decontamination, perplexity bucket, DSIR cutoff — against FROZEN
    * standing artifacts (the dedup index at `dedupRoot`, the LM gate at
    * `pplRoot`, the DSIR model at `dsirRoot`), the streaming form of
    * [[graft.ops.Corpus.frontDoor]]. All four gates are pure functions of
    * (batch, artifacts) — no index append inside the stream, maintenance
    * is offline — so the sink is STATELESS and exactly-once by replay: a
    * crash-rerun of batch N rewrites identical b=N verdict bytes. */
  def frontDoorSink(incoming: DataFrame, dedupRoot: String,
      pplRoot: String, dsirRoot: String, phashRoot: String,
      audioRoot: String, verdictsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.sources.IndexStore
    // all gate artifacts are FROZEN for the stream's lifetime
    // (maintenance is offline), so load them ONCE in the sink's closure:
    // readDsirModel collects its model rows driver-side and readPpl
    // round-trips threshold frames — per-batch latency must scale with
    // batch size, not artifact load (r13 ADVICE). The dedup/ppl/phash/
    // audio frames stay lazy parquet-backed plans (corpus-scale tables
    // must not pin executor memory for the stream's lifetime); what's
    // hoisted is the plan construction and the driver-side model collect.
    val s = incoming.sparkSession
    val idx = IndexStore.readDedup(s, dedupRoot)
    val art = IndexStore.readPpl(s, pplRoot)
    val (lam, thr) = IndexStore.readDsirModel(s, dsirRoot)
    val phash = IndexStore.readPhash(s, phashRoot)
    val audio = IndexStore.readAudioSig(s, audioRoot)
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        frontDoorBatch(batch, batchId, idx, art, lam, thr, phash, audio,
          verdictsPath)
      }
      .start()
  }

  /** One front-door micro-batch against PRE-LOADED frozen artifacts —
    * what [[frontDoorSink]] actually runs per batch. */
  private[graft] def frontDoorBatch(batch: DataFrame, batchId: Long,
      idx: graft.sources.IndexStore.DedupIndex,
      art: graft.sources.IndexStore.PplArtifact,
      lam: Array[Long], thr: Seq[(String, Long)], phashSig: DataFrame,
      audioSig: DataFrame, verdictsPath: String): Unit = {
    graft.ops.Corpus.frontDoorVerdicts(batch, idx, art, lam, thr, phashSig,
        audioSig)
      .orderBy(col("doc_id"))
      .write.mode("overwrite").parquet(s"$verdictsPath/b=$batchId")
    ()
  }

  /** One [[frontDoorSink]] micro-batch loaded from artifact ROOTS —
    * the replay spec's entry point (a crash-rerun has no live sink
    * closure to inherit loaded artifacts from). */
  def frontDoorBatch(batch: DataFrame, batchId: Long, dedupRoot: String,
      pplRoot: String, dsirRoot: String, phashRoot: String,
      audioRoot: String, verdictsPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    val (lam, thr) = IndexStore.readDsirModel(s, dsirRoot)
    frontDoorBatch(batch, batchId, IndexStore.readDedup(s, dedupRoot),
      IndexStore.readPpl(s, pplRoot), lam, thr,
      IndexStore.readPhash(s, phashRoot),
      IndexStore.readAudioSig(s, audioRoot), verdictsPath)
  }

  /** One [[pplIntakeSink]] micro-batch — exposed for the replay spec. */
  def pplIntakeBatch(batch: DataFrame, batchId: Long, modelRoot: String,
      verdictsPath: String): Unit = {
    val s = batch.sparkSession
    val art = graft.sources.IndexStore.readPpl(s, modelRoot)
    val scored = graft.ops.TermScoring.lmScoreWith(
        batch.select(col("doc_id"), split(col("text"), " ").as("toks")),
        art.model)
      .select(col("doc_id"), col("lm_score"))
      .join(graft.ops.TextAnalysis.predictedLang(batch), "doc_id")
    graft.ops.TermScoring.bucketBy(scored, art.thresholds)
      .orderBy(col("doc_id"))
      .write.mode("overwrite").parquet(s"$verdictsPath/b=$batchId")
    ()
  }

  /** Streaming multimodal intake sink: each micro-batch of assets is
    * triaged against the PERSISTED phash index (near/novel verdicts —
    * the multimodal twin of [[sigIntakeSink]]), then its signatures are
    * appended as one batch-keyed segment — so batch N+1's assets dedup
    * against batch N's. Decode runs ONCE per asset, at intake; the index
    * never stores payload bytes. Exactly-once by the family recipe:
    * probes read segments `< batchId`, writes overwrite `b=<batchId>`,
    * and the signature is a pure function of the bytes — a crash-replay
    * rewrites identical bytes. */
  def phashIntakeSink(incoming: DataFrame, indexPath: String,
      verdictsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        phashIntakeBatch(batch, batchId, indexPath, verdictsPath)
      }
      .start()

  /** One [[phashIntakeSink]] micro-batch — exposed for the replay spec. */
  def phashIntakeBatch(batch: DataFrame, batchId: Long, indexPath: String,
      verdictsPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    import s.implicits._
    val assets = batch.as[graft.ops.Asset]
    val standing = IndexStore.readPhashBefore(s, indexPath, batchId)
    // triage materializes (localCheckpoint) before return, so the index
    // append below can't change what the verdict write sees
    val verdicts = graft.ops.Multimodal
      .triageAssetsAgainstPhash(assets, standing)
    verdicts.write.mode("overwrite").parquet(s"$verdictsPath/b=$batchId")
    IndexStore.appendPhashVersioned(assets, indexPath, batchId)
    ()
  }

  /** Streaming AUDIO intake sink: each micro-batch of WAV assets is
    * triaged against the PERSISTED audio-signature index (near/novel
    * verdicts — the audio twin of [[phashIntakeSink]]), then its
    * signatures append as one batch-keyed segment, so batch N+1's audio
    * dedups against batch N's. Decode runs ONCE per asset, at intake;
    * the index never stores payload bytes. Exactly-once by the family
    * recipe: probes read segments `< batchId`, writes overwrite
    * `b=<batchId>`, and the signature is a pure function of the bytes —
    * a crash-replay rewrites identical bytes. */
  def audioIntakeSink(incoming: DataFrame, indexPath: String,
      verdictsPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        audioIntakeBatch(batch, batchId, indexPath, verdictsPath)
      }
      .start()

  /** One [[audioIntakeSink]] micro-batch — exposed for the replay spec. */
  def audioIntakeBatch(batch: DataFrame, batchId: Long, indexPath: String,
      verdictsPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    import s.implicits._
    val assets = batch.as[graft.ops.Asset]
    val standing = IndexStore.readAudioSigBefore(s, indexPath, batchId)
    // triage materializes (localCheckpoint) before return, so the index
    // append below can't change what the verdict write sees
    val verdicts = graft.ops.AudioDedup
      .triageAssetsAgainstAudioSig(assets, standing)
    verdicts.write.mode("overwrite").parquet(s"$verdictsPath/b=$batchId")
    IndexStore.appendAudioSigVersioned(assets, indexPath, batchId)
    ()
  }

  /** One [[sigIntakeSink]] micro-batch — exposed for the replay spec. */
  def sigIntakeBatch(batch: DataFrame, batchId: Long, indexPath: String,
      verdictsPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    val standing = IndexStore.readSigBefore(s, indexPath, batchId)
    // triage materializes (localCheckpoint) before return, so the index
    // append below can't change what the verdict write sees
    val verdicts = graft.ops.Similarity.triageVectorsAgainstSig(
      batch, standing)
    verdicts.write.mode("overwrite").parquet(s"$verdictsPath/b=$batchId")
    IndexStore.appendSigVersioned(batch, indexPath, batchId)
    ()
  }

  /** One [[annIntakeSink]] micro-batch — exposed for the replay spec. */
  def annIntakeBatch(batch: DataFrame, batchId: Long, indexRoot: String,
      neighborsPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    val cs = IndexStore.readAnnCentroids(s, indexRoot)
    val standing = IndexStore.readAnnCellsBefore(s, indexRoot, batchId)
    val q = graft.ops.Similarity.embeddedOf(batch)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"))
    // selfExclude=false: the incoming batch's vec_ids are a different id
    // space from the standing index — an id collision must not drop a
    // legitimate standing neighbor
    val neighbors = graft.ops.Similarity
      .ivfProbeQueries(q, standing, cs, graft.ops.Similarity.AnnK,
        graft.ops.Similarity.IvfProbe, pruneCells = true,
        selfExclude = false)
    // materialize before the index append below can extend the cells view
    neighbors.write.mode("overwrite").parquet(s"$neighborsPath/b=$batchId")
    IndexStore.appendAnnVersioned(batch, indexRoot, batchId)
    ()
  }

  /** One [[triageSink]] micro-batch — exposed for the replay spec. */
  def triageBatch(batch: DataFrame, batchId: Long, indexRoot: String,
      verdictPath: String): Unit = {
    import graft.sources.IndexStore
    val s = batch.sparkSession
    val verdicts = graft.ops.Dedup.triageAgainstIndex(batch,
      IndexStore.readDedupBefore(s, indexRoot, batchId))
      .localCheckpoint(true) // pin: consumed by the write and the novel join
    verdicts.write.mode("overwrite").parquet(s"$verdictPath/b=$batchId")
    val novel = batch.join(
      verdicts.filter(col("verdict") === "novel").select(col("doc_id")),
      "doc_id")
    IndexStore.appendDedupVersioned(novel, indexRoot, batchId)
    ()
  }

  /** CDC-style streaming upsert sink: a stream of (key, op, payload)
    * change rows maintains a keyed snapshot table via foreachBatch +
    * [[graft.ops.Upsert.merge]] — each micro-batch is one MERGE applied
    * in arrival order, so the maintained table always equals the batch
    * fold of every batch seen so far (the equivalence Round4Spec proves
    * for [[graft.ops.Upsert.readView]]).
    *
    * foreachBatch is the right tool, not a custom sink: the merge needs
    * to READ the current snapshot, which a StreamingWrite cannot.
    * Micro-batch replays after a crash re-run the merge on the same
    * batch — idempotent for this fold (delete/update of an applied batch
    * re-applies to the same end state; insert behaves as upsert by
    * design), which is the standard exactly-once-effect argument for
    * foreachBatch sinks. At scale the snapshot rewrite inside each batch
    * becomes the merge-on-read append ([[graft.ops.Upsert.readView]]) —
    * same per-batch dataflow, O(delta) writes. */
  def upsertSink(changes: DataFrame, store: graft.collab.TableStore,
      table: String, key: String, payload: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val snapshot = store.scan(table).select(col(key), col(payload))
        // localCheckpoint(eager): materialize the merge DISTRIBUTED (pinned
        // on executors) before truncate deletes the files it was read from
        // — no driver funnel. A cluster deployment hardens the swap into a
        // versioned-directory flip (or the MOR delta append) so an
        // executor loss mid-swap cannot drop pinned blocks.
        val merged = graft.ops.Upsert
          .merge(snapshot, batch, key, payload)
          .select(col(key), col(payload))
          .localCheckpoint(true)
        store.truncate(table)
        store.append(table, merged)
      }
      .start()

  /** Merge-on-read CDC sink — the scale-honest variant of [[upsertSink]]:
    * each micro-batch APPENDS to the delta-log table (an O(delta)
    * distributed parquet write; the base snapshot's files are never
    * touched) stamped with the micro-batch id, so the log preserves
    * arrival order for [[graft.ops.Upsert.readView]]'s per-key fold.
    * Readers reconcile via readView(base, [delta log]);
    * [[graft.ops.Upsert.compact]] folds the log back into base when it
    * outgrows its read amortization. Batch replays after a crash would
    * re-append; dedup by `__batch` (max-applied watermark or a
    * read-side `dropDuplicates(key, op, __batch)`) is the standard
    * foreachBatch idempotence recipe — the spec pins normal-path
    * semantics. */
  def upsertSinkMor(changes: DataFrame, store: graft.collab.TableStore,
      deltaTable: String, key: String, payload: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // __seq persists intra-batch arrival order durably: without it,
        // same-key ops inside one micro-batch would tie on __batch in the
        // read view's fold and replay in an order the source never saw
        store.append(deltaTable,
          batch.select(col(key), col("op"), col(payload),
            lit(batchId).cast("long").as("__batch"),
            monotonically_increasing_id().as("__seq")))
      }
      .start()

  /** Streaming incremental-aggregate-view sink: an event stream maintains
    * the per-user stats view ([[graft.ops.ViewMaintain.viewOf]]) as a
    * VERSIONED parquet store — each micro-batch merges its map-side
    * partial aggregate into the latest committed version and writes
    * `v=<batchId>` ([[graft.ops.ViewMaintain.applyViewBatch]]).
    *
    * Exactly-once effect WITHOUT a dedup column: the merge reads only
    * versions strictly older than the current batch id, so a
    * crash-replay of batch N deterministically rewrites the same
    * `v=N` bytes — the version flip is the idempotence mechanism, and
    * readers never observe a half-swapped view (they list committed
    * versions, same discipline as a transaction-log table format; old
    * versions double as time travel until compacted). The streaming twin
    * of q_incr_agg: after any prefix of batches, the newest version
    * equals the batch aggregate of every event seen so far. */
  def aggViewSink(events: DataFrame, viewRoot: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.ViewMaintain.applyViewBatch(batch, viewRoot, batchId)
      }
      .start()

  /** Read the reconciled view of a base + MOR delta-log pair maintained
    * by [[upsertSinkMor]]: the log (already batch-stamped) folds per key
    * in `__batch` order through Upsert.readView's state machine. */
  def morSnapshot(store: graft.collab.TableStore, baseTable: String,
      deltaTable: String, key: String, payload: String): DataFrame =
    graft.ops.Upsert.readViewLog(
      store.scan(baseTable).select(col(key), col(payload)),
      store.scan(deltaTable), key, payload)

  /** Time travel over the CDC log: the snapshot AS OF micro-batch
    * `maxBatch` is just the read view over the log prefix — the batch
    * stamps the sink persists double as version numbers, exactly how a
    * transaction-log table format reconstructs historical versions. The
    * prefix filter prunes at the scan when the log is partitioned or
    * sorted by `__batch`. */
  def morSnapshotAt(store: graft.collab.TableStore, baseTable: String,
      deltaTable: String, key: String, payload: String,
      maxBatch: Long): DataFrame =
    graft.ops.Upsert.readViewLog(
      store.scan(baseTable).select(col(key), col(payload)),
      store.scan(deltaTable).filter(col("__batch") <= maxBatch),
      key, payload)
}
