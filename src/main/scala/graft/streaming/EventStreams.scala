package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over event streams (SURVEY.md §2: the
  * reference has no streaming, but the engine's 100 TB mandate does —
  * the same windowed/sessionized aggregations as the batch catalog
  * entries q50/q51, expressed as unbounded streams).
  *
  * Design: file-source streams (`readStream.parquet`) so a directory of
  * parquet drops becomes an incremental pipeline; watermarks bound state;
  * sessionization keeps per-user state in `flatMapGroupsWithState`
  * (timeout-driven flush), which scales horizontally because state is
  * hash-partitioned by user.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, nEvents: Long)

  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** Incremental scan of a directory where event parquet files land.
    *
    * Ingest-rate knobs (Spark file-source options, surfaced because the
    * two ingest regimes want opposite settings):
    *  - `maxFilesPerTrigger`: cap files consumed per micro-batch. A
    *    BACKFILL over months of drops would otherwise plan one giant
    *    first batch (every historical file) — bound it so state stores,
    *    shuffles, and checkpoints stay micro-batch-sized.
    *  - `latestFirst`: process newest files first. Steady-state serving
    *    behind on a backlog catches up to fresh data before draining
    *    history; combine with `maxFilesPerTrigger` for bounded batches.
    *    Note: out-of-order file processing makes event-time watermarks
    *    advance on the NEWEST data, so late historical windows may be
    *    dropped as late — leave it off for backfills that must be
    *    complete. */
  def readEventStream(spark: SparkSession, dir: String,
      schema: StructType,
      maxFilesPerTrigger: Option[Int] = None,
      latestFirst: Boolean = false): DataFrame = {
    maxFilesPerTrigger.foreach(n => require(n >= 1,
      s"maxFilesPerTrigger must be >= 1, got $n"))
    var r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n =>
      r = r.option("maxFilesPerTrigger", n.toString))
    if (latestFirst) r = r.option("latestFirst", "true")
    r.parquet(dir)
  }

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * late data (and therefore state size). Append-mode compatible. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup (the streaming counterpart of `Dedup.exact`,
    * and the shape a continuously-ingesting training-data pipeline runs).
    * State is the set of fingerprints seen, hash-partitioned across
    * executors; the watermark on the event-time column bounds that state.
    *
    * Contract — first-occurrence-WITHIN-THE-DELAY, not global first:
    * `dropDuplicatesWithinWatermark` guarantees a fingerprint is emitted
    * at most once among records whose event times fall within the
    * watermark delay of each other. Once the watermark passes a
    * fingerprint's state expiry, the state is dropped, and a duplicate
    * arriving AFTER that is RE-EMITTED as a fresh first sighting. That
    * re-emission-beyond-delay behavior is the bounded-state trade-off
    * every streaming dedup makes (unbounded `dropDuplicates(fp)` state
    * would be the alternative); size `watermark` to the duplicate window
    * you need, and run a batch `Dedup.exact` pass downstream if global
    * uniqueness is required. */
  def streamingDedup(records: DataFrame, tsCol: String, fpCol: String,
      watermark: String = "2 hours"): DataFrame =
    records
      .withWatermark(tsCol, watermark)
      // dedup on the fingerprint ALONE; state for a fingerprint expires
      // once the watermark passes its first sighting (dropDuplicates(fp)
      // would grow state forever; adding ts to the keys wouldn't dedup)
      .dropDuplicatesWithinWatermark(fpCol)

  /** Stream-static incremental dedup: drop stream records whose content
    * fingerprint already exists in a static seen-index — the streaming
    * face of [[graft.operators.Dedup.dedupAgainst]] (new crawl batches
    * arriving as a stream, deduped against the accumulated corpus). A
    * stream-static LEFT ANTI join is stateless — the static side is
    * planned per micro-batch, no watermark or state store — so it
    * composes freely with [[streamingDedup]], which covers in-stream
    * duplicates that a static index can't know about. */
  def streamingDedupAgainst(stream: DataFrame, fpCol: String,
      seen: DataFrame, seenFpCol: String): DataFrame =
    stream.join(seen.select(col(seenFpCol).as("__seen_fp")),
      stream(fpCol) === col("__seen_fp"), "left_anti")

  /** Stream-static enrichment: join an unbounded stream against a batch
    * dimension table. Spark plans the static side as a broadcast (or
    * re-reads it per micro-batch if too large) — no state, no watermark
    * needed for an inner equi-join; the streaming side never buffers.
    * This is THE shape for attaching user/customer attributes to an
    * event stream at ingest. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    stream.join(dim, stream(streamKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))

  /** Watermarked stream-stream inner join: pair each left event with
    * right events on the same key whose event time falls in
    * `[leftTs, leftTs + withinMs]` — the ad-attribution /
    * request-response correlation shape. Both sides carry watermarks AND
    * the join condition bounds event-time distance, which is what lets
    * Spark evict buffered rows once the watermark passes (an unbounded
    * stream-stream join refuses to start in append mode). State is
    * hash-partitioned by key, so it scales horizontally like the
    * sessionizer; matches beyond the watermark delay are the same
    * bounded-state trade-off [[streamingDedup]] documents.
    *
    * `joinType` also admits "left_outer"/"right_outer"/"full_outer":
    * outer rows (nulls on the unmatched side) emit only once the
    * watermark proves no in-bound match can still arrive — i.e. a later
    * batch must advance the watermark past the row's bound before the
    * null-padded result appears. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      withinMs: Long, watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $withinMs MILLISECOND"),
      joinType)
  }

  /** ANN serving over a query STREAM (X3 × streaming): each micro-batch
    * of query vectors runs the batch
    * [[graft.operators.Similarity.cosineTopK]] (or any batch top-k the
    * caller wraps) against the static, pre-indexed corpus via
    * `foreachBatch` — the documented pattern for applying batch-only
    * operators (windows, ranks) per micro-batch. Query rows are
    * independent, so the operator is state-free; the corpus side is a
    * plain DataFrame the caller can point at a PQ-coded or bucketed
    * index. `sink` receives the scored micro-batch and its batch id. */
  def serveTopK(queryStream: DataFrame,
      score: DataFrame => DataFrame)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    queryStream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) => sink(score(batch), id)
    }

  /** Streaming drift monitor — the ingest-side data-quality alarm: every
    * micro-batch's categorical distribution (source, language, label) is
    * χ²-tested against a STATIC reference snapshot
    * ([[graft.operators.Profiles.chiSquaredDrift]]) and the per-category
    * report goes to `sink` with the batch id; Σ contrib over the report
    * is the batch's drift statistic for the caller's threshold. The
    * same stateless foreachBatch shape as [[serveTopK]]: the reference
    * is a plain (small, typically cached) DataFrame, the stream side is
    * one aggregation per micro-batch, no state store, no watermark.
    * Empty micro-batches emit no report (a 0-row distribution has no
    * defined test, and the operator would rightly raise). */
  def driftMonitor(stream: DataFrame, reference: DataFrame,
      colName: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        if (!batch.isEmpty) {
          sink(graft.operators.Profiles.chiSquaredDrift(
            reference, batch.toDF(), colName), id)
        }
    }

  /** Gap-based sessionization via the BUILT-IN `session_window` (merging
    * event-time windows + watermark state eviction) — the declarative
    * counterpart of [[sessionize]]. Prefer this when per-session output
    * is aggregates only (count/min/max): Catalyst owns the state format
    * and the sort-merge of overlapping windows. Reach for
    * [[sessionize]]'s explicit `flatMapGroupsWithState` when the
    * per-session logic needs arbitrary code (custom payloads, early
    * emission, side effects). Append-mode: sessions emit once the
    * watermark passes their close. */
  def sessionizeWindowed(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization with explicit per-user state: a session
    * closes when `gapMs` passes without an event — emitted as soon as a
    * later event proves the gap, or (with `ProcessingTimeTimeout`) when
    * the state times out. The default `NoTimeout` emits only gap-proven
    * sessions, which keeps micro-batch draining deterministic; production
    * pipelines that must flush idle users pass `ProcessingTimeTimeout`. */
  def sessionize(events: Dataset[Event], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[Session] = {
    implicit val stateEnc: Encoder[SessionState] =
      Encoders.product[SessionState]
    implicit val outEnc: Encoder[Session] = Encoders.product[Session]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, s.start, s.last, s.nEvents))
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last > gapMs =>
            closed += Session(userId, s.start, s.last, s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case Some(s) =>
            cur = Some(SessionState(s.start, math.max(s.last, t),
              s.nEvents + 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
          state.setTimeoutDuration(gapMs)
      }
      closed.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update)
  }

  /** One metric observation on a keyed stream. */
  case class MetricPoint(key: String, seq: Long, value: Double)

  /** A fired CUSUM alarm. */
  case class CusumAlarm(key: String, seq: Long, cusum: Double)

  case class CusumState(prefixSum: Double, prefixMin: Double)

  /** STREAMING CUSUM drift alarm — [[graft.operators.Checks.cusumAlarms]]
    * carried across micro-batches: the window fold's entire per-key
    * state is just (prefix sum P, prefix-min of P), so
    * `flatMapGroupsWithState` keeps TWO DOUBLES per key (no event
    * buffer, no watermark) and emits an alarm row the moment
    * `S = P − min(0, minP)` crosses `threshold`. Batch rows fold in
    * `seq` order within each micro-batch; ACROSS batches `seq` must
    * arrive non-decreasing per key (route late data through an
    * upstream watermark+sort — the fold, like any CUSUM, is
    * order-defined). Emitted alarms are exactly the batch operator's
    * alarm rows for the same prefix of data. */
  def streamingCusum(points: Dataset[MetricPoint], target: Double,
      slack: Double, threshold: Double): Dataset[CusumAlarm] = {
    require(slack >= 0, s"streamingCusum: slack must be >= 0, got $slack")
    require(threshold > 0,
      s"streamingCusum: threshold must be > 0, got $threshold")
    implicit val stateEnc: Encoder[CusumState] =
      Encoders.product[CusumState]
    implicit val outEnc: Encoder[CusumAlarm] = Encoders.product[CusumAlarm]
    implicit val keyEnc: Encoder[String] = Encoders.STRING

    def update(key: String, rows: Iterator[MetricPoint],
        state: GroupState[CusumState]): Iterator[CusumAlarm] = {
      var st = state.getOption.getOrElse(CusumState(0.0, 0.0))
      val out = Seq.newBuilder[CusumAlarm]
      rows.toSeq.sortBy(_.seq).foreach { pt =>
        val p = st.prefixSum + (pt.value - target - slack)
        val s = p - math.min(st.prefixMin, 0.0)
        if (s > threshold) out += CusumAlarm(key, pt.seq,
          BigDecimal(s).setScale(6, // HALF_UP: match the batch round()
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        st = CusumState(p, math.min(st.prefixMin, p))
      }
      state.update(st)
      out.result().iterator
    }

    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
