package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (additive scope — the
  * reference is a pure batch bridge, SURVEY.md §2.10).
  *
  * Everything is expressed so the *same* logical transform runs in batch
  * (for the oracle-checked queries) and as a stream: windowed aggregates
  * with watermarks, and custom sessionization state via
  * flatMapGroupsWithState. File-source streaming over the test parquet
  * exercises the full incremental execution path.
  */
object EventStreams {

  /** The legacy physical shape: TIMESTAMP(NANOS) read as raw nano-longs
    * under spark.sql.legacy.parquet.nanosAsLong. Kept for specs that
    * deliberately write this encoding; production reads derive the schema
    * from the file itself (see readEventStream). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The CURRENT corpus shape: ts as µs TimestampType (what the driver's
    * generator writes since the ns-restore block was removed). This is the
    * empty-dir fallback for readEventStream — a stream created before any
    * file lands must bind to the encoding that file will actually carry. */
  val eventSchemaMicros: StructType = StructType(
    eventSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  /** File-source stream of the events table. Structured Streaming's file
    * source requires a user-supplied schema, so we probe the file with a
    * one-off batch read (driver-side footer read, no data scan) and bind
    * the stream to whatever physical ts encoding the file actually
    * carries — long-nanos, µs NTZ, or µs UTC — then normalize to
    * TimestampType exactly like graft.Tables.load does for batch. This
    * mirrors the reference's runtime-typed cell decode
    * (SQLiteDataFrame.swift:87-104): trust the storage class in the file,
    * not a compile-time declaration. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // If no file has landed yet (legal for a file-source stream: it idles
    // until data arrives), the probe cannot infer a schema — fall back to
    // the CURRENT corpus encoding (µs TimestampType) instead of failing
    // stream *creation*. The r9 ADVICE pass caught the previous fallback
    // (legacy nano-long) defeating the schema-adaptive goal in exactly the
    // empty-dir case: a µs file landing later would be read through a
    // LongType binding. Streams over a not-yet-populated dir therefore
    // support the current encoding; legacy-ns dirs must have a file
    // present at stream creation (all spec and production paths do).
    val physical =
      try spark.read.option("pathGlobFilter", "events.parquet").parquet(dir).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          // r10 ADVICE: make the tradeoff diagnosable — if a legacy
          // TIMESTAMP(NANOS) file lands in this dir AFTER creation, the
          // µs binding will misread its nano-longs; this warning is the
          // breadcrumb that explains the resulting million-fold ts skew
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"readEventStream($dir): no file present at stream " +
            "creation — binding the CURRENT corpus encoding (ts as µs " +
            "TimestampType). A legacy TIMESTAMP(NANOS) file landing later " +
            "will be misread; legacy-ns dirs need a file present at creation.")
          eventSchemaMicros
      }
    // full normalization (ts AND value): a decimal-encoded `value` must
    // not leak DecimalType into streaming aggregates any more than batch
    graft.Tables.normalize(
      spark.readStream
        .schema(physical)
        .option("pathGlobFilter", "events.parquet") // file source needs a dir
        .parquet(dir))
  }

  /** Tumbling-window counts with a watermark: the streaming twin of the
    * batch q28_time_window. `groupByStruct = true` keys on the window
    * STRUCT instead of its start field — required for Append-mode output
    * (Spark needs the event-time column among the grouping keys; the
    * start-field projection is only legal under Complete, which is what
    * the oracle-twinned default uses). */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours", groupByStruct: Boolean = false): DataFrame = {
    val key =
      if (groupByStruct) window(col("ts"), window_)
      else window(col("ts"), window_).getField("start").as("hour_start")
    events
      .withWatermark("ts", watermark)
      .groupBy(key, col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
  }

  /** Stream-stream interval join: purchases attributed to a click by the
    * same user within `windowSec` before the purchase. Both sides carry
    * watermarks so join state is bounded (Spark requires the interval
    * condition + watermarks to garbage-collect buffered rows). */
  def clickAttribution(events: DataFrame, windowSec: Long = 3600,
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", watermark)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("c_ts") < col("p_ts"),
      "inner")
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("value"))
  }

  /** Stream-stream LEFT OUTER interval join: every click, matched to the
    * same-user purchases that follow it within `windowSec` — or to NULL
    * once the watermark proves no match can still arrive. Outer
    * stream-stream joins are the shape inner joins can't express (did the
    * click convert or not?): matched rows emit within their batch, but an
    * unmatched click is held in the join state until the watermark passes
    * `c_ts + windowSec` (only then is "no purchase followed" final), so
    * null-extended rows emit one watermark-advance later. Callers must
    * restrict to the watermark-complete region — clicks near the end of a
    * finite replay are never resolved (see the e09 query). */
  def clickFollowedByPurchase(events: DataFrame, windowSec: Long = 3600,
      watermark: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") > col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowSec SECONDS"),
      "left_outer")
      .select(col("click_id"), col("c_user").as("user_id"), col("c_ts"),
        col("purchase_id"))
  }

  /** Streaming exact dedup: drop re-delivered events by id within the
    * watermark horizon (state is bounded by the watermark — the streaming
    * twin of Dedup.dedupExact). */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Streaming dedup with TTL'd state: unlike [[dedupEvents]] (whose state
    * only drops once the *event-time column itself* ages past the
    * watermark), `dropDuplicatesWithinWatermark` guarantees dedup only for
    * duplicates arriving within the watermark delay of first sight and may
    * evict earlier — the right contract for at-least-once sources that
    * re-deliver promptly, with strictly smaller state at 100 TB/day
    * throughput. Same output as dedupEvents whenever re-deliveries land
    * inside the horizon (they do for a finite replayed source). */
  def dedupEventsWithinWatermark(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  // ---- custom state: sessionization via flatMapGroupsWithState ----------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      n_events: Long, duration_sec: Double)

  /** Emits one row per closed session (gap > gapSec between events, or
    * state timeout). Mirrors the batch q29_sessionize logic with true
    * incremental state. */
  def sessionize(events: Dataset[Event], gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[List[SessionState]]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var sessions = state.getOption.getOrElse(Nil)
          val closed = scala.collection.mutable.ListBuffer[SessionOut]()
          for (e <- sorted) {
            val t = e.ts.getTime / 1000
            sessions match {
              case cur :: rest if t - cur.lastSeen <= gapSec =>
                sessions = cur.copy(lastSeen = t, nEvents = cur.nEvents + 1) :: rest
              case cur :: rest =>
                closed += SessionOut(userId,
                  new java.sql.Timestamp(cur.sessionStart * 1000),
                  cur.nEvents, (cur.lastSeen - cur.sessionStart).toDouble)
                sessions = SessionState(t, t, 1) :: rest
              case Nil =>
                sessions = SessionState(t, t, 1) :: Nil
            }
          }
          if (state.hasTimedOut) {
            sessions.foreach { cur =>
              closed += SessionOut(userId,
                new java.sql.Timestamp(cur.sessionStart * 1000),
                cur.nEvents, (cur.lastSeen - cur.sessionStart).toDouble)
            }
            state.remove()
          } else {
            state.update(sessions)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gapSec * 1000)
          }
          closed.iterator
      }
  }

  /** Streaming stateful operators hash-partition their state by
    * spark.sql.shuffle.partitions, fixed at the first checkpoint — AQE
    * never resizes it, and every micro-batch pays a per-partition state
    * store commit whether or not the partition saw data. Production
    * streaming jobs therefore size this explicitly to expected state
    * volume (keys x throughput), independent of the batch setting. This
    * scopes that sizing to one query and restores the session after. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T =
    withConf(spark, "spark.sql.shuffle.partitions", n.toString)(f)

  /** Run a streaming query to completion against the (finite) file source
    * and return the materialized result — the test/verify harness.
    * Complete mode for aggregations; Append for dedup / stream-stream
    * joins (both emit matched/first-seen rows within the batch, so a
    * finite source leaves nothing stuck behind the watermark). */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamed.writeStream
      .outputMode(mode)
      .format("memory").queryName(name)
      .start()
    q.processAllAvailable()
    lastRunProgress = q.recentProgress.toSeq
    q.stop()
    spark.table(name)
  }

  /** Per-batch progress of the most recent [[runToMemory]] run in this
    * JVM — the query object is stopped and discarded inside, so this is
    * the only window into trigger counts and durationMs breakdowns.
    * Diagnostic surface for perf work (StreamingSpec/PERF.md); not part
    * of the operator contract. */
  @volatile var lastRunProgress
      : Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil

  // ---- streaming multimodal (codec decode inside a micro-batch) ---------

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream of the documents table — same probe-then-bind +
    * normalize shape as [[readEventStream]], so a re-encoded corpus
    * (BINARY text being the live risk) streams as cleanly as it batches. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame = {
    val physical =
      try spark.read.option("pathGlobFilter", "documents.parquet").parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => docSchema }
    graft.Tables.normalize(
      spark.readStream
        .schema(physical)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir))
  }

  /** Streaming multimodal decode: synthesize a REAL WAV payload per
    * streamed row (m03's closed-form rule — n_chars%400+16 samples at
    * 8 kHz, sample(i) = (doc_id·31 + i·7) % 2001 − 1000), decode it
    * with the real PCM parser, and keep a running per-source aggregate.
    * The codec stage is a stateless narrow mapPartitions inside each
    * micro-batch — exactly how a decode kernel rides a production
    * stream; only the final aggregate holds state. Works identically
    * on a batch frame (the oracle path). */
  def mediaEnergyBySource(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast(LongType), col("source"),
        col("n_chars").cast(LongType))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, src, nChars) =>
          val n = (nChars % 400 + 16).toInt
          val bytes = graft.operators.Multimodal.encodeWavPcm16(8000,
            Array.tabulate(n)(i =>
              ((id * 31 + i.toLong * 7) % 2001 - 1000).toShort))
          val d = graft.operators.Multimodal.decodeWav(bytes).get
          (src, d.n_samples, d.energy)
        }
      }.toDF("source", "n_samples", "energy")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_samples")).as("total_samples"),
        round(sum(col("energy")), 4).as("total_energy"))
  }

  // ---- transformWithState (Spark 4 arbitrary-state API) -------------------

  case class UserTotals(user_id: Long, n: Long, total_value: Double)
  case class TotalsState(n: Long, total: Double)

  /** Per-user cumulative totals via `transformWithState` — Spark 4's
    * successor to [flat]MapGroupsWithState (typed ValueState handles,
    * TTL support, timers, RocksDB-backed). Each micro-batch folds the
    * key's rows into a ValueState and emits the running cumulative row;
    * over a finite single-batch replay that is exactly one row per user,
    * which the batch oracle can hash-match. */
  private class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    @transient private var state: ValueState[TotalsState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TotalsState]("totals",
        org.apache.spark.sql.Encoders.product[TotalsState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
      var s = if (state.exists()) state.get() else TotalsState(0L, 0.0)
      rows.foreach(e => s = TotalsState(s.n + 1, s.total + e.value))
      state.update(s)
      Iterator.single(UserTotals(key, s.n, s.total))
    }
  }

  // ---- transformWithState: ListState (bounded per-key buffer) -------------

  case class UserLastN(user_id: Long, n_last: Long, lastn_sum: Double,
      last_ts: Long)
  case class Seen(tsMicros: Long, id: Long, v: Double)

  /** Keeps each user's most recent `n` events in a ListState — the
    * bounded-buffer state shape (sliding features, "last N actions"
    * models) that ValueState (e08) can't express without packing. The
    * buffer is re-bounded on every batch, so state size is n×keys
    * regardless of throughput. Emits the running (count, sum, max-ts)
    * over the buffer each micro-batch. */
  private class LastNProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserLastN] {
    import org.apache.spark.sql.streaming.{ListState, TimeMode, TTLConfig}
    @transient private var state: ListState[Seen] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getListState[Seen]("lastn",
        org.apache.spark.sql.Encoders.product[Seen], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserLastN] = {
      val incoming = rows.map { e =>
        val i = e.ts.toInstant // full micro precision (getTime floors to ms)
        Seen(i.getEpochSecond * 1000000L + i.getNano / 1000L, e.event_id, e.value)
      }
      val merged = (state.get().toSeq ++ incoming)
        .sortBy(s => (-s.tsMicros, -s.id)).take(n)
      state.put(merged.toArray)
      Iterator.single(UserLastN(key, merged.size.toLong,
        merged.map(_.v).sum, merged.head.tsMicros))
    }
  }

  /** Per-user last-N buffer as a stream (see [[LastNProcessor]]).
    *
    * Emission contract: transformWithState only admits OutputMode.Append,
    * but the processor re-emits a REVISED snapshot for a key whenever a
    * later micro-batch touches it — update-style semantics riding an
    * append-mode plan (Spark never retracts transformWithState output).
    * The memory-sink replay harness this feeds dedupes by taking the
    * latest row per key; a true append-only sink (files, Kafka) would
    * accumulate the stale snapshots, so production consumers must either
    * do the same latest-per-key compaction or write to an upsert sink. */
  def lastNValues(spark: SparkSession, events: Dataset[Event], name: String,
      n: Int): DataFrame = {
    import spark.implicits._
    val out = events.groupByKey(_.user_id)
      .transformWithState(new LastNProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
    withConf(spark, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      runToMemory(spark, out.toDF(), name, OutputMode.Append())
    }
  }

  // ---- transformWithState: MapState (per-key sub-keyed aggregates) --------

  case class UserTypeStat(user_id: Long, event_type: String, n: Long,
      total_value: Double)
  case class TypeAgg(n: Long, total: Double)

  /** Per-user, per-event-type running totals in a MapState — the sub-keyed
    * state shape (feature counters per category) that would otherwise need
    * a composite grouping key and a second shuffle. Completes the
    * transformWithState state-type trio next to e08 (ValueState) and e10
    * (ListState). Emits each updated (type → agg) entry per micro-batch. */
  private class PerTypeTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTypeStat] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig}
    @transient private var state: MapState[String, TypeAgg] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getMapState[String, TypeAgg]("per_type",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.product[TypeAgg], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTypeStat] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { e =>
        val cur = if (state.containsKey(e.event_type)) state.getValue(e.event_type)
                  else TypeAgg(0L, 0.0)
        state.updateValue(e.event_type, TypeAgg(cur.n + 1, cur.total + e.value))
        touched += e.event_type
      }
      touched.iterator.map { t =>
        val agg = state.getValue(t)
        UserTypeStat(key, t, agg.n, agg.total)
      }
    }
  }

  /** Per-user per-type running totals as a stream (see
    * [[PerTypeTotalsProcessor]]). Same emission contract as
    * [[lastNValues]]: update-style snapshots per (user, type) on an
    * append-mode plan — consumers compact to the latest row per key or
    * use an upsert sink. */
  def perTypeTotals(spark: SparkSession, events: Dataset[Event],
      name: String): DataFrame = {
    import spark.implicits._
    val out = events.groupByKey(_.user_id)
      .transformWithState(new PerTypeTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
    withConf(spark, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      runToMemory(spark, out.toDF(), name, OutputMode.Append())
    }
  }

  // ---- transformWithState: event-time timers -------------------------------

  case class SessionSummary(user_id: Long, session_start_us: Long,
      n_events: Long, duration_us: Long)
  case class SessState(startUs: Long, lastUs: Long, n: Long,
      timerMs: Long)

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Gap-based sessionization driven by EVENT-TIME TIMERS — the
    * transformWithState feature the state-type queries (e08/e10/e11)
    * don't touch: a session closes either when a later event of the same
    * user arrives past the gap (emitted from handleInputRows), or when
    * the watermark passes lastSeen+gap with no such event — which only a
    * registered timer can observe (emitted from handleExpiredTimer).
    * Each user holds ONE open session and ONE registered timer; a
    * session-extending batch deletes and re-registers it. The same
    * semantics as [[sessionize]] (flatMapGroupsWithState) through the
    * successor API. */
  private class TimerSessionProcessor(gapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionSummary] {
    import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
    @transient private var state: ValueState[SessState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessState]("sess",
        org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)
    private def summary(key: Long, c: SessState) =
      SessionSummary(key, c.startUs, c.n, c.lastUs - c.startUs)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionSummary] = {
      val gapUs = gapSec * 1000000L
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val closed = scala.collection.mutable.ListBuffer.empty[SessionSummary]
      var cur = if (state.exists()) Some(state.get()) else None
      cur.filter(_.timerMs > 0).foreach(c => getHandle.deleteTimer(c.timerMs))
      for (e <- sorted) {
        val us = micros(e.ts)
        cur match {
          case Some(c) if us - c.lastUs <= gapUs =>
            cur = Some(c.copy(lastUs = math.max(c.lastUs, us), n = c.n + 1))
          case Some(c) =>
            closed += summary(key, c)
            cur = Some(SessState(us, us, 1, 0))
          case None =>
            cur = Some(SessState(us, us, 1, 0))
        }
      }
      cur.foreach { c =>
        val timerMs = c.lastUs / 1000L + gapSec * 1000L
        getHandle.registerTimer(timerMs)
        state.update(c.copy(timerMs = timerMs))
      }
      closed.iterator
    }
    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionSummary] = {
      if (state.exists()) {
        val c = state.get()
        // only the timer of the CURRENT registration closes the session
        // (stale timers were deleted, but stay defensive)
        if (expiredTimerInfo.getExpiryTimeInMs() >= c.timerMs) {
          state.clear()
          Iterator.single(summary(key, c))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Timer-closed sessions as a stream (see [[TimerSessionProcessor]]).
    * Requires a watermark on the input for TimeMode.EventTime. */
  def timerSessions(spark: SparkSession, events: Dataset[Event], name: String,
      gapSec: Long): DataFrame = {
    import spark.implicits._
    val out = events.groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapSec),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
    withConf(spark, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      runToMemory(spark, out.toDF(), name, OutputMode.Append())
    }
  }

  /** Disable the trailing NO-DATA micro-batch for queries whose output
    * is fully emitted inside data batches. Spark fires one extra
    * trigger after the last data batch purely to advance the watermark
    * — which only matters to state GC (irrelevant on a finite replay
    * that discards state at stop) and to operators that EMIT on
    * watermark advance. Append-mode dedup (rows emit on first sight)
    * and INNER interval joins (matches emit in their data batch) lose
    * nothing: measured result-identical at sf0.01 and sf0.1, and the
    * dropped trigger is a full state-commit cycle (e04 −35%, e03/e05
    * −16% — PERF.md round-12). Do NOT use for outer joins (e09: the
    * null-extended rows only emit once the watermark proves no match)
    * or timer/timeout sessionization (e12: trailing sessions close on
    * the watermark-advance batch). At 100 TB the same rule reads: an
    * always-on stream pays no such trigger per batch — benchmarks that
    * replay finite sources must not bill one against bounded-emission
    * operators. */
  def withDataBatchesOnly[T](spark: SparkSession)(f: => T): T =
    withConf(spark, "spark.sql.streaming.noDataMicroBatches.enabled", "false")(f)

  /** transformWithState needs the RocksDB state store provider; scope it
    * (plus any other conf) to one query and restore after. */
  def withConf[T](spark: SparkSession, key: String, value: String)(f: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Per-user running totals as a stream (see [[RunningTotalsProcessor]]).
    * Returns the materialized Append-mode output. */
  def runningTotals(spark: SparkSession, events: Dataset[Event], name: String): DataFrame = {
    import spark.implicits._
    val out = events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
    withConf(spark, "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider") {
      runToMemory(spark, out.toDF(), name, OutputMode.Append())
    }
  }

  /** The production sink pattern the memory sink can't show: `foreachBatch`
    * with an idempotent overwrite per micro-batch. Complete-mode state is
    * re-emitted whole every trigger, so overwriting the target with each
    * batch is exactly-once BY CONSTRUCTION — a replayed batch (failure,
    * speculative retry) rewrites the same content instead of duplicating
    * it. At scale the same shape targets a transactional table (Delta /
    * Iceberg MERGE keyed on the group columns); parquet-overwrite is the
    * dependency-free stand-in with identical semantics here. Returns the
    * final sink contents. */
  def runForeachBatchOverwrite(spark: SparkSession, aggregated: DataFrame,
      outDir: String): DataFrame = {
    val q = aggregated.writeStream
      .outputMode(OutputMode.Complete())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.coalesce(1).write.mode("overwrite").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }
}
