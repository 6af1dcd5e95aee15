package graft.streaming

import graft.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.9 — absent in the reference,
  * mandated by the extension brief): the event table consumed as a stream
  * with watermarked windowed aggregation, plus stateful sessionization via
  * flatMapGroupsWithState.
  *
  * The parquet fixture drives the stream (file source + pathGlobFilter), so
  * tests run the exact batch data through the streaming engine and compare
  * against the batch plan (q18).
  */
object EventStream {

  /** The event stream, unit-normalized like Tables.load: the physical unit of
    * `ts` is read from the parquet footer (Tables' cached check), so both
    * nanos- and micros-typed fixtures stream identically. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val nanos = graft.Tables.eventsTsIsNanos(spark, sfDir)
    // the stream executes long after this builder returns, so the nanos
    // branch must arm the shim itself (the probe restores the conf)
    if (nanos) graft.Tables.ensureNanosShim(spark)
    val base = spark.readStream
      .schema(if (nanos) Schemas.eventsRaw else Schemas.events)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    if (nanos)
      base.select(
        col("event_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    else base
  }

  /** Watermarked tumbling-hour aggregation — the streaming twin of the batch
    * q18 (identical grouping + decimal-cents money math). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))) * lit(100))
          .cast(LongType).as("sum_cents"))
      .select(col("window.start").cast(StringType).as("hour"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Watermarked DAILY event-mix counts — the streaming input of the q152
    * drift monitor's deployment shape: the monitor's expensive half (the
    * corpus-sized count collapse) runs incrementally with O(open days ×
    * types) state, and the ppm-L1 drift arithmetic (domain-sized, exact)
    * composes downstream on the emitted frame exactly as in the batch
    * query. Day buckets are epoch-day integers, matching q152's
    * calendar-free convention. Verified equal to the batch aggregate in
    * StreamingSpec. */
  def dailyMixAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_millis(window.start) div 86400000").as("day"),
        col("event_type"), col("n"))

  /** Streaming HyperLogLog register maintenance — q233's hourly register
    * build as a watermarked streaming aggregate: the distinct-user
    * cardinality registers a traffic dashboard keeps warm without ever
    * re-touching raw events. MAX over the per-event ρ is associative and
    * idempotent, so the windowed aggregate IS the sketch build — state is
    * O(open hours × 64 registers), retired by the watermark, late events
    * within the watermark fold in exactly (a register can only grow).
    * Chaining the corpus-level MAX-merge here would be a second stateful
    * aggregate in one streaming query (unsupported shape); the merge is
    * the trivially cheap ≤64-row fold (q233's tail) any consumer runs on
    * the emitted hourly frame — StreamingSpec asserts the streamed hourly
    * table equals the batch stage AND that its driver-side MAX-merge
    * equals q233's corpus registers. */
  def hllRegistersStream(events: DataFrame): DataFrame = {
    val p54 = 1L << 54
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"),
        graft.functions.TextFunctions.portableHash60(col("user_id")).as("h"))
      .select(col("ts"), expr(s"h div ${p54}L").as("bucket"),
        expr(s"h % ${p54}L").as("rest"))
      .select(col("ts"), col("bucket"),
        when(col("rest") === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(col("rest"))).cast(LongType))
          .as("rho"))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(max("rho").as("hr_rho"))
      .select(expr("unix_millis(window.start) div 3600000").as("hr"),
        col("bucket"), col("hr_rho"))
  }

  /** Watermarked SLIDING-window aggregation (1 h window, 30 min slide — the
    * q63 batch query's streaming twin): each event expands into exactly two
    * overlapping windows before the same hash aggregate a tumbling window
    * uses; the watermark retires a window's state once event time passes its
    * end, so state is O(active windows × types), not O(stream). */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast(DecimalType(18, 2))) * lit(100))
          .cast(LongType).as("sum_cents"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Watermarked streaming `session_window` aggregation — the declarative
    * twin of q75 (batch) and of [[sessionize]] (the explicit-state version).
    * Streaming session windows MERGE in state: a late-but-in-watermark event
    * can bridge two open sessions into one, which no fixed-window aggregate
    * can express. The watermark finalizes a session once event time passes
    * its close + gap, so state is O(open sessions), not O(stream). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      // ms truncation before windowing — same declared session granularity
      // as the q75 batch twin (see its scaladoc on the 30-min knife edge)
      .withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"), col("n_events"))

  /** Streaming delivery-dedup: state-backed `dropDuplicates` on
    * (keys, event time) — each replayed record (same key, same timestamp,
    * e.g. an at-least-once redelivery) is emitted once. Including the
    * event-time column in the key lets the watermark expire state, so
    * executor memory is bounded by keys-per-watermark-window, not stream
    * length; state is hash-partitioned by key across executors. */
  def dedupStream(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(keys :+ "ts")

  /** Jitter-tolerant streaming dedup: `dropDuplicatesWithinWatermark` keys
    * on the business key ALONE — a redelivered record whose event time was
    * re-stamped (broker retry, clock skew) still collapses, where
    * [[dedupStream]]'s (key, ts) identity would pass both copies through.
    * State for a key is dropped once the watermark passes its first-seen
    * time, so memory is bounded by keys-per-watermark-window; the trade is
    * that a duplicate arriving later than the watermark gap re-emits. */
  def dedupStreamJittered(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static ENRICHMENT join: each micro-batch of the stream joins a
    * static dimension (left join keeps unmatched events — an enrichment
    * must never drop data). The static side is planned per micro-batch, so
    * Catalyst broadcasts it while it fits and shuffle-joins when it does
    * not — no hint, same policy as the batch side of the engine. No
    * watermark needed: a static side holds no state. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream-static INGEST GATE — the streaming twin of q128's dedup-at-
    * ingestion: events whose key already exists in the static known-set
    * (the corpus fingerprint index of a deployed pipeline) are dropped via
    * a LEFT ANTI join, evaluated fresh each micro-batch. Composed with
    * [[dedupStream]] downstream it yields exactly-once ingestion against
    * both the historical corpus AND the stream's own redeliveries. */
  def ingestGateStream(events: DataFrame, known: DataFrame,
      key: String): DataFrame =
    events.join(known, Seq(key), "left_anti")

  /** Incremental mart load — the strategy the reference explicitly deferred
    * ("we typically use partitioning or incremental load, but for this
    * project, we'll use DELETE for simplicity", `Project Plan6.md:111-112`).
    * The watermarked hourly aggregate streams in update mode; each
    * micro-batch carries only the hour×type rows whose aggregates changed,
    * and foreachBatch rewrites ONLY those partitions (dynamic partition
    * overwrite). The mart is partitioned by BOTH grouping keys — update mode
    * emits per (hour, event_type), so an overwritten partition corresponds
    * exactly to one emitted aggregate row; partitioning by hour alone would
    * let a batch that updates one event_type wipe the hour's other types.
    * Idempotent per batch — a replayed trigger rewrites the same partitions
    * with the same totals — and at warehouse scale each trigger touches
    * O(changed keys), never the full mart. */
  def incrementalHourlyMart(events: DataFrame, outPath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    hourlyAgg(events).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-write option, NOT the session conf: a session-level dynamic
        // mode would silently change every later overwrite in the session
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("hour", "event_type").parquet(outPath)
      }
      .start()

  /** Incremental implicit-preference pair construction — the streaming twin
    * of the batch q164 (DPO/BPR data prep) and the deployment shape of a
    * preference-data service: when the watermark closes a (user, day), that
    * day's (chosen, rejected) pairs ship downstream.
    *
    * Deliberately ONE stateful operator: a watermarked day-window
    * aggregation collecting the user's purchased-item and viewed-item SETS
    * (state per open (user, day) is two daily-activity-bounded sets — the
    * same bound as the batch query's pair fan-out). The pairing itself —
    * explode(purchased) × explode(viewed ∖ purchased) — is STATELESS on
    * the aggregation's append-mode output, so the batch plan's anti-join
    * and pair join cost no join state at all here. A cascade of
    * stream-stream joins (views outer-anti purchases, then × purchases)
    * computes the same set, but the outer join's watermark-expiry rows
    * re-enter a second join whose state expires on the SAME watermark —
    * the day-tail rows land as late input there and silently drop, an
    * operator-composition hazard the single-aggregation shape avoids by
    * construction.
    * Day windows are UTC-aligned `window(ts, '1 day')`, so `day` equals the
    * batch query's epoch-day buckets. Works unchanged on batch frames (the
    * same plan minus state); streamed-vs-batch parity over the real fixture
    * is asserted in StreamingSpec. */
  def preferencePairsStream(events: DataFrame): DataFrame =
    events
      // NOTE the watermark advances only on rows that survive the type/item
      // filter (Catalyst pushes source-column predicates below the watermark
      // node regardless of call order): a quiet period carrying only
      // non-feedback events does NOT close open days. Deployments that need
      // wall-clock-bounded emission under feedback silence add a processing-
      // time fallback; the fixture replay advances event time with ordinary
      // feedback rows, as StreamingSpec's sentinels do.
      .withWatermark("ts", "1 day")
      .withColumn("item", get_json_object(col("props"), "$.k").cast(LongType))
      .filter(col("item").isNotNull &&
        col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), window(col("ts"), "1 day").as("w"))
      .agg(
        collect_set(when(col("event_type") === "purchase", col("item")))
          .as("purchased"),
        collect_set(when(col("event_type") === "view", col("item")))
          .as("viewed"))
      .filter(size(col("purchased")) > 0)
      .select(col("user_id"),
        expr("unix_millis(w.start) div 86400000").as("day"),
        explode(col("purchased")).as("chosen"),
        array_except(col("viewed"), col("purchased")).as("rej"))
      .select(col("user_id"), col("day"), col("chosen"),
        explode(col("rej")).as("rejected"))

  /** Watermarked stream-stream join: purchases within `withinMinutes` after
    * a view by the same user (the conversion-attribution shape). Works
    * unchanged on batch DataFrames — the same plan, minus state. In
    * streaming, both sides carry watermarks and the time-range predicate
    * bounds how long view rows wait in state: Spark derives the state
    * retention from (watermark, range), so state is O(events per window),
    * not O(stream). The join itself hash-shuffles both sides on user_id —
    * one exchange each, same as the batch plan.
    *
    * The watermark is derived from `withinMinutes` (never below it): a fixed
    * watermark shorter than the match window would evict view state before
    * the window closes and silently drop valid conversions. */
  def conversions(events: DataFrame, withinMinutes: Int = 60): DataFrame = {
    val wm = s"${math.max(120, withinMinutes)} minutes"
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", wm)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", wm)
    views.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <=
            col("view_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "inner")
      .select(col("user_id"), col("view_id"), col("purchase_id"))
  }

  /** LEFT OUTER twin of [[conversions]] — the abandonment funnel: every view
    * pairs with its in-window purchases, and a view with NO purchase emits
    * once with a NULL purchase_id. In streaming mode that null row can only
    * be produced when the watermark passes the view's join window (until
    * then a matching purchase could still arrive), so this is the state-
    * expiry semantics of an outer stream-stream join — asserted across
    * triggers in StreamingSpec. Batch-replayed (same plan, watermark a
    * no-op) under the DuckDB oracle as q120. */
  def unconvertedViews(events: DataFrame, withinMinutes: Int = 60): DataFrame = {
    val wm = s"${math.max(120, withinMinutes)} minutes"
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", wm)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", wm)
    views.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("view_ts") &&
          col("purchase_ts") <=
            col("view_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "leftOuter")
      .select(col("user_id"), col("view_id"), col("purchase_id"))
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int)

  /** Gap-based sessionization: a session closes after `gapMinutes` of
    * inactivity (event-time), emitted via flatMapGroupsWithState — the
    * custom-state primitive the brief calls for.
    *
    * `flushOpen=true` (batch analytics) also emits the still-open trailing
    * session and clears state; leave false for a true incremental stream,
    * where the open session must survive in state across triggers. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      flushOpen: Boolean = true): Dataset[Session] = {
    val gapMs = gapMinutes * 60000L
    implicit val longEnc = Encoders.scalaLong
    implicit val eEnc = Encoders.product[Event]
    implicit val sEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    events
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // Sort within group: correct for the batch-replay harness; a true
          // incremental deployment would rely on per-trigger arrival order +
          // watermark-bounded lateness instead of a full sort.
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Session]()
          var st = state.getOption.orNull
          for (e <- evs) {
            val t = e.ts.getTime
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.last <= gapMs => st = s.copy(last = t, n = s.n + 1)
              case s =>
                out += Session(userId, s.start, s.last, s.n)
                st = SessionState(t, t, 1)
            }
          }
          if (st != null) {
            if (flushOpen) { out += Session(userId, st.start, st.last, st.n); state.remove() }
            else state.update(st)
          }
          out.iterator
      }
  }

  final case class EwmaState(ewma: Long, n: Long)
  final case class EwmaSpike(user_id: Long, event_id: Long, cents: Long,
      ewma_before: Long)

  /** Per-user EWMA rate-anomaly detector — the streaming alert primitive a
    * pipeline runs over its ingest telemetry: maintain, per user, an
    * exact-integer exponentially-weighted moving average of the event
    * value in cents (α = 1/4: ewma' = (3·ewma + cents) div 4 — all-integer,
    * so batch, stream, and the DuckDB oracle agree bit-for-bit), and EMIT
    * one row per spike — an event whose cents exceed 4× the ewma carried
    * into it. Alerts stream out in Append mode as they are detected; the
    * ewma state survives across triggers, so a spike in trigger N is judged
    * against history from triggers 1..N−1 (state size: one (long, long)
    * per user). Within a trigger events sort by (ts, event_id) — the q38
    * batch-replay convention; a production deployment would add a
    * watermark-bounded reorder buffer. */
  def ewmaAnomaly(events: DataFrame): Dataset[EwmaSpike] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val eEnc = Encoders.product[Event]
    implicit val sEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaSpike]
    events
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaSpike](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[EwmaState]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[EwmaSpike]()
          var st = state.getOption.orNull
          for (e <- evs) {
            val cents = math.floor(e.value * 100).toLong
            st match {
              case null => st = EwmaState(cents, 1)
              case s =>
                if (cents > 4 * s.ewma)
                  out += EwmaSpike(userId, e.event_id, cents, s.ewma)
                st = EwmaState((3 * s.ewma + cents) / 4, s.n + 1)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Production-shape sessionization: like [[sessionize]] but idle sessions
    * CLOSE on the watermark, not on the user's next event. `EventTimeTimeout`
    * registers each open session for `last + gap`; when the watermark passes
    * it, the group's handler fires with an empty iterator (`hasTimedOut`),
    * emits the session, and drops its state — so a user who never returns
    * still gets their session emitted, and state size stays bounded by the
    * gap window instead of growing with one-visit users forever. */
  def sessionizeTimeout(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "0 seconds"): Dataset[Session] = {
    val gapMs = gapMinutes * 60000L
    implicit val longEnc = Encoders.scalaLong
    implicit val eEnc = Encoders.product[Event]
    implicit val sEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    events
      .withWatermark("ts", watermark)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n))
          } else {
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer[Session]()
            var st = state.getOption.orNull
            for (e <- evs) {
              val t = e.ts.getTime
              st match {
                case null => st = SessionState(t, t, 1)
                case s if t - s.last <= gapMs => st = s.copy(last = t, n = s.n + 1)
                case s =>
                  out += Session(userId, s.start, s.last, s.n)
                  st = SessionState(t, t, 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            out.iterator
          }
      }
  }

  /** One ranked survivor in the [[TopPurchaseProcessor]] list state. */
  final case class TopEntry(cents: Long, event_id: Long)

  /** Per-user running purchase leaderboard emission. */
  final case class TopPurchases(user_id: Long, n_purchases: Long,
      top_sum_cents: Long, top_checksum: Long)

  /** The Spark-4 arbitrary-state v2 API ([[org.apache.spark.sql.streaming.StatefulProcessor]]
    * / `transformWithState`) exercised on a genuinely LIST-shaped state: a
    * per-user running top-`k` purchase leaderboard — ListState holds the k
    * survivors (cents desc, event_id asc — the deterministic q73 argmax
    * order), ValueState the purchase count, and each trigger emits the
    * user's refreshed rollup (Update-mode semantics: the LAST emission per
    * user is the answer). State size is k+1 longs per user by
    * construction — the bounded-state property that distinguishes a
    * leaderboard from a naive per-user sort. Events inside a trigger sort
    * by (ts, event_id) — the q38 batch-replay convention. Requires the
    * RocksDB state-store provider (the v2 state API's backend);
    * StreamingSpec scopes that conf to the stream and restores it. */
  final class TopPurchaseProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, TopPurchases] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, ValueState}
    @transient private var top: ListState[TopEntry] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      top = getHandle.getListState[TopEntry]("top",
        Encoders.product[TopEntry], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TopPurchases] = {
      val cur = scala.collection.mutable.ArrayBuffer[TopEntry]()
      if (top.exists()) cur ++= top.get()
      var n = if (seen.exists()) seen.get() else 0L
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        n += 1
        cur += TopEntry(math.floor(e.value * 100).toLong, e.event_id)
        val kept = cur.sortBy(t => (-t.cents, t.event_id)).take(k)
        cur.clear(); cur ++= kept
      }
      top.put(cur.toArray)
      seen.update(n)
      Iterator.single(TopPurchases(user, n, cur.map(_.cents).sum,
        cur.map(_.event_id).sum))
    }
  }

  /** Per-user top-k purchase leaderboard as a stream — the batch twin is
    * q214's rank-window rollup; StreamingSpec proves the final Update-mode
    * emission per user equals it trigger-for-trigger. */
  def topPurchasesStream(events: DataFrame, k: Int = 3): Dataset[TopPurchases] = {
    implicit val longEnc = Encoders.scalaLong
    implicit val eEnc = Encoders.product[Event]
    implicit val outEnc = Encoders.product[TopPurchases]
    events.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new TopPurchaseProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Closed-session digest stream (the q282 concurrency leg): the
    * incremental sessionizer ([[sessionize]] with `flushOpen=false` —
    * open sessions survive in state across triggers) emits each session
    * the moment its gap closes it, and each micro-batch persists its
    * closed sessions batch-stamped with idempotent overwrite.
    * [[graft.queries.Stats.concurrencyReadMerged]] folds the digests and
    * runs the identical hierarchical sweep — the peak-concurrency census
    * maintained without ever rescanning events. */
  def sessionDigestStream(events: DataFrame, outDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    sessionize(events, flushOpen = false).toDF()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.toDF().select("user_id", "start_ms", "end_ms")
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()

  final case class LateCell(user_id: Long, bucket: Long, n: Long)

  /** Per-user event-time disorder as a STREAM (the q292 twin): a watermark
    * IS a per-stream running max, so the stateful form is one
    * ValueState[Long] per user — each arrival's lateness against the max
    * event time already seen buckets into q292's power-of-two histogram as
    * it lands. Rows inside a trigger sort by event_id (the arrival-order
    * key the batch kernel windows on), so stream and batch see the SAME
    * prefix maxima wherever micro-batch boundaries fall. Emits the
    * trigger's per-user bucket cells (≤ 64 rows per user-trigger, already
    * combined), which [[lateBucketStream]] folds into per-batch digests. */
  final class LatenessProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, LateCell] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var maxSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      maxSeen = getHandle.getValueState[Long]("maxSeen",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[LateCell] = {
      var mx = if (maxSeen.exists()) maxSeen.get() else Long.MinValue
      val cells = scala.collection.mutable.Map.empty[Long, Long]
      rows.toSeq.sortBy(_.event_id).foreach { e =>
        val tms = e.ts.getTime
        mx = math.max(mx, tms)
        val late = mx - tms
        val b = if (late <= 0L) 0L else (64 - java.lang.Long.numberOfLeadingZeros(late)).toLong
        cells(b) = cells.getOrElse(b, 0L) + 1L
      }
      maxSeen.update(mx)
      cells.iterator.map { case (b, n) => LateCell(user, b, n) }
    }
  }

  /** The q292 digest stream: lateness cells per micro-batch, persisted
    * batch-stamped with idempotent overwrite (the q277/q283 LSM shape) for
    * [[graft.queries.Stats.watermarkReadMerged]] to fold. */
  def lateBucketStream(events: DataFrame, outDir: String,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    implicit val longEnc = Encoders.scalaLong
    implicit val eEnc = Encoders.product[Event]
    implicit val outEnc = Encoders.product[LateCell]
    events
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new LatenessProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[LateCell], id: Long) =>
        batch.groupBy("bucket").agg(sum("n").as("n_events"))
          .write.mode("overwrite").parquet(s"$outDir/batch-$id")
      }
      .start()
  }
}
