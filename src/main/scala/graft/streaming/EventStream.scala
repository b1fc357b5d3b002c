package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session accumulator for [[EventStream.sessionize]]. Top-level so
  * Spark can derive and code-generate its state Encoder (nested private case
  * classes break the generated accessor calls).
  */
case class SessionState(nEvents: Int, firstTs: Long, lastTs: Long, totalValue: Double)

/** Running per-user profile state for [[EventStream.userProfile]]. */
case class ProfileState(nEvents: Long, totalValue: Double, lastTsUs: Long)

/** Per-shard Misra-Gries counter state for [[EventStream.heavyUsers]]. */
case class MgState(users: Seq[Long], counts: Seq[Long])

/** Per-user running Welford moments for [[EventStream.anomalyFlags]]. */
case class WelfordState(n: Long, mean: Double, m2: Double)

/** One flagged event (Update-mode output row): the z-score of `value`
  * against the user's running distribution BEFORE this event folds in.
  */
case class AnomalyFlag(user_id: Long, event_id: Long, value: Double, z: Double)

/** StatefulProcessor for [[EventStream.anomalyFlags]]: per-user Welford
  * (n, mean, M2) folded over each micro-batch; an event whose |z| against
  * the PRE-event state exceeds the threshold (once ≥ minN observations
  * back it) is emitted, then the event updates the state either way —
  * anomalous points still teach the baseline, matching the batch
  * rolling-z convention (#249) of scoring against history, not self.
  */
class AnomalyProcessor(minN: Long, zThreshold: Double)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStream.Event, AnomalyFlag] {
  import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[WelfordState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[WelfordState]("welford",
      org.apache.spark.sql.Encoders.product[WelfordState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventStream.Event],
      timerValues: TimerValues): Iterator[AnomalyFlag] = {
    var s = if (state.exists()) state.get() else WelfordState(0L, 0.0, 0.0)
    val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyFlag]
    rows.foreach { e =>
      if (s.n >= minN && s.m2 > 0.0) {
        val sd = math.sqrt(s.m2 / (s.n - 1))
        val z = (e.value - s.mean) / sd
        if (math.abs(z) > zThreshold) out += AnomalyFlag(key, e.event_id, e.value, z)
      }
      val n1 = s.n + 1
      val d = e.value - s.mean
      val mean1 = s.mean + d / n1
      s = WelfordState(n1, mean1, s.m2 + d * (e.value - mean1))
    }
    state.update(s)
    out.iterator
  }
}

/** One emitted heavy-hitter counter (Update-mode output row): the MG lower
  * bound for `user_id` within `shard` as of the latest micro-batch.
  */
case class ShardHeavyUser(shard: Long, user_id: Long, mg_count: Long)

/** StatefulProcessor for [[EventStream.heavyUsers]]: the classic Misra-Gries
  * update — increment a tracked counter, adopt an empty slot, or decrement
  * ALL counters when full — folded over each micro-batch's rows for one
  * shard, persisted as a single ≤m-entry ValueState, re-emitted per batch.
  */
class HeavyUsersProcessor(m: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStream.Event, ShardHeavyUser] {
  import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[MgState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[MgState]("mg",
      org.apache.spark.sql.Encoders.product[MgState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventStream.Event],
      timerValues: TimerValues): Iterator[ShardHeavyUser] = {
    val init = if (state.exists()) state.get() else MgState(Seq.empty, Seq.empty)
    var counters = scala.collection.mutable.LinkedHashMap.from(
      init.users.zip(init.counts))
    rows.foreach { e =>
      val u = e.user_id
      if (counters.contains(u)) counters(u) += 1L
      else if (counters.size < m) counters(u) = 1L
      else {
        counters.mapValuesInPlace((_, c) => c - 1L)
        counters = counters.filter(_._2 > 0L)
      }
    }
    state.update(MgState(counters.keys.toSeq, counters.values.toSeq))
    counters.iterator.map { case (u, c) => ShardHeavyUser(key, u, c) }
  }
}

/** Version history for one temporal-join key: (version ts µs, value)
  * ascending by ts — the bounded slice of the dimension's timeline the
  * horizon still allows a late fact to land in.
  */
case class VersionState(tsUs: Seq[Long], values: Seq[Double])

/** One enriched fact (Update-mode output row): the fact row joined to the
  * dimension version in force AT ITS EVENT TIME. `dim_ts_us` is
  * Long.MinValue and `matched` false when no version at-or-before the fact
  * exists yet. `n_versions` is the post-trim state size — observability
  * for the bounded-state contract, not business data.
  */
case class TemporalMatch(user_id: Long, fact_ts_us: Long, fact_value: Double,
                         dim_ts_us: Long, dim_value: Double, matched: Boolean,
                         n_versions: Int)

/** StatefulProcessor for [[EventStream.temporalJoin]]: per key, a version
  * HISTORY of the dimension (not just the latest value) so a fact that
  * arrives in a later micro-batch with an EARLIER event time still joins
  * to the version that was in force at its time — the property a
  * latest-value stream-static join cannot give. Each batch's rows are
  * processed in event-time order (updates before facts at equal ts: as-of
  * means at-or-before inclusive); versions older than the horizon below
  * the key's max seen time are trimmed, KEEPING the newest trimmed one as
  * the floor version — so state is bounded by the update rate within one
  * horizon (+1) per key, and any fact no later than the horizon still
  * resolves exactly.
  */
class TemporalJoinProcessor(horizonUs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStream.TemporalIn, TemporalMatch] {
  import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[VersionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[VersionState]("versions",
      org.apache.spark.sql.Encoders.product[VersionState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventStream.TemporalIn],
      timerValues: TimerValues): Iterator[TemporalMatch] = {
    val init = if (state.exists()) state.get() else VersionState(Seq.empty, Seq.empty)
    // Ascending (ts, value) timeline; within a batch updates sort before
    // facts at the same microsecond (as-of is at-or-before INCLUSIVE).
    var timeline = init.tsUs.zip(init.values).toVector
    val out = scala.collection.mutable.ArrayBuffer.empty[TemporalMatch]
    // Event time at FULL microsecond precision: getTime truncates to ms,
    // getNanos carries the sub-second rest — combining them stops
    // sub-ms versions collapsing into ties whose winner depended on
    // arrival order across batch compositions (ADVICE r13 #4). Equal-µs
    // updates get a value tie-break below, so even a true tie resolves
    // the same way regardless of batching.
    def tsUs(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val batch = rows.toVector.sortBy(r =>
      (tsUs(r.ts), if (r.kind == "U") 0 else 1, r.value))
    var maxSeen = timeline.lastOption.map(_._1).getOrElse(Long.MinValue)
    batch.foreach { r =>
      val tUs = tsUs(r.ts)
      maxSeen = math.max(maxSeen, tUs)
      if (r.kind == "U") {
        // Insert in (ts, value) order (a late update lands mid-timeline
        // so later-batch facts before the next version see it; the value
        // tie-break makes equal-µs versions batch-composition-stable —
        // lastIndexWhere then always resolves an equal-ts tie to the
        // LARGEST value).
        val at = timeline.indexWhere(v =>
          v._1 > tUs || (v._1 == tUs && v._2 > r.value))
        val ins = (tUs, r.value)
        timeline = if (at < 0) timeline :+ ins
          else (timeline.take(at) :+ ins) ++ timeline.drop(at)
      } else {
        val i = timeline.lastIndexWhere(_._1 <= tUs)
        if (i < 0) out += TemporalMatch(key, tUs, r.value,
          Long.MinValue, 0.0, matched = false, timeline.size)
        else out += TemporalMatch(key, tUs, r.value,
          timeline(i)._1, timeline(i)._2, matched = true, timeline.size)
      }
    }
    // Trim: drop versions fully superseded before (maxSeen − horizon),
    // keeping the newest of them as the floor so in-horizon facts still
    // resolve. A version is droppable only if a NEWER version also sits
    // at-or-below the bound.
    val bound = maxSeen - horizonUs
    val floor = timeline.lastIndexWhere(_._1 <= bound)
    if (floor > 0) timeline = timeline.drop(floor)
    state.update(VersionState(timeline.map(_._1), timeline.map(_._2)))
    out.iterator.map(m => m.copy(n_versions = timeline.size))
  }
}

/** One emitted profile update (Update-mode output row). */
case class UserProfile(user_id: Long, n_events: Long, total_value: Double,
                       last_ts_us: Long)

/** StatefulProcessor for [[EventStream.userProfile]] — the arbitrary-state
  * API v2 (`transformWithState`, Spark 4): named state variables from a
  * handle instead of one opaque blob, optional per-state TTL, timers, and
  * RocksDB-backed storage. One `ValueState[ProfileState]` per user holds
  * the lifetime aggregate; each micro-batch folds its rows in and emits
  * the refreshed profile.
  */
class ProfileProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStream.Event, UserProfile] {
  import org.apache.spark.sql.streaming.{OutputMode, TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[ProfileState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ProfileState]("profile",
      org.apache.spark.sql.Encoders.product[ProfileState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EventStream.Event],
      timerValues: TimerValues): Iterator[UserProfile] = {
    var s = if (state.exists()) state.get() else ProfileState(0L, 0.0, Long.MinValue)
    rows.foreach { e =>
      s = ProfileState(s.nEvents + 1, s.totalValue + e.value,
        math.max(s.lastTsUs, e.ts.getTime * 1000L))
    }
    state.update(s)
    Iterator.single(UserProfile(key, s.nEvents, s.totalValue, s.lastTsUs))
  }
}

/** Structured-Streaming operators over the `events` schema (SURVEY.md §2.4).
  *
  * Both operators take an already-constructed streaming Dataset (file source,
  * Kafka, or MemoryStream in tests) so they compose with any input; the
  * transforms are the operator. At 100 TB/day the same code runs with a
  * partitioned file/Kafka source — state is keyed and distributed, and
  * event-time watermarks bound state size deterministically (no wall-clock
  * dependence, so reprocessing a backlog gives identical results).
  */
object EventStream {

  /** One event as the streaming ops consume it. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  /** A closed (or flushed) per-user session. */
  case class UserSession(user_id: Long, n_events: Int, first_ts: Timestamp,
                         last_ts: Timestamp, total_value: Double)

  /** One tagged input row for [[temporalJoin]]: kind "U" = a dimension
    * VERSION (value becomes current at ts), kind "F" = a fact to enrich.
    */
  case class TemporalIn(user_id: Long, ts: Timestamp, kind: String,
                        value: Double)

  /** Per-window type-count state for [[topTypesPerWindow]]. */
  case class WindowTopState(counts: Map[String, Long])

  /** One ranked row of a closed window's top-K event types. */
  case class WindowTopType(window_start: Timestamp, event_type: String,
                           n: Long, rank: Int)

  /** §2.4 #35 — watermarked tumbling-window counts per event type.
    * 10-minute windows, 20-minute watermark: late events beyond the watermark
    * are dropped and window state is evicted — bounded state at any rate.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** §2.4 #202 — windowed APPROXIMATE user cardinality: distinct users per
    * tumbling window × event type via HyperLogLog++ sketches
    * (`approx_count_distinct`, default rsd 5%). Exact windowed
    * count-distinct on an unbounded stream needs per-window state linear in
    * the number of distinct users; the HLL register array is a few KB per
    * (window, type) group REGARDLESS of cardinality — the only shape that
    * survives billions of users per window. Sketch merge is commutative and
    * associative and the estimate is a pure function of the merged
    * registers, so the micro-batched stream result is BIT-IDENTICAL to the
    * batch computation over the same input (spec-asserted) — approximate in
    * value, deterministic in execution.
    */
  def windowedApproxUsers(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("approx_users"), col("n_events"))

  /** §2.4 #43 — streaming exact dedup: drop events whose `event_id` was
    * already seen, keeping state only within the watermark horizon.
    * `dropDuplicatesWithinWatermark` evicts seen-keys once the watermark
    * passes them — bounded state at any rate, which is what makes exact
    * dedup feasible on an unbounded stream (the batch analogue keeps ALL
    * keys). This is the ingest-side guard of the corpus-dedup story: exact
    * dedup at the stream, MinHash/SimHash/embedding near-dup in batch.
    */
  def dedupped(events: DataFrame, idColumn: String = "event_id"): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .dropDuplicatesWithinWatermark(idColumn)

  /** §2.4 #47 — watermarked stream-stream join: each click joined to the
    * same user's views within the following `withinMinutes`. Both sides are
    * watermarked and the join predicate carries an event-time RANGE, which
    * is what lets Spark bound the two-sided join state: each side buffers
    * only rows inside its watermark horizon, evicting as event time
    * advances. Without the range predicate a stream-stream join would have
    * to buffer both streams forever.
    */
  def clickToView(events: DataFrame, withinMinutes: Int = 10): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "20 minutes")
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "20 minutes")
    clicks.join(views,
        col("user_id") === col("view_user_id") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
  }

  /** §2.4 #113 — watermarked stream-stream LEFT OUTER join: like
    * [[clickToView]], but clicks that never find a view inside the time
    * range still emit — with null view columns — once the watermark passes
    * the end of their range (only then can the engine PROVE no match will
    * arrive). The outer variant is what conversion analysis actually needs:
    * the unmatched clicks ARE the non-converting sessions. Same bounded
    * two-sided state as the inner join; the null emission piggybacks on
    * watermark-driven state eviction.
    */
  def clickToViewOuter(events: DataFrame, withinMinutes: Int = 10): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "20 minutes")
    val views = events.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "20 minutes")
    clicks.join(views,
        col("user_id") === col("view_user_id") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
        "left_outer")
      .select("click_id", "view_id", "user_id", "click_ts", "view_ts")
  }

  /** §2.4 #115 — running per-user profile via `transformWithState` (the
    * Spark 4 arbitrary-state API v2): lifetime event count / value total /
    * last-seen per user, refreshed every micro-batch in Update mode. Where
    * `flatMapGroupsWithState` gives one opaque state blob, the v2 API gives
    * NAMED state variables with per-state TTL and timers over the RocksDB
    * state store — the profile/feature-store accumulation shape (state is
    * keyed and distributed; a user's profile lives on exactly one
    * executor's store and survives restarts via the checkpoint).
    */
  def userProfile(events: Dataset[Event]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** §2.4 #393 — stream-stream TEMPORAL JOIN (the streaming twin of batch
    * as-of #61; Flink spells it `FOR SYSTEM_TIME AS OF`): facts enrich
    * against the dimension version in force AT THEIR EVENT TIME, not the
    * latest arrival — the operator behind "price at order time" /
    * "segment at click time" joins that Spark has natively only in
    * stream-static form (#62, which silently uses the CURRENT dim row for
    * historical facts). Both inputs arrive as one tagged union keyed by
    * the join key; per key, [[TemporalJoinProcessor]] holds the version
    * TIMELINE bounded by `horizon` (versions older than the key's max
    * seen time minus the horizon collapse to one floor entry), so a fact
    * up to `horizon` late still resolves to the exact historical version
    * while state stays bounded by update-rate × horizon, never stream
    * length. Within a micro-batch rows process in event-time order;
    * cross-batch, facts later than `horizon` behind a key's frontier may
    * see the floor version — the documented at-arrival semantics (the
    * same contract Flink's temporal join has under its watermark).
    */
  def temporalJoin(tagged: Dataset[TemporalIn],
      horizonMinutes: Int = 60): Dataset[TemporalMatch] = {
    import tagged.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    tagged
      .groupByKey(_.user_id)
      .transformWithState(new TemporalJoinProcessor(horizonMinutes * 60_000_000L),
        TimeMode.None(), OutputMode.Update())
  }

  /** §2.4 #166 — streaming HEAVY HITTERS (who generates the traffic, live):
    * sharded Misra-Gries over the event stream. Keying by `user_id % shards`
    * spreads sketch maintenance across the cluster — per-shard state is a
    * bounded ≤m-counter map (constant memory regardless of user cardinality
    * or stream length), the update is O(1) amortized per event, and shards
    * never coordinate. Each micro-batch re-emits the shard's counters
    * (Update mode); a reader unions shards and takes the global top-k —
    * MG's guarantee composes across shards because every user lives in
    * EXACTLY one shard: a user with shard-local count > n_shard/(m+1) is
    * always tracked, and emitted counts are lower bounds no more than
    * n_shard/(m+1) under truth (the same contract the batch
    * [[graft.operators.Curation.heavyHitters]] sketch-then-rescore uses —
    * this is its always-on micro-batch twin).
    */
  def heavyUsers(events: Dataset[Event], shards: Int = 8,
      m: Int = 16): Dataset[ShardHeavyUser] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id % shards)
      .transformWithState(new HeavyUsersProcessor(m),
        TimeMode.None(), OutputMode.Update())
  }

  /** §2.4 #287 — streaming PER-USER ANOMALY FLAGS: each user's event values
    * score against that user's OWN running mean/σ (Welford state over the
    * RocksDB store — one (n, mean, M2) triple per user, constant memory per
    * key regardless of stream length), |z| > threshold emits a flag once
    * ≥ minN observations back the baseline. This is the always-on
    * micro-batch twin of the batch rolling-z (#249): per-user baselines
    * catch the user whose behavior CHANGED, which a global threshold
    * (#125's MAD fence) can't see. State is keyed and distributed — a
    * user's moments live on exactly one executor's store and survive
    * restarts via the checkpoint; the update is O(1) per event.
    */
  def anomalyFlags(events: Dataset[Event], minN: Long = 5,
      zThreshold: Double = 3.0): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor(minN, zThreshold),
        TimeMode.None(), OutputMode.Update())
  }

  /** §2.4 #62 — stream-static enrichment join: each streaming event picks up
    * dimension attributes from a static (batch) table. Stream-static joins
    * are STATELESS — the static side is just planned into every micro-batch,
    * and `broadcast()` pins it as a broadcast hash join, so the stream never
    * shuffles and no join state accumulates. This is the streaming analogue
    * of the batch dim join: at 100 TB/day the stream stays partition-local
    * while the bounded dim rides along on every executor.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** §2.4 #36 — custom-state sessionization with flatMapGroupsWithState:
    * events within `gapMinutes` of each other belong to one session; an
    * EVENT-TIME timeout (watermark passing last_ts + gap) closes idle
    * sessions — deterministic under replay, unlike wall-clock timeouts.
    * State per user is O(1) (four numbers), so total state is bounded by the
    * active-user count, and the watermark evicts users that go quiet.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[UserSession] = {
      def close(s: SessionState) = UserSession(userId, s.nEvents,
        new Timestamp(s.firstTs), new Timestamp(s.lastTs), s.totalValue)
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(close(s))
      }
      val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[UserSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs <= gapMs =>
            cur = Some(SessionState(s.nEvents + 1, s.firstTs, t, s.totalValue + e.value))
          case Some(s) =>
            closed ::= close(s)
            cur = Some(SessionState(1, t, t, e.value))
          case None =>
            cur = Some(SessionState(1, t, t, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** §2.4 #244 — per-window TOP-K event types (streaming "trending items"):
    * ranking is not an aggregate, so a plain windowed `groupBy` can't emit
    * it in append mode — this is the custom-state-plus-timer shape: state
    * keyed by WINDOW START accumulates per-type counts (bounded:
    * |types| entries per open window, windows evicted on close), and an
    * EVENT-TIME timeout at window end turns the watermark into the "window
    * closed" signal, at which point the state is sorted once (deterministic
    * (count desc, type asc) order) and the top-K emitted. Deterministic
    * under replay — counts are commutative and the sort happens exactly
    * once per window — so stream = batch(rank over windowed counts) exactly,
    * which is what the spec asserts.
    */
  def topTypesPerWindow(events: Dataset[Event], windowMinutes: Int = 10,
      k: Int = 2): Dataset[WindowTopType] = {
    val spark = events.sparkSession
    import spark.implicits._
    val winMs = windowMinutes * 60L * 1000L

    def update(winStart: Long, batch: Iterator[Event],
               state: GroupState[WindowTopState]): Iterator[WindowTopType] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return s.counts.toSeq
          .sortBy { case (t, n) => (-n, t) }.take(k).zipWithIndex
          .map { case ((t, n), i) =>
            WindowTopType(new Timestamp(winStart), t, n, i + 1) }.iterator
      }
      val m = scala.collection.mutable.Map.empty[String, Long]
      state.getOption.foreach(s => m ++= s.counts)
      batch.foreach(e => m.update(e.event_type, m.getOrElse(e.event_type, 0L) + 1L))
      state.update(WindowTopState(m.toMap))
      // Timeout when the watermark passes window end: that IS window close.
      state.setTimeoutTimestamp(winStart + winMs)
      Iterator.empty
    }

    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(e => e.ts.getTime - Math.floorMod(e.ts.getTime, winMs))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** §2.4 #259 — streaming SAMPLE-RATIO-MISMATCH monitor: per tumbling
    * window, the observed A/B arm split of APPROXIMATE DISTINCT users
    * (HLL++ per arm — bounded state at any user cardinality, the #202
    * discipline) with the 1-df chi-square against the designed 50/50 —
    * the live guardrail that pages before a broken bucketing poisons an
    * experiment (its batch twin is `q_ab_srm`). One stateful windowed
    * aggregation; the chi-square and flag are stateless projections, so
    * stream = batch by sketch-merge algebra (spec-asserted).
    */
  def srmMonitor(events: DataFrame): DataFrame = {
    val arm = when(
      substring(sha2(col("user_id").cast("string"), 256), 1, 1) <= "7", "A")
      .otherwise("B")
    val agg = events
      .withWatermark("ts", "20 minutes")
      .withColumn("arm", arm)
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(approx_count_distinct(when(col("arm") === "A", col("user_id")))
        .as("n_a"),
        approx_count_distinct(when(col("arm") === "B", col("user_id")))
          .as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val chi2 = (na - nb) * (na - nb) / (na + nb)
    agg.select(col("window.start").as("window_start"), col("n_a"), col("n_b"),
      round(chi2, 6).as("chi2"), (chi2 > 3.841459).as("srm_detected"))
  }

  /** §2.4 #352 — streaming POISSON-BAND rate monitor: per tumbling window
    * and event type, the arrival count against a static per-type baseline
    * rate λ (events/window) with the ±3√λ normal-approximation band — the
    * live "is this event type arriving at its usual rate" pager (batch
    * twins: `q_poisson_rate` fits λ, `q_interarrival` validates the
    * Poisson assumption the band rests on). The baseline rides in as a
    * bounded literal map (the psiMonitor discipline — no stream-stream
    * join, no second aggregation); ONE stateful windowed count, band and
    * flags stateless projections ⇒ stream = batch by construction
    * (spec-asserted, with a deliberately spiked window flagging high).
    */
  def rateMonitor(events: DataFrame, baseline: Map[String, Double])
      : DataFrame = {
    val lam = element_at(typedlit(baseline), col("event_type"))
    val agg = events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val nD = col("n_events").cast("double")
    agg.select(col("window.start").as("window_start"), col("event_type"),
      col("n_events"), round(lam, 6).as("lambda"),
      round(lam - lit(3.0) * sqrt(lam), 6).as("band_lo"),
      round(lam + lit(3.0) * sqrt(lam), 6).as("band_hi"),
      when(nD > lam + lit(3.0) * sqrt(lam), "high")
        .when(nD < lam - lit(3.0) * sqrt(lam), "low")
        .otherwise("normal").as("rate_flag"))
  }

  /** §2.4 #79 — INCREMENTAL table copy as a stream: `Trigger.AvailableNow`
    * processes everything that has landed in `srcDir` since the last run,
    * appends it to `destDir`, then stops — the modern replacement for
    * timestamp-watermark incremental copies. The checkpoint directory IS the
    * high-watermark: file-source offsets record which input files are done,
    * so re-running never re-copies them (exactly-once per file even across
    * crashes — a half-written batch replays into the same epoch). At 100 TB
    * this is the landing-zone -> warehouse conveyor: each run moves only the
    * new files, with Spark's parallelism per batch. Returns rows copied in
    * this run.
    */
  def incrementalCopy(spark: SparkSession, srcDir: String, destDir: String,
      checkpointDir: String, schema: org.apache.spark.sql.types.StructType): Long = {
    val before = if (new java.io.File(destDir).exists())
      spark.read.parquet(destDir).count() else 0L
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(destDir).count() - before
  }

  /** §2.4 #82 — CDC APPLY: a stream of keyed upserts merged into a batch
    * destination, one `foreachBatch` at a time. Each micro-batch first
    * collapses to one row per key (last writer within the batch wins, by
    * `seqColumn`), then [[graft.operators.TableCopy.upsert]] merges it into
    * the destination atomically (stage-then-swap via a versioned subdir so
    * readers never see a half-applied batch). This is the change-feed →
    * warehouse-table applier; state lives in the destination itself, so the
    * stream needs no Spark state store.
    */
  def cdcApply(spark: SparkSession, changes: DataFrame, destDir: String,
      checkpointDir: String, keys: Seq[String], seqColumn: String): Unit = {
    val q = changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(col(seqColumn).desc)
        val latest = batch
          .withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
        val sparkB = batch.sparkSession
        val cur = s"$destDir/current"
        val staged = s"$destDir/v$batchId"
        val merged =
          if (new java.io.File(cur).exists())
            graft.operators.TableCopy.upsert(latest, sparkB.read.parquet(cur), keys)
          else latest
        merged.write.mode("overwrite").parquet(staged)
        // Atomic-enough swap for a filesystem destination: point `current`
        // at the new version (a real lakehouse uses a table format commit).
        val link = new java.io.File(cur)
        if (link.exists()) {
          val old = new java.io.File(s"$destDir/prev-$batchId")
          link.renameTo(old)
        }
        new java.io.File(staged).renameTo(link)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** §2.4 #328 — streaming PSI DRIFT monitor: per tumbling window, the
    * Population Stability Index of event values against a STATIC baseline
    * decile table — the live twin of the batch #215 (same Laplace
    * smoothing (n+1)/(N+10), same bin convention bin = #edges exceeded),
    * paging when a model's input distribution walks away from its
    * training snapshot BETWEEN batch refits. The baseline (9 edges + 10
    * counts) is computed once in batch and passed as plain values — a
    * bounded config, not a stream; bucketing is a codegen'd CASE cascade;
    * ONE stateful windowed aggregation carries ten conditional counts as
    * columns (not rows — a second aggregation would be illegal in append
    * mode), and the PSI is a stateless projection, so stream = batch by
    * construction (spec-asserted).
    */
  def psiMonitor(events: DataFrame, edges: Seq[Double],
      baseCounts: Seq[Long], threshold: Double = 0.2): DataFrame = {
    require(baseCounts.length == edges.length + 1,
      s"need one baseline count per bucket: ${baseCounts.length} counts " +
        s"for ${edges.length} edges")
    val bucket = edges.foldLeft(lit(0)) { (acc, e) =>
      acc + when(col("value") > e, 1).otherwise(0)
    }
    val aggs = baseCounts.indices.map(b =>
      sum(when(bucket === b, 1L).otherwise(0L)).as(s"n_$b"))
    val agg = events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(aggs.head, aggs.tail: _*)
    val baseTot = baseCounts.sum
    val obsTot = baseCounts.indices.map(b => col(s"n_$b")).reduce(_ + _)
    val nBuckets = baseCounts.length
    val terms = baseCounts.indices.map { b =>
      val pa = lit((baseCounts(b) + 1.0) / (baseTot + nBuckets.toDouble))
      val pb = (col(s"n_$b") + lit(1L)).cast("double") /
        (obsTot + lit(nBuckets.toLong)).cast("double")
      (pa - pb) * log(pa / pb)
    }
    val psi = terms.reduce(_ + _)
    agg.select(col("window.start").as("window_start"),
      obsTot.as("n_events"), round(psi, 6).as("psi"),
      (psi > threshold).as("drift_detected"))
  }

  /** Apply ONE micro-batch of a streaming JDBC upsert exactly once: stage
    * the batch via the distributed JDBC writer, then — inside a single
    * database TRANSACTION — check the batch LEDGER, run the dialect's
    * set-based MERGE, and record the batch id. A crash-replayed batch
    * finds its id in the ledger and rolls back untouched, which is what
    * upgrades foreachBatch's at-least-once to exactly-once IN EFFECT: the
    * merge and its ledger row commit or vanish together. Returns true if
    * the batch applied, false if the ledger said "already done".
    */
  private[graft] def applyBatchUpsert(store: graft.operators.TableCopy.JdbcStore,
      table: String, keys: Seq[String], batch: DataFrame,
      batchId: Long): Boolean = {
    import graft.operators.TableCopy.Recreate
    val ledger = s"${table}_graft_batches"
    val staging = s"${table}_stage_$batchId"
    // Distributed stage write; Recreate makes a replayed stage idempotent.
    store.write(batch, staging, Recreate)
    val props = new java.util.Properties()
    store.options.foreach { case (k, v) => props.setProperty(k, v) }
    store.options.get("driver").foreach(Class.forName)
    val conn = java.sql.DriverManager.getConnection(store.url, props)
    try {
      // Destination + ledger bootstrap (idempotent: "exists" tolerated).
      // Both the tolerated SQLStates and the catalog identifier case go
      // through the dialect/driver (hardcoding Derby's X0Y32 + toUpperCase
      // made every micro-batch fail permanently on a lowercase-folding
      // backend like Postgres, where an existing table read as absent and
      // the CREATE raised an unswallowed 42P07).
      def tryDdl(sql: String): Unit =
        try { conn.createStatement().executeUpdate(sql); () }
        catch { case e: java.sql.SQLException
          if store.dialect.tableExistsStates(e.getSQLState) => () }
      tryDdl(s"CREATE TABLE $ledger (batch_id BIGINT PRIMARY KEY)")
      val md = conn.getMetaData
      val catalogName =
        if (md.storesUpperCaseIdentifiers) table.toUpperCase
        else if (md.storesLowerCaseIdentifiers) table.toLowerCase
        else table
      val meta = md.getTables(null, null, catalogName, null)
      val destExists = meta.next(); meta.close()
      if (!destExists)
        tryDdl(s"CREATE TABLE $table AS SELECT * FROM $staging WITH NO DATA")
      val idx = s"${table}_graft_kidx"
      try conn.createStatement().executeUpdate(
        store.dialect.keyIndexSql(table, idx, keys))
      catch { case e: java.sql.SQLException
        if store.dialect.indexExistsStates(e.getSQLState) => () }
      conn.setAutoCommit(false)
      val rs = conn.createStatement()
        .executeQuery(s"SELECT 1 FROM $ledger WHERE batch_id = $batchId")
      val seen = rs.next(); rs.close()
      val applied = if (seen) { conn.rollback(); false } else {
        conn.createStatement().executeUpdate(
          store.dialect.mergeSql(table, staging, keys, batch.columns.toSeq))
        conn.createStatement().executeUpdate(
          s"INSERT INTO $ledger VALUES ($batchId)")
        conn.commit()
        true
      }
      conn.setAutoCommit(true)
      conn.createStatement().executeUpdate(s"DROP TABLE $staging")
      applied
    } finally conn.close()
  }

  /** §2.4 #317 — streaming JDBC UPSERT sink, the continuous version of the
    * reference's table copy: every micro-batch merges into a live JDBC
    * destination (update on key match, insert otherwise) with EXACTLY-ONCE
    * effect via [[applyBatchUpsert]]'s ledger transaction. This is the
    * landing-zone → warehouse conveyor run as a stream: Spark stages each
    * batch in parallel, the database applies one set-based MERGE, and a
    * replayed batch is a no-op — no timestamp watermark column needed, no
    * duplicate rows ever. `Trigger.AvailableNow` drains what has landed
    * and stops (the #79 discipline), so the same call serves both
    * continuous and scheduled-batch deployments.
    */
  def jdbcUpsertSink(spark: SparkSession, src: DataFrame,
      store: graft.operators.TableCopy.JdbcStore, table: String,
      keys: Seq[String], checkpointDir: String): Unit = {
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyBatchUpsert(store, table, keys, batch.toDF(), batchId)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** §2.4 #137 — streaming QUARANTINE ROUTER: every micro-batch routes
    * through the SAME rule set the batch [[graft.operators.TableCopy
    * .quarantineCopy]] applies — clean rows append to the destination,
    * failing rows append to the quarantine table stamped with the first
    * failing rule (the landing-zone conveyor with in-flight validation:
    * bad rows neither abort the stream nor silently vanish). One codegen'd
    * CASE per row. foreachBatch alone is at-least-once on crash replay —
    * so each write is keyed on the micro-batch id (`_batch_id` partition,
    * dynamic partition overwrite): a replayed batch OVERWRITES its own
    * partition instead of double-appending, making the sink idempotent and
    * the route exactly-once in effect, like [[incrementalCopy]]'s file-sink
    * commit log. Both outputs derive from one persisted evaluation.
    */
  def quarantineRoute(spark: SparkSession, src: DataFrame, destDir: String,
      checkpointDir: String,
      rules: Seq[(String, org.apache.spark.sql.Column)]): Unit = {
    val reason = coalesce(
      rules.map { case (n, bad) => when(bad, lit(n)) } :+
        lit(null).cast("string"): _*)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val tagged = batch.withColumn("reason", reason)
          .withColumn("_batch_id", lit(batchId)).persist()
        try {
          tagged.where(col("reason").isNull).drop("reason")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(s"$destDir/clean.parquet")
          tagged.where(col("reason").isNotNull)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(s"$destDir/quarantine.parquet")
        } finally tagged.unpersist()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** §2.4 #69 — sessionization via Spark's NATIVE `session_window` grouping:
    * the declarative twin of [[sessionize]]. The engine merges overlapping
    * per-event windows `[ts, ts+gap)` into sessions inside the streaming
    * aggregation operator — no user state code, and because it's a plain
    * groupBy the SAME call runs in batch (where it must agree with
    * `Relational.sessionizeBatch`). Watermark closes (emits + evicts) a
    * session once event time passes its end — state stays bounded by the
    * active-session count.
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30,
      watermark: Option[String] = Some("30 minutes")): DataFrame = {
    val in = watermark.fold(events)(events.withWatermark("ts", _))
    in.groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
  }
}
