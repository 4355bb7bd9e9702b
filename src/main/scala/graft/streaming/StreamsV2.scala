package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** `transformWithState` (Spark 4.x `StatefulProcessor`) forms of the two
  * hottest keyed-state operators — txn assembly and the rolling-lag ring.
  *
  * Semantics are identical to the `flatMapGroupsWithState` forms in
  * [[Streams]] (parity-asserted in StreamingSpec); what changes is the state
  * plumbing:
  *
  *   - the buffer is a NAMED, TYPED `ListState` instead of one opaque
  *     case-class blob — the RocksDB state store appends an arriving event
  *     as its own key-value entry instead of rewriting the whole buffer
  *     value on every micro-batch, which is the operational win at scale
  *     (large in-flight transactions under drift);
  *   - state TTL is declarative (`TTLConfig`) — the runtime expires
  *     abandoned buffers per-entry, replacing the manual
  *     `ProcessingTimeTimeout` + `setTimeoutDuration` bookkeeping (and its
  *     zero-interval-trigger busy-loop pitfall).
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `...state.RocksDBStateStoreProvider`); the HDFS-backed default does not
  * support `transformWithState`. The `flatMapGroupsWithState` forms remain
  * the portable default.
  */
object StreamsV2 {

  import Streams.{AssembledTxn, Event, LagSample, LagSnapshot}

  /** Txn-assembly processor: buffer per txId until complete
    * (`src/changefeed/model.ts:176-205` — same completion rule as
    * `Streams.txnComplete`: declared total reached; the `last` flag alone
    * never completes a known-total txn, a drift-first last event must
    * wait for its siblings). */
  class TxnAssemblyProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, Event, AssembledTxn] {
    @transient private var buf: ListState[Event] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState("txnBuf", Encoders.product[Event], ttl)

    override def handleInputRows(
        txId: String, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[AssembledTxn] = {
      val incoming = rows.toList
      val all = buf.get().toList ++ incoming
      if (Streams.txnComplete(all)) {
        buf.clear()
        val sorted = all.sortBy(e => (e.txIndex, e.lsn))
        Iterator.single(AssembledTxn(
          txId, sorted.size,
          sorted.map(_.commitTs).max,
          sorted.map(_.lsn).min,
          sorted))
      } else {
        // append-only state write: only the NEW events hit the store
        buf.appendList(incoming.toArray)
        Iterator.empty
      }
    }
  }

  /** Txn assembly on `transformWithState` — drop-in for
    * [[Streams.assembleTxns]]. `ttlMs <= 0` disables expiry (bounded
    * replays / tests). */
  def assembleTxns(
      events: Dataset[Event],
      ttlMs: Long = 60000L): Dataset[AssembledTxn] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.txId)
      .transformWithState(new TxnAssemblyProcessor(ttl), mode, OutputMode.Append())
  }

  /** Rolling-lag ring processor: the last ≤ `lastN` lag samples per lane
    * (`src/engine/metrics.ts:42-44,97-139`), snapshot after every batch. */
  class LagRingProcessor(lastN: Int)
      extends StatefulProcessor[String, LagSample, LagSnapshot] {
    @transient private var ring: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getListState("lagRing", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        method: String, rows: Iterator[LagSample],
        timerValues: TimerValues): Iterator[LagSnapshot] = {
      val arrived = rows.toSeq.sortBy(s => (s.ord1, s.ord2)).map(_.lagMs)
      val kept = (ring.get().toSeq ++ arrived).takeRight(lastN).toIndexedSeq
      if (kept.isEmpty) Iterator.empty
      else {
        ring.put(kept.toArray)
        val sorted = kept.sorted
        def r3(x: Double): Double =
          BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        Iterator.single(LagSnapshot(
          method,
          r3(Streams.percentile(sorted, 0.5)),
          r3(Streams.percentile(sorted, 0.95)),
          sorted.last,
          kept.length))
      }
    }
  }

  /** Rolling lag percentiles on `transformWithState` — drop-in for
    * [[Streams.lagRollingStream]]. */
  def lagRollingStream(
      samples: Dataset[LagSample],
      lastN: Int = 2000): Dataset[LagSnapshot] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .groupByKey(_.method)
      .transformWithState(new LagRingProcessor(lastN), TimeMode.None(), OutputMode.Append())
  }

  /** Funnel-progress processor: per-user first-completion times as ONE
    * small `ValueState` (≤ |steps| longs), the shared
    * [[Streams.funnelFold]] doing the semantics — v1/v2 parity by
    * construction, same as the throttle/broker/lag processors. */
  class FunnelProcessor(steps: Seq[String], ttl: TTLConfig)
      extends StatefulProcessor[Long, Streams.EventIn, Streams.FunnelAdvance] {
    @transient private var progress:
      org.apache.spark.sql.streaming.ValueState[Streams.FunnelProgress] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      progress = getHandle.getValueState("funnelProgress",
        Encoders.product[Streams.FunnelProgress], ttl)

    override def handleInputRows(
        uid: Long, rows: Iterator[Streams.EventIn],
        timerValues: TimerValues): Iterator[Streams.FunnelAdvance] = {
      val (next, out) =
        Streams.funnelFold(steps, Option(progress.get()), rows.toSeq)
      progress.update(next)
      out.iterator
    }
  }

  /** Ordered-conversion funnel on `transformWithState` — drop-in for
    * [[Streams.funnelStream]] (parity-asserted in EventStreamSpec). */
  def funnelStream(
      events: Dataset[Streams.EventIn],
      steps: Seq[String] = Seq("signup", "click", "purchase"),
      ttlMs: Long = 0L): Dataset[Streams.FunnelAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor(steps, ttl), mode, OutputMode.Append())
  }

  /** Transition-matrix processor: ONE previous-event tuple of
    * `ValueState` per user — the fold is [[Streams.transitionsFold]],
    * shared with the `flatMapGroupsWithState` form. TTL expiry clears
    * the carried tuple (declarative `TTLConfig`, like the v1 form's
    * plain eviction — a re-appearing user simply starts a new chain). */
  class TransitionsProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, (Long, Long, String, Long), Streams.TransitionOut] {
    @transient private var last: org.apache.spark.sql.streaming.ValueState[Streams.LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState(
        "lastEvent", Encoders.product[Streams.LastEvent], ttl)

    override def handleInputRows(
        userId: Long, rows: Iterator[(Long, Long, String, Long)],
        timerValues: TimerValues): Iterator[Streams.TransitionOut] = {
      val start = if (last.exists()) Some(last.get()) else None
      val (next, out) = Streams.transitionsFold(userId, start,
        rows.map(e => (e._2, e._3, e._4)).toSeq)
      next.foreach(last.update)
      out.iterator
    }
  }

  /** Streaming transition matrix on `transformWithState` — drop-in for
    * [[Streams.transitionsStream]]. `ttlMs <= 0` disables expiry. */
  def transitionsStream(
      events: Dataset[(Long, Long, String, Long)],
      ttlMs: Long = 0L): Dataset[Streams.TransitionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_._1)
      .transformWithState(new TransitionsProcessor(ttl), mode, OutputMode.Append())
  }

  /** Retention processor: (cohortDay, emitted-day set, pending) per user
    * — the fold is [[Streams.retentionFold]], shared with the v1 form
    * (including the pre-signup same-day `pending` buffer). */
  class RetentionProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Streams.EventIn, Streams.RetentionMark] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Streams.RetentionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState(
        "retention", Encoders.product[Streams.RetentionState], ttl)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.EventIn],
        timerValues: TimerValues): Iterator[Streams.RetentionMark] = {
      val start = if (st.exists()) Some(st.get()) else None
      val (next, out) = Streams.retentionFold(userId, start, rows.toSeq)
      st.update(next)
      out.iterator
    }
  }

  /** Streaming retention triangle on `transformWithState` — drop-in for
    * [[Streams.retentionStream]]. `ttlMs <= 0` disables expiry. */
  def retentionStream(
      events: Dataset[Streams.EventIn],
      ttlMs: Long = 0L): Dataset[Streams.RetentionMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.userId)
      .transformWithState(new RetentionProcessor(ttl), mode, OutputMode.Append())
  }

  /** Last-touch attribution processor: ONE carried touch tuple per user
    * — the fold is [[Streams.attributionFold]], shared with the v1
    * form; every purchase emits already credited. */
  class AttributionProcessor(touchTypes: Set[String], ttl: TTLConfig)
      extends StatefulProcessor[Long, Streams.AttrIn, Streams.AttributionOut] {
    @transient private var touch: org.apache.spark.sql.streaming.ValueState[Streams.LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      touch = getHandle.getValueState(
        "lastTouch", Encoders.product[Streams.LastEvent], ttl)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.AttrIn],
        timerValues: TimerValues): Iterator[Streams.AttributionOut] = {
      val start = if (touch.exists()) Some(touch.get()) else None
      val (next, out) =
        Streams.attributionFold(userId, touchTypes, start, rows.toSeq)
      next.foreach(touch.update)
      out.iterator
    }
  }

  /** Streaming last-touch attribution on `transformWithState` — drop-in
    * for [[Streams.attributionStream]]. `ttlMs <= 0` disables expiry. */
  def attributionStream(
      events: Dataset[Streams.AttrIn],
      touchTypes: Set[String] = Set("click", "view"),
      ttlMs: Long = 0L): Dataset[Streams.AttributionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.userId)
      .transformWithState(new AttributionProcessor(touchTypes, ttl), mode, OutputMode.Append())
  }

  /** [[Streams.ActivityState]] plus the last-touch processing time the
    * timer-based TTL eviction needs (V2 has no `setTimeoutDuration`; a
    * timer is registered per batch and a stale-timer guard compares
    * against `lastTouchMs`). */
  case class ActivityStateV2(days: Seq[Long], everActive: Boolean,
      lastTouchMs: Long)

  /** DAU / new-vs-returning processor — the `transformWithState` form of
    * [[Streams.activityStream]], same fold ([[Streams.activityFold]]),
    * same TTL-eviction contract: expiry drops the day SET but keeps the
    * one-boolean `everActive` tombstone, so a re-appearing user is never
    * a second `new`. */
  class ActivityProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, Streams.EventIn, Streams.DayActive] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[ActivityStateV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState(
        "activity", Encoders.product[ActivityStateV2], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.EventIn],
        timerValues: TimerValues): Iterator[Streams.DayActive] = {
      val start = if (st.exists()) {
        val s = st.get(); Some(Streams.ActivityState(s.days, s.everActive))
      } else None
      val (next, out) = Streams.activityFold(userId, start, rows.toSeq)
      val now = timerValues.getCurrentProcessingTimeInMs()
      st.update(ActivityStateV2(next.days, next.everActive, now))
      if (ttlMs > 0) {
        // one pending timer per key, not one per batch: a key active
        // every micro-batch would otherwise accumulate a timer per batch
        // within each TTL window (the stale guard keeps that CORRECT but
        // timer-state size and expired-timer invocations grow with batch
        // rate) — same discipline as DriftBrokerProcessor
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(now + ttlMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Streams.DayActive] = {
      // a timer registered before a later touch is STALE — only evict
      // when the key has been silent for a full TTL
      if (st.exists() &&
          timerValues.getCurrentProcessingTimeInMs() - st.get().lastTouchMs >= ttlMs)
        st.update(st.get().copy(days = Seq.empty, everActive = true))
      Iterator.empty
    }
  }

  /** Streaming DAU on `transformWithState` — drop-in for
    * [[Streams.activityStream]]. `ttlMs <= 0` disables expiry. */
  def activityStream(
      events: Dataset[Streams.EventIn],
      ttlMs: Long = 0L): Dataset[Streams.DayActive] = {
    val spark = events.sparkSession
    import spark.implicits._
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.userId)
      .transformWithState(new ActivityProcessor(ttlMs), mode, OutputMode.Append())
  }

  /** [[Streams.GrowthState]] plus the last-touch processing time (same
    * stale-timer discipline as [[ActivityStateV2]]). */
  case class GrowthStateV2(lastWeek: Long, churned: Boolean, lastTouchMs: Long)

  /** Growth-accounting processor — the `transformWithState` form of
    * [[Streams.growthStream]], same fold ([[Streams.growthFold]]), same
    * eviction contract: expiry emits the silent `churned` row and keeps
    * the (lastWeek, churned=true) tombstone so a return classifies
    * `resurrected`, never a second `new`. */
  class GrowthProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, Streams.EventIn, Streams.GrowthMark] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[GrowthStateV2] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState(
        "growth", Encoders.product[GrowthStateV2], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.EventIn],
        timerValues: TimerValues): Iterator[Streams.GrowthMark] = {
      val start = if (st.exists()) {
        val s = st.get(); Some(Streams.GrowthState(s.lastWeek, s.churned))
      } else None
      val (next, out) = Streams.growthFold(userId, start, rows.toSeq)
      val now = timerValues.getCurrentProcessingTimeInMs()
      st.update(GrowthStateV2(next.lastWeek, next.churned, now))
      if (ttlMs > 0) {
        // one pending timer per key (see ActivityProcessor)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(now + ttlMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Streams.GrowthMark] = {
      if (st.exists() &&
          timerValues.getCurrentProcessingTimeInMs() - st.get().lastTouchMs >= ttlMs) {
        val s = st.get()
        if (s.lastWeek >= 0 && !s.churned) {
          st.update(s.copy(churned = true))
          return Iterator.single(
            Streams.GrowthMark(userId, s.lastWeek + 1, "churned"))
        }
      }
      Iterator.empty
    }
  }

  /** Streaming growth accounting on `transformWithState` — drop-in for
    * [[Streams.growthStream]]. `ttlMs <= 0` disables expiry. */
  def growthStream(
      events: Dataset[Streams.EventIn],
      ttlMs: Long = 0L): Dataset[Streams.GrowthMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.userId)
      .transformWithState(new GrowthProcessor(ttlMs), mode, OutputMode.Append())
  }

  /** RFM processor: one 3-long `ValueState` per purchasing user — the
    * running (lastDay, frequency, ticks). The fold is
    * [[Streams.rfmFold]], the SAME function the
    * `flatMapGroupsWithState` form calls — the two APIs cannot drift.
    * TTL here is declarative; the [[Streams.rfmStream]] docstring's
    * eviction caveat (totals ARE the product; expiry resets a
    * re-appearing purchaser visibly) applies identically. */
  class RfmProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Streams.AttrIn, Streams.RfmMark] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[Streams.RfmState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState(
        "rfmTotals", Encoders.product[Streams.RfmState], ttl)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.AttrIn],
        timerValues: TimerValues): Iterator[Streams.RfmMark] = {
      val start = if (totals.exists()) Some(totals.get()) else None
      val (next, out) = Streams.rfmFold(userId, start, rows.toSeq)
      next.foreach(totals.update)
      out.iterator
    }
  }

  /** Streaming RFM on `transformWithState` — drop-in for
    * [[Streams.rfmStream]]. `ttlMs <= 0` disables expiry. */
  def rfmStream(
      events: Dataset[Streams.AttrIn],
      ttlMs: Long = 0L): Dataset[Streams.RfmMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.userId)
      .transformWithState(new RfmProcessor(ttl), mode, OutputMode.Append())
  }

  /** Cohort-LTV processor: one long of `ValueState` per user (the signup
    * cohort day). The fold is [[Streams.ltvFold]] — shared with the
    * `flatMapGroupsWithState` form. TTL expiry forgets a cohort, so a
    * user's LATER purchases drop from the triangle (the conservative
    * direction — the entry mark emitted exactly once before expiry, so
    * cohort sizes never double-count). */
  class LtvProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Streams.AttrIn, Streams.LtvMark] {
    @transient private var cohort: org.apache.spark.sql.streaming.ValueState[Streams.LtvState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cohort = getHandle.getValueState(
        "ltvCohort", Encoders.product[Streams.LtvState], ttl)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.AttrIn],
        timerValues: TimerValues): Iterator[Streams.LtvMark] = {
      val start = if (cohort.exists()) Some(cohort.get()) else None
      val (next, out) = Streams.ltvFold(userId, start, rows.toSeq)
      if (next.cohortDay >= 0) cohort.update(next)
      out.iterator
    }
  }

  /** Streaming cohort LTV on `transformWithState` — drop-in for
    * [[Streams.ltvStream]]. `ttlMs <= 0` disables expiry. */
  def ltvStream(
      events: Dataset[Streams.AttrIn],
      ttlMs: Long = 0L): Dataset[Streams.LtvMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.userId)
      .transformWithState(new LtvProcessor(ttl), mode, OutputMode.Append())
  }

  /** Token-bucket throttle processor: one small `ValueState` per lane —
    * the scalar-state counterpart to the ListState buffers above (the
    * bucket is (tick, allowance, used); RocksDB rewrites one tiny value
    * per lane per batch). The drain math is [[Streams.throttleFold]],
    * the SAME function the `flatMapGroupsWithState` form calls — the two
    * APIs cannot drift. */
  class ThrottleProcessor(rate: Double, stepMs: Long, batchCap: Int, ttl: TTLConfig)
      extends StatefulProcessor[String, graft.cdc.Consumer.DeliveryIn, graft.cdc.Consumer.DeliveryOut] {
    @transient private var bucket: org.apache.spark.sql.streaming.ValueState[Streams.ThrottleState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bucket = getHandle.getValueState(
        "bucket", Encoders.product[Streams.ThrottleState], ttl)

    override def handleInputRows(
        method: String, rows: Iterator[graft.cdc.Consumer.DeliveryIn],
        timerValues: TimerValues): Iterator[graft.cdc.Consumer.DeliveryOut] = {
      val st =
        if (bucket.exists()) bucket.get()
        else Streams.ThrottleState(0L, 0.0, 0)
      val (next, out) = Streams.throttleFold(st, rows.toSeq, rate, stepMs, batchCap)
      bucket.update(next)
      out.iterator
    }
  }

  /** Consumer throttle on `transformWithState` — drop-in for
    * [[Streams.throttleStream]]. `ttlMs <= 0` disables expiry. */
  def throttleStream(
      events: Dataset[graft.cdc.Consumer.DeliveryIn],
      rate: Double,
      stepMs: Long = 50L,
      batchCap: Int = 50,
      ttlMs: Long = 0L): Dataset[graft.cdc.Consumer.DeliveryOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(_.method)
      .transformWithState(
        new ThrottleProcessor(rate, stepMs, batchCap, ttl), mode, OutputMode.Append())
  }

  /** As-of enrichment processor: the latest build row per key in one
    * `ValueState` — the minimal-state operator of the family (one (ts, id)
    * pair per key, rewritten only when a newer build arrives). The in-batch
    * fold is [[Streams.asOfFold]], the SAME function the
    * `flatMapGroupsWithState` form calls — the two APIs cannot drift. */
  class AsOfProcessor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Streams.AsOfIn, Streams.AsOfOut] {
    @transient private var latest: org.apache.spark.sql.streaming.ValueState[Streams.AsOfState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState(
        "latestBuild", Encoders.product[Streams.AsOfState], ttl)

    override def handleInputRows(
        key: Long, rows: Iterator[Streams.AsOfIn],
        timerValues: TimerValues): Iterator[Streams.AsOfOut] = {
      val st = if (latest.exists()) Some(latest.get()) else None
      val (next, out) = Streams.asOfFold(key, st, rows.toSeq)
      next.foreach(latest.update)
      out.iterator
    }
  }

  /** Streaming as-of enrichment on `transformWithState` — drop-in for
    * [[Streams.asOfStream]]. `ttlMs <= 0` disables expiry. */
  def asOfStream(
      rows: Dataset[Streams.AsOfIn],
      ttlMs: Long = 3600000L): Dataset[Streams.AsOfOut] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    rows
      .groupByKey(_.key)
      .transformWithState(new AsOfProcessor(ttl), mode, OutputMode.Append())
  }

  /** FIFO broker-delivery processor: one (tick, used) `ValueState` per
    * partition. The drain math is [[Streams.brokerFold]], the SAME
    * function the `flatMapGroupsWithState` form calls — the two APIs
    * cannot drift. */
  class BrokerDeliveryProcessor(tickMs: Long, maxApplyPerTick: Int)
      extends StatefulProcessor[Int, graft.cdc.Consumer.BrokerIn, graft.cdc.Consumer.BrokerOut] {
    @transient private var queue: org.apache.spark.sql.streaming.ValueState[Streams.BrokerQueueState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      queue = getHandle.getValueState(
        "queue", Encoders.product[Streams.BrokerQueueState], TTLConfig.NONE)

    override def handleInputRows(
        part: Int, rows: Iterator[graft.cdc.Consumer.BrokerIn],
        timerValues: TimerValues): Iterator[graft.cdc.Consumer.BrokerOut] = {
      val st = if (queue.exists()) queue.get() else Streams.BrokerQueueState(0L, 0)
      val (next, out) = Streams.brokerFold(part, st, rows.toSeq, tickMs, maxApplyPerTick)
      queue.update(next)
      out.iterator
    }
  }

  /** Exact FIFO broker delivery on `transformWithState` — drop-in for
    * [[Streams.brokerDeliverStream]]. */
  def brokerDeliverStream(
      events: Dataset[graft.cdc.Consumer.BrokerIn],
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4): Dataset[graft.cdc.Consumer.BrokerOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.part)
      .transformWithState(
        new BrokerDeliveryProcessor(tickMs, maxApplyPerTick), TimeMode.None(), OutputMode.Append())
  }

  /** Drift-broker (LIFO) processor: the per-partition (clock, pending
    * stack) in one `ValueState`. A ValueState, not a ListState, on
    * purpose: the stack mutates at its HEAD (every arrival prepends, every
    * drain pops), so the append-only ListState write pattern buys nothing
    * here — the value rewrite is the honest cost of LIFO state. The fold
    * is [[Streams.driftFold]], the SAME function the
    * `flatMapGroupsWithState` form calls — the two APIs cannot drift.
    *
    * `ttlMs > 0` arms a processing-time timer re-registered on every
    * batch; if it fires with no new arrivals the stack drains to empty
    * (same terminal semantics as v1's ProcessingTimeTimeout). Bounded
    * replays use a flush sentinel instead, so no wall clock enters tests. */
  class DriftBrokerProcessor(tickMs: Long, maxApplyPerTick: Int, ttlMs: Long)
      extends StatefulProcessor[Int, graft.cdc.Consumer.DriftIn, graft.cdc.Consumer.BrokerOut] {
    @transient private var queue: org.apache.spark.sql.streaming.ValueState[Streams.DriftQueueState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      queue = getHandle.getValueState(
        "driftQueue", Encoders.product[Streams.DriftQueueState], TTLConfig.NONE)

    override def handleInputRows(
        part: Int, rows: Iterator[graft.cdc.Consumer.DriftIn],
        timerValues: TimerValues): Iterator[graft.cdc.Consumer.BrokerOut] = {
      val st = if (queue.exists()) queue.get() else Streams.DriftQueueState(0L, Seq.empty)
      val (next, out) = Streams.driftFold(part, st, rows.toSeq, tickMs, maxApplyPerTick)
      queue.update(next)
      if (ttlMs > 0) {
        // slide the idle deadline: drop the old timer, arm a fresh one
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + ttlMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        part: Int, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[graft.cdc.Consumer.BrokerOut] = {
      val st = if (queue.exists()) queue.get() else Streams.DriftQueueState(0L, Seq.empty)
      val (_, out) = Streams.driftFold(part, st, Seq.empty, tickMs, maxApplyPerTick, flush = true)
      queue.clear()
      out.iterator
    }
  }

  /** Exact drift-on (LIFO) broker delivery on `transformWithState` —
    * drop-in for [[Streams.brokerDeliverDriftStream]]. */
  def brokerDeliverDriftStream(
      events: Dataset[graft.cdc.Consumer.DriftIn],
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4,
      ttlMs: Long = 0L): Dataset[graft.cdc.Consumer.BrokerOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.part)
      .transformWithState(
        new DriftBrokerProcessor(tickMs, maxApplyPerTick, ttlMs), mode, OutputMode.Append())
  }

  /** Schema-capture processor: the per-table monotone version counter in
    * one tiny `ValueState`. The versioning is [[Streams.schemaFold]], the
    * SAME function the `flatMapGroupsWithState` form calls — the two APIs
    * cannot drift. */
  class SchemaCaptureProcessor
      extends StatefulProcessor[String, graft.cdc.SchemaEvolution.SchemaChange, Streams.VersionedSchemaChange] {
    @transient private var version: org.apache.spark.sql.streaming.ValueState[Streams.SchemaVersionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      version = getHandle.getValueState(
        "schemaVersion", Encoders.product[Streams.SchemaVersionState], TTLConfig.NONE)

    override def handleInputRows(
        tbl: String, rows: Iterator[graft.cdc.SchemaEvolution.SchemaChange],
        timerValues: TimerValues): Iterator[Streams.VersionedSchemaChange] = {
      val v0 = if (version.exists()) version.get().version else 1
      val (v, out) = Streams.schemaFold(v0, rows.toSeq)
      version.update(Streams.SchemaVersionState(v))
      out.iterator
    }
  }

  /** Streaming schema-change capture on `transformWithState` — drop-in
    * for [[Streams.schemaCaptureStream]]. */
  def schemaCaptureStream(
      changes: Dataset[graft.cdc.SchemaEvolution.SchemaChange]): Dataset[Streams.VersionedSchemaChange] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.tbl)
      .transformWithState(new SchemaCaptureProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** Latest row image within one open poll window (public for the state
    * encoder). */
  case class PollWinState(
      opCode: String, valV: Option[Double], kV: Option[Long], lsn: Long, n: Long)

  /** One closed poll window's emission — same fields as
    * [[Streams.pollStream]]'s row with `poll_ts` as epoch millis. */
  case class PollOut(
      tbl: String, pk: String, pollTs: Long, opCode: String,
      afterVal: Option[Double], afterK: Option[Long], opsInWindow: Long)

  /** Polling-capture processor — the ROW-IMAGE form of the poll lane: per
    * (tbl, pk) key a `MapState` holds the latest image (max-lsn op, merged
    * payload fields, op count) of each OPEN tumbling window, and an
    * event-time timer at each window's end emits the image once the
    * watermark closes it — the poll's lossy-by-design semantics
    * (intermediate versions die inside the window state;
    * `sim/engines/PollingEngine.ts:59-84`).
    *
    * vs the v1 windowed `max_by` aggregation ([[Streams.pollStream]]):
    * same semantics (parity-asserted), but the state is explicit — one
    * map entry per key per open window, O(1) per entry regardless of ops
    * per window — and the RocksDB write pattern is per-window-entry
    * updates instead of aggregation buffers. */
  class PollProcessor(pollIntervalMs: Long)
      extends StatefulProcessor[(String, String), Event, PollOut] {
    @transient private var windows: org.apache.spark.sql.streaming.MapState[Long, PollWinState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      windows = getHandle.getMapState(
        "openWindows", Encoders.scalaLong, Encoders.product[PollWinState], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String), rows: Iterator[Event],
        timerValues: TimerValues): Iterator[PollOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      rows.toSeq.sortBy(_.lsn).foreach { e =>
        val ws = Math.floorDiv(e.commitTs, pollIntervalMs) * pollIntervalMs
        // late-row guard, matching the v1 windowed aggregation's watermark
        // filter: a row for a window the watermark already closed must NOT
        // reopen it (it would emit a duplicate window on the next timer)
        if (ws + pollIntervalMs > wm) {
          val cur = if (windows.containsKey(ws)) Some(windows.getValue(ws)) else None
          val next = cur match {
            case None => PollWinState(e.opCode, e.valV, e.kV, e.lsn, 1L)
            case Some(c) =>
              if (e.lsn >= c.lsn) PollWinState(e.opCode, e.valV, e.kV, e.lsn, c.n + 1)
              else c.copy(n = c.n + 1)
          }
          windows.updateValue(ws, next)
          getHandle.registerTimer(ws + pollIntervalMs)
        }
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: (String, String), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[PollOut] = {
      // a timer at windowEnd fires once the watermark passes it; emit and
      // drop every window closed by the current watermark (covers several
      // windows if the watermark jumped)
      val wm = timerValues.getCurrentWatermarkInMs()
      val closed = windows.iterator()
        .filter { case (ws, _) => ws + pollIntervalMs <= wm }
        .toSeq.sortBy(_._1)
      // mutate state eagerly, BEFORE the runtime consumes the returned
      // iterator — removal inside a lazy map would couple state changes to
      // output consumption order (partial consumption on error/stop could
      // leave emitted-but-unremoved windows)
      val out = closed.map { case (ws, st) =>
        windows.removeKey(ws)
        PollOut(key._1, key._2, ws + pollIntervalMs, st.opCode, st.valV, st.kV, st.n)
      }
      out.iterator
    }
  }

  /** Streaming polling capture on `transformWithState` — the keyed
    * row-image-state counterpart of [[Streams.pollStream]] (same emitted
    * rows, `poll_ts` as epoch ms; parity in StreamingSpec).
    *
    * Late-data semantics, precisely: `transformWithState` filters input
    * rows by EVENT TIME against the watermark (a row older than the
    * watermark never reaches the processor), while the v1 windowed
    * aggregation filters by WINDOW END (a late row still joins its
    * window while the window is open). The two coincide whenever
    * `watermarkDelay` bounds the feed's actual disorder — the contract a
    * watermark is supposed to encode; under disorder EXCEEDING the
    * stated delay, v1 may still absorb a late row into an open window
    * where this form has already dropped it. Size the delay honestly and
    * the forms are row-identical (randomized parity in StreamingSpec). */
  def pollStream(
      events: Dataset[Event],
      pollIntervalMs: Long = 1000L,
      watermarkDelay: String = "10 seconds"): Dataset[PollOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    events
      .withColumn("event_time", timestamp_millis(col("commitTs")))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
      .groupByKey(e => (e.tbl, e.pk))
      .transformWithState(
        new PollProcessor(pollIntervalMs), TimeMode.EventTime(), OutputMode.Append())
  }

  /** SCD2 processor — the `transformWithState` form of
    * [[Streams.scd2Stream]] (the heaviest per-key state of the keyed
    * family: the OPEN dimension version plus the version counter). The
    * step is [[Streams.scd2Fold]], the SAME function the
    * `flatMapGroupsWithState` form calls — the two APIs cannot drift.
    *
    * TTL contract matches v1 exactly: eviction emits the OPEN version
    * with [[Streams.ScdEvictedOpen]] as its `validTo` (a silently dropped
    * open row would be a dimension history that never ends) and then
    * REMOVES the state entirely — a re-appearing key restarts its version
    * counter at 1, the v1 `state.remove()` semantics. One pending timer
    * per key (delete-before-register, the DriftBrokerProcessor
    * discipline), slid on every batch, so the timer fires only after a
    * full TTL of silence. */
  class Scd2Processor(ttlMs: Long)
      extends StatefulProcessor[(String, String), Streams.ScdIn, Streams.ScdOut] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Streams.ScdState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState(
        "scd2Open", Encoders.product[Streams.ScdState], TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String), rows: Iterator[Streams.ScdIn],
        timerValues: TimerValues): Iterator[Streams.ScdOut] = {
      val start = if (st.exists()) Some(st.get()) else None
      val (next, out) = Streams.scd2Fold(start, rows.toSeq)
      next.foreach(st.update)
      if (ttlMs > 0) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + ttlMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        key: (String, String), timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Streams.ScdOut] = {
      val evicted =
        if (st.exists()) {
          val p = st.get()
          if (p.open)
            Some(Streams.ScdOut(key._1, key._2, p.openVer, p.validFrom,
              Streams.ScdEvictedOpen, p.v, p.kk))
          else None
        } else None
      st.clear()
      evicted.iterator
    }
  }

  /** Streaming SCD Type-2 dimension builder on `transformWithState` —
    * drop-in for [[Streams.scd2Stream]]. `ttlMs <= 0` disables expiry. */
  def scd2Stream(
      ops: Dataset[Streams.ScdIn],
      ttlMs: Long = 0L): Dataset[Streams.ScdOut] = {
    val spark = ops.sparkSession
    import spark.implicits._
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    ops
      .groupByKey(o => (o.tbl, o.pk))
      .transformWithState(new Scd2Processor(ttlMs), mode, OutputMode.Append())
  }

  /** Heartbeat processor — the `transformWithState` form of
    * [[Streams.heartbeatStream]]: one (lsn, t) tuple per table, the
    * smallest keyed state in the repo. The step is
    * [[Streams.heartbeatFold]], shared with the v1 form. TTL removes the
    * tuple silently (v1 semantics — a table going quiet is itself a gap
    * the NEXT tick will report against whatever state remains). */
  class HeartbeatProcessor(stallMs: Long, ttlMs: Long)
      extends StatefulProcessor[String, Streams.OpTick, Streams.StallOut] {
    @transient private var last: org.apache.spark.sql.streaming.ValueState[Streams.TickState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState(
        "lastTick", Encoders.product[Streams.TickState], TTLConfig.NONE)

    override def handleInputRows(
        tbl: String, rows: Iterator[Streams.OpTick],
        timerValues: TimerValues): Iterator[Streams.StallOut] = {
      val start = if (last.exists()) Some(last.get()) else None
      val (next, out) = Streams.heartbeatFold(stallMs, start, rows.toSeq)
      next.foreach(last.update)
      if (ttlMs > 0) {
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + ttlMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(
        tbl: String, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Streams.StallOut] = {
      last.clear()
      Iterator.empty
    }
  }

  /** Streaming liveness monitor on `transformWithState` — drop-in for
    * [[Streams.heartbeatStream]]. `ttlMs <= 0` disables expiry. */
  def heartbeatStream(
      ticks: Dataset[Streams.OpTick],
      stallMs: Long = 60000L,
      ttlMs: Long = 0L): Dataset[Streams.StallOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val mode = if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None()
    ticks
      .groupByKey(_.tbl)
      .transformWithState(new HeartbeatProcessor(stallMs, ttlMs), mode, OutputMode.Append())
  }

  /** Budget-admission processor — the `transformWithState` form of
    * [[Streams.budgetAdmissionStream]]: one long (tokens consumed) per
    * source, declarative TTL (the v1 timeout just removes the counter, so
    * TTLConfig expresses it exactly — no timer needed). The step is
    * [[Streams.budgetFold]], shared with the v1 form. */
  class BudgetProcessor(budgetPerSource: Long, ttl: TTLConfig)
      extends StatefulProcessor[String, Streams.BudgetIn, Streams.BudgetOut] {
    @transient private var used: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      used = getHandle.getValueState("usedTokens", Encoders.scalaLong, ttl)

    override def handleInputRows(
        source: String, rows: Iterator[Streams.BudgetIn],
        timerValues: TimerValues): Iterator[Streams.BudgetOut] = {
      val start = if (used.exists()) Some(used.get()) else None
      val (next, out) = Streams.budgetFold(source, start, rows.toSeq, budgetPerSource)
      used.update(next)
      out.iterator
    }
  }

  /** Streaming per-source token-budget admission on `transformWithState` —
    * drop-in for [[Streams.budgetAdmissionStream]]. `ttlMs <= 0` disables
    * expiry. */
  def budgetAdmissionStream(
      rows: Dataset[Streams.BudgetIn],
      budgetPerSource: Long = 2000L,
      ttlMs: Long = 3600000L): Dataset[Streams.BudgetOut] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    rows
      .groupByKey(_.source)
      .transformWithState(new BudgetProcessor(budgetPerSource, ttl), mode, OutputMode.Append())
  }

  /** Row-apply processor — the `transformWithState` form of
    * [[Streams.applyStream]] (merge-upsert keyed by (tbl, pk)): one
    * `ValueState[RowState]` per live key, the step is
    * [[Streams.applyFold]] — the SAME function the v1 form calls, so the
    * two APIs cannot drift. Delete emits the tombstone and CLEARS the
    * state (v1's `state.remove()`); TTL is declarative — expiry of an
    * idle key's state is a silent drop in both forms. */
  class ApplyProcessor(ttl: TTLConfig)
      extends StatefulProcessor[(String, String), Event, Streams.RowState] {
    @transient private var row: org.apache.spark.sql.streaming.ValueState[Streams.RowState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      row = getHandle.getValueState(
        "rowImage", Encoders.product[Streams.RowState], ttl)

    override def handleInputRows(
        key: (String, String), rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Streams.RowState] = {
      val start = if (row.exists()) Some(row.get()) else None
      val next = Streams.applyFold(key, start, rows.toSeq)
      if (next.deleted) row.clear() else row.update(next)
      Iterator.single(next)
    }
  }

  /** Streaming merge-upsert apply on `transformWithState` — drop-in for
    * [[Streams.applyStream]]. `ttlMs <= 0` disables expiry. */
  def applyStream(
      events: Dataset[Event],
      ttlMs: Long = 3600000L): Dataset[Streams.RowState] = {
    val spark = events.sparkSession
    import spark.implicits._
    val (ttl, mode) =
      if (ttlMs > 0)
        (TTLConfig(java.time.Duration.ofMillis(ttlMs)), TimeMode.ProcessingTime())
      else (TTLConfig.NONE, TimeMode.None())
    events
      .groupByKey(e => (e.tbl, e.pk))
      .transformWithState(new ApplyProcessor(ttl), mode, OutputMode.Append())
  }

  /** One OPEN gap session: `[start, end)` with `end = last event time +
    * gap` (the `session_window` convention — two events share a session
    * iff the later one's time is STRICTLY before the earlier one's end).
    * `n` counts the session's events. */
  case class OpenSession(start: Long, end: Long, n: Long)

  /** A closed session — same fields as [[Streams.sessionStream]]'s row
    * (`session_end` already includes the gap, the `session_window`
    * convention). */
  case class SessionOut(
      userId: Long, sessionStart: Long, sessionEnd: Long, nEvents: Long)

  /** One session-merge step: fold a batch of same-user event times into
    * the open-session list. Pure interval merge — each event is a
    * `[t, t+gap)` candidate, sessions merge while the next start is
    * strictly before the current end (Spark's `session_window` rule, so
    * this form, the v1 native-aggregate form, and the batch
    * [[graft.operators.Sessions.sessionize]] agree event-for-event).
    * Order-insensitive within a batch (the sort owns the order), and a
    * late-but-within-watermark event can BRIDGE two open sessions — the
    * case the list state exists for. */
  def sessionFold(
      gapMs: Long,
      open: Seq[OpenSession],
      arrivalTs: Seq[Long]): Seq[OpenSession] = {
    val all = (open ++ arrivalTs.map(t => OpenSession(t, t + gapMs, 1L)))
      .sortBy(s => (s.start, s.end))
    val out = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    all.foreach { s =>
      if (out.nonEmpty && s.start < out.last.end) {
        val l = out.last
        out(out.size - 1) = OpenSession(l.start, math.max(l.end, s.end), l.n + s.n)
      } else out += s
    }
    out.toSeq
  }

  /** Gap-sessionization processor — the keyed-state form of
    * [[Streams.sessionStream]] (which rides the native `session_window`
    * aggregate): per user a `ListState` of OPEN sessions, merged against
    * each batch's arrivals by [[sessionFold]] and closed by event-time
    * timers once the watermark passes a session's end. The state is
    * list-shaped on purpose: out-of-order events within the watermark
    * allowance can hold several sessions open per user at once (and a
    * late event can merge two of them), which is exactly what
    * `UpdatingSessionsExec` tracks internally — here it is explicit,
    * per-entry in RocksDB, instead of inside an aggregation buffer.
    *
    * Emission contract matches v1 append mode: a (user, session) row
    * emits ONCE, when the watermark passes `session end` (= last event
    * time + gap). Input rows older than the watermark are dropped by the
    * runtime before reaching the processor — the same honest-delay caveat
    * as [[PollProcessor]], plus one boundary: `transformWithState`
    * filters late rows as `eventTime <= watermark` and the watermark
    * STARTS at 0, so a row at event time 0 is dropped before the first
    * batch ever runs (the v1 aggregate keeps it — its filter is on window
    * END). Event times must be positive, which every epoch-ms feed
    * satisfies. */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Streams.EventIn, SessionOut] {
    @transient private var open: ListState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState(
        "openSessions", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        userId: Long, rows: Iterator[Streams.EventIn],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val merged = sessionFold(gapMs, open.get().toSeq, rows.map(_.tMs).toSeq)
      val wm = timerValues.getCurrentWatermarkInMs()
      val (closed, stillOpen) = merged.partition(_.end <= wm)
      if (stillOpen.isEmpty) open.clear() else open.put(stillOpen.toArray)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (stillOpen.nonEmpty) getHandle.registerTimer(stillOpen.map(_.end).min)
      closed.sortBy(_.start)
        .map(s => SessionOut(userId, s.start, s.end, s.n)).iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      val wm = timerValues.getCurrentWatermarkInMs()
      val (closed, stillOpen) = open.get().toSeq.partition(_.end <= wm)
      if (stillOpen.isEmpty) open.clear() else open.put(stillOpen.toArray)
      // the fired timer is consumed by the runtime; one-timer discipline
      // means no stale ones remain — just arm the next deadline
      if (stillOpen.nonEmpty) getHandle.registerTimer(stillOpen.map(_.end).min)
      closed.sortBy(_.start)
        .map(s => SessionOut(userId, s.start, s.end, s.n)).iterator
    }
  }

  /** Streaming gap sessionization on `transformWithState` — emits the
    * same closed-session rows as [[Streams.sessionStream]] (as a typed
    * Dataset; parity in EventStreamSpec). */
  def sessionStream(
      events: Dataset[Streams.EventIn],
      gapMs: Long = 28800000L,
      watermarkDelayMs: Long = 0L): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    events
      .withColumn("event_time", timestamp_millis(col("tMs")))
      .withWatermark("event_time", s"$watermarkDelayMs milliseconds")
      .as[Streams.EventIn]
      .groupByKey(_.userId)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
