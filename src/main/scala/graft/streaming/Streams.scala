package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the stateful CDC operators.
  *
  * The batch-replay forms in `graft.cdc` are the deterministic oracles; these
  * are the unbounded-stream equivalents built on the public
  * `[flat]mapGroupsWithState` API (no custom physical plans), as SURVEY §2.9
  * prescribes. State is keyed — per txn or per row key — so it shards across
  * executors; timeouts bound state growth (the reference keeps buffers
  * forever, `src/changefeed/model.ts:176-205`; at 100 TB that leaks, so every
  * operator here takes a TTL).
  */
object Streams {

  /** A change event on the wire (subset of the Debezium-style envelope,
    * `sim/core/types.ts:42-54`). */
  case class Event(
      txId: String, txIndex: Int, txTotal: Int, last: Boolean,
      tbl: String, pk: String, opCode: String,
      setsVal: Boolean, valV: Option[Double], setsK: Boolean, kV: Option[Long],
      commitTs: Long, lsn: Long)

  /** Txn completion (`src/changefeed/model.ts:176-205`): complete when the
    * declared event count has arrived. The `last` flag alone is NOT
    * completion — under broker drift the last-indexed event can arrive
    * first, and trusting it would emit a truncated transaction and orphan
    * its late siblings. `last` only decides when the total is unknown
    * (unknowable-total streams mark completion explicitly). */
  private[streaming] def txnComplete(buf: Seq[Event]): Boolean = {
    val total = buf.headOption.map(_.txTotal).getOrElse(Int.MaxValue)
    if (total > 0 && total != Int.MaxValue) buf.size >= total
    else buf.exists(_.last)
  }

  /** An assembled transaction ready to apply atomically. */
  case class AssembledTxn(
      txId: String, nEvents: Int, commitTs: Long, firstLsn: Long,
      events: Seq[Event])

  /** Keyed buffer state for txn assembly (public: Spark codegen needs
    * accessible accessors on state encoder classes). */
  case class TxnBuf(events: Seq[Event])

  /** Txn assembly (`src/changefeed/model.ts:176-205`, `web/App.tsx:2115-2156`):
    * buffer events per txId until `count >= total` (or a `last` marker),
    * then emit the whole transaction, events sorted by `txIndex`
    * (`model.ts:196`). Incomplete txns are dropped after `ttlMs` processing
    * time — the safety valve the reference lacks.
    */
  def assembleTxns(
      events: Dataset[Event],
      ttlMs: Long = 60000L): Dataset[AssembledTxn] = {
    val spark = events.sparkSession
    import spark.implicits._
    // ttlMs <= 0 disables the timeout entirely — with ProcessingTimeTimeout
    // armed, a zero-interval trigger busy-loops empty micro-batches just to
    // evaluate timers; tests (and bounded replays) don't want that.
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.txId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (txId: String, incoming: Iterator[Event], state: GroupState[TxnBuf]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buf = (state.getOption.map(_.events).getOrElse(Seq.empty) ++ incoming).toList
            if (Streams.txnComplete(buf)) {
              state.remove()
              val sorted = buf.sortBy(e => (e.txIndex, e.lsn))
              Iterator.single(AssembledTxn(
                txId, sorted.size,
                sorted.map(_.commitTs).max,
                sorted.map(_.lsn).min,
                sorted))
            } else {
              state.update(TxnBuf(buf))
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
              Iterator.empty
            }
          }
        })
  }

  /** Apply-on-commit with the commit floor as an event-time watermark
    * (`src/changefeed/model.ts:169-244`, SURVEY §2.9: the floor — min
    * commitTs over in-flight events — IS the watermark). Transactions
    * assemble per txId; a *complete* transaction is held in state until the
    * watermark passes its commitTs (drifted stragglers keep the watermark —
    * and therefore every commit-later txn — back), then emits. Incomplete
    * txns are dropped as soon as the watermark passes their max buffered
    * commitTs — no extra lateness beyond `watermarkDelay` is granted (the
    * event-time timeout is `max(commitTs, watermark + 1)`).
    *
    * Note: `txnComplete` counts duplicate deliveries toward `total`
    * (reference-faithful, `model.ts:178-186`), so at-least-once sources must
    * run `dedupOffsets` upstream of assembly.
    */
  def applyOnCommitStream(
      events: Dataset[Event],
      watermarkDelay: String = "10 seconds"): Dataset[AssembledTxn] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    val watermarked = events
      .withColumn("event_time", timestamp_millis(col("commitTs")))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
    watermarked
      .groupByKey(_.txId)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (txId: String, incoming: Iterator[Event], state: GroupState[TxnBuf]) => {
          def assembled(buf: Seq[Event]): AssembledTxn = {
            val sorted = buf.sortBy(e => (e.txIndex, e.lsn)).toList
            AssembledTxn(txId, sorted.size, sorted.map(_.commitTs).max,
              sorted.map(_.lsn).min, sorted)
          }
          if (state.hasTimedOut) {
            val buf = state.getOption.map(_.events).getOrElse(Seq.empty)
            state.remove()
            if (Streams.txnComplete(buf)) Iterator.single(assembled(buf)) else Iterator.empty
          } else {
            val buf = (state.getOption.map(_.events).getOrElse(Seq.empty) ++ incoming).toList
            val commitTs = buf.map(_.commitTs).max
            if (Streams.txnComplete(buf) && state.getCurrentWatermarkMs() >= commitTs) {
              state.remove()
              Iterator.single(assembled(buf))
            } else {
              state.update(TxnBuf(buf))
              // hold until the floor (watermark) passes the commit
              state.setTimeoutTimestamp(math.max(commitTs, state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            }
          }
        })
  }

  /** Materialized destination row emitted by the streaming apply. */
  case class RowState(
      tbl: String, pk: String, valV: Option[Double], kV: Option[Long],
      version: Long, deleted: Boolean, lastLsn: Long = 0L)

  /** Streaming merge-upsert apply keyed by (tbl, pk) — the unbounded form of
    * `ApplyEngine.applyState`: delete clears, partial payloads merge
    * (`src/domain/storage.ts:137-164`). Emits the post-image after each
    * micro-batch's events for the key (ordered by lsn within the batch).
    * Deleted keys emit a `deleted = true` tombstone and drop their state.
    */
  /** One apply step for a batch of same-key events — the shared fold of
    * [[applyStream]] and its `transformWithState` twin
    * ([[StreamsV2.applyStream]]): events process in lsn order, delete
    * resets to a tombstone, partial payloads merge over the current
    * image. */
  def applyFold(key: (String, String), start: Option[RowState],
      incoming: Seq[Event]): RowState = {
    val init = start.getOrElse(
      RowState(key._1, key._2, None, None, 0L, deleted = true))
    incoming.sortBy(_.lsn).foldLeft(init) { (cur, e) =>
      if (e.opCode == "d")
        RowState(key._1, key._2, None, None, 0L, deleted = true, lastLsn = e.lsn)
      else {
        val base = if (cur.deleted) RowState(key._1, key._2, None, None, 0L, deleted = false) else cur
        base.copy(
          valV = if (e.setsVal) e.valV else base.valV,
          kV = if (e.setsK) e.kV else base.kV,
          version = base.version + 1,
          deleted = false,
          lastLsn = e.lsn)
      }
    }
  }

  def applyStream(
      events: Dataset[Event],
      ttlMs: Long = 3600000L): Dataset[RowState] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(e => (e.tbl, e.pk))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (key: (String, String), incoming: Iterator[Event], state: GroupState[RowState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val next = applyFold(key, state.getOption, incoming.toSeq)
            if (next.deleted) state.remove()
            else {
              state.update(next)
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            }
            Iterator.single(next)
          }
        })
  }

  /** Streaming polling capture (`sim/engines/PollingEngine.ts:59-84` as an
    * unbounded stream): tumbling event-time windows of `pollIntervalMs` per
    * key, emitting only the latest state per (key, window) once the
    * watermark closes the window — the poll's lossy-by-design semantics
    * (intermediate versions never leave the aggregation). Uses windowed
    * `max_by` on event time, so state per key-window is O(1).
    */
  def pollStream(
      events: Dataset[Event],
      pollIntervalMs: Long = 1000L,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    import org.apache.spark.sql.functions._
    val interval = s"$pollIntervalMs milliseconds"
    events
      .withColumn("event_time", timestamp_millis(col("commitTs")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), interval), col("tbl"), col("pk"))
      .agg(
        max_by(struct(col("opCode"), col("valV"), col("kV"), col("lsn")), col("lsn")).as("latest"),
        count(lit(1)).as("ops_in_window"))
      .select(
        col("tbl"), col("pk"),
        col("window.end").as("poll_ts"),
        col("latest.opCode").as("op_code"),
        col("latest.valV").as("after_val"),
        col("latest.kV").as("after_k"),
        col("ops_in_window"))
  }

  /** Exactly-once ingestion dedup (`consumer.mjs:122-143` offset-dedup):
    * drop replayed events by (topic, partition, offset) within the watermark
    * — `dropDuplicatesWithinWatermark` keyed on the offset triple. `df` must
    * carry an event-time column already watermarked by the caller.
    */
  def dedupOffsets[T](ds: Dataset[T], cols: Seq[String]): Dataset[T] =
    ds.dropDuplicatesWithinWatermark(cols)

  /** Token-bucket carry-over state for the streaming throttle. */
  case class ThrottleState(tick: Long, allowance: Double, usedThisTick: Int)

  /** One micro-batch step of the token-bucket drain: fold `incoming`
    * (any order; sorted internally) through the bucket, returning the
    * carried state and the drained events. Shared by the
    * `flatMapGroupsWithState` and `transformWithState` forms so the two
    * APIs cannot drift semantically. */
  def throttleFold(
      st: ThrottleState,
      incoming: Seq[graft.cdc.Consumer.DeliveryIn],
      rate: Double, stepMs: Long, batchCap: Int)
      : (ThrottleState, Seq[graft.cdc.Consumer.DeliveryOut]) = {
    val cap = 5 * rate
    val perTick = rate * stepMs / 1000.0
    var tick = st.tick
    var allowance = st.allowance
    var used = st.usedThisTick
    val out = incoming.sortBy(e => (e.availableAt, e.seq)).map { e =>
      val needTick = Math.floorDiv(e.availableAt - 1, stepMs) + 1
      if (needTick > tick) {
        allowance = math.min(allowance + perTick * (needTick - tick), cap)
        tick = needTick
        used = 0
      }
      while (allowance < 1.0 || used >= batchCap) {
        tick += 1
        allowance = math.min(allowance + perTick, cap)
        used = 0
      }
      allowance -= 1
      used += 1
      graft.cdc.Consumer.DeliveryOut(e.method, e.seq, e.availableAt, tick, tick * stepMs)
    }
    (ThrottleState(tick, allowance, used), out)
  }

  /** Streaming consumer throttle — the unbounded form of
    * `Consumer.throttleDrain` (`web/App.tsx:2106-2113,2185-2201`): the
    * per-lane token bucket (tick, allowance, used) lives in keyed state and
    * carries across micro-batches, so a lane's drain schedule is identical
    * no matter how the stream is chopped into batches. Within a batch,
    * events drain in (availableAt, seq) order — the same order the batch
    * fold consumes. State is O(1) per lane; lanes shard with the shuffle.
    */
  def throttleStream(
      events: Dataset[graft.cdc.Consumer.DeliveryIn],
      rate: Double,
      stepMs: Long = 50L,
      batchCap: Int = 50): Dataset[graft.cdc.Consumer.DeliveryOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.method)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (method: String, incoming: Iterator[graft.cdc.Consumer.DeliveryIn],
         state: GroupState[ThrottleState]) => {
          val st = state.getOption.getOrElse(ThrottleState(0L, 0.0, 0))
          val (next, out) = throttleFold(st, incoming.toSeq, rate, stepMs, batchCap)
          state.update(next)
          out.iterator
        })
  }

  /** Per-partition queue state for the streaming broker delivery. */
  case class BrokerQueueState(tick: Long, usedThisTick: Int)

  /** One micro-batch step of the FIFO broker delivery: fold `incoming` (any
    * order; sorted by lsn internally — the enqueue order) through the
    * per-partition (tick, used) queue state. Shared by the
    * `flatMapGroupsWithState` and `transformWithState` forms so the two
    * APIs cannot drift. */
  def brokerFold(
      part: Int,
      st: BrokerQueueState,
      incoming: Seq[graft.cdc.Consumer.BrokerIn],
      tickMs: Long, maxApplyPerTick: Int)
      : (BrokerQueueState, Seq[graft.cdc.Consumer.BrokerOut]) = {
    var tick = st.tick
    var used = st.usedThisTick
    val out = incoming.sortBy(_.lsn).map { e =>
      val availTick = Math.floorDiv(e.availableAt - 1, tickMs) + 1
      if (availTick > tick) { tick = availTick; used = 0 }
      if (used >= maxApplyPerTick) { tick += 1; used = 0 }
      used += 1
      graft.cdc.Consumer.BrokerOut(
        e.part, e.lsn, e.availableAt, e.dropped, tick, tick * tickMs)
    }
    (BrokerQueueState(tick, used), out)
  }

  /** Streaming exact broker delivery — the unbounded form of
    * `Consumer.brokerDeliverExact` (`model.ts:246-263` `pollBroker`): each
    * partition's (tick, used) queue state is keyed state, so per-tick caps
    * and head-of-line FIFO order carry across micro-batches. Within a
    * batch, events process in enqueue (lsn) order — the queue order the
    * reference maintains. Exactly-once FIFO requires lsn-ordered arrival
    * per partition (the broker's own guarantee).
    */
  def brokerDeliverStream(
      events: Dataset[graft.cdc.Consumer.BrokerIn],
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4): Dataset[graft.cdc.Consumer.BrokerOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.part)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (part: Int, incoming: Iterator[graft.cdc.Consumer.BrokerIn],
         state: GroupState[BrokerQueueState]) => {
          val st = state.getOption.getOrElse(BrokerQueueState(0L, 0))
          val (next, out) = brokerFold(part, st, incoming.toSeq, tickMs, maxApplyPerTick)
          state.update(next)
          out.iterator
        })
  }

  /** A pending drift-broker stack entry (public for the state encoder). */
  case class DriftEntry(lsn: Long, t: Long, availableAt: Long, dropped: Boolean)

  /** Drift-broker queue state: the simulation clock plus the pending LIFO
    * stack (head first). Stack size is bounded by the partition backlog —
    * the same bound the reference's in-memory queue carries. */
  case class DriftQueueState(tick: Long, stack: Seq[DriftEntry])

  /** Streaming exact drift-on broker delivery — the unbounded form of
    * `Consumer.brokerDeliverDriftExact` (`model.ts:141-149,246-263`): with
    * commit drift every event is spliced into the queue FRONT, so pending
    * events form a LIFO stack and a drifted head blocks older events. The
    * per-partition (clock, stack) carries in keyed state across
    * micro-batches.
    *
    * A batch can only simulate ticks strictly BEFORE its own latest arrival
    * tick — a later micro-batch may still deliver arrivals for that tick,
    * and they would stack on top and change what pops — so the final tick's
    * arrivals are pushed pending and its drain defers to the next batch.
    * That makes the fold exact under ARBITRARY micro-batch boundaries (the
    * only requirement is per-partition lsn-ordered arrival, the broker's
    * own guarantee — same as [[brokerDeliverStream]]). The tail of the
    * stream stays pending until either (a) `ttlMs` fires with no new
    * arrivals — the processing-time timeout drains the stack to empty — or
    * (b) a bounded replay appends a flush sentinel (an event with `t` past
    * every real arrival); tests use (b) so no timer wall-clock enters the
    * assertion.
    */
  /** One micro-batch step of the drift-broker LIFO drain — the core shared
    * by the `flatMapGroupsWithState` and `transformWithState` forms (the
    * two APIs cannot drift). Simulates ticks strictly BEFORE the batch's
    * latest arrival tick, pushes the final tick's arrivals pending (their
    * drain belongs to the next batch — see [[brokerDeliverDriftStream]]'s
    * exactness argument), and returns the carried (clock, stack) state.
    * `flush = true` means no more arrivals are coming: drain to empty. */
  def driftFold(
      part: Int,
      st: DriftQueueState,
      incomingAnyOrder: Seq[graft.cdc.Consumer.DriftIn],
      tickMs: Long, maxApplyPerTick: Int,
      flush: Boolean = false)
      : (DriftQueueState, Seq[graft.cdc.Consumer.BrokerOut]) = {
    def tickOf(x: Long) = Math.floorDiv(x - 1, tickMs) + 1
    val stack = scala.collection.mutable.ArrayDeque.from(st.stack)
    var tick = st.tick
    val out = scala.collection.mutable.ArrayBuffer.empty[graft.cdc.Consumer.BrokerOut]
    // simulate ticks ≤ maxTick; returns how many arrivals were consumed
    def drainUpTo(maxTick: Long, arrivals: IndexedSeq[graft.cdc.Consumer.DriftIn]): Int = {
      var i = 0
      var continue = true
      while (continue) {
        val nextArr = if (i < arrivals.length) tickOf(arrivals(i).t) else Long.MaxValue
        val nextDrain =
          if (stack.nonEmpty) math.max(tick + 1, tickOf(stack.head.availableAt))
          else Long.MaxValue
        val T = math.min(nextArr, nextDrain)
        if (T > maxTick) continue = false
        else {
          while (i < arrivals.length && tickOf(arrivals(i).t) <= T) {
            val e = arrivals(i)
            stack.prepend(DriftEntry(e.lsn, e.t, e.availableAt, e.dropped))
            i += 1
          }
          var used = 0
          while (stack.nonEmpty && used < maxApplyPerTick &&
              tickOf(stack.head.availableAt) <= T) {
            val e = stack.removeHead()
            out += graft.cdc.Consumer.BrokerOut(
              part, e.lsn, e.availableAt, e.dropped, T, T * tickMs)
            used += 1
          }
          tick = T
        }
      }
      i
    }
    if (flush) {
      drainUpTo(Long.MaxValue - 1, IndexedSeq.empty)
      (DriftQueueState(tick, Seq.empty), out.toSeq)
    } else {
      val arrivals = incomingAnyOrder.toIndexedSeq.sortBy(_.lsn)
      if (arrivals.nonEmpty) {
        val consumed = drainUpTo(arrivals.map(e => tickOf(e.t)).max - 1, arrivals)
        // the final tick's arrivals were not consumed by the loop: push
        // them pending in lsn order (each lands on top, newest at the
        // head); their drain belongs to the next batch, which may still
        // add same-tick arrivals above them
        arrivals.drop(consumed).foreach { e =>
          stack.prepend(DriftEntry(e.lsn, e.t, e.availableAt, e.dropped))
        }
      }
      (DriftQueueState(tick, stack.toSeq), out.toSeq)
    }
  }

  def brokerDeliverDriftStream(
      events: Dataset[graft.cdc.Consumer.DriftIn],
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4,
      ttlMs: Long = 0L): Dataset[graft.cdc.Consumer.BrokerOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.part)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (part: Int, incoming: Iterator[graft.cdc.Consumer.DriftIn],
         state: GroupState[DriftQueueState]) => {
          val st = state.getOption.getOrElse(DriftQueueState(0L, Seq.empty))
          if (state.hasTimedOut) {
            // no more arrivals coming: drain to empty
            val (_, out) = driftFold(part, st, Seq.empty, tickMs, maxApplyPerTick, flush = true)
            state.remove()
            out.iterator
          } else {
            val (next, out) = driftFold(part, st, incoming.toSeq, tickMs, maxApplyPerTick)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** A consumed-lag sample in lane delivery order. */
  case class LagSample(method: String, ord1: Long, ord2: Long, lagMs: Long)

  /** Rolling-percentile snapshot emitted after each micro-batch per lane. */
  case class LagSnapshot(method: String, p50: Double, p95: Double, maxLag: Long, windowN: Int)

  /** Ring-buffer state: the last ≤ N lag samples in delivery order. */
  case class LagRingState(samples: Seq[Long])

  /** Exact interpolating percentile over a sorted sample array — the
    * reference's `percentile` (`src/engine/metrics.ts:131-139`:
    * `index = (n-1)·p`, linear interpolation between floor and ceil; same
    * definition as Spark's `percentile` and DuckDB's `quantile_cont`). */
  private[streaming] def percentile(sorted: IndexedSeq[Long], p: Double): Double = {
    val idx = (sorted.length - 1) * p
    val lo = math.floor(idx).toInt
    val hi = math.ceil(idx).toInt
    if (lo == hi) sorted(lo).toDouble
    else sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
  }

  /** Streaming rolling lag percentiles — the live form of the reference's
    * MetricsStore (`src/engine/metrics.ts:42-44,97-139`): a per-lane ring
    * buffer of the LAST `lastN` lag samples carried in keyed state, with a
    * p50/p95/max snapshot emitted after every micro-batch — the number the
    * dashboard actually shows on a long-running feed. Batch counterpart
    * (same slice, same interpolation): `MetricsAgg.lagPercentilesRolling`.
    * Within a batch, samples append in delivery order (ord1, ord2); state
    * is O(lastN) per lane and lanes shard with the shuffle.
    */
  def lagRollingStream(
      samples: Dataset[LagSample],
      lastN: Int = 2000): Dataset[LagSnapshot] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .groupByKey(_.method)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (method: String, incoming: Iterator[LagSample], state: GroupState[LagRingState]) => {
          val arrived = incoming.toSeq.sortBy(s => (s.ord1, s.ord2)).map(_.lagMs)
          val ring = (state.getOption.map(_.samples).getOrElse(Seq.empty) ++ arrived)
            .takeRight(lastN).toIndexedSeq
          if (ring.isEmpty) Iterator.empty
          else {
            state.update(LagRingState(ring))
            val sorted = ring.sorted
            // HALF_UP to 3 places — same rounding as the batch form's
            // `round(percentile(...), 3)`
            def r3(x: Double): Double =
              BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
            Iterator.single(LagSnapshot(
              method,
              r3(percentile(sorted, 0.5)),
              r3(percentile(sorted, 0.95)),
              sorted.last,
              ring.length))
          }
        })
  }

  /** A schema change with its version transition assigned. */
  case class VersionedSchemaChange(
      tbl: String, action: String, column: String, commitTs: Long,
      prevVersion: Int, nextVersion: Int, kind: String)

  /** Per-table version counter state (public for the state encoder). */
  case class SchemaVersionState(version: Int)

  /** Streaming schema-change capture: the unbounded form of
    * `SchemaEvolution.capture` — a per-table monotone version counter
    * (`bumpSchemaVersion`, `src/modes/logBased.ts:210-217`;
    * destination max rule `storage.ts:144-146`) carried in keyed state, so
    * version transitions continue correctly across micro-batches. Within a
    * batch, changes apply in the batch form's deterministic
    * (commitTs, column) order. Per-lane emission timing is a stateless
    * projection on top (`SchemaEvolution.captureLanes`' lane explode works
    * unchanged on a streaming frame).
    */
  /** One micro-batch step of the per-table version counter: changes apply
    * in the batch form's deterministic (commitTs, column) order. Shared by
    * the `flatMapGroupsWithState` and `transformWithState` forms so the
    * two APIs cannot drift. */
  def schemaFold(
      version: Int,
      incoming: Seq[graft.cdc.SchemaEvolution.SchemaChange])
      : (Int, Seq[VersionedSchemaChange]) = {
    var v = version
    val out = incoming.sortBy(c => (c.commitTs, c.column)).map { c =>
      val prev = v
      v += 1
      VersionedSchemaChange(
        c.tbl, c.action, c.column, c.commitTs, prev, v,
        if (c.action == "ADD_COLUMN") "SCHEMA_ADD_COL" else "SCHEMA_DROP_COL")
    }
    (v, out)
  }

  def schemaCaptureStream(
      changes: Dataset[graft.cdc.SchemaEvolution.SchemaChange]): Dataset[VersionedSchemaChange] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .groupByKey(_.tbl)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (tbl: String, incoming: Iterator[graft.cdc.SchemaEvolution.SchemaChange],
         state: GroupState[SchemaVersionState]) => {
          val (v, out) = schemaFold(
            state.getOption.map(_.version).getOrElse(1), incoming.toSeq)
          state.update(SchemaVersionState(v))
          out.iterator
        })
  }

  /** One tagged row of an as-of stream: build rows (`isBuild`) carry the
    * lookup value, probe rows get enriched. */
  case class AsOfIn(key: Long, ts: Long, isBuild: Boolean, id: Long)

  /** Enriched probe row: the latest build id/ts at-or-before the probe. */
  case class AsOfOut(key: Long, ts: Long, id: Long,
      matchId: Option[Long], matchTs: Option[Long])

  /** Latest build row seen per key. */
  case class AsOfState(ts: Long, id: Long)

  /** Streaming form of [[graft.operators.AsOfJoin]]: enrich a probe stream
    * with the latest at-or-before build row per key, both sides arriving on
    * ONE tagged stream (union the two feeds upstream — the same trick as the
    * batch form, which makes batch↔streaming parity exact instead of
    * approximate).
    *
    * Within a micro-batch, rows fold in (ts, tag) order with builds first on
    * ties — identical to the batch window's sort. Across batches the latest
    * build per key rides in keyed ValueState, so a probe in a later batch
    * still sees it. The one semantic difference from batch, inherent to
    * streaming: a build row arriving in a LATER batch than a probe with a
    * larger ts cannot retro-enrich it (the probe already emitted). Feed
    * ordering is the source's contract — bound skew with a watermark
    * upstream if the feeds can interleave across batches.
    *
    * State is O(1) per key (one (ts, id) pair) — no TTL needed beyond the
    * usual key-cardinality bound, but `ttlMs` evicts idle keys anyway.
    */
  /** The in-batch as-of fold shared by both streaming API forms: rows sort
    * in (ts, tag) order with builds first on ties — inclusive as-of,
    * matching the batch form's window order — and the latest build carries
    * forward. Returns (next state, enriched probes). */
  def asOfFold(
      key: Long,
      start: Option[AsOfState],
      incoming: Seq[AsOfIn]): (Option[AsOfState], Seq[AsOfOut]) = {
    val ordered = incoming.sortBy(r => (r.ts, r.isBuild, r.id))(
      Ordering.Tuple3(Ordering.Long, Ordering.Boolean.reverse, Ordering.Long))
    var latest = start
    val out = Seq.newBuilder[AsOfOut]
    ordered.foreach { r =>
      if (r.isBuild) {
        // equal-ts builds: larger id wins, same as the batch dedup
        if (latest.forall(s => r.ts > s.ts || (r.ts == s.ts && r.id >= s.id)))
          latest = Some(AsOfState(r.ts, r.id))
      } else {
        out += AsOfOut(key, r.ts, r.id, latest.map(_.id), latest.map(_.ts))
      }
    }
    (latest, out.result())
  }

  def asOfStream(rows: Dataset[AsOfIn], ttlMs: Long = 3600000L): Dataset[AsOfOut] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (key: Long, incoming: Iterator[AsOfIn], state: GroupState[AsOfState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (latest, out) = asOfFold(key, state.getOption, incoming.toSeq)
            latest.foreach { s =>
              state.update(s)
              if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            }
            out.iterator
          }
        })
  }

  /** A document arriving at the ingest gate: (source, doc id, token count). */
  case class BudgetIn(source: String, docId: Long, nTokens: Long)

  /** Budget-gate verdict: the running per-source token total INCLUDING this
    * doc, and whether it still fits the source's budget. */
  case class BudgetOut(
      source: String, docId: Long, nTokens: Long,
      cumSourceTokens: Long, admitted: Boolean)

  /** One budget step: fold a batch of same-source arrivals (docId order —
    * the arrival order contract every fold here shares) onto the running
    * token total. `used` counts ALL arrived tokens, admitted or not, so the
    * verdict matches the batch window form (`Corpus.sourceBudget`) exactly:
    * admitted ⇔ cum ≤ budget. Deterministic: chopped == one-shot on
    * docId-ordered feeds (FoldPropertiesSpec). */
  def budgetFold(
      key: String,
      start: Option[Long],
      incoming: Seq[BudgetIn],
      budget: Long): (Long, Seq[BudgetOut]) = {
    var used = start.getOrElse(0L)
    val out = incoming.sortBy(_.docId).map { r =>
      used += r.nTokens
      BudgetOut(key, r.docId, r.nTokens, used, used <= budget)
    }
    (used, out)
  }

  /** Streaming per-source token-budget admission — the ingest-time quota
    * gate: state is ONE long (tokens consumed) per source, carried across
    * micro-batches, so a runaway feed is cut off at write time without any
    * global coordination. Keyed by source ⇒ shards across executors; the
    * single-counter-per-key state is exactly-once under checkpoint resume
    * (FailureDrillSpec). A strict GLOBAL budget would serialize the world
    * through one key — the per-source shard is the scalable contract, and
    * the curation-time global cut stays a batch job
    * ([[graft.llm.Corpus.tokenBudget]]). */
  def budgetAdmissionStream(
      rows: Dataset[BudgetIn],
      budgetPerSource: Long = 2000L,
      ttlMs: Long = 3600000L): Dataset[BudgetOut] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    rows
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (key: String, incoming: Iterator[BudgetIn], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (used, out) = budgetFold(key, state.getOption, incoming.toSeq,
              budgetPerSource)
            state.update(used)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  // ─────────────────── event analytics twins (funnel / retention) ────────

  /** A product event on the stream: user, type, event time in millis
    * (the batch forms read `ts div 1000000` off the nanos column —
    * [[graft.operators.EventAnalytics]]). */
  case class EventIn(userId: Long, eventType: String, tMs: Long)

  /** A funnel advance: `userId` first completed `stage` (1-based) at
    * `tMs`. Each (user, stage) emits AT MOST ONCE, so
    * `count(*) group by stage` over the emitted stream equals the batch
    * funnel's per-step `n_users` at any point in time. */
  case class FunnelAdvance(userId: Long, stage: Int, stageName: String,
      tMs: Long)

  /** Per-user funnel state: first-completion time of each reached stage
    * (a ≤ |steps|-element prefix — bounded by construction). */
  case class FunnelProgress(times: Seq[Long])

  /** One funnel step for a batch of same-user events — the shared fold
    * both the stream and its tests drive ([[funnelStream]]). First-touch
    * semantics on ORDERED ARRIVALS (events non-decreasing in `tMs` across
    * the feed — the same arrival-order contract [[budgetFold]] states):
    * stage k+1 completes at the first step-(k+1) event STRICTLY after
    * stage k's completion, which on a time-ordered replay is exactly the
    * batch form's `min t > c_k` — so chopped == one-shot and
    * stream == batch hold on ordered feeds (EventStreamSpec). A feed with
    * genuine cross-batch time travel needs the batch funnel re-run; the
    * watermark drills ([[graft.cdc.Capture.watermarkCurve]]) quantify how
    * much of such a feed a lateness allowance would rescue. */
  def funnelFold(
      steps: Seq[String],
      start: Option[FunnelProgress],
      incoming: Seq[EventIn]): (FunnelProgress, Seq[FunnelAdvance]) = {
    var times = start.map(_.times.toVector).getOrElse(Vector.empty)
    val out = scala.collection.mutable.ArrayBuffer.empty[FunnelAdvance]
    incoming.sortBy(e => (e.tMs, e.eventType)).foreach { e =>
      val reached = times.length
      if (reached < steps.length && e.eventType == steps(reached) &&
          (reached == 0 || e.tMs > times.last)) {
        times = times :+ e.tMs
        out += FunnelAdvance(e.userId, reached + 1, steps(reached), e.tMs)
      }
    }
    (FunnelProgress(times), out.toSeq)
  }

  /** Streaming ordered-conversion funnel — the incremental twin of
    * [[graft.operators.EventAnalytics.funnel]]: per-user stage progress
    * as keyed state (≤ |steps| longs per user — sharded by user across
    * executors, TTL-evicted), one [[FunnelAdvance]] per (user, stage)
    * ever, so the downstream per-stage count is an append-only aggregate
    * a 100 TB events pipeline maintains instead of re-scanning history.
    * Parity and the kill/resume drill: EventStreamSpec /
    * FailureDrillSpec. */
  def funnelStream(
      events: Dataset[EventIn],
      steps: Seq[String] = Seq("signup", "click", "purchase"),
      ttlMs: Long = 0L): Dataset[FunnelAdvance] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (_: Long, incoming: Iterator[EventIn],
            state: GroupState[FunnelProgress]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (progress, out) =
              funnelFold(steps, state.getOption, incoming.toSeq)
            state.update(progress)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** An observed transition: `userId` went `fromType` → `toType` at
    * `tMs` (the destination event's time). `count(*) group by fromType,
    * toType` over the emitted stream equals the batch
    * [[graft.operators.EventAnalytics.transitions]] pair counts at any
    * point in time. */
  case class TransitionOut(
      userId: Long, fromType: String, toType: String, tMs: Long)

  /** Per-user transition state: the PREVIOUS event — all the state a
    * first-order Markov ledger ever needs (one tuple per user). */
  case class LastEvent(eventType: String, tMs: Long, eventId: Long)

  /** One transition step for a batch of same-user events — shared fold
    * of [[transitionsStream]] and its tests. Events process in
    * (tMs, eventId) order (the batch form's total order); each event
    * after the first emits the (previous → current) pair. Chopped ==
    * one-shot on ordered arrivals, the [[funnelFold]] contract. */
  def transitionsFold(
      userId: Long,
      start: Option[LastEvent],
      incoming: Seq[(Long, String, Long)]): (Option[LastEvent], Seq[TransitionOut]) = {
    var last = start
    val out = scala.collection.mutable.ArrayBuffer.empty[TransitionOut]
    incoming.sortBy { case (id, _, t) => (t, id) }.foreach { case (id, ty, t) =>
      last.foreach(p => out += TransitionOut(userId, p.eventType, ty, t))
      last = Some(LastEvent(ty, t, id))
    }
    (last, out.toSeq)
  }

  /** Streaming twin of the batch transition matrix — the keyed-state
    * form with the SMALLEST possible state: one previous-event tuple per
    * user, carried across micro-batches. Each arriving event emits its
    * (previous → current) pair, so the transition matrix downstream is
    * an append-only count per (from, to) instead of a re-scan with a
    * `lead` window over all history. `events` rows are
    * (eventId, eventType, tMs) keyed by the grouping below. */
  def transitionsStream(
      events: Dataset[(Long, Long, String, Long)],
      ttlMs: Long = 0L): Dataset[TransitionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[(Long, Long, String, Long)],
            state: GroupState[LastEvent]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (last, out) = transitionsFold(uid, state.getOption,
              incoming.map(e => (e._2, e._3, e._4)).toSeq)
            last.foreach(state.update)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** A retention mark: `userId` (cohort of `cohortDay`) was active on
    * `cohortDay + dayOffset`. Each (user, day) emits AT MOST ONCE, so
    * `count(*) group by cohortDay, dayOffset` over the emitted stream
    * equals the batch matrix's `n_active`, and the `dayOffset = 0` row
    * is the cohort size (the signup event itself marks its user active
    * that day). */
  case class RetentionMark(userId: Long, cohortDay: Long, dayOffset: Long)

  /** Per-user retention state. `cohortDay < 0` = no signup seen yet;
    * `emitted` = days already marked (the minimal state ANY exact
    * streaming retention needs — one entry per distinct active day,
    * TTL-bounded); `pending` = active days seen BEFORE the signup
    * arrived (an activity earlier the same day must still count toward
    * offset 0 once the signup lands — the ordering edge the batch form
    * never sees). */
  case class RetentionState(
      cohortDay: Long, emitted: Seq[Long], pending: Seq[Long])

  /** One retention step for a batch of same-user events — shared fold of
    * [[retentionStream]] and its tests. Cohort day = the user's FIRST
    * signup day (on time-ordered arrivals that is the batch `min`); any
    * active day ≥ cohort day emits once. Within a batch, arrival order
    * does not matter (sets, not sequences); across batches the ordered-
    * arrival contract of [[funnelFold]] applies to the signup only. */
  def retentionFold(
      userId: Long,
      start: Option[RetentionState],
      incoming: Seq[EventIn]): (RetentionState, Seq[RetentionMark]) = {
    val dayMs = 86400000L
    val st = start.getOrElse(RetentionState(-1L, Seq.empty, Seq.empty))
    var cohort = st.cohortDay
    val emitted = scala.collection.mutable.Set[Long](st.emitted: _*)
    val pending = scala.collection.mutable.Set[Long](st.pending: _*)
    incoming.foreach { e =>
      val day = Math.floorDiv(e.tMs, dayMs)
      if (e.eventType == "signup" && (cohort < 0 || day < cohort)) cohort = day
      pending += day
    }
    val out =
      if (cohort < 0) Seq.empty
      else {
        val fresh = pending.toSeq.sorted
          .filter(d => d >= cohort && !emitted.contains(d))
        fresh.foreach(emitted += _)
        pending.clear()
        fresh.map(d => RetentionMark(userId, cohort, d - cohort))
      }
    (RetentionState(cohort, emitted.toSeq.sorted,
      if (cohort < 0) pending.toSeq.sorted else Seq.empty), out)
  }

  /** Streaming cohort-retention twin of
    * [[graft.operators.EventAnalytics.retention]]: per-user (cohort day,
    * marked-day set) keyed state, one [[RetentionMark]] per (user,
    * active day) ever — the retention triangle becomes an append-only
    * count per (cohortDay, dayOffset) instead of a daily re-scan of the
    * events history. Pre-signup same-day activity is buffered in
    * `pending` so stream == batch even when the activity row arrives
    * before its user's signup row. Parity: EventStreamSpec. */
  def retentionStream(
      events: Dataset[EventIn],
      ttlMs: Long = 0L): Dataset[RetentionMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[EventIn],
            state: GroupState[RetentionState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (next, out) = retentionFold(uid, state.getOption, incoming.toSeq)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** A daily-activity mark: `userId` was active on `day` (epoch days),
    * `isNew` iff that day is the user's first-ever active day. Each
    * (user, day) emits AT MOST ONCE, so over the emitted stream
    * `count(*) group by day` is the DAU series and `count(isNew)` the
    * new-user count — the batch
    * [[graft.operators.EventAnalytics.newVsReturning]] ledger becomes an
    * append-only per-day aggregate instead of a re-scan of all history. */
  case class DayActive(userId: Long, day: Long, isNew: Boolean)

  /** Per-user activity state: the distinct active-day set (bounded by the
    * calendar — the same argument that bounds the batch window frames),
    * sorted ascending so `days.head` is the first-ever day.
    * `everActive` survives TTL eviction as a tombstone (the day set is
    * dropped, the one boolean stays) so a re-appearing user is never
    * re-counted as `new` — without it, eviction would reset the fold to
    * first-contact and inflate `new_users` by one per evicted returnee.
    *
    * CHECKPOINT COMPATIBILITY: adding `everActive` (round 13) changed the
    * `GroupState` encoder schema of [[activityStream]] — a production
    * query resuming a checkpoint written by the pre-round-13 shape will
    * fail or misdecode state (the case-class default does NOT apply to
    * already-serialized rows); resume requires a fresh checkpoint
    * (replay or batch-backfill the state, the FailureDrillSpec recipe).
    * The `transformWithState` twin does NOT share this limitation: with
    * the Avro state encoding (StateSchemaV3) a V2 processor adds a
    * nullable state field and resumes the SAME checkpoint, old rows
    * decoding with the field defaulted — proven by the FailureDrillSpec
    * schema-evolution drill. */
  case class ActivityState(days: Seq[Long], everActive: Boolean = true)

  /** One DAU step for a batch of same-user events — shared fold of
    * [[activityStream]] and its tests. Within a batch arrival order does
    * not matter (day sets); across batches the ordered-arrival contract
    * of [[funnelFold]] applies: a day earlier than the recorded first
    * would re-write history the batch `min` already settled, so feeds
    * are time-ordered (the same contract every twin in this file rides). */
  def activityFold(
      userId: Long,
      start: Option[ActivityState],
      incoming: Seq[EventIn]): (ActivityState, Seq[DayActive]) = {
    val dayMs = 86400000L
    val seen = scala.collection.mutable.Set[Long](
      start.map(_.days).getOrElse(Seq.empty): _*)
    // a post-eviction tombstone has an empty day set but everActive=true:
    // the user is known history, so no day of theirs is ever `new` again
    val hadAny = start.exists(s => s.everActive || s.days.nonEmpty)
    val fresh = incoming.map(e => Math.floorDiv(e.tMs, dayMs)).distinct
      .filterNot(seen.contains).sorted
    fresh.foreach(seen += _)
    val out = fresh.zipWithIndex.map { case (d, i) =>
      DayActive(userId, d, isNew = !hadAny && i == 0)
    }
    (ActivityState(seen.toSeq.sorted), out)
  }

  /** Streaming DAU / new-vs-returning twin of
    * [[graft.operators.EventAnalytics.newVsReturning]]: per-user
    * active-day-set keyed state, one [[DayActive]] per (user, day) ever.
    * Aggregating the emitted stream by day reproduces the batch ledger
    * (dau / new_users / returning_users) at any point in time.
    * Parity: EventStreamSpec. */
  def activityStream(
      events: Dataset[EventIn],
      ttlMs: Long = 0L): Dataset[DayActive] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[EventIn],
            state: GroupState[ActivityState]) => {
          if (state.hasTimedOut) {
            // eviction drops the DEDUP set but keeps a one-boolean
            // tombstone (everActive=true, no further timeout): a
            // re-appearing user's days re-emit as returning, never as a
            // second `new` — the conservative direction. DAU may
            // overcount a TTL-evicted user's REVISITED day (its dedup
            // evidence is gone); `new_users` never inflates.
            state.update(ActivityState(Seq.empty, everActive = true))
            Iterator.empty
          } else {
            val (next, out) = activityFold(uid, state.getOption, incoming.toSeq)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** A growth-accounting mark: in `week`, `userId` classified as `kind`
    * (`new` / `retained` / `resurrected` / `churned` — churned rows carry
    * the week the user went MISSING, the batch attribution). Conditional
    * counts per week over the emitted stream equal the event-driven rows
    * of [[graft.operators.EventAnalytics.growthAccounting]]; the
    * trailing silent-churn rows (users who never return) additionally
    * need a clock — they emit on TTL eviction ([[growthStream]]'s
    * timeout path), the same evidence a batch re-run would only gain
    * from a later max-week. */
  case class GrowthMark(userId: Long, week: Long, kind: String)

  /** Per-user growth state: the last active week, plus whether a
    * `churned` mark for this user is already on the stream (set by the
    * TTL-eviction path). The tombstone keeps (lastWeek, churned=true)
    * past eviction so a returning user classifies as `resurrected` —
    * consistent with the churn already emitted — never as a second
    * `new`, which is what a bare state.remove() would produce.
    *
    * CHECKPOINT COMPATIBILITY: adding `churned` (round 13) changed the
    * `GroupState` encoder schema of [[growthStream]] — resuming a
    * pre-round-13 checkpoint fails or misdecodes state (defaults don't
    * apply to already-serialized rows); resume needs a fresh checkpoint
    * (see the [[ActivityState]] note — and its V2 contrast: the
    * `transformWithState` twin evolves nullable state fields in place
    * under the Avro encoding). */
  case class GrowthState(lastWeek: Long, churned: Boolean = false)

  /** One growth step for a batch of same-user events — shared fold of
    * [[growthStream]] and its tests. Weeks process ascending (ordered-
    * arrival contract): first-ever week emits `new`, consecutive weeks
    * `retained`, a gap emits `churned` AT lastWeek+1 (the week the user
    * went missing) plus `resurrected` at the return week — exactly the
    * batch lag/lead classification, incrementally. */
  def growthFold(
      userId: Long,
      start: Option[GrowthState],
      incoming: Seq[EventIn]): (GrowthState, Seq[GrowthMark]) = {
    val weekMs = 7L * 86400000L
    var last = start.map(_.lastWeek).getOrElse(-1L)
    // churned=true: the TTL path already put this user's churn mark on
    // the stream — the next activity is a resurrection (at ANY later
    // week, even lastWeek+1: the append-only stream cannot retract the
    // eviction-time churn, so the consistent classification is
    // churn → resurrected, exactly the pair a real gap emits)
    var churnOut = start.exists(_.churned)
    val out = scala.collection.mutable.ArrayBuffer.empty[GrowthMark]
    incoming.map(e => Math.floorDiv(e.tMs, weekMs)).distinct.sorted.foreach { w =>
      if (last < 0) out += GrowthMark(userId, w, "new")
      else if (w == last) ()
      else if (churnOut && w > last) {
        out += GrowthMark(userId, w, "resurrected")
        churnOut = false
      }
      else if (w == last + 1) out += GrowthMark(userId, w, "retained")
      else if (w > last + 1) {
        out += GrowthMark(userId, last + 1, "churned")
        out += GrowthMark(userId, w, "resurrected")
      }
      if (w > last) last = w
    }
    (GrowthState(last, churnOut), out.toSeq)
  }

  /** Streaming weekly growth-accounting twin of
    * [[graft.operators.EventAnalytics.growthAccounting]]: ONE long of
    * keyed state per user (the last active week), each classification
    * emitted the moment its evidence arrives. With ttlMs=0 the
    * event-driven kinds (new/retained/resurrected + gap churn) stream
    * exactly. Silent churn — a user who never returns — has no closing
    * event, so it emits on TTL eviction as `churned` at lastWeek+1,
    * mirroring what the batch ledger attributes once max-week passes
    * the user's silence; the evicted key keeps a (lastWeek,
    * churned=true) tombstone, so a user who RETURNS after eviction
    * classifies `resurrected` — the batch gap pair — never a second
    * `new`. TTL trade-off (documented contract, pinned in
    * EventStreamSpec): if the TTL fires before the user's gap is real
    * (they return in week lastWeek+1), the stream has emitted
    * churned+resurrected where the batch ledger says `retained` — an
    * append-only stream cannot retract an eviction-time mark; choose
    * ttlMs ≫ the week cadence.
    * Parity: EventStreamSpec (event-driven rows + derived trailing churn
    * == the batch ledger; post-eviction return pinned). */
  def growthStream(
      events: Dataset[EventIn],
      ttlMs: Long = 0L): Dataset[GrowthMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[EventIn],
            state: GroupState[GrowthState]) => {
          if (state.hasTimedOut) {
            // emit the silent churn, but KEEP (lastWeek, churned=true)
            // as a tombstone (no further timeout; the state is one long
            // + one boolean, so there is nothing worth evicting): a
            // return classifies `resurrected`, matching the batch
            // ledger's gap pair instead of a spurious second `new`
            val evicted = state.getOption.filter(s => s.lastWeek >= 0 && !s.churned)
            evicted.foreach(s =>
              state.update(GrowthState(s.lastWeek, churned = true)))
            evicted.map(s => GrowthMark(uid, s.lastWeek + 1, "churned")).iterator
          } else {
            val (next, out) = growthFold(uid, state.getOption, incoming.toSeq)
            state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** An attributed purchase on the stream: `userId` bought for
    * `valueTicks` (value × 100, exact money) at `tMs`, credited to
    * `channel` — the latest prior touch type, or "direct". Summing
    * (count, ticks) per channel over the emitted stream equals the batch
    * [[graft.operators.EventAnalytics.attribution]] ledger (ticks / 100
    * = the DECIMAL(18,2) revenue) at any point in time. */
  case class AttributionOut(
      userId: Long, channel: String, valueTicks: Long, tMs: Long)

  /** An attribution event: id for the (tMs, eventId) total order, type,
    * time, and value in integer ticks (×100). */
  case class AttrIn(eventId: Long, userId: Long, eventType: String,
      tMs: Long, valueTicks: Long)

  /** One attribution step for a batch of same-user events — shared fold
    * of [[attributionStream]] and its tests. Events process in
    * (tMs, eventId) order (the batch window's total order): a touch
    * updates the carried channel, a purchase emits credited to the
    * carried channel BEFORE this event — exactly the batch form's
    * rows-(-∞,-1) frame, so a purchase tying a touch's timestamp is
    * credited iff the touch's eventId is lower. Chopped == one-shot on
    * ordered arrivals ([[funnelFold]] contract). */
  def attributionFold(
      userId: Long,
      touchTypes: Set[String],
      start: Option[LastEvent],
      incoming: Seq[AttrIn]): (Option[LastEvent], Seq[AttributionOut]) = {
    var lastTouch = start
    val out = scala.collection.mutable.ArrayBuffer.empty[AttributionOut]
    incoming.sortBy(e => (e.tMs, e.eventId)).foreach { e =>
      if (e.eventType == "purchase")
        out += AttributionOut(userId,
          lastTouch.map(_.eventType).getOrElse("direct"), e.valueTicks, e.tMs)
      if (touchTypes.contains(e.eventType))
        lastTouch = Some(LastEvent(e.eventType, e.tMs, e.eventId))
    }
    (lastTouch, out.toSeq)
  }

  /** Streaming last-touch attribution twin of
    * [[graft.operators.EventAnalytics.attribution]]: the keyed state is
    * ONE carried touch tuple per user (the same minimal shape as
    * [[transitionsStream]]); every purchase emits exactly once, already
    * credited, so the channel ledger downstream is an append-only
    * (count, ticks) aggregate instead of a re-windowed scan of all
    * history. Money stays integer ticks end to end. Parity:
    * EventStreamSpec; restart: FailureDrillSpec. */
  def attributionStream(
      events: Dataset[AttrIn],
      touchTypes: Set[String] = Set("click", "view"),
      ttlMs: Long = 0L): Dataset[AttributionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[AttrIn],
            state: GroupState[LastEvent]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (last, out) =
              attributionFold(uid, touchTypes, state.getOption, incoming.toSeq)
            last.foreach(state.update)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** A running RFM snapshot for one user: last purchase day, purchase
    * count, and exact money in integer ticks (×100). The LATEST mark per
    * user, joined with a reference "now" day of the consumer's choosing,
    * reproduces the batch [[graft.operators.EventAnalytics.rfm]] row
    * (recency = refDay − lastDay; the 1..3 scores are a deterministic
    * projection of these three numbers) — recency is deliberately NOT
    * baked into the mark because it is a property of the reference
    * clock, not of the user's history. */
  case class RfmMark(
      userId: Long, lastDay: Long, frequency: Long, monetaryTicks: Long)

  /** Per-user RFM state: the three running totals behind [[RfmMark]]. */
  case class RfmState(lastDay: Long, frequency: Long, ticks: Long)

  /** One RFM step for a batch of same-user events — shared fold of
    * [[rfmStream]] and its tests. Only purchases move the totals; a
    * batch with ≥1 purchase emits ONE superseding mark (marks are
    * snapshots, not deltas — the consumer keeps the latest per user,
    * which makes replay after an exactly-once sink upsert idempotent).
    * max/count/sum are in-batch order free; across batches the
    * ordered-arrival contract of [[funnelFold]] applies. */
  def rfmFold(
      userId: Long,
      start: Option[RfmState],
      incoming: Seq[AttrIn]): (Option[RfmState], Seq[RfmMark]) = {
    val dayMs = 86400000L
    val buys = incoming.filter(_.eventType == "purchase")
    if (buys.isEmpty) (start, Seq.empty)
    else {
      val s = start.getOrElse(RfmState(Long.MinValue, 0L, 0L))
      val next = RfmState(
        math.max(s.lastDay, buys.map(e => Math.floorDiv(e.tMs, dayMs)).max),
        s.frequency + buys.size,
        s.ticks + buys.map(_.valueTicks).sum)
      (Some(next),
        Seq(RfmMark(userId, next.lastDay, next.frequency, next.ticks)))
    }
  }

  /** Streaming RFM twin of [[graft.operators.EventAnalytics.rfm]]: the
    * keyed state is three longs per purchasing user; every purchase
    * batch emits a superseding running snapshot, so the segmentation
    * table downstream is a latest-mark-per-user upsert plus the fixed
    * scoring projection — never a re-scan of purchase history. Money
    * stays integer ticks end to end (ticks / 100 = the batch
    * DECIMAL(18,2) monetary). Parity: EventStreamSpec; restart:
    * FailureDrillSpec. */
  def rfmStream(
      events: Dataset[AttrIn],
      ttlMs: Long = 0L): Dataset[RfmMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[AttrIn],
            state: GroupState[RfmState]) => {
          if (state.hasTimedOut) {
            // the totals ARE the product — evicting them would corrupt
            // every later mark, so TTL only drops users the sink has
            // already seen the final mark of; a re-appearing purchaser
            // restarts their totals, which the docstring's
            // latest-mark-wins consumer surfaces as a visible reset
            // rather than silently wrong arithmetic
            state.remove()
            Iterator.empty
          } else {
            val (next, out) = rfmFold(uid, state.getOption, incoming.toSeq)
            next.foreach(state.update)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** One cohort-LTV mark: `entry=true` announces the user joining the
    * `cohortDay` cohort (counting these per cohort gives the batch
    * `cohort_size`); `entry=false` is one attributed purchase at
    * `weekOffset` weeks since signup worth `valueTicks`. Aggregating
    * purchase marks per (cohortDay, weekOffset) — count, Σticks/100,
    * running Σ over the week axis, divided by the entry count —
    * reproduces the batch
    * [[graft.operators.EventAnalytics.cohortLtv]] triangle at any point
    * in time. */
  case class LtvMark(userId: Long, cohortDay: Long, weekOffset: Long,
      valueTicks: Long, entry: Boolean)

  /** Per-user LTV state: the signup cohort day (−1 = no signup seen). */
  case class LtvState(cohortDay: Long)

  /** One cohort-LTV step for a batch of same-user events — shared fold
    * of [[ltvStream]] and its tests. The cohort day settles FIRST from
    * the batch's earliest signup (in-batch order free, like
    * [[activityFold]]), then purchases with day ≥ cohortDay emit one
    * mark each — the batch form's `_pd >= cohort_day` filter applied at
    * day granularity. A purchase arriving before ANY signup of its user
    * drops, exactly like the batch inner join drops purchasers who
    * never signed up; ordered arrival ([[funnelFold]] contract) makes
    * the two forms agree for users who did. */
  def ltvFold(
      userId: Long,
      start: Option[LtvState],
      incoming: Seq[AttrIn]): (LtvState, Seq[LtvMark]) = {
    val dayMs = 86400000L
    var cohort = start.map(_.cohortDay).getOrElse(-1L)
    val out = scala.collection.mutable.ArrayBuffer.empty[LtvMark]
    val sigDays = incoming.filter(_.eventType == "signup")
      .map(e => Math.floorDiv(e.tMs, dayMs))
    if (cohort < 0 && sigDays.nonEmpty) {
      cohort = sigDays.min
      out += LtvMark(userId, cohort, 0L, 0L, entry = true)
    }
    if (cohort >= 0)
      incoming.filter(_.eventType == "purchase").foreach { e =>
        val d = Math.floorDiv(e.tMs, dayMs)
        if (d >= cohort)
          out += LtvMark(userId, cohort, (d - cohort) / 7, e.valueTicks,
            entry = false)
      }
    (LtvState(cohort), out.toSeq)
  }

  /** Streaming cohort-LTV twin of
    * [[graft.operators.EventAnalytics.cohortLtv]]: ONE long of keyed
    * state per user (the signup cohort day); every purchase emits
    * already cohort-attributed, so the LTV triangle downstream is an
    * append-only (cohortDay, weekOffset) aggregate instead of a
    * re-join of all purchases against all signups. Money stays integer
    * ticks end to end. TTL note: evicting a user forgets their cohort
    * — their LATER purchases drop from the triangle (the conservative
    * direction: revenue undercounts, cohort sizes never double-count,
    * because the entry mark is emitted exactly once before any
    * eviction). Parity: EventStreamSpec; restart: FailureDrillSpec. */
  def ltvStream(
      events: Dataset[AttrIn],
      ttlMs: Long = 0L): Dataset[LtvMark] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (uid: Long, incoming: Iterator[AttrIn],
            state: GroupState[LtvState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (next, out) = ltvFold(uid, state.getOption, incoming.toSeq)
            if (next.cohortDay >= 0) state.update(next)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** One heartbeat tick of a capture lane: table, lsn, event time. */
  case class OpTick(tbl: String, lsn: Long, t: Long)

  /** An observed stall: the gap between consecutive ticks of `tbl` in
    * lsn order exceeded the threshold; emitted the moment the closing
    * tick arrives. */
  case class StallOut(tbl: String, fromLsn: Long, toLsn: Long, gapMs: Long)

  /** Last tick seen per table — all the state the stall monitor needs. */
  case class TickState(lsn: Long, t: Long)

  /** One monitor step for a batch of same-table ticks — the shared fold
    * of [[heartbeatStream]] and its tests. Ticks process in lsn order
    * (the batch form's total order); chopped == one-shot on
    * lsn-ordered feeds (the [[transitionsFold]] contract). */
  def heartbeatFold(
      stallMs: Long,
      start: Option[TickState],
      incoming: Seq[OpTick]): (Option[TickState], Seq[StallOut]) = {
    var last = start
    val out = scala.collection.mutable.ArrayBuffer.empty[StallOut]
    incoming.sortBy(_.lsn).foreach { tick =>
      last.foreach { l =>
        if (tick.t - l.t > stallMs)
          out += StallOut(tick.tbl, l.lsn, tick.lsn, tick.t - l.t)
      }
      last = Some(TickState(tick.lsn, tick.t))
    }
    (last, out.toSeq)
  }

  /** One CDC op for the SCD2 builder: the partial payload (`setsVal`/
    * `setsK` mirror the ops feed's `sets_val`/`sets_k`). */
  case class ScdIn(tbl: String, pk: String, lsn: Long, t: Long, op: String,
      setsVal: Boolean, v: Double, setsK: Boolean, kk: Long)

  /** A CLOSED dimension version: `[validFrom, validTo)` with the merged
    * row image — emitted exactly once, when the closing op arrives (or,
    * under a TTL, when eviction forces the OPEN version out with
    * [[ScdEvictedOpen]] as `validTo`). */
  case class ScdOut(tbl: String, pk: String, ver: Long, validFrom: Long,
      validTo: Long, v: Option[Double], kk: Option[Long])

  /** Sentinel `validTo` marking a TTL-evicted OPEN version — still the
    * key's current row at eviction time, not a business-time closure. */
  val ScdEvictedOpen: Long = -1L

  /** Per-key SCD2 state: the op counter plus the OPEN version (absent
    * after a delete — deleted keys have no current version, and the
    * image resets so a later partial insert starts from nulls, exactly
    * `CdcOps.withState`'s RESET semantics). */
  case class ScdState(lastVer: Long, open: Boolean, openVer: Long,
      validFrom: Long, v: Option[Double], kk: Option[Long])

  /** One SCD2 step for a batch of same-key ops — the shared fold of
    * [[scd2Stream]] and its tests. Ops process in lsn order; chopped ==
    * one-shot on lsn-ordered feeds (the [[transitionsFold]] contract):
    * every op closes the previous version (emitting it), a non-delete
    * opens the next one with the image merged over the previous. */
  def scd2Fold(
      start: Option[ScdState],
      incoming: Seq[ScdIn]): (Option[ScdState], Seq[ScdOut]) = {
    var st = start
    val out = scala.collection.mutable.ArrayBuffer.empty[ScdOut]
    incoming.sortBy(_.lsn).foreach { o =>
      val ver = st.map(_.lastVer).getOrElse(0L) + 1
      val open = st.filter(_.open)
      open.foreach { p =>
        out += ScdOut(o.tbl, o.pk, p.openVer, p.validFrom, o.t, p.v, p.kk)
      }
      st =
        if (o.op == "delete") Some(ScdState(ver, open = false, 0L, 0L, None, None))
        else Some(ScdState(ver, open = true, ver, o.t,
          if (o.setsVal) Some(o.v) else open.flatMap(_.v),
          if (o.setsK) Some(o.kk) else open.flatMap(_.kk)))
    }
    (st, out.toSeq)
  }

  /** Streaming SCD Type-2 dimension builder — the incremental twin of
    * [[graft.cdc.ApplyEngine.scd2]]: per (tbl, pk) the state is the op
    * counter plus the one OPEN version; each arriving op emits the
    * version it closes (exactly once, in Append mode) and a non-delete
    * opens the next. The emitted feed equals the batch history's
    * `is_current = false` rows at any point — the open (current)
    * versions live only in state, like open sessions in [[sessionStream]].
    * A warehouse consuming this feed appends closed versions and
    * maintains current rows from the companion apply stream, so the
    * dimension table needs no rebuild scan at 100 TB.
    * Parity + chop-invariance: StreamingSpec; per-key state is O(1). */
  def scd2Stream(
      ops: Dataset[ScdIn],
      ttlMs: Long = 0L): Dataset[ScdOut] = {
    val spark = ops.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ops
      .groupByKey(o => (o.tbl, o.pk))
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (key: (String, String), incoming: Iterator[ScdIn],
            state: GroupState[ScdState]) => {
          if (state.hasTimedOut) {
            // TTL eviction must not LOSE the key's current version: emit
            // the open version with the ScdEvictedOpen sentinel as its
            // validTo so the downstream append feed still closes every
            // version it ever saw opened (a silently dropped open row is
            // a dimension history that never ends).
            val evicted = state.getOption.filter(_.open).map(p =>
              ScdOut(key._1, key._2, p.openVer, p.validFrom,
                ScdEvictedOpen, p.v, p.kk))
            state.remove()
            evicted.iterator
          } else {
            val (next, out) = scd2Fold(state.getOption, incoming.toSeq)
            next.foreach(state.update)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** Streaming liveness monitor — the incremental twin of
    * [[graft.cdc.Capture.heartbeatGaps]]' stall count: ONE (lsn, t)
    * tuple of keyed state per table, a [[StallOut]] emitted exactly once
    * per above-threshold gap, the moment its closing tick arrives — so
    * the alerting path downstream is an append-only feed instead of a
    * re-windowed scan of the lane history. `count by tbl` over the
    * emitted stream equals the batch ledger's `n_stalls` at any point.
    * Parity: StreamingSpec; state is one tuple per TABLE (the smallest
    * keyed state in the repo), so restart recovery is covered by the
    * transitions/attribution drills' shape. */
  def heartbeatStream(
      ticks: Dataset[OpTick],
      stallMs: Long = 60000L,
      ttlMs: Long = 0L): Dataset[StallOut] = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ticks
      .groupByKey(_.tbl)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (_: String, incoming: Iterator[OpTick],
            state: GroupState[TickState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (last, out) =
              heartbeatFold(stallMs, state.getOption, incoming.toSeq)
            last.foreach(state.update)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })
  }

  /** Streaming gap sessionization — the incremental twin of
    * [[graft.operators.Sessions.sessionize]], and the reason that batch
    * operator was built on the native `session_window` aggregate in the
    * first place: the SAME declarative plan runs here under a watermark,
    * with Spark's UpdatingSessionsExec machinery owning the hard parts
    * (per-key session merge in the state store, watermark-driven close,
    * exactly-once emission from the checkpoint) instead of a hand-rolled
    * keyed-state fold.
    *
    * Semantics: a session extends while same-user events arrive within
    * `gapMs`; in Append mode a (user, session) row emits ONCE, when the
    * event-time watermark (max seen time − `watermarkDelayMs`) passes the
    * session's end — so the output is the closed-session feed, equal to
    * the batch [[graft.operators.Sessions.sessionize]] rows for every
    * session the watermark has closed (parity: EventStreamSpec; a
    * session SPANNING a crash must merge across restart: the
    * FailureDrillSpec drill). Late events beyond the allowance are
    * dropped by the watermark, exactly the loss
    * [[graft.cdc.Capture.watermarkCurve]] prices.
    *
    * Scale shape: one shuffle keyed by user, per-key state bounded by
    * OPEN sessions only (closed ones are evicted at emission) — the
    * 100 TB form is this same plan with the state store on RocksDB. */
  def sessionStream(
      events: Dataset[EventIn],
      gapMs: Long = 28800000L,
      watermarkDelayMs: Long = 0L): DataFrame = {
    import org.apache.spark.sql.functions._
    events.toDF()
      .select(
        col("userId").as("user_id"),
        timestamp_millis(col("tMs")).as("_t"))
      .withWatermark("_t", s"$watermarkDelayMs milliseconds")
      .groupBy(
        col("user_id"),
        session_window(col("_t"), s"$gapMs milliseconds").as("_w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("_w.start")).as("session_start"),
        unix_millis(col("_w.end")).as("session_end"),
        col("n_events"))
  }
}
