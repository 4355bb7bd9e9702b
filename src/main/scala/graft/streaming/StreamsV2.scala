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
}
