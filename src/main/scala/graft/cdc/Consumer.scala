package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Consumer-side delivery mechanics
  * (`web/App.tsx:2102-2248`, `src/changefeed/model.ts:246-274`):
  * token-bucket throttling and per-tick broker delivery with caps.
  *
  * These are inherently sequential *per consumer lane*, so they run as a
  * per-partition fold after partitioning by lane (method) — the same
  * secondary-sort shape as the apply engine: shuffle on the lane key, sort
  * within partition, O(1) state. One lane's drain order never depends on
  * another lane's, so lanes parallelize.
  */
object Consumer {

  case class DeliveryIn(method: String, seq: Long, availableAt: Long)
  case class DeliveryOut(method: String, seq: Long, availableAt: Long, drainTick: Long, drainMs: Long)

  /** Token-bucket drain (`web/App.tsx:2106-2113,2185-2201`): every `stepMs`
    * tick, `allowance += rate * stepMs / 1000` capped at `5 * rate`; the
    * consumer drains `min(floor(allowance), batchCap)` available events.
    * Returns each event's drain tick (and its wall time).
    */
  def throttleDrain(
      events: Dataset[DeliveryIn],
      rate: Double,
      stepMs: Long = 50L,
      batchCap: Int = 50): Dataset[DeliveryOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .repartition(col("method"))
      .sortWithinPartitions("method", "availableAt", "seq")
      .mapPartitions { it =>
        // Streaming fold: drain order equals input order (FIFO per lane),
        // so each event's drain tick is computable one event at a time with
        // O(1) state — no lane-sized buffering. The clock jumps straight to
        // the next relevant tick (idle ticks only accrue allowance, which
        // the cap bounds, so the jump is lossless; ticking 50 ms at a time
        // through absolute epoch timestamps would spin forever).
        val cap = 5 * rate
        val perTick = rate * stepMs / 1000.0
        var method: String = null
        var tick = 0L
        var allowance = 0.0
        var usedThisTick = 0
        it.map { e =>
          if (e.method != method) {
            method = e.method
            tick = 0L; allowance = 0.0; usedThisTick = 0 // per-lane bucket
          }
          val needTick = Math.floorDiv(e.availableAt - 1, stepMs) + 1
          if (needTick > tick) {
            allowance = math.min(allowance + perTick * (needTick - tick), cap)
            tick = needTick
            usedThisTick = 0
          }
          while (allowance < 1.0 || usedThisTick >= batchCap) {
            tick += 1
            allowance = math.min(allowance + perTick, cap)
            usedThisTick = 0
          }
          allowance -= 1
          usedThisTick += 1
          DeliveryOut(e.method, e.seq, e.availableAt, tick, tick * stepMs)
        }
      }
  }

  case class BrokerIn(part: Int, lsn: Long, availableAt: Long, dropped: Boolean)
  case class BrokerOut(
      part: Int, lsn: Long, availableAt: Long, dropped: Boolean,
      deliverTick: Long, deliverMs: Long)

  /** EXACT broker per-tick delivery (`model.ts:246-263` `pollBroker`):
    * each partition queue is FIFO in ENQUEUE (lsn) order — an unavailable
    * head blocks everything behind it — and each tick consumes at most
    * `maxApplyPerTick` from the front, with dropped events consuming quota
    * without being delivered. (The reference's cross-partition
    * `maxToDeliver = maxApply·(partitions+1)` cap can never bind — per-tick
    * consumption is already ≤ maxApply·partitions — so partitions fold
    * independently and in parallel, exactly.)
    *
    * Same secondary-sort shape as [[throttleDrain]]: shuffle on the
    * partition, sort by lsn, O(1) state per queue. This is the exact
    * counterpart to [[brokerDelivery]]'s closed form (which sorts by
    * availability and is a lower bound after idle gaps).
    */
  def brokerDeliverExact(
      events: Dataset[BrokerIn],
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4): Dataset[BrokerOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .repartition(col("part"))
      .sortWithinPartitions("part", "lsn")
      .mapPartitions { it =>
        var part = Int.MinValue
        var tick = 0L
        var used = 0
        it.map { e =>
          if (e.part != part) { part = e.part; tick = 0L; used = 0 }
          // first tick whose clock (tick·tickMs) has reached availableAt
          val availTick = Math.floorDiv(e.availableAt - 1, tickMs) + 1
          if (availTick > tick) { tick = availTick; used = 0 }
          if (used >= maxApplyPerTick) { tick += 1; used = 0 }
          used += 1
          BrokerOut(e.part, e.lsn, e.availableAt, e.dropped, tick, tick * tickMs)
        }
      }
  }

  case class DriftIn(part: Int, lsn: Long, t: Long, availableAt: Long, dropped: Boolean)

  /** EXACT broker delivery under commit drift (`model.ts:140-149,246-263`):
    * with `commitDrift` on, the reference `splice`s every event into the
    * FRONT of its partition queue (`insertAt = 0`), so the queue is a LIFO
    * stack over pending events — the newest enqueued event delivers first,
    * and a drifted head (`availableAt = enqueueClock + 50`) blocks every
    * older event beneath it for a tick. [[brokerDeliverExact]] models the
    * no-drift FIFO queue; this operator reproduces the drift-on trace.
    *
    * Event-driven per-partition fold: arrivals (sorted by lsn — enqueue
    * order) are pushed front-first at their arrival tick, then each visited
    * tick pops at most `maxApplyPerTick` available events off the head. The
    * clock jumps between relevant ticks (next arrival / next drain), so work
    * is O(events), not O(ticks). Dropped events consume delivery quota
    * without delivery (`model.ts:256-259`), exactly like the FIFO form.
    *
    * Same shuffle shape as the other exact folds: repartition on the broker
    * partition, sort by lsn, fold. State is the pending stack — bounded by
    * the per-partition backlog, the same bound the reference's in-memory
    * queue carries.
    */
  def brokerDeliverDriftExact(
      events: Dataset[DriftIn],
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4): Dataset[BrokerOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def simulate(evts: scala.collection.Seq[DriftIn]): Iterator[BrokerOut] = {
      def tickOf(x: Long) = Math.floorDiv(x - 1, tickMs) + 1
      val out = scala.collection.mutable.ArrayBuffer.empty[BrokerOut]
      val stack = scala.collection.mutable.ArrayDeque.empty[DriftIn]
      var i = 0
      var tick = 0L
      while (i < evts.length || stack.nonEmpty) {
        val nextArr = if (i < evts.length) tickOf(evts(i).t) else Long.MaxValue
        val nextDrain =
          if (stack.nonEmpty) math.max(tick + 1, tickOf(stack.head.availableAt))
          else Long.MaxValue
        val T = math.min(nextArr, nextDrain)
        while (i < evts.length && tickOf(evts(i).t) <= T) { stack.prepend(evts(i)); i += 1 }
        var used = 0
        while (stack.nonEmpty && used < maxApplyPerTick &&
            tickOf(stack.head.availableAt) <= T) {
          val e = stack.removeHead()
          out += BrokerOut(e.part, e.lsn, e.availableAt, e.dropped, T, T * tickMs)
          used += 1
        }
        tick = T
      }
      out.iterator
    }
    events
      .repartition(col("part"))
      .sortWithinPartitions("part", "lsn")
      .mapPartitions { it =>
        // consecutive runs of the same part (input is sorted): buffer one
        // queue's events, simulate, emit, move on
        new Iterator[Iterator[BrokerOut]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[BrokerOut] = {
            val part = buf.head.part
            val q = scala.collection.mutable.ArrayBuffer.empty[DriftIn]
            while (buf.hasNext && buf.head.part == part) q += buf.next()
            simulate(q)
          }
        }.flatten
      }
  }

  /** Broker delivery schedule bound (`model.ts:246-274` computes this with
    * a per-tick loop; here it is the closed form
    * `max(availability tick, ⌈queue position / maxApplyPerTick⌉)`).
    *
    * Exact when the queue is saturated (events available from the start);
    * after an idle gap it is a *lower bound* — the tick loop would spread
    * the backlog over subsequent ticks, the closed form schedules it at
    * availability. The exact sequential semantics, when needed, are what
    * `throttleDrain` computes (per-lane fold); this operator is the
    * embarrassingly-parallel schedule used for backlog/shape analysis.
    */
  def brokerDelivery(
      routed: DataFrame, // part, seq/lsn col, available_at
      seqCol: String,
      tickMs: Long = 50L,
      maxApplyPerTick: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("part").orderBy(col("available_at"), col(seqCol))
    routed
      .withColumn("queue_pos", row_number().over(w).cast("long"))
      // earliest tick where the event is available
      .withColumn("avail_tick", ceil(col("available_at").cast("double") / tickMs).cast("long"))
      // per-partition throughput cap: position in queue bounds the tick
      .withColumn("cap_tick", ceil(col("queue_pos").cast("double") / maxApplyPerTick).cast("long"))
      .withColumn("deliver_tick", greatest(col("avail_tick"), col("cap_tick")))
      .withColumn("deliver_ms", col("deliver_tick") * tickMs)
  }

  /** Pause/resume gate for `foreachBatch` consumers
    * (`web/App.tsx:2103`; SIGUSR1/2 pause in `consumer.mjs:453-461` pauses
    * the Kafka consumer — fetching stops, nothing is dropped).
    *
    * The guard HOLDS the in-flight micro-batch while paused (backpressure):
    * the batch does not complete, its offsets are not committed, and the
    * backlog builds in the source — a lossless pause, like the reference's.
    * Skipping the body instead would silently DROP the paused batches: a
    * skipped `foreachBatch` still commits its offsets, so the data would
    * never be reprocessed. Resume (or a controller stop, which reopens the
    * gate before stopping the query) releases the held batch. */
  final class PauseGate extends Serializable {
    // monitor-based hold: the guarded thread parks on the gate's monitor
    // instead of burning its task slot polling; resume/stop notify it.
    // (transient + re-init on deserialize: foreachBatch runs driver-side,
    // so in practice the original instance is used — this is belt and
    // braces for closure serialization round-trips.)
    @transient private var lock = new Object
    @volatile private var open = true
    private def monitor: Object = {
      if (lock == null) synchronized { if (lock == null) lock = new Object }
      lock
    }
    def pause(): Unit = open = false
    def resume(): Unit = {
      val m = monitor
      // flip + notify under the monitor: guard's check-then-wait runs under
      // the same lock, so the wakeup cannot fall between them
      m.synchronized { open = true; m.notifyAll() }
    }
    def isOpen: Boolean = open
    /** Wrap a foreachBatch body. */
    def guard[T](body: (Dataset[T], Long) => Unit): (Dataset[T], Long) => Unit =
      (ds, id) => {
        val m = monitor
        m.synchronized {
          while (!open) m.wait() // hold: offsets must not commit
        }
        body(ds, id)
      }
  }
}
