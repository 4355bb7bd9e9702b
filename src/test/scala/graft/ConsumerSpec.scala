package graft

import org.apache.spark.sql.functions._
import graft.cdc.Consumer
import graft.cdc.Consumer.DeliveryIn

/** Token-bucket throttle and broker delivery caps
  * (`web/App.tsx:2106-2201`, `src/changefeed/model.ts:246-274`). */
class ConsumerSpec extends SparkSpec {

  import spark.implicits._

  test("throttle drains at the configured rate, preserving order") {
    // 10 events available immediately; rate 2/s, step 1000ms → 2 per tick
    val events = (1 to 10).map(i => DeliveryIn("m", i.toLong, 0L)).toDS()
    val out = Consumer.throttleDrain(events, rate = 2.0, stepMs = 1000L)
      .collect().sortBy(_.seq)
    assert(out.map(_.seq).toSeq === (1L to 10L))
    val perTick = out.groupBy(_.drainTick).view.mapValues(_.length).toMap
    assert(perTick.values.forall(_ <= 2), "never more than allowance per tick")
    assert(out.map(_.drainTick).max === 5L, "10 events at 2/tick drain in 5 ticks")
    // order preserved: seq increases with drain tick
    assert(out.sortBy(e => (e.drainTick, e.seq)).map(_.seq).toSeq === (1L to 10L))
  }

  test("throttle lanes are independent (bucket resets per lane)") {
    val events = ((1 to 4).map(i => DeliveryIn("a", i.toLong, 0L)) ++
      (1 to 4).map(i => DeliveryIn("b", i.toLong, 0L))).toDS()
    val out = Consumer.throttleDrain(events, rate = 1.0, stepMs = 1000L).collect()
    val byLane = out.groupBy(_.method)
    assert(byLane("a").map(_.drainTick).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    assert(byLane("b").map(_.drainTick).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("throttle waits for availability") {
    val events = Seq(DeliveryIn("m", 1L, 5000L)).toDS()
    val out = Consumer.throttleDrain(events, rate = 100.0, stepMs = 1000L).collect().head
    assert(out.drainMs >= 5000L)
  }

  test("broker delivery respects per-tick cap and availability") {
    val routed = (1 to 9).map(i => (0L, i.toLong, 0L))
      .toDF("part", "lsn", "available_at")
    val out = Consumer.brokerDelivery(routed, "lsn", tickMs = 50L, maxApplyPerTick = 4)
      .collect().sortBy(_.getAs[Long]("queue_pos"))
    // 9 immediately-available events, cap 4/tick → ticks 1,1,1,1,2,2,2,2,3
    assert(out.map(_.getAs[Long]("deliver_tick")).toSeq ===
      Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L, 3L))
    val late = Seq((0L, 100L, 500L)).toDF("part", "lsn", "available_at")
    val lateOut = Consumer.brokerDelivery(late, "lsn").collect().head
    assert(lateOut.getAs[Long]("deliver_ms") === 500L)
  }
}
