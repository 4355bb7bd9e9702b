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

  test("exact broker delivery: FIFO head-of-line blocking, drops consume quota") {
    import graft.cdc.Consumer.BrokerIn
    val events = Seq(
      // head of queue not available until 500ms — lsn 2 is available at 0
      // but must wait behind it (enqueue-order FIFO, model.ts:251-253)
      BrokerIn(0, 1L, 500L, dropped = false),
      BrokerIn(0, 2L, 0L, dropped = false),
      // a full tick: cap 2 → lsns 3,4 at tick 11; 5 dropped consumes quota
      BrokerIn(1, 3L, 501L, dropped = false),
      BrokerIn(1, 4L, 501L, dropped = false),
      BrokerIn(1, 5L, 501L, dropped = true),
      BrokerIn(1, 6L, 501L, dropped = false)).toDS()
    val out = Consumer.brokerDeliverExact(events, tickMs = 50L, maxApplyPerTick = 2)
      .collect().map(e => e.lsn -> e).toMap
    assert(out(1L).deliverTick === 10L) // ceil(500/50)
    assert(out(2L).deliverTick === 10L, "blocked behind head, same tick once head moves")
    assert(out(3L).deliverTick === 11L && out(4L).deliverTick === 11L)
    assert(out(5L).deliverTick === 12L && out(5L).dropped)
    assert(out(6L).deliverTick === 12L,
      "dropped event consumed quota; 6 shares tick 12 with the drop")
  }

  test("invariants on testdata: throttle conserves events, broker-exact is FIFO-monotone, backlog drains to zero") {
    import graft.cdc.{Broker, Capture, CdcOps, MetricsAgg}
    import graft.cdc.Consumer.BrokerIn
    val ops = CdcOps.ops(spark, "/root/testdata/sf0.001")
    val lane = Capture.log(CdcOps.withState(ops)).persist()

    // throttle: every event drains exactly once; per-(lane, tick) ≤ batchCap
    val drained = Consumer.throttleDrain(
      lane.select(lit("m").as("method"), col("lsn").as("seq"),
        col("emitted_ts").as("availableAt")).as[DeliveryIn],
      rate = 200.0).toDF().persist()
    assert(drained.count() === lane.count())
    assert(drained.groupBy("method", "drainTick").count()
      .filter(col("count") > 50).count() === 0L)

    // backlog series: running backlog never negative, ends at zero per lane
    val series = MetricsAgg.backlogSeries(drained).persist()
    assert(series.filter(col("backlog") < 0).count() === 0L)
    val finals = series
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("method").orderBy(col("tick").desc)))
      .filter(col("rn") === 1)
    assert(finals.filter(col("backlog") =!= 0).count() === 0L, "all produced events drain")

    // broker exact: FIFO ⇒ deliverTick non-decreasing in lsn per partition;
    // per-(part, tick) consumption ≤ maxApplyPerTick
    val routed = Broker.route(
      Broker.withDrift(ops, concat(lit("tx-"), col("lsn").cast("string")), col("t")),
      col("pk"), col("lsn"), 32, 0.1)
    val exact = Consumer.brokerDeliverExact(
      routed.select(col("part").cast("int").as("part"), col("lsn"),
        col("available_at").as("availableAt"), col("dropped")).as[BrokerIn]).toDF().persist()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("part").orderBy("lsn")
    assert(exact.withColumn("prev", lag(col("deliverTick"), 1).over(w))
      .filter(col("prev") > col("deliverTick")).count() === 0L, "head-of-line order violated")
    assert(exact.groupBy("part", "deliverTick").count()
      .filter(col("count") > 4).count() === 0L, "per-tick cap violated")
    Seq(lane, drained, series, exact).foreach(_.unpersist())
  }

  test("drift-exact broker delivery: queue-front insertion is LIFO, drifted head blocks") {
    import graft.cdc.Consumer.DriftIn
    val events = Seq(
      // three events enqueued at distinct ticks; each new arrival is spliced
      // to the queue FRONT (model.ts:141-149), so pending events pop
      // newest-first once available
      DriftIn(0, 1L, 10L, 10L, dropped = false),   // arrives tick 1, available tick 1
      DriftIn(0, 2L, 60L, 110L, dropped = false),  // arrives tick 2, DRIFTED → avail tick 3
      DriftIn(0, 3L, 70L, 70L, dropped = false),   // arrives tick 2, available tick 2
      // partition 1: LIFO among same-tick arrivals, cap 2/tick
      DriftIn(1, 10L, 10L, 10L, dropped = false),
      DriftIn(1, 11L, 12L, 12L, dropped = false),
      DriftIn(1, 12L, 14L, 14L, dropped = false)).toDS()
    val out = Consumer.brokerDeliverDriftExact(events, tickMs = 50L, maxApplyPerTick = 2)
      .collect().map(e => e.lsn -> e).toMap
    // part 0: lsn 1 pops alone at tick 1. At tick 2 the stack is [3, 2... no:
    // arrivals in lsn order 2 then 3 → head is 3; 3 is available → pops at
    // tick 2; 2 (drifted, avail tick 3) pops at tick 3.
    assert(out(1L).deliverTick === 1L)
    assert(out(3L).deliverTick === 2L, "newest available arrival pops first")
    assert(out(2L).deliverTick === 3L, "drifted event waits its tick")
    // part 1: all arrive tick 1, stack head-first [12,11,10], cap 2 →
    // 12,11 at tick 1; 10 at tick 2 (oldest starved behind newer arrivals)
    assert(out(12L).deliverTick === 1L && out(11L).deliverTick === 1L)
    assert(out(10L).deliverTick === 2L, "LIFO pops the oldest last")
  }

  test("drift-exact head-of-line: unavailable head blocks older available events") {
    import graft.cdc.Consumer.DriftIn
    val events = Seq(
      DriftIn(0, 1L, 10L, 10L, dropped = false),  // arrives tick 1, available
      DriftIn(0, 2L, 20L, 70L, dropped = false)   // arrives tick 1 ON TOP, drifted → avail tick 2
    ).toDS()
    val out = Consumer.brokerDeliverDriftExact(events, tickMs = 50L, maxApplyPerTick = 4)
      .collect().map(e => e.lsn -> e).toMap
    // head (lsn 2) unavailable at tick 1 → blocks lsn 1 beneath it even
    // though lsn 1 is available; both pop at tick 2, newest first
    assert(out(2L).deliverTick === 2L)
    assert(out(1L).deliverTick === 2L, "older event blocked behind drifted head")
  }

  test("drift-exact invariants on testdata: conservation, caps, availability") {
    import graft.cdc.{Broker, CdcOps}
    import graft.cdc.Consumer.DriftIn
    val ops = CdcOps.ops(spark, "/root/testdata/sf0.001")
    val routed = Broker.route(
      Broker.withDrift(ops, concat(lit("tx-"), col("lsn").cast("string")), col("t")),
      col("pk"), col("lsn"), 32, 0.1)
    val in = routed.select(col("part").cast("int").as("part"), col("lsn"),
      col("t"), col("available_at").as("availableAt"), col("dropped")).as[DriftIn]
    val out = Consumer.brokerDeliverDriftExact(in).toDF().persist()
    // conservation: every routed event is delivered exactly once
    assert(out.count() === routed.count())
    assert(out.select("lsn").distinct().count() === out.count())
    // per-(partition, tick) consumption respects the cap
    assert(out.groupBy("part", "deliverTick").count()
      .filter(col("count") > 4).count() === 0L)
    // no event delivers before it is available
    assert(out.filter(col("deliverMs") < col("availableAt")).count() === 0L)
    out.unpersist()
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
