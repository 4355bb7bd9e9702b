package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Streams
import graft.streaming.Streams.{AssembledTxn, Event, RowState}

/** Structured-Streaming operator tests over MemoryStream: txn assembly emits
  * only complete transactions ("keeps transactions atomic under drift",
  * `src/test/unit/changefeed-playground.test.ts:12-63`), and the streaming
  * apply merges partial payloads across micro-batches.
  */
class StreamingSpec extends SparkSpec {

  private def ev(
      tx: String, idx: Int, total: Int, tbl: String, pk: String, op: String,
      lsn: Long, v: Option[Double] = None, k: Option[Long] = None): Event =
    Event(tx, idx, total, last = idx == total - 1, tbl, pk, op,
      setsVal = v.isDefined, v, setsK = k.isDefined, k, commitTs = 100L + lsn, lsn = lsn)

  test("txn assembly holds incomplete transactions across batches (atomicity under drift)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.assembleTxns(input.toDS(), ttlMs = 0L)
      .writeStream.format("memory").queryName("txns")
      .outputMode("append").start()

    // Batch 1: tx-1 partially arrives (drifted), tx-2 complete but interleaved
    input.addData(
      ev("tx-1", 0, 3, "t0", "a", "c", 1, v = Some(1.0)),
      ev("tx-2", 0, 2, "t0", "b", "c", 2, v = Some(2.0)),
      ev("tx-2", 1, 2, "t1", "b", "u", 3, k = Some(5L)),
      ev("tx-1", 1, 3, "t1", "a", "u", 4, k = Some(9L)))
    q.processAllAvailable()
    val after1 = spark.table("txns").as[AssembledTxn].collect()
    assert(after1.map(_.txId).toSet === Set("tx-2"), "incomplete tx-1 must be buffered")

    // Batch 2: tx-1's last event arrives — now it emits, events in index order
    input.addData(ev("tx-1", 2, 3, "t2", "a", "u", 5, v = Some(3.0)))
    q.processAllAvailable()
    val after2 = spark.table("txns").as[AssembledTxn].collect()
    assert(after2.map(_.txId).toSet === Set("tx-1", "tx-2"))
    val tx1 = after2.find(_.txId == "tx-1").get
    assert(tx1.nEvents === 3)
    assert(tx1.events.map(_.txIndex) === Seq(0, 1, 2))
    assert(tx1.commitTs === tx1.events.map(_.commitTs).max)
    q.stop()
  }

  test("streaming apply merges partial payloads across micro-batches; delete tombstones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.applyStream(input.toDS(), ttlMs = 0L)
      .writeStream.format("memory").queryName("applied")
      .outputMode("append").start()

    input.addData(
      ev("tx", 0, 1, "t0", "a", "c", 1, v = Some(1.0), k = Some(10L)),
      ev("tx", 0, 1, "t0", "a", "u", 2, v = Some(2.0))) // partial: touches val only
    q.processAllAvailable()
    input.addData(ev("tx", 0, 1, "t0", "a", "u", 3, k = Some(30L))) // partial: k only
    q.processAllAvailable()
    val states = spark.table("applied").as[RowState].collect()
    val last = states.maxBy(_.version)
    assert(last.valV === Some(2.0), "val from batch-1 update must survive batch-2")
    assert(last.kV === Some(30L))
    assert(last.version === 3L)

    input.addData(ev("tx", 0, 1, "t0", "a", "d", 4))
    q.processAllAvailable()
    val tomb = spark.table("applied").as[RowState].collect().last
    assert(tomb.deleted && tomb.valV.isEmpty && tomb.kV.isEmpty)
    q.stop()
  }

  test("commit-floor apply holds complete txns until the watermark passes their commit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.applyOnCommitStream(input.toDS(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("floor_txns")
      .outputMode("append").start()

    // tx-a completes with commitTs ~ 1100+2 — but the watermark is still 0
    input.addData(
      ev("tx-a", 0, 2, "t0", "a", "c", 1, v = Some(1.0)),
      ev("tx-a", 1, 2, "t0", "a", "u", 2, k = Some(2L)))
    q.processAllAvailable()
    assert(spark.table("floor_txns").count() === 0,
      "complete txn must be held while the floor is behind its commit")

    // a much later event advances the watermark past tx-a's commit
    input.addData(ev("tx-b", 0, 9, "t1", "b", "c", 1000000L))
    q.processAllAvailable()
    // one more batch so the new watermark takes effect for timeouts
    input.addData(ev("tx-b", 1, 9, "t1", "b", "u", 1000001L))
    q.processAllAvailable()
    val emitted = spark.table("floor_txns").as[AssembledTxn].collect()
    assert(emitted.map(_.txId).toSeq === Seq("tx-a"), "floor passed ⇒ tx-a applies; tx-b incomplete")
    assert(emitted.head.events.map(_.txIndex) === Seq(0, 1))
    q.stop()
  }

  test("streaming poll emits only the latest state per key per closed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = Streams.pollStream(input.toDS(), pollIntervalMs = 1000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("poll_stream")
      .outputMode("append").start()
    // three ops on one key inside window [0, 1000): only the last survives
    input.addData(
      Event("tx", 0, 1, true, "t0", "a", "c", true, Some(1.0), false, None, 100L, 1L),
      Event("tx", 0, 1, true, "t0", "a", "u", true, Some(2.0), false, None, 300L, 2L),
      Event("tx", 0, 1, true, "t0", "a", "u", false, None, true, Some(9L), 700L, 3L))
    q.processAllAvailable()
    // advance the watermark past the window with a later event
    input.addData(Event("tx", 0, 1, true, "t0", "b", "c", true, Some(5.0), false, None, 5000L, 4L))
    q.processAllAvailable()
    input.addData(Event("tx", 0, 1, true, "t0", "c", "c", true, Some(6.0), false, None, 9000L, 5L))
    q.processAllAvailable()
    val rows = spark.table("poll_stream").collect()
    val a = rows.filter(_.getAs[String]("pk") == "a")
    assert(a.length === 1, "one emission per key-window, intermediates lost")
    assert(a.head.getAs[Long]("ops_in_window") === 3L)
    assert(a.head.getAs[String]("op_code") === "u")
    assert(a.head.isNullAt(a.head.fieldIndex("after_val")), "latest op set only k")
    assert(a.head.getAs[Long]("after_k") === 9L)
    q.stop()
  }

  test("streaming apply converges to the batch merge-fold state (cross-layer parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // one deterministic scenario, split across three micro-batches
    val opTuples = graft.sources.WorkloadGen.randomScenario(11, "t0")
    val events = opTuples.zipWithIndex.map { case ((t, tbl, pk, op, sv, v, sk, k), i) =>
      Event(s"tx-$i", 0, 1, last = true, tbl, pk,
        if (op == "insert") "c" else if (op == "delete") "d" else "u",
        sv, v, sk, k, commitTs = t, lsn = i + 1L)
    }
    val input = MemoryStream[Event]
    val q = Streams.applyStream(input.toDS(), ttlMs = 0L)
      .writeStream.format("memory").queryName("parity")
      .outputMode("append").start()
    events.grouped(math.max(events.size / 3, 1)).foreach { batch =>
      input.addData(batch: _*)
      q.processAllAvailable()
    }
    // final streamed state: emission with the highest applied lsn per key,
    // tombstones = absent
    val streamed = spark.table("parity").as[RowState].collect()
      .groupBy(r => (r.tbl, r.pk))
      .map { case (k, rs) => k -> rs.maxBy(_.lastLsn) }
      .filter(!_._2.deleted)
      .map { case (k, r) => k -> ((r.valV, r.kV)) }
    val batchState = graft.cdc.ApplyEngine.applyState(
      graft.sources.WorkloadGen.toOpsDf(spark, opTuples)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(streamed === batchState)
    q.stop()
  }

  test("offset dedup drops replayed events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int, Long, java.sql.Timestamp)]
    val deduped = Streams.dedupOffsets(
      input.toDF().toDF("topic", "partition", "offset", "ts")
        .withWatermark("ts", "10 seconds"),
      Seq("topic", "partition", "offset"))
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    val t0 = new java.sql.Timestamp(1000000L)
    input.addData(("a", 0, 1L, t0), ("a", 0, 1L, t0), ("a", 0, 2L, t0))
    q.processAllAvailable()
    assert(spark.table("dedup").count() === 2)
    q.stop()
  }

  test("watermark curve predicts streaming late-drop behavior (batch ↔ stream parity)") {
    import spark.implicits._
    // the batch ledger's claim: live max 2000 ms ⇒ backfill t=100 is
    // dropped at delay ≤ 1 s, kept at 10 s (CaptureSpec pins the curve);
    // here the SAME stream runs through a real withWatermark + streaming
    // dedup (row-level drop rule: event time < max_seen − delay) and must
    // land exactly where the curve said
    def survivors(delay: String): Long = {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val q = Streams.dedupOffsets(
        input.toDF().toDF("event_id", "ts").withWatermark("ts", delay),
        Seq("event_id"))
        .writeStream.format("memory").queryName(s"wm_parity")
        .outputMode("append").start()
      // batch 1: the live stream advances the watermark to 2000 − delay
      input.addData((1L, new java.sql.Timestamp(1000L)),
        (2L, new java.sql.Timestamp(2000L)))
      q.processAllAvailable()
      // batch 2: the backfill arrives — t=100 (year-old) and t=2500
      input.addData((17L, new java.sql.Timestamp(100L)),
        (34L, new java.sql.Timestamp(2500L)))
      q.processAllAvailable()
      val n = spark.table("wm_parity").count() - 2 // minus the live rows
      q.stop()
      spark.catalog.dropTempView("wm_parity")
      n
    }
    // batch prediction on the equivalent op stream
    val ops = testutil.Scenarios.opsDf(spark, Seq(
      (1000L, "t0", "1", "insert", true, Some(1.0), false, None),
      (2000L, "t0", "2", "insert", true, Some(2.0), false, None),
      (100L, "t0", "17", "insert", true, Some(3.0), false, None),
      (2500L, "t0", "34", "insert", true, Some(4.0), false, None)))
    val curve = graft.cdc.Capture.watermarkCurve(ops).collect()
      .map(r => r.getAs[Long]("delay_ms") ->
        (r.getAs[Long]("n_backfill") - r.getAs[Long]("n_dropped"))).toMap
    assert(survivors("1 second") === curve(1000L),
      "at 1 s allowed lateness the stream must drop what the curve predicts")
    assert(survivors("10 seconds") === curve(10000L),
      "at 10 s the year-old row fits inside the allowed lateness")
  }

  test("streaming throttle carries the token bucket across batches (== batch fold)") {
    import spark.implicits._
    import graft.cdc.Consumer
    import graft.cdc.Consumer.{DeliveryIn, DeliveryOut}
    implicit val sqlCtx = spark.sqlContext
    // rate 2/s at 1000ms steps → 2 tokens/tick; 6 events available at t=0
    val batch1 = (1 to 4).map(i => DeliveryIn("m", i.toLong, 0L))
    val batch2 = (5 to 6).map(i => DeliveryIn("m", i.toLong, 0L))
    val input = MemoryStream[DeliveryIn]
    val q = Streams.throttleStream(input.toDS(), rate = 2.0, stepMs = 1000L)
      .writeStream.format("memory").queryName("throttle_stream")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.table("throttle_stream").as[DeliveryOut].collect()
      .map(e => e.seq -> e.drainTick).toMap
    val batch = Consumer.throttleDrain((batch1 ++ batch2).toDS(), rate = 2.0, stepMs = 1000L)
      .collect().map(e => e.seq -> e.drainTick).toMap
    assert(streamed === batch, "bucket state must survive the batch boundary")
    assert(streamed(5L) === 3L && streamed(6L) === 3L) // 2/tick → ticks 1,1,2,2,3,3
    q.stop()
  }

  test("streaming broker delivery carries queue state across batches (== batch fold)") {
    import spark.implicits._
    import graft.cdc.Consumer
    import graft.cdc.Consumer.{BrokerIn, BrokerOut}
    implicit val sqlCtx = spark.sqlContext
    // cap 2/tick; 5 events available at 40ms (tick 1) split across batches
    val batch1 = (1 to 3).map(i => BrokerIn(0, i.toLong, 40L, dropped = i == 2))
    val batch2 = (4 to 5).map(i => BrokerIn(0, i.toLong, 40L, dropped = false))
    val input = MemoryStream[BrokerIn]
    val q = Streams.brokerDeliverStream(input.toDS(), tickMs = 50L, maxApplyPerTick = 2)
      .writeStream.format("memory").queryName("broker_stream")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    val streamed = spark.table("broker_stream").as[BrokerOut].collect()
      .map(e => e.lsn -> e.deliverTick).toMap
    val batch = Consumer.brokerDeliverExact((batch1 ++ batch2).toDS(),
      tickMs = 50L, maxApplyPerTick = 2)
      .collect().map(e => e.lsn -> e.deliverTick).toMap
    assert(streamed === batch, "queue state must survive the batch boundary")
    // ticks: (1,1), (2,2), (3) — the drop at lsn 2 consumed tick-1 quota
    assert(streamed === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
    q.stop()
  }

  test("streaming drift broker: LIFO stack state carries across batches (== batch fold)") {
    import spark.implicits._
    import graft.cdc.Consumer
    import graft.cdc.Consumer.{BrokerOut, DriftIn}
    implicit val sqlCtx = spark.sqlContext
    // two partitions, arrivals over several ticks, half drifted (+50ms),
    // cap 2/tick; the mid-tick batch split (lsn 3 | 4 share tick 2) is the
    // deferral case: a batch must not drain its own newest arrival tick
    val all = Seq(
      DriftIn(0, 1L, 10L, 10L, dropped = false),  // tick 1
      DriftIn(0, 2L, 20L, 70L, dropped = false),  // tick 1, drifted → tick 2
      DriftIn(0, 3L, 60L, 60L, dropped = true),   // tick 2 (drop uses quota)
      DriftIn(0, 4L, 70L, 120L, dropped = false), // tick 2, drifted → tick 3
      DriftIn(0, 5L, 160L, 160L, dropped = false), // tick 4
      DriftIn(1, 10L, 10L, 10L, dropped = false),
      DriftIn(1, 11L, 12L, 62L, dropped = false), // drifted → tick 2
      DriftIn(1, 12L, 110L, 110L, dropped = false)) // tick 3
    val (batch1, batch2) = all.splitAt(3) // splits partition 0 inside tick 2
    // flush sentinels: one per partition, far past every real arrival
    val flush = Seq(
      DriftIn(0, 9000L, 100000L, 100000L, dropped = true),
      DriftIn(1, 9001L, 100000L, 100000L, dropped = true))
    val input = MemoryStream[DriftIn]
    val q = Streams.brokerDeliverDriftStream(input.toDS(), tickMs = 50L, maxApplyPerTick = 2)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    input.addData(flush: _*)
    q.processAllAvailable()
    val streamed = spark.table("drift_stream").as[BrokerOut].collect()
      .filter(_.lsn < 9000L).map(e => e.lsn -> e.deliverTick).toMap
    val batch = Consumer.brokerDeliverDriftExact(all.toDS(), tickMs = 50L, maxApplyPerTick = 2)
      .collect().map(e => e.lsn -> e.deliverTick).toMap
    assert(streamed === batch, "stack state must survive the batch boundary")
    // partition 0 trace: tick 1 pushes [2,1] but head 2 is drifted (avail
    // tick 2) → blocks 1; tick 2 pushes [4,3,2,1], head 4 drifted (avail
    // tick 3) → blocks everything; tick 3 pops 4 then 3 (drop uses quota);
    // tick 4 pushes 5 → pops 5 then 2; tick 5 pops 1 — the oldest event
    // starves longest, the LIFO signature
    assert(streamed(4L) === 3L && streamed(3L) === 3L)
    assert(streamed(5L) === 4L && streamed(2L) === 4L && streamed(1L) === 5L)
    q.stop()
  }

  test("streaming rolling lag ring buffer: final snapshot equals the batch window") {
    import spark.implicits._
    import graft.streaming.Streams.{LagSample, LagSnapshot}
    implicit val sqlCtx = spark.sqlContext
    // lane "a": 10 samples, ring of 4 → final window = lags of ord 7..10;
    // lane "b" stays under N
    val all = (1L to 10L).map(i => LagSample("a", i, i, i * 10)) ++
      Seq(LagSample("b", 1L, 1L, 500L), LagSample("b", 2L, 2L, 100L))
    val (batch1, batch2) = all.splitAt(7)
    val input = MemoryStream[LagSample]
    val q = Streams.lagRollingStream(input.toDS(), lastN = 4)
      .writeStream.format("memory").queryName("lag_stream")
      .outputMode("append").start()
    input.addData(batch1: _*)
    q.processAllAvailable()
    input.addData(batch2: _*)
    q.processAllAvailable()
    val snaps = spark.table("lag_stream").as[LagSnapshot].collect()
    // last snapshot per lane == batch rolling window over the full feed
    val lastByLane = snaps.groupBy(_.method).view.mapValues(_.last).toMap
    val batch = graft.cdc.MetricsAgg.lagPercentilesRolling(
      all.toDF("method", "ord1", "ord2", "lag_ms"), lastN = 4)
      .collect().map(r => r.getAs[String]("method") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"),
          r.getAs[Long]("max_lag"), r.getAs[Long]("window_n"))).toMap
    assert(lastByLane("a").windowN === 4)
    assert((lastByLane("a").p50, lastByLane("a").p95,
      lastByLane("a").maxLag, lastByLane("a").windowN.toLong) === batch("a"))
    assert((lastByLane("b").p50, lastByLane("b").p95,
      lastByLane("b").maxLag, lastByLane("b").windowN.toLong) === batch("b"))
    // the ring moved: after batch 1 lane "a" held lags {40..70}, after
    // batch 2 it holds {70..100}
    val aSnaps = snaps.filter(_.method == "a")
    assert(aSnaps.head.maxLag === 70L && aSnaps.last.maxLag === 100L)
    q.stop()
  }

  test("streaming schema capture continues version transitions across batches") {
    import spark.implicits._
    import graft.cdc.SchemaEvolution.SchemaChange
    import graft.streaming.Streams.VersionedSchemaChange
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SchemaChange]
    val q = Streams.schemaCaptureStream(input.toDS())
      .writeStream.format("memory").queryName("schema_stream")
      .outputMode("append").start()

    input.addData(
      SchemaChange("t0", "ADD_COLUMN", "a", 100L),
      SchemaChange("t1", "ADD_COLUMN", "z", 150L),
      SchemaChange("t0", "DROP_COLUMN", "a", 200L))
    q.processAllAvailable()
    input.addData(SchemaChange("t0", "ADD_COLUMN", "b", 300L)) // next batch
    q.processAllAvailable()
    val out = spark.table("schema_stream").as[VersionedSchemaChange].collect()
      .map(c => (c.tbl, c.column, c.prevVersion, c.nextVersion, c.kind)).toSet
    assert(out === Set(
      ("t0", "a", 1, 2, "SCHEMA_ADD_COL"),
      ("t0", "a", 2, 3, "SCHEMA_DROP_COL"),
      ("t0", "b", 3, 4, "SCHEMA_ADD_COL"), // state carried the counter over
      ("t1", "z", 1, 2, "SCHEMA_ADD_COL")))
    // matches the batch form on the same changes (t0 lane)
    val batch = graft.cdc.SchemaEvolution.capture(Seq(
      SchemaChange("t0", "ADD_COLUMN", "a", 100L),
      SchemaChange("t0", "DROP_COLUMN", "a", 200L),
      SchemaChange("t0", "ADD_COLUMN", "b", 300L)).toDS()).collect()
      .map(r => (r.getAs[String]("column"), r.getAs[Int]("prev_version"),
        r.getAs[Int]("next_version"))).toSet
    assert(batch === out.filter(_._1 == "t0").map(c => (c._2, c._3, c._4)))
    q.stop()
  }

  /** transformWithState needs the RocksDB state store provider; scope it to
    * the query and restore the session default afterwards. */
  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState txn assembly: parity with the flatMapGroupsWithState form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[Event]
      val q = graft.streaming.StreamsV2.assembleTxns(input.toDS(), ttlMs = 0L)
        .writeStream.format("memory").queryName("txns_tws")
        .outputMode("append").start()
      input.addData(
        ev("tx-1", 0, 3, "t0", "a", "c", 1, v = Some(1.0)),
        ev("tx-2", 0, 2, "t0", "b", "c", 2, v = Some(2.0)),
        ev("tx-2", 1, 2, "t1", "b", "u", 3, k = Some(5L)),
        ev("tx-1", 1, 3, "t1", "a", "u", 4, k = Some(9L)))
      q.processAllAvailable()
      val after1 = spark.table("txns_tws").as[AssembledTxn].collect()
      assert(after1.map(_.txId).toSet === Set("tx-2"),
        "incomplete tx-1 must stay buffered in ListState")
      input.addData(ev("tx-1", 2, 3, "t2", "a", "u", 5, v = Some(3.0)))
      q.processAllAvailable()
      val after2 = spark.table("txns_tws").as[AssembledTxn].collect()
      assert(after2.map(_.txId).toSet === Set("tx-1", "tx-2"))
      val tx1 = after2.find(_.txId == "tx-1").get
      assert((tx1.nEvents, tx1.events.map(_.txIndex), tx1.commitTs, tx1.firstLsn) ===
        ((3, Seq(0, 1, 2), tx1.events.map(_.commitTs).max, 1L)))
      q.stop()
    }
  }

  test("transformWithState throttle: ValueState bucket == batch fold across batches") {
    import spark.implicits._
    import graft.cdc.Consumer
    import graft.cdc.Consumer.{DeliveryIn, DeliveryOut}
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (1 to 4).map(i => DeliveryIn("m", i.toLong, 0L))
    val batch2 = (5 to 6).map(i => DeliveryIn("m", i.toLong, 0L))
    withRocksDb {
      val input = MemoryStream[DeliveryIn]
      val q = graft.streaming.StreamsV2.throttleStream(input.toDS(), rate = 2.0, stepMs = 1000L)
        .writeStream.format("memory").queryName("throttle_tws")
        .outputMode("append").start()
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("throttle_tws").as[DeliveryOut].collect()
        .map(e => e.seq -> e.drainTick).toMap
      val batch = Consumer.throttleDrain((batch1 ++ batch2).toDS(), rate = 2.0, stepMs = 1000L)
        .collect().map(e => e.seq -> e.drainTick).toMap
      assert(streamed === batch, "ValueState bucket must survive the batch boundary")
      assert(streamed(5L) === 3L && streamed(6L) === 3L)
      q.stop()
    }
  }

  test("transformWithState rolling lag ring: parity with batch window and v1 stream") {
    import spark.implicits._
    import graft.streaming.Streams.{LagSample, LagSnapshot}
    implicit val sqlCtx = spark.sqlContext
    val all = (1L to 10L).map(i => LagSample("a", i, i, i * 10)) ++
      Seq(LagSample("b", 1L, 1L, 500L), LagSample("b", 2L, 2L, 100L))
    val (batch1, batch2) = all.splitAt(7)
    withRocksDb {
      val input = MemoryStream[LagSample]
      val q = graft.streaming.StreamsV2.lagRollingStream(input.toDS(), lastN = 4)
        .writeStream.format("memory").queryName("lag_tws")
        .outputMode("append").start()
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val snaps = spark.table("lag_tws").as[LagSnapshot].collect()
      val lastByLane = snaps.groupBy(_.method).view.mapValues(_.last).toMap
      val batch = graft.cdc.MetricsAgg.lagPercentilesRolling(
        all.toDF("method", "ord1", "ord2", "lag_ms"), lastN = 4)
        .collect().map(r => r.getAs[String]("method") ->
          (r.getAs[Double]("p50"), r.getAs[Double]("p95"),
            r.getAs[Long]("max_lag"), r.getAs[Long]("window_n"))).toMap
      assert((lastByLane("a").p50, lastByLane("a").p95,
        lastByLane("a").maxLag, lastByLane("a").windowN.toLong) === batch("a"))
      assert((lastByLane("b").p50, lastByLane("b").p95,
        lastByLane("b").maxLag, lastByLane("b").windowN.toLong) === batch("b"))
      // the ring slid exactly as the v1 stream's did
      val aSnaps = snaps.filter(_.method == "a")
      assert(aSnaps.head.maxLag === 70L && aSnaps.last.maxLag === 100L)
      q.stop()
    }
  }

  test("transformWithState broker delivery: shared fold parity across batches") {
    import spark.implicits._
    import graft.cdc.Consumer
    import graft.cdc.Consumer.{BrokerIn, BrokerOut}
    implicit val sqlCtx = spark.sqlContext
    val batch1 = (1 to 3).map(i => BrokerIn(0, i.toLong, 40L, dropped = i == 2))
    val batch2 = (4 to 5).map(i => BrokerIn(0, i.toLong, 40L, dropped = false))
    withRocksDb {
      val input = MemoryStream[BrokerIn]
      val q = graft.streaming.StreamsV2.brokerDeliverStream(
        input.toDS(), tickMs = 50L, maxApplyPerTick = 2)
        .writeStream.format("memory").queryName("broker_tws")
        .outputMode("append").start()
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("broker_tws").as[BrokerOut].collect()
        .map(e => e.lsn -> e.deliverTick).toMap
      val batch = Consumer.brokerDeliverExact((batch1 ++ batch2).toDS(),
        tickMs = 50L, maxApplyPerTick = 2)
        .collect().map(e => e.lsn -> e.deliverTick).toMap
      assert(streamed === batch, "ValueState queue must survive the batch boundary")
      assert(streamed === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
      q.stop()
    }
  }

  test("transformWithState drift broker: LIFO stack parity with v1 and batch fold") {
    import spark.implicits._
    import graft.cdc.Consumer
    import graft.cdc.Consumer.{BrokerOut, DriftIn}
    implicit val sqlCtx = spark.sqlContext
    // same planted drift scenario as the v1 test, same mid-tick batch split
    val all = Seq(
      DriftIn(0, 1L, 10L, 10L, dropped = false),
      DriftIn(0, 2L, 20L, 70L, dropped = false),
      DriftIn(0, 3L, 60L, 60L, dropped = true),
      DriftIn(0, 4L, 70L, 120L, dropped = false),
      DriftIn(0, 5L, 160L, 160L, dropped = false),
      DriftIn(1, 10L, 10L, 10L, dropped = false),
      DriftIn(1, 11L, 12L, 62L, dropped = false),
      DriftIn(1, 12L, 110L, 110L, dropped = false))
    val (batch1, batch2) = all.splitAt(3)
    val flush = Seq(
      DriftIn(0, 9000L, 100000L, 100000L, dropped = true),
      DriftIn(1, 9001L, 100000L, 100000L, dropped = true))
    withRocksDb {
      val input = MemoryStream[DriftIn]
      val q = graft.streaming.StreamsV2.brokerDeliverDriftStream(
        input.toDS(), tickMs = 50L, maxApplyPerTick = 2)
        .writeStream.format("memory").queryName("drift_tws")
        .outputMode("append").start()
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      input.addData(flush: _*)
      q.processAllAvailable()
      val streamed = spark.table("drift_tws").as[BrokerOut].collect()
        .filter(_.lsn < 9000L).map(e => e.lsn -> e.deliverTick).toMap
      val batch = Consumer.brokerDeliverDriftExact(all.toDS(), tickMs = 50L, maxApplyPerTick = 2)
        .collect().map(e => e.lsn -> e.deliverTick).toMap
      assert(streamed === batch, "ValueState stack must survive the batch boundary")
      assert(streamed(4L) === 3L && streamed(3L) === 3L)
      assert(streamed(5L) === 4L && streamed(2L) === 4L && streamed(1L) === 5L)
      q.stop()
    }
  }

  test("transformWithState schema capture: version counter parity across batches") {
    import spark.implicits._
    import graft.cdc.SchemaEvolution.SchemaChange
    import graft.streaming.Streams.VersionedSchemaChange
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[SchemaChange]
      val q = graft.streaming.StreamsV2.schemaCaptureStream(input.toDS())
        .writeStream.format("memory").queryName("schema_tws")
        .outputMode("append").start()
      input.addData(
        SchemaChange("t0", "ADD_COLUMN", "a", 100L),
        SchemaChange("t1", "ADD_COLUMN", "z", 150L),
        SchemaChange("t0", "DROP_COLUMN", "a", 200L))
      q.processAllAvailable()
      input.addData(SchemaChange("t0", "ADD_COLUMN", "b", 300L))
      q.processAllAvailable()
      val out = spark.table("schema_tws").as[VersionedSchemaChange].collect()
        .map(c => (c.tbl, c.column, c.prevVersion, c.nextVersion, c.kind)).toSet
      assert(out === Set(
        ("t0", "a", 1, 2, "SCHEMA_ADD_COL"),
        ("t0", "a", 2, 3, "SCHEMA_DROP_COL"),
        ("t0", "b", 3, 4, "SCHEMA_ADD_COL"),
        ("t1", "z", 1, 2, "SCHEMA_ADD_COL")))
      q.stop()
    }
  }

  test("transformWithState poll: MapState row-image windows == v1 windowed agg") {
    import spark.implicits._
    import graft.streaming.StreamsV2.PollOut
    implicit val sqlCtx = spark.sqlContext
    // the v1 poll test's feed: three ops on key a in window [0,1000), then
    // watermark-advancing events on keys b and c
    val feed = Seq(
      Seq(
        Event("tx", 0, 1, true, "t0", "a", "c", true, Some(1.0), false, None, 100L, 1L),
        Event("tx", 0, 1, true, "t0", "a", "u", true, Some(2.0), false, None, 300L, 2L),
        Event("tx", 0, 1, true, "t0", "a", "u", false, None, true, Some(9L), 700L, 3L)),
      Seq(Event("tx", 0, 1, true, "t0", "b", "c", true, Some(5.0), false, None, 5000L, 4L)),
      // a LATE straggler for key a's long-closed [0,1000) window rides with
      // the watermark-advancing event: both forms must drop it (no
      // duplicate window emission), matching the v1 watermark filter
      Seq(
        Event("tx", 0, 1, true, "t0", "a", "u", true, Some(7.0), false, None, 150L, 6L),
        Event("tx", 0, 1, true, "t0", "c", "c", true, Some(6.0), false, None, 9000L, 5L)))

    val v2 = withRocksDb {
      val input = MemoryStream[Event]
      val q = graft.streaming.StreamsV2.pollStream(
        input.toDS(), pollIntervalMs = 1000L, watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName("poll_tws")
        .outputMode("append").start()
      feed.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table("poll_tws").as[PollOut].collect()
        .map(p => (p.tbl, p.pk, p.pollTs, p.opCode, p.afterVal, p.afterK, p.opsInWindow))
        .sortBy(t => (t._2, t._3))
      q.stop()
      rows.toSeq
    }

    // v1 on the identical feed (poll_ts timestamp → epoch ms for compare)
    val input1 = MemoryStream[Event]
    val q1 = Streams.pollStream(input1.toDS(), pollIntervalMs = 1000L, watermarkDelay = "0 seconds")
      .selectExpr("tbl", "pk", "unix_millis(poll_ts) AS poll_ms", "op_code",
        "after_val", "after_k", "ops_in_window")
      .writeStream.format("memory").queryName("poll_v1_cmp")
      .outputMode("append").start()
    feed.foreach { b => input1.addData(b: _*); q1.processAllAvailable() }
    val v1 = spark.table("poll_v1_cmp").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Long]), r.getLong(6)))
      .sortBy(t => (t._2, t._3)).toSeq
    q1.stop()

    assert(v2 === v1, "MapState windows must emit exactly the windowed agg's rows")
    // and the planted semantics hold: key a's window kept only the last
    // image, emitted ONCE — the late straggler must not reopen it
    val a = v2.filter(_._2 == "a")
    assert(a === Seq(("t0", "a", 1000L, "u", None, Some(9L), 3L)))
  }

  test("transformWithState poll: randomized multi-key feeds match v1 exactly") {
    import spark.implicits._
    import graft.streaming.StreamsV2.PollOut
    implicit val sqlCtx = spark.sqlContext
    // deterministic pseudo-random feeds: several keys, colliding windows,
    // in-batch disorder; a far-future closer drains every window. The
    // watermark delay (6 s) bounds the feed's actual disorder (ts < 6000),
    // the contract under which the two forms' late-row mechanisms (row
    // event-time filter vs window-end filter) provably coincide — see the
    // v2 pollStream scaladoc.
    for (seed <- Seq(101L, 202L)) {
      val rng = new scala.util.Random(seed)
      val events = (1 to 40).map { i =>
        Event("tx", 0, 1, true, "t0", s"k${rng.nextInt(4)}",
          if (rng.nextBoolean()) "u" else "c",
          rng.nextBoolean(), Some(rng.nextInt(100).toDouble),
          false, None, rng.nextInt(6000).toLong, i.toLong)
      } :+ Event("tx", 0, 1, true, "t0", "zz", "c", true, Some(0.0), false, None, 50000L, 99L)
      val batches = events.grouped(14).toSeq

      def runV2(): Seq[(String, Long, String, Option[Double], Long)] = withRocksDb {
        val input = MemoryStream[Event]
        val q = graft.streaming.StreamsV2.pollStream(
          input.toDS(), pollIntervalMs = 1000L, watermarkDelay = "6 seconds")
          .writeStream.format("memory").queryName(s"poll_rnd_v2_$seed")
          .outputMode("append").start()
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val rows = spark.table(s"poll_rnd_v2_$seed").as[PollOut].collect()
          .map(p => (p.pk, p.pollTs, p.opCode, p.afterVal, p.opsInWindow))
          .sortBy(t => (t._1, t._2)).toSeq
        q.stop()
        rows
      }
      def runV1(): Seq[(String, Long, String, Option[Double], Long)] = {
        val input = MemoryStream[Event]
        val q = Streams.pollStream(
          input.toDS(), pollIntervalMs = 1000L, watermarkDelay = "6 seconds")
          .selectExpr("pk", "unix_millis(poll_ts) AS ms", "op_code", "after_val", "ops_in_window")
          .writeStream.format("memory").queryName(s"poll_rnd_v1_$seed")
          .outputMode("append").start()
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        val rows = spark.table(s"poll_rnd_v1_$seed").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getString(2),
            Option(r.get(3)).map(_.asInstanceOf[Double]), r.getLong(4)))
          .sortBy(t => (t._1, t._2)).toSeq
        q.stop()
        rows
      }
      assert(runV2() === runV1(), s"seed=$seed")
    }
  }

  test("transformWithState as-of: ValueState parity with the v1 stream across batches") {
    import spark.implicits._
    import graft.streaming.Streams.{AsOfIn, AsOfOut}
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      AsOfIn(1L, 30L, isBuild = true, 300L),
      AsOfIn(1L, 10L, isBuild = true, 100L),
      AsOfIn(1L, 20L, isBuild = false, 900L), // in-batch: sees ts=10
      AsOfIn(2L, 5L, isBuild = false, 910L)) // no build for key 2 yet
    val batch2 = Seq(
      AsOfIn(1L, 99L, isBuild = false, 902L), // carried state: ts=30
      AsOfIn(2L, 6L, isBuild = true, 200L),
      AsOfIn(2L, 7L, isBuild = false, 911L))

    def run(name: String, mk: org.apache.spark.sql.Dataset[AsOfIn] =>
        org.apache.spark.sql.Dataset[AsOfOut]): Seq[(Long, Option[Long])] = {
      val input = MemoryStream[AsOfIn]
      val q = mk(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val out = spark.table(name).as[AsOfOut].collect()
        .map(o => (o.id, o.matchId)).sortBy(_._1).toSeq
      q.stop()
      out
    }

    val v2 = withRocksDb {
      run("asof_tws", ds => graft.streaming.StreamsV2.asOfStream(ds, ttlMs = 0L))
    }
    val v1 = run("asof_v1", ds => Streams.asOfStream(ds, ttlMs = 0L))
    assert(v2 === v1, "transformWithState == flatMapGroupsWithState")
    assert(v2 === Seq(
      (900L, Some(100L)), (902L, Some(300L)),
      (910L, None), (911L, Some(200L))))
  }

  test("streaming chunk plan == batch on live arrivals (stateless explode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val arrivals = Seq(
      (30L, (1 to 10).map(i => s"w$i").mkString(" ")),  // 2 chunks at 6/4
      (31L, "k l m"),                                    // 1 short chunk
      (32L, (1 to 20).map(i => s"x$i").mkString(" ")))   // 4 chunks
    val input = MemoryStream[(Long, String)]
    val q = graft.llm.Chunking
      .chunkPlan(input.toDS().toDF("doc_id", "text"), size = 6, stride = 4)
      .writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    q.stop()
    val batch = graft.llm.Chunking
      .chunkPlan(arrivals.toDF("doc_id", "text"), size = 6, stride = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got === batch, "streaming chunking == batch chunking")
    assert(got.count(_._1 == 32L) === 5) // starts 0,4,8,12,16 at size 6 / stride 4
  }

  test("streaming admission controller == batch on live arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "spark filter join table scan window batch merge sort group value column key"))
      .toDF("doc_id", "text")
    val arrivals = Seq(
      // dup of corpus doc 0 → rejected on dedup
      (20L, "spark filter join table scan window batch merge sort group value column key"),
      // long, diverse, clean → admitted
      (21L, (1 to 60).map(i => s"tok$i").mkString(" ")),
      // carries an email → rejected on PII
      (22L, (1 to 60).map(i => s"tok$i").mkString(" ") + " mail me a1@ex.com"),
      // stopword soup → rejected on quality
      (23L, (1 to 40).map(_ => "the a of and to").mkString(" ")))
    val input = MemoryStream[(Long, String)]
    val q = graft.llm.Corpus
      .admissionGate(input.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("admission")
      .outputMode("append").start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("admission").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1).toSeq
    q.stop()
    assert(got.map(g => g._1 -> g._6) ===
      Seq(20L -> false, 21L -> true, 22L -> false, 23L -> false))
    assert(!got(0)._4 && got(0)._5 === 0L, "20 rejected by the dedup gate, provenance kept")
    assert(!got(2)._3, "22 rejected by the PII gate")
    assert(!got(3)._2, "23 rejected by the quality gate")
    val batch = graft.llm.Corpus
      .admissionGate(arrivals.toDF("doc_id", "text"), corpus)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getLong(4), r.getBoolean(5))).sortBy(_._1).toSeq
    assert(got === batch, "streaming admission == batch admission")
  }

  test("streaming per-source budget gate == batch sourceBudget on ordered arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "a b c d e", "s0"),                          // 5 tokens
      (2L, (1 to 8).map(_ => "w").mkString(" "), "s0"), // 8 → s0 cum 13 > 10
      (3L, "x y z", "s1"),                              // 3
      (4L, "p q r s", "s1"),                            // 4 → s1 cum 7 ≤ 10
      (5L, "k l m n o", "s1"))                          // 5 → s1 cum 12 > 10
    val input = MemoryStream[graft.streaming.Streams.BudgetIn]
    val q = graft.streaming.Streams
      .budgetAdmissionStream(input.toDS(), budgetPerSource = 10L, ttlMs = 0L)
      .writeStream.format("memory").queryName("budget_gate")
      .outputMode("append").start()
    def asIn(d: (Long, String, String)) =
      graft.streaming.Streams.BudgetIn(d._3, d._1, d._2.split(" ").length.toLong)
    input.addData(docs.take(3).map(asIn): _*)
    q.processAllAvailable()
    input.addData(docs.drop(3).map(asIn): _*)
    q.processAllAvailable()
    val got = spark.table("budget_gate").as[graft.streaming.Streams.BudgetOut]
      .collect().sortBy(o => (o.source, o.docId)).toSeq
    q.stop()
    val batch = graft.llm.Corpus
      .sourceBudget(docs.toDF("doc_id", "text", "source"), budgetPerSource = 10L)
      .orderBy("source", "doc_id").collect()
      .map(r => graft.streaming.Streams.BudgetOut(
        r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_source_tokens"),
        r.getAs[Boolean]("admitted"))).toSeq
    assert(got === batch, "streaming budget gate == batch keyed prefix sum")
    assert(got.map(o => o.docId -> o.admitted) ===
      Seq(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> false))
  }

  test("streaming ingest dedup gate flags live docs against the corpus index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "spark filter join table scan window batch merge"),
      (5L, "completely different words entirely other content here"))
      .toDF("doc_id", "text")
    val arrivals1 = Seq(
      (10L, "spark filter join table scan window batch merge"), // dup of 0
      (11L, "fresh unseen tokens nothing like the corpus rows"))
    val arrivals2 = Seq(
      (12L, "completely different words entirely other content here"), // dup of 5
      (13L, "fresh unseen tokens nothing like the corpus rows")) // dup of... nothing in corpus
    val input = MemoryStream[(Long, String)]
    val q = graft.llm.Dedup
      .ingestGate(input.toDS().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("ingest_gate")
      .outputMode("append").start()
    input.addData(arrivals1: _*)
    q.processAllAvailable()
    input.addData(arrivals2: _*)
    q.processAllAvailable()
    val got = spark.table("ingest_gate").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1).toSeq
    q.stop()
    // 13 matches no CORPUS doc (the static index is fixed at stream start;
    // 11 arrived on the stream, and stream-side arrivals never join it)
    assert(got === Seq(
      (10L, true, 0L), (11L, false, -1L),
      (12L, true, 5L), (13L, false, -1L)))
    // parity with the batch incremental path on the union of arrivals
    val batch = graft.llm.Dedup.incrementalFlags(
      corpus, (arrivals1 ++ arrivals2).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got === batch, "streaming gate == batch incrementalFlags")
  }

  test("live ingest gate via foreachBatch + persisted bucketed index: " +
      "per-micro-batch bucket pruning, verdict parity with the unindexed gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "spark filter join table scan window batch merge"),
      (5L, "completely different words entirely other content here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ingest_stream_idx").toString
    graft.llm.Corpus.writeAdmissionIndex(corpus, dir, numBuckets = 32)
    val index = graft.llm.Corpus.readAdmissionIndex(spark, dir)
    val arrivals1 = Seq(
      (10L, "spark filter join table scan window batch merge"), // dup of 0
      (11L, "fresh unseen tokens nothing like the corpus rows"))
    val arrivals2 = Seq(
      (12L, "completely different words entirely other content here"), // dup of 5
      (13L, "hi")) // below shingle resolution — dropped
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean, Long)]
    val input = MemoryStream[(Long, String)]
    // the production wiring: each micro-batch arrives as a BATCH frame in
    // foreachBatch, so bucket discovery (collect of ≤numBuckets small
    // ints) is legal and the standing index read is pruned per batch
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val gated = graft.llm.Dedup.ingestGateWithIndex(batch, index)
        // pin the prune while we're here: the static-side scan of a
        // non-empty micro-batch must carry the bucket INSET partition filter
        if (batch.count() > 0) {
          val plan = gated.queryExecution.executedPlan.toString()
          // a one-bucket batch's INSET constant-folds to an equality —
          // both shapes are the prune
          assert(plan.contains("PartitionFilters") &&
            "sig_bucket[#0-9]* (IN|=)".r.findFirstIn(plan).isDefined,
            s"index scan must be partition-pruned to the batch's buckets:\n$plan")
        }
        got ++= gated.collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
        ()
      }
      .start()
    input.addData(arrivals1: _*)
    q.processAllAvailable()
    input.addData(arrivals2: _*)
    q.processAllAvailable()
    q.stop()
    // foreachBatch is at-least-once across restarts — no kill here, but
    // distinct keeps the assertion honest to the sink contract anyway
    val sorted = got.distinct.sortBy(_._1).toSeq
    val plain = graft.llm.Dedup.ingestGate(
      (arrivals1 ++ arrivals2).toDF("doc_id", "text"), corpus)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
    assert(sorted === plain, "indexed live gate == unindexed gate on the union")
    assert(sorted === Seq((10L, true, 0L), (11L, false, -1L), (12L, true, 5L)))
  }

  /** Round-16 drill (verdict #5): the O(batch) claim MEASURED, not just
    * plan-pinned. Five micro-batches of fixed size stream through the
    * real `writeStream.foreachBatch` wiring against a standing bucketed
    * index at 1× and at 10× the corpus — per batch, the drill reads the
    * executed index scan's partitions-read/files-read metrics and the
    * batch wall time. O(batch) means: partitions read stay bounded by the
    * BATCH's own bucket count (never the index's 64 partitions) at both
    * corpus sizes, and per-batch wall does not scale with the corpus
    * side. Wall assertions use generous noise bands (3×) — the sharp
    * assertion is the partition metric, which is deterministic. */
  test("live ingest gate stays O(batch) across micro-batches as the " +
      "corpus-side index grows 10x (partitions read bounded by the batch)") {
    import spark.implicits._
    import graft.llm.{Corpus, Dedup}
    def text(i: Long): String =
      (0 until 8).map(k => s"w${(i * 7 + k * 13) % 50000}").mkString(" ")
    def corpusDf(n: Int) =
      (0 until n).map(i => (i.toLong, text(i.toLong))).toDF("doc_id", "text")
    val batchSize = 20
    // 5 fixed batches: half exact dups of corpus docs (present in BOTH
    // corpora — ids < 2000), half fresh arrivals
    val batches: Seq[Seq[(Long, String)]] = (0 until 5).map { b =>
      (0 until batchSize / 2).map(j =>
        (100000L + b * 100 + j, text((b * 97 + j * 11) % 2000))) ++
        (0 until batchSize / 2).map { j =>
          // disjoint word space ("f" prefix): genuinely fresh at both sizes
          val fresh = (0 until 8).map(k => s"f${b * 1000 + j * 10 + k}")
            .mkString(" ")
          (200000L + b * 100 + j, fresh)
        }
    }
    // the executed per-batch plan's index-side scan: partitions read after
    // pruning (falls back to files read — ≥1 file per partition here)
    def indexScanPartitions(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        // AQE stage wrappers are leaves (children = Nil); the materialized
        // subplan hangs off .plan
        case q: QueryStageExec => scans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other =>
          (other.children ++ other.subqueries).flatMap(scans)
      }
      val ss = scans(df.queryExecution.executedPlan)
      assert(ss.nonEmpty, "the gate plan must contain the index file scan")
      val s = ss.head
      s.metrics.get("numPartitions").orElse(s.metrics.get("numFiles"))
        .map(_.value).getOrElse(0L)
    }
    def drill(corpusRows: Int): (Seq[Double], Seq[Long]) = {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files
        .createTempDirectory(s"obatch_idx_$corpusRows").toString
      // fixed 64-bucket fold at BOTH sizes so partition counts compare
      // apples-to-apples and a 20-doc batch can only touch ≤ 20 of 64
      Corpus.writeAdmissionIndex(corpusDf(corpusRows), dir, numBuckets = 64)
      val index = Corpus.readAdmissionIndex(spark, dir)
      val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
      val parts = scala.collection.mutable.ArrayBuffer.empty[Long]
      val input = MemoryStream[(Long, String)]
      val q = input.toDS().toDF("doc_id", "text").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val t0 = System.nanoTime()
          val gated = Dedup.ingestGateWithIndex(batch, index)
          val n = gated.collect().length
          walls += (System.nanoTime() - t0) / 1e9
          parts += indexScanPartitions(gated)
          assert(n === batchSize, "every arrival is over shingle resolution")
          ()
        }
        .start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
      (walls.toSeq, parts.toSeq)
    }
    val (wallS, partS) = drill(2000)
    val (wallB, partB) = drill(20000)
    info(f"1x  corpus: walls=${wallS.map(w => f"$w%.2f").mkString(",")} " +
      s"partitionsRead=${partS.mkString(",")}")
    info(f"10x corpus: walls=${wallB.map(w => f"$w%.2f").mkString(",")} " +
      s"partitionsRead=${partB.mkString(",")}")
    // the sharp assertion: partitions read ≤ the batch's own bucket count
    // (≤ batchSize distinct signatures), at 1× and at 10× the corpus —
    // the index has 64 populated partitions; an O(corpus) re-scan reads
    // all of them
    (partS ++ partB).zipWithIndex.foreach { case (p, i) =>
      assert(p > 0 && p <= batchSize,
        s"batch ${i % 5}: read $p index partitions — must be bounded by " +
          s"the batch's $batchSize docs, not the 64-partition index")
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    // wall-clock numbers are INFO-ONLY (round-16 ADVICE): ~0.3 s per-batch
    // walls are co-tenancy/JIT sensitive and the deterministic
    // partitions-read assertion above already proves the O(batch)
    // property; the timings are printed for per-round reading
    for ((walls, lbl) <- Seq((wallS, "1x"), (wallB, "10x"))) {
      val steady = walls.drop(1)
      info(f"$lbl steady walls: max=${steady.max}%.2f med=${med(steady)}%.2f")
    }
    val ratio = med(wallB.drop(1)) / med(wallS.drop(1))
    info(f"per-batch wall 10x/1x median ratio: $ratio%.2f (info-only; " +
      "the partitions-read bound is the gated property)")
  }

  /** Round-17 drill: the admission loop CLOSED in live ingest. The
    * r15/r16 O(batch) drills gate every micro-batch against a FROZEN
    * standing index — arrivals never become corpus. With delta segments
    * the loop closes lock-free: each micro-batch (a) gates against the
    * CURRENT folded index (base ∪ published segments) and (b) publishes
    * its own docs as a new segment (`Corpus.appendAdmissionDelta` —
    * append-only, so a second concurrent ingest pipeline could do the
    * same with no coordination), so batch N+1 sees batch N's arrivals as
    * duplicates. A mid-stream compaction absorbs pending segments and
    * must not change any verdict. The sharp assertions are the
    * cross-batch dup verdicts (impossible against a frozen index) and
    * the per-scan partition prune (every scan in the folded plan —
    * base and each segment — stays bounded by the BATCH's buckets). */
  test("live delta-segment ingest closes the admission loop: later " +
      "batches dedup against earlier arrivals; compaction mid-stream " +
      "preserves verdicts; every folded scan stays batch-pruned") {
    import spark.implicits._
    import graft.llm.Corpus
    implicit val sqlCtx = spark.sqlContext
    def freshText(tag: String): String =
      (0 until 8).map(k => s"${tag}w$k").mkString(" ")
    val base = (0 until 30).map(i => (i.toLong, freshText(s"base$i")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("delta_stream").toString
    Corpus.writeAdmissionIndex(base, dir, numBuckets = 16)
    // b0: 10 fresh; b1: 5 dups OF B0 + 5 fresh; (compact); b2: 3 dups of
    // base + 3 dups of b0 (now absorbed) + 4 fresh
    val b0 = (0 until 10).map(i => (1000L + i, freshText(s"zero$i")))
    val b1 = (0 until 5).map(i => (2000L + i, freshText(s"zero$i"))) ++
      (0 until 5).map(i => (2100L + i, freshText(s"one$i")))
    val b2 = (0 until 3).map(i => (3000L + i, freshText(s"base$i"))) ++
      (0 until 3).map(i => (3100L + i, freshText(s"zero$i"))) ++
      (0 until 4).map(i => (3200L + i, freshText(s"two$i")))
    def allScans(df: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: QueryStageExec => scans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => (other.children ++ other.subqueries).flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
    }
    val verdicts =
      scala.collection.mutable.Map.empty[Long, (Boolean, Long)]
    val scanBound = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        val gated = Corpus.admissionGatePruned(batch,
          Corpus.readAdmissionIndexFolded(spark, dir))
        gated.collect().foreach { r =>
          verdicts(r.getAs[Long]("doc_id")) =
            (r.getAs[Boolean]("pass_dedup"), r.getAs[Long]("dup_of"))
        }
        allScans(gated).foreach { s =>
          val p = s.metrics.get("numPartitions")
            .orElse(s.metrics.get("numFiles")).map(_.value).getOrElse(0L)
          scanBound += ((bid.toInt, p))
        }
        Corpus.appendAdmissionDelta(spark, dir, batch)
        ()
      }
      .start()
    input.addData(b0: _*); q.processAllAvailable()
    input.addData(b1: _*); q.processAllAvailable()
    // mid-stream maintenance: absorb the two published segments
    assert(Corpus.compactAdmissionIndex(spark, dir) === 2)
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // b0: all fresh — admitted with no owner
    (0 until 10).foreach { i =>
      assert(verdicts(1000L + i) === ((true, -1L)),
        s"b0 doc ${1000 + i} must be fresh")
    }
    // b1: the loop is closed — b0's arrivals own their signatures now
    (0 until 5).foreach { i =>
      assert(verdicts(2000L + i) === ((false, 1000L + i)),
        s"b1 doc ${2000 + i} must dedup against b0's ${1000 + i} " +
          "(frozen-index gating cannot produce this)")
      assert(verdicts(2100L + i) === ((true, -1L)))
    }
    // b2 (post-compaction): base dups, b0 dups (absorbed), fresh — the
    // compaction changed the layout, not one verdict
    (0 until 3).foreach { i =>
      assert(verdicts(3000L + i) === ((false, i.toLong)),
        s"b2 doc ${3000 + i} must dedup against base doc $i")
      assert(verdicts(3100L + i) === ((false, 1000L + i)),
        s"b2 doc ${3100 + i} must dedup against b0's ${1000 + i} " +
          "through the COMPACTED base")
    }
    (0 until 4).foreach(i => assert(verdicts(3200L + i) === ((true, -1L))))
    // every scan in every folded plan stayed batch-pruned: a 10-doc batch
    // touches ≤ 10 buckets of any 16-partition segment or base
    scanBound.foreach { case (bid, p) =>
      assert(p > 0 && p <= 10,
        s"batch $bid: a folded-plan scan read $p partitions — must be " +
          "bounded by the batch's ≤10 distinct signatures, not the " +
          "16-partition layout")
    }
    info(s"per-batch folded-plan scans (batch -> partitions read): " +
      scanBound.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, xs) => s"b$b=${xs.map(_._2).mkString("+")}" }
        .mkString(" "))
  }

  test("streaming heartbeat monitor: each stall emits once, == batch ledger") {
    import spark.implicits._
    import graft.streaming.Streams.{OpTick, StallOut}
    implicit val sqlCtx = spark.sqlContext
    // t0 ticks at 0, 1s, 91s (90s stall), 92s; t1 at 0, 200s (one stall)
    val feed = Seq(
      OpTick("t0", 1L, 0L), OpTick("t1", 2L, 0L),
      OpTick("t0", 3L, 1000L), OpTick("t0", 4L, 91000L),
      OpTick("t0", 5L, 92000L), OpTick("t1", 6L, 200000L))
    val input = MemoryStream[OpTick]
    val q = Streams.heartbeatStream(input.toDS(), stallMs = 60000L)
      .writeStream.format("memory").queryName("hb_parity")
      .outputMode("append").start()
    feed.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val stalls = spark.table("hb_parity").as[StallOut].collect().toSeq
    q.stop()
    spark.catalog.dropTempView("hb_parity")
    assert(stalls.toSet === Set(
      StallOut("t0", 3L, 4L, 90000L), StallOut("t1", 2L, 6L, 200000L)))
    // fold chop-invariance on the ordered t0 feed
    val t0 = feed.filter(_.tbl == "t0")
    val (s0, o0) = Streams.heartbeatFold(60000L, None, t0)
    for (cut <- 1 until t0.size) {
      val (s1, o1) = Streams.heartbeatFold(60000L, None, t0.take(cut))
      val (s2, o2) = Streams.heartbeatFold(60000L, s1, t0.drop(cut))
      assert(s2 === s0 && (o1 ++ o2) === o0, s"diverged at cut $cut")
    }
    // parity with the batch ledger's stall count on the same ticks
    val ops = feed.map(tk => (tk.tbl, tk.lsn, tk.t)).toDF("tbl", "lsn", "t")
    val batch = graft.cdc.Capture.heartbeatGaps(ops, stallMs = 60000L)
      .collect().map(r => r.getAs[String]("tbl") -> r.getAs[Long]("n_stalls")).toMap
    val streamed = stalls.groupBy(_.tbl).view.mapValues(_.size.toLong).toMap
    assert(streamed === batch.filter(_._2 > 0),
      "streamed stall counts == batch heartbeatGaps n_stalls")
  }

  test("streaming SCD2: closed versions emit once and equal the batch " +
      "history's is_current = false rows") {
    import spark.implicits._
    import graft.streaming.Streams.{ScdIn, ScdOut}
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      ScdIn("t0", "1", 1L, 10L, "insert", setsVal = true, 1.0, setsK = true, 100L),
      ScdIn("t0", "1", 2L, 20L, "update", setsVal = true, 2.0, setsK = false, 0L),
      ScdIn("t0", "1", 3L, 30L, "delete", setsVal = false, 0.0, setsK = false, 0L),
      ScdIn("t0", "1", 4L, 40L, "insert", setsVal = true, 5.0, setsK = false, 0L),
      ScdIn("t1", "2", 5L, 15L, "insert", setsVal = false, 0.0, setsK = true, 7L),
      ScdIn("t1", "2", 6L, 25L, "update", setsVal = true, 9.5, setsK = false, 0L))
    val input = MemoryStream[ScdIn]
    val q = Streams.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2_parity")
      .outputMode("append").start()
    feed.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val closed = spark.table("scd2_parity").as[ScdOut].collect().toSeq
    q.stop()
    spark.catalog.dropTempView("scd2_parity")
    assert(closed.toSet === Set(
      // t0/1: ver 1 closed by the update, ver 2 closed by the delete;
      // ver 4 stays OPEN (current) so it must NOT emit; k does not leak
      // across the delete
      ScdOut("t0", "1", 1L, 10L, 20L, Some(1.0), Some(100L)),
      ScdOut("t0", "1", 2L, 20L, 30L, Some(2.0), Some(100L)),
      // t1/2: the partial insert (k only) closed by the update
      ScdOut("t1", "2", 1L, 15L, 25L, None, Some(7L))))
    // batch parity: the closed feed == is_current = false history rows
    val opsDf = feed.map(o => (o.tbl, o.pk, o.lsn, o.t, o.op,
        o.setsVal, if (o.setsVal) Some(o.v) else None,
        o.setsK, if (o.setsK) Some(o.kk) else None))
      .toDF("tbl", "pk", "lsn", "t", "op", "sets_val", "val", "sets_k", "k")
    val batch = graft.cdc.ApplyEngine.scd2(graft.cdc.CdcOps.withState(opsDf))
      .filter(!org.apache.spark.sql.functions.col("is_current"))
      .collect().map(r => ScdOut(r.getAs[String]("tbl"), r.getAs[String]("pk"),
        r.getAs[Long]("ver"), r.getAs[Long]("valid_from"),
        r.getAs[Long]("valid_to"),
        Option(r.getAs[java.lang.Double]("val")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("k")).map(_.toLong))).toSet
    assert(closed.toSet === batch,
      "streamed closed versions == batch scd2 non-current rows")
    // fold chop-invariance on the ordered t0 feed
    val t0 = feed.filter(_.tbl == "t0")
    val (s0, o0) = Streams.scd2Fold(None, t0)
    for (cut <- 1 until t0.size) {
      val (s1, o1) = Streams.scd2Fold(None, t0.take(cut))
      val (s2, o2) = Streams.scd2Fold(s1, t0.drop(cut))
      assert(s2 === s0 && (o1 ++ o2) === o0, s"diverged at cut $cut")
    }
  }

  test("streaming SCD2 TTL eviction emits the OPEN version with the " +
      "ScdEvictedOpen sentinel, never silently drops it") {
    import spark.implicits._
    import graft.streaming.Streams.{ScdIn, ScdOut, ScdEvictedOpen}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScdIn]
    val q = Streams.scd2Stream(input.toDS(), ttlMs = 200L)
      .writeStream.format("memory").queryName("scd2_ttl")
      .outputMode("append").start()
    // batch 1 opens a version for (t0, 1) — nothing closes it.
    // NOTE: no processAllAvailable here — under ProcessingTimeTimeout the
    // microbatch engine self-triggers continuously (shouldRunAnotherBatch
    // is always true for clock-based timeouts), so noNewData never latches
    // and processAllAvailable blocks forever; TTL tests must POLL the sink.
    input.addData(ScdIn("t0", "1", 1L, 10L, "insert",
      setsVal = true, 1.0, setsK = true, 100L))
    def rows(): Seq[ScdOut] = spark.table("scd2_ttl").as[ScdOut].collect().toSeq
    val deadline = System.currentTimeMillis() + 60000L
    while (rows().isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(100L)
    q.stop()
    val got = rows()
    spark.catalog.dropTempView("scd2_ttl")
    assert(got.contains(
      ScdOut("t0", "1", 1L, 10L, ScdEvictedOpen, Some(1.0), Some(100L))),
      s"evicted open version must reach the append feed; got $got")
    // nothing else may have emitted — the open version closed exactly once
    assert(got.size === 1, s"exactly the eviction row expected; got $got")
  }

  test("transformWithState row apply: parity with the flatMapGroupsWithState form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      ev("tx", 0, 1, "t0", "a", "c", 1, v = Some(1.0), k = Some(10L)),
      ev("tx", 0, 1, "t0", "a", "u", 2, v = Some(2.0)), // partial: val only
      ev("tx", 0, 1, "t0", "a", "u", 3, k = Some(30L)), // partial: k only
      ev("tx", 0, 1, "t1", "b", "c", 4, v = Some(7.0)),
      ev("tx", 0, 1, "t0", "a", "d", 5), // delete: tombstone + state drop
      ev("tx", 0, 1, "t0", "a", "c", 6, v = Some(9.0))) // re-insert from blank
    def run(tag: String,
        mk: MemoryStream[Event] => org.apache.spark.sql.Dataset[RowState]): Seq[RowState] = {
      val input = MemoryStream[Event]
      val q = mk(input)
        .writeStream.format("memory").queryName(tag)
        .outputMode("append").start()
      feed.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(tag).as[RowState].collect().toSeq
        .sortBy(r => (r.tbl, r.pk, r.lastLsn))
      q.stop()
      spark.catalog.dropTempView(tag)
      rows
    }
    withRocksDb {
      val v2 = run("apply_tws",
        in => graft.streaming.StreamsV2.applyStream(in.toDS(), ttlMs = 0L))
      val v1 = run("apply_v1",
        in => Streams.applyStream(in.toDS(), ttlMs = 0L))
      assert(v2 === v1, "the two state APIs must emit identical post-images")
      // the delete reset the image: the re-insert restarts at version 1
      // with no k carry-over
      val reborn = v2.filter(r => r.pk == "a" && r.lastLsn == 6L)
      assert(reborn.map(r => (r.version, r.valV, r.kV, r.deleted)) ===
        Seq((1L, Some(9.0), None, false)))
    }
  }

  test("transformWithState scd2: parity with the flatMapGroupsWithState form") {
    import spark.implicits._
    import graft.streaming.Streams.{ScdIn, ScdOut}
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      ScdIn("t0", "1", 1L, 10L, "insert", setsVal = true, 1.0, setsK = true, 100L),
      ScdIn("t0", "1", 2L, 20L, "update", setsVal = true, 2.0, setsK = false, 0L),
      ScdIn("t0", "1", 3L, 30L, "delete", setsVal = false, 0.0, setsK = false, 0L),
      ScdIn("t0", "1", 4L, 40L, "insert", setsVal = true, 5.0, setsK = false, 0L),
      ScdIn("t1", "2", 5L, 15L, "insert", setsVal = false, 0.0, setsK = true, 7L),
      ScdIn("t1", "2", 6L, 25L, "update", setsVal = true, 9.5, setsK = false, 0L))
    def run(tag: String,
        mk: MemoryStream[ScdIn] => org.apache.spark.sql.Dataset[ScdOut]): Set[ScdOut] = {
      val input = MemoryStream[ScdIn]
      val q = mk(input)
        .writeStream.format("memory").queryName(tag)
        .outputMode("append").start()
      feed.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(tag).as[ScdOut].collect().toSet
      q.stop()
      spark.catalog.dropTempView(tag)
      rows
    }
    withRocksDb {
      val v2 = run("scd2_tws", in => graft.streaming.StreamsV2.scd2Stream(in.toDS()))
      val v1 = run("scd2_v1", in => Streams.scd2Stream(in.toDS()))
      assert(v2 === v1, "the two state APIs must emit identical closed versions")
      assert(v2 === Set(
        ScdOut("t0", "1", 1L, 10L, 20L, Some(1.0), Some(100L)),
        ScdOut("t0", "1", 2L, 20L, 30L, Some(2.0), Some(100L)),
        ScdOut("t1", "2", 1L, 15L, 25L, None, Some(7L))))
    }
  }

  test("transformWithState scd2 TTL: the timer path emits the evicted OPEN " +
      "version with the ScdEvictedOpen sentinel") {
    import spark.implicits._
    import graft.streaming.Streams.{ScdIn, ScdOut, ScdEvictedOpen}
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[ScdIn]
      val q = graft.streaming.StreamsV2.scd2Stream(input.toDS(), ttlMs = 200L)
        .writeStream.format("memory").queryName("scd2_ttl_tws")
        .outputMode("append").start()
      input.addData(ScdIn("t0", "1", 1L, 10L, "insert",
        setsVal = true, 1.0, setsK = true, 100L))
      // V2 nudge discipline (see the growth TTL test): no
      // processAllAvailable with live processing-time timers — poll the
      // sink and drive batches with an unrelated key's ops so a batch
      // runs after the TTL expires, firing the due timer. The nudge key's
      // own evicted rows are filtered out of every assertion.
      def t0rows(): Seq[ScdOut] = spark.table("scd2_ttl_tws").as[ScdOut]
        .collect().toSeq.filter(_.tbl == "t0")
      val deadline = System.currentTimeMillis() + 90000L
      var nudge = 1000L
      while (t0rows().isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250L)
        nudge += 1
        input.addData(ScdIn("t9", "z", nudge, nudge, "insert",
          setsVal = true, 0.0, setsK = false, 0L))
      }
      q.stop()
      val got = t0rows()
      spark.catalog.dropTempView("scd2_ttl_tws")
      assert(got === Seq(
        ScdOut("t0", "1", 1L, 10L, ScdEvictedOpen, Some(1.0), Some(100L))),
        s"eviction must emit the open version exactly once; got $got")
    }
  }

  test("transformWithState heartbeat: parity with the flatMapGroupsWithState form") {
    import spark.implicits._
    import graft.streaming.Streams.{OpTick, StallOut}
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      OpTick("t0", 1L, 0L), OpTick("t1", 2L, 0L),
      OpTick("t0", 3L, 1000L), OpTick("t0", 4L, 91000L),
      OpTick("t0", 5L, 92000L), OpTick("t1", 6L, 200000L))
    def run(tag: String,
        mk: MemoryStream[OpTick] => org.apache.spark.sql.Dataset[StallOut]): Set[StallOut] = {
      val input = MemoryStream[OpTick]
      val q = mk(input)
        .writeStream.format("memory").queryName(tag)
        .outputMode("append").start()
      feed.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(tag).as[StallOut].collect().toSet
      q.stop()
      spark.catalog.dropTempView(tag)
      rows
    }
    withRocksDb {
      val v2 = run("hb_tws",
        in => graft.streaming.StreamsV2.heartbeatStream(in.toDS(), stallMs = 60000L))
      val v1 = run("hb_v1",
        in => Streams.heartbeatStream(in.toDS(), stallMs = 60000L))
      assert(v2 === v1, "the two state APIs must emit identical stalls")
      assert(v2 === Set(
        StallOut("t0", 3L, 4L, 90000L), StallOut("t1", 2L, 6L, 200000L)))
    }
  }

  test("transformWithState budget admission: parity with the " +
      "flatMapGroupsWithState form") {
    import spark.implicits._
    import graft.streaming.Streams.{BudgetIn, BudgetOut}
    implicit val sqlCtx = spark.sqlContext
    val feed = Seq(
      BudgetIn("web", 1L, 800L), BudgetIn("web", 2L, 900L),
      BudgetIn("books", 3L, 1500L), BudgetIn("web", 4L, 400L),
      BudgetIn("books", 5L, 600L), BudgetIn("web", 6L, 100L))
    def run(tag: String,
        mk: MemoryStream[BudgetIn] => org.apache.spark.sql.Dataset[BudgetOut]): Set[BudgetOut] = {
      val input = MemoryStream[BudgetIn]
      val q = mk(input)
        .writeStream.format("memory").queryName(tag)
        .outputMode("append").start()
      feed.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(tag).as[BudgetOut].collect().toSet
      q.stop()
      spark.catalog.dropTempView(tag)
      rows
    }
    withRocksDb {
      val v2 = run("budget_tws",
        in => graft.streaming.StreamsV2.budgetAdmissionStream(in.toDS(), ttlMs = 0L))
      val v1 = run("budget_v1",
        in => Streams.budgetAdmissionStream(in.toDS(), ttlMs = 0L))
      assert(v2 === v1, "the two state APIs must emit identical verdicts")
      // the cut happens mid-source: web doc 4 crosses 2000 and is refused
      assert(v2.find(_.docId == 4L).get.admitted === false)
      assert(v2.find(_.docId == 2L).get.admitted === true)
      assert(v2.find(_.docId == 5L).get.admitted === false)
    }
  }
}
