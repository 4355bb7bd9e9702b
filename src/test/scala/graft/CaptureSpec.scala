package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.{ApplyEngine, Capture, CdcOps, Diff}

/** Deterministic micro-scenarios for the three capture engines, checking the
  * reference semantics that are easy to get "accidentally too correct":
  * polling must LOSE intermediates and SUPPRESS deletes
  * (`sim/engines/PollingEngine.ts:59-84`, `src/modes/queryBased.ts:286-288`).
  */
class CaptureSpec extends SparkSpec {

  import testutil.Scenarios

  /** 5 ops on one key, first three inside poll window [0,1000). */
  private lazy val tinyOps: DataFrame = Scenarios.opsDf(spark, Seq(
    // (t, tbl, pk, op, setsVal, val, setsK, k)
    (100L, "t0", "1", "insert", true, Some(1.0), true, Some(10L)),
    (300L, "t0", "1", "update", true, Some(2.0), false, None),
    (700L, "t0", "1", "update", false, None, true, Some(20L)),
    (1500L, "t0", "1", "delete", false, None, false, None),
    (2500L, "t0", "1", "insert", true, Some(5.0), true, Some(50L))))

  test("polling sees only the latest state per window (intermediates lost)") {
    val emissions = Capture.poll(CdcOps.withState(tinyOps), pollIntervalMs = 1000L)
      .orderBy("poll_window").collect()
    assert(emissions.length === 3) // windows 0, 1, 2 — not 5 events
    val w0 = emissions(0)
    // sim PollingEngine semantics (`PollingEngine.ts:59-84`): kind comes from
    // the ROW version at poll time — the window's latest op is the 3rd op on
    // the key, so the poller reports an update even though it never saw a 'c'
    assert(w0.getAs[String]("op_code") === "u")
    assert(w0.getAs[Double]("after_val") === 2.0) // op2's val survives
    assert(w0.getAs[Long]("after_k") === 20L) // op3's k survives
    assert(w0.getAs[Long]("version") === 3L)
  }

  test("polling without soft deletes suppresses and counts the delete") {
    val state = CdcOps.withState(tinyOps)
    val noSoft = Capture.poll(state, 1000L, includeSoftDeletes = false).collect()
    assert(!noSoft.exists(_.getAs[String]("op_code") == "d"))
    val loss = Capture.pollLoss(state, 1000L).collect().head
    assert(loss.getAs[Long]("missed_deletes") === 1L)
    assert(loss.getAs[Long]("lost_intermediates") === 2L) // ops 1,2 overwritten in w0
  }

  test("log capture is lossless with correct before/after images") {
    val lane = Capture.log(CdcOps.withState(tinyOps), fetchIntervalMs = 100L)
      .orderBy("lsn").collect()
    assert(lane.length === 5)
    val del = lane(3)
    assert(del.getAs[String]("op_code") === "d")
    assert(del.getAs[Double]("before_val") === 2.0) // state at delete time
    assert(del.getAs[Long]("before_k") === 20L)
    assert(del.isNullAt(del.fieldIndex("after_val")))
    val reinsert = lane(4)
    assert(reinsert.isNullAt(reinsert.fieldIndex("before_val")), "no leak across delete")
    assert(reinsert.getAs[Double]("after_val") === 5.0)
    // emission strictly after commit, within one fetch interval
    lane.foreach { r =>
      val lag = r.getAs[Long]("lag_ms")
      assert(lag > 0 && lag <= 100)
    }
  }

  test("trigger capture stamps commit overhead and audit write amplification") {
    val lane = Capture.trigger(CdcOps.withState(tinyOps),
      triggerOverheadMs = 5L, extractIntervalMs = 500L).orderBy("audit_seq").collect()
    assert(lane.length === 5)
    lane.zip(Seq(100L, 300L, 700L, 1500L, 2500L)).foreach { case (r, t) =>
      assert(r.getAs[Long]("commit_ts") === t + 5)
      val lag = r.getAs[Long]("lag_ms")
      assert(lag > 5 && lag <= 505)
    }
  }

  test("snapshot phase emits one read event per seed row") {
    import spark.implicits._
    val seed = Seq((1L, "alice"), (2L, "bob")).toDF("id", "name")
    val snap = Capture.snapshot(seed, "users", "id", Seq("name")).collect()
    assert(snap.length === 2)
    assert(snap.forall(_.getAs[String]("op") == "r"))
    assert(snap.forall(_.getAs[String]("tx_id") == "snapshot-0"))
  }

  test("event replay of the log lane reproduces the merge-fold state") {
    val truth = ApplyEngine.applyState(tinyOps)
    val replayed = ApplyEngine.replayEvents(
      Capture.log(CdcOps.withState(tinyOps)), "lsn")
    val diff = Diff.diffStates(truth, replayed, Seq("val", "k"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff === Map("match" -> 1L))
  }

  test("snapshot→tail: offsets are continuous and the replay equals the full-history state") {
    // real op stream so the cut lands mid-history across keys/tables
    val o = CdcOps.ops(spark, "/root/testdata/sf0.001")
    val log = SparkEntry.queries("cdc_snapshot_tail")(spark, "/root/testdata/sf0.001")
      .persist()
    try {
      val offsets = log.select("offset").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      assert(offsets.head === 1L && offsets.last === offsets.length.toLong,
        "offsets must be dense 1..N across the snapshot/tail boundary")
      val phaseEdge = log.groupBy("phase").agg(
        min("offset").as("lo"), max("offset").as("hi")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(phaseEdge("snapshot")._2 + 1 === phaseEdge("tail")._1,
        "tail offsets must continue exactly where the snapshot stopped")
      // replaying snapshot ∪ tail by offset reproduces the full-history fold
      val replayed = ApplyEngine.replayEvents(log, "offset",
        afterValCol = "val", afterKCol = "k")
      val truth = ApplyEngine.applyState(o)
      val diff = Diff.diffStates(truth, replayed, Seq("val", "k"))
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(diff.keySet === Set("match"),
        s"snapshot+tail replay diverged from the direct fold: $diff")
    } finally log.unpersist()
  }

  test("incremental snapshot: chunk watermarks supersede chunk rows the log covers") {
    // cut = (0+4000)/2 = 2000; live at cut: pks 1,2,3 (4 deleted before cut)
    val o = Scenarios.opsDf(spark, Seq(
      (0L, "t0", "1", "insert", true, Some(1.0), true, Some(10L)),
      (100L, "t0", "2", "insert", true, Some(2.0), true, Some(20L)),
      (200L, "t0", "3", "insert", true, Some(3.0), true, Some(30L)),
      (300L, "t0", "4", "insert", true, Some(4.0), true, Some(40L)),
      (400L, "t0", "4", "delete", false, None, false, None),
      (2600L, "t0", "1", "update", true, Some(7.0), false, None),
      (2700L, "t0", "3", "update", true, Some(8.0), false, None),
      (3000L, "t0", "2", "update", true, Some(9.0), false, None),
      (4000L, "t0", "1", "update", true, Some(9.9), false, None)))
    val st = CdcOps.withState(o)
    // chunkSize 2: chunk0 = {1,2}, chunk1 = {3}; n_chunks=2 ⇒
    // step = (4000-2000) div 3 = 666 ⇒ hw0=2666, hw1=3332.
    // pk1's 2600-update lands in (2000,2666] ⇒ superseded in chunk0;
    // pk2's 3000-update is PAST hw0 ⇒ chunk0 already read it — emitted;
    // pk3's 2700-update lands in (2000,3332] ⇒ superseded in chunk1.
    val out = Capture.incrementalSnapshot(st, chunkSize = 2)
      .orderBy("chunk").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_keys") === 2L)
    assert(out(0).getAs[Long]("n_emitted") === 1L)
    assert(out(0).getAs[Long]("n_superseded") === 1L)
    assert(out(0).getAs[Long]("hw") === 2666L)
    assert(out(0).getAs[Long]("sum_k") === 20L)          // pk2 only
    assert(out(0).getAs[Long]("sum_val_q") === 2000L)
    assert(out(1).getAs[Long]("n_keys") === 1L)
    assert(out(1).getAs[Long]("n_emitted") === 0L)
    assert(out(1).getAs[Long]("n_superseded") === 1L)
    assert(out(1).getAs[Long]("hw") === 3332L)
    // one big chunk ⇒ hw=3000, nothing in (2000,3000] except 2600/2700/3000
    // updates — all three keys superseded, nothing emitted
    val one = Capture.incrementalSnapshot(st, chunkSize = 64).collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("n_keys") === 3L)
    assert(one.head.getAs[Long]("n_superseded") === 3L)
  }

  test("incremental snapshot: chunk plan is a pure function of the key set (resume-safe)") {
    // a restarted snapshot must recompute the SAME chunk boundaries and
    // watermarks, or completed-chunk bookkeeping is worthless — the ledger
    // must be invariant to physical layout (the restart never sees the
    // original partitioning)
    val o = Scenarios.propertyOps(spark, Seq(3L, 5L))
    val a = Capture.incrementalSnapshot(CdcOps.withState(o), chunkSize = 8)
      .orderBy("chunk").collect().map(_.toSeq)
    val b = Capture.incrementalSnapshot(
      CdcOps.withState(o.repartition(13)), chunkSize = 8)
      .orderBy("chunk").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("incremental snapshot: emitted ∪ window-covered keys = full key scope") {
    // on a realistic feed the dedup must drop EXACTLY the keys the log
    // covers in-window — no key vanishes, none is double-covered
    val o = Scenarios.propertyOps(spark, Seq(7L, 11L))
    val st = CdcOps.withState(o)
    val ledger = Capture.incrementalSnapshot(st, chunkSize = 8).collect()
    ledger.foreach { r =>
      assert(r.getAs[Long]("n_emitted") + r.getAs[Long]("n_superseded")
        === r.getAs[Long]("n_keys"))
    }
  }

  test("watermark curve: drop rule is t < max_live_t - delay, per delay") {
    val o = Scenarios.opsDf(spark, Seq(
      (1000L, "t0", "1", "insert", true, Some(1.0), false, None),
      (2000L, "t0", "2", "insert", true, Some(2.0), false, None),
      (100L, "t0", "17", "insert", true, Some(3.0), false, None),
      (2500L, "t0", "34", "insert", true, Some(4.0), false, None)))
    val curve = Capture.watermarkCurve(o).orderBy("delay_ms").collect()
      .map(r => (r.getAs[Long]("delay_ms"), r.getAs[Long]("n_dropped")))
    // live watermark base 2000: t=100 is dropped at delay 0 and 1000
    // (100 < 2000−1000), survives once the allowed lateness covers it
    assert(curve.toSeq === Seq((0L, 1L), (1000L, 1L), (10000L, 0L), (60000L, 0L)))
  }

  test("backfill audit: lateness vs the live maximum, per table") {
    val o = Scenarios.opsDf(spark, Seq(
      (1000L, "t0", "1", "insert", true, Some(1.0), false, None),
      (2000L, "t0", "2", "insert", true, Some(2.0), false, None),
      // backfill keys (pk % 17 == 0): one a year "old", one current
      (100L, "t0", "17", "insert", true, Some(3.0), false, None),
      (2500L, "t0", "34", "insert", true, Some(4.0), false, None)))
    val out = Capture.backfillAudit(o).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_live") === 2L)
    assert(r.getAs[Long]("n_backfill") === 2L)
    assert(r.getAs[Long]("n_late") === 1L)               // only the t=100 row
    assert(r.getAs[Long]("max_skew_ms") === 1900L)       // 2000 − 100
  }

  test("compaction audit: latest-per-key retention, deletes become tombstones") {
    val ops = Scenarios.opsDf(spark, Seq(
      // t0/a: 3 versions, last is an update -> one live record
      (100L, "t0", "a", "insert", true, Some(1.0), false, None),
      (200L, "t0", "a", "update", true, Some(2.0), false, None),
      (300L, "t0", "a", "update", true, Some(3.0), false, None),
      // t0/b: insert then delete -> tombstone
      (150L, "t0", "b", "insert", true, Some(9.0), false, None),
      (250L, "t0", "b", "delete", false, None, false, None),
      // t1/c: single insert -> live, ratio 1.0
      (120L, "t1", "c", "insert", true, Some(4.0), false, None)))
    val out = Capture.compactionAudit(ops).orderBy("tbl").collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("n_live"),
        r.getAs[Long]("n_tombstones"), r.getAs[Double]("compaction_ratio"),
        r.getAs[Double]("avg_versions")))
    assert(out.toSeq === Seq(
      ("t0", 5L, 2L, 1L, 1L, 0.4, 2.5),
      ("t1", 1L, 1L, 1L, 0L, 1.0, 1.0)))
  }

  test("chain integrity: the three violation classes, counted per table") {
    val ops = Scenarios.opsDf(spark, Seq(
      // t0/a: legal lifecycle — no violations
      (100L, "t0", "a", "insert", true, Some(1.0), false, None),
      (200L, "t0", "a", "update", true, Some(2.0), false, None),
      (300L, "t0", "a", "delete", false, None, false, None),
      (400L, "t0", "a", "insert", true, Some(3.0), false, None),
      // t0/b: opens with an update -> update_without_row
      (150L, "t0", "b", "update", true, Some(9.0), false, None),
      // t1/c: double insert, then delete-after-delete
      (100L, "t1", "c", "insert", true, Some(1.0), false, None),
      (200L, "t1", "c", "insert", true, Some(2.0), false, None),
      (300L, "t1", "c", "delete", false, None, false, None),
      (400L, "t1", "c", "delete", false, None, false, None)))
    val out = Capture.chainIntegrity(ops).orderBy("tbl").collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[Long]("n_ops"),
        r.getAs[Long]("n_double_insert"), r.getAs[Long]("n_update_without_row"),
        r.getAs[Long]("n_delete_without_row"), r.getAs[Double]("violation_frac")))
    assert(out.toSeq === Seq(
      ("t0", 5L, 0L, 1L, 0L, 0.2),
      ("t1", 4L, 1L, 0L, 1L, 0.5)))
  }

  test("heartbeat gaps: stalls counted above the threshold, exact mean") {
    val ops = Scenarios.opsDf(spark, Seq(
      (0L, "t0", "a", "insert", true, Some(1.0), false, None),
      (1000L, "t0", "b", "insert", true, Some(1.0), false, None),
      (91000L, "t0", "a", "update", true, Some(2.0), false, None), // 90 s stall
      (92000L, "t0", "b", "update", true, Some(2.0), false, None)))
    val out = Capture.heartbeatGaps(ops, stallMs = 60000L).collect().head
    assert(out.getAs[Long]("n_gaps") === 3L)
    assert(out.getAs[Long]("n_stalls") === 1L)
    assert(out.getAs[Long]("max_gap_ms") === 90000L)
    assert(out.getAs[Double]("mean_gap_ms") === 92000.0 / 3.0)
  }

  test("tombstone GC keys on the LAST op; reborn keys never GC-eligible") {
    val day = 86400000L
    val ops = Scenarios.opsDf(spark, Seq(
      // t0/a: deleted long ago, never reborn -> GC-eligible tombstone
      (0L, "t0", "a", "insert", true, Some(1.0), false, None),
      (100L, "t0", "a", "delete", false, None, false, None),
      // t0/b: deleted then REBORN -> live, counted reborn, not a tombstone
      (200L, "t0", "b", "insert", true, Some(1.0), false, None),
      (300L, "t0", "b", "delete", false, None, false, None),
      (400L, "t0", "b", "insert", true, Some(2.0), false, None),
      // t0/c: fresh tombstone inside retention -> kept
      (2 * day, "t0", "c", "insert", true, Some(1.0), false, None),
      (2 * day + 100L, "t0", "c", "delete", false, None, false, None),
      // high-water setter
      (2 * day + 200L, "t0", "d", "insert", true, Some(1.0), false, None)))
    val out = Capture.tombstoneGc(ops, retentionMs = day).collect().head
    assert(out.getAs[Long]("n_keys") === 4L)
    assert(out.getAs[Long]("n_tombstones") === 2L)   // a and c
    assert(out.getAs[Long]("n_gc_eligible") === 1L)  // only a is past W
    assert(out.getAs[Long]("n_reborn") === 1L)       // b
    assert(out.getAs[Double]("reclaimable_frac") === 0.25)
  }
}
