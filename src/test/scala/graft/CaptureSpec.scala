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
}
