package graft

import graft.cdc.Txn
import graft.testutil.Scenarios

/** Batch txn assembly + ordered apply log (`src/changefeed/model.ts:169-244`). */
class TxnSpec extends SparkSpec {

  test("assemble groups ops, stamps commit ts, orders by (commitTs, lsn)") {
    val ops = Scenarios.opsDf(spark, Seq(
      (100L, "t0", "1", "insert", true, Some(1.0), true, Some(1L)),
      (110L, "t1", "2", "insert", true, Some(2.0), true, Some(2L)),
      (120L, "t0", "3", "insert", true, Some(3.0), true, Some(3L)),
      (200L, "t0", "1", "update", true, Some(4.0), false, None),
      (210L, "t2", "2", "delete", false, None, false, None)))
    val txns = Txn.assemble(ops, size = 3, commitDelayMs = 100L)
      .orderBy("apply_order").collect()
    assert(txns.length === 2)
    val first = txns(0)
    assert(first.getAs[String]("tx_id") === "tx-0")
    assert(first.getAs[Long]("n_events") === 3L)
    assert(first.getAs[Long]("n_tables") === 2L) // multi-table txn
    assert(first.getAs[Long]("commit_ts") === 220L) // max(t)+100
    assert(first.getAs[Long]("apply_order") === 1L)
    val second = txns(1)
    assert(second.getAs[Long]("n_events") === 2L)
    assert(second.getAs[Long]("commit_ts") === 310L)
  }

  test("commit-floor: a late txn holds back every commit-later txn (atomic under drift)") {
    import spark.implicits._
    val txns = Seq(
      // tx1 commits first but its last event is drifted until t=500
      ("tx-1", 100L, 1L, 500L),
      ("tx-2", 200L, 4L, 250L), // ready before tx-1 — must still wait
      ("tx-3", 300L, 7L, 600L)
    ).toDF("tx_id", "commit_ts", "first_lsn", "ready_at")
    val out = graft.cdc.Txn.applyOnCommit(txns).orderBy("apply_order").collect()
    assert(out.map(_.getAs[Long]("applied_at")).toSeq === Seq(500L, 500L, 600L))
    assert(out(1).getAs[Long]("held_ms") === 250L, "tx-2 held behind drifted tx-1")
    assert(out.map(_.getAs[String]("tx_id")).toSeq === Seq("tx-1", "tx-2", "tx-3"))
  }
}
