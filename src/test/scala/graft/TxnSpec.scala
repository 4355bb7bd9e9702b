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
    assert(first.getAs[Int]("apply_order") === 1)
    val second = txns(1)
    assert(second.getAs[Long]("n_events") === 2L)
    assert(second.getAs[Long]("commit_ts") === 310L)
  }
}
