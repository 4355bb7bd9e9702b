package graft

import org.apache.spark.sql.functions._

import graft.cdc.{ApplyEngine, Capture, CdcOps, Evaluate}

/** Sensitivity of the harness report (`harness/verifier/index.js:169-205`):
  * a lossless lane must pass, and every corruption class — dropped events,
  * wrong final state — must flip the corresponding counters and `pass`.
  * (A gate that cannot fail verifies nothing.)
  */
class EvaluateSpec extends SparkSpec {

  private def report(actualTail: Long, corruptState: Boolean): Map[String, Long] = {
    val state = CdcOps.withState(CdcOps.ops(spark, "/root/testdata/sf0.001")).persist()
    val lane = Capture.log(state)
    val actual = lane
      .filter(col("lsn") <= actualTail) // actualTail = MaxValue → intact lane
      .select(col("emitted_ts").as("time"), col("lsn").as("ord"),
        col("op_code"), col("tbl"), col("pk"))
    val replayed0 = ApplyEngine.replayEvents(lane, "lsn")
    val replayed =
      if (corruptState) replayed0.withColumn("val", col("val") + 1.0)
      else replayed0
    val out = Evaluate.lane(state, state, actual, replayed).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("value")).toMap
    state.unpersist()
    out
  }

  test("intact log lane passes with zero missing/extra/mismatches") {
    val m = report(Long.MaxValue, corruptState = false)
    assert(m("missing") === 0L && m("extra") === 0L &&
      m("state_mismatches") === 0L && m("ordering_issues") === 0L)
    assert(m("pass") === 1L)
    assert(m("deletes_captured") === m("deletes_expected"))
  }

  test("dropped events flip missing and fail the gate") {
    val intact = report(Long.MaxValue, corruptState = false)
    val m = report(0L, corruptState = false) // every event dropped
    assert(m("missing") === intact("matched") + intact("missing"))
    assert(m("matched") === 0L)
    assert(m("pass") === 0L)
  }

  test("corrupted destination state flips state_mismatches and fails the gate") {
    val m = report(Long.MaxValue, corruptState = true)
    assert(m("state_mismatches") > 0L)
    assert(m("pass") === 0L)
    assert(m("missing") === 0L, "lane diff unaffected by state corruption")
  }
}
