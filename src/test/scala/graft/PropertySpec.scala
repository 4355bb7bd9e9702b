package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.{ApplyEngine, Capture, CdcOps, Diff}
import graft.testutil.Scenarios

/** The reference's property-test invariants (`sim/tests/property-tests.mjs:
  * 207-243`) over 24 seeded random scenarios, run with the test-config
  * intervals (poll=200, extract=150+6, fetch=25, `:140-142`):
  *
  *   - trigger/log: zero missing, zero extra, zero ordering issues;
  *   - polling: zero extra; captured deletes ≤ expected;
  *   - lag bounds: log ≤ fetch interval, trigger ≤ extract + overhead;
  *   - event ts non-decreasing per lane in delivery order.
  *
  * All 24 scenarios are unioned into one DataFrame (table = seed) so each
  * invariant is a single distributed pass.
  */
class PropertySpec extends SparkSpec {

  // the reference's exact seed set (`sim/tests/seeds.json`)
  private val seeds: Seq[Long] = (11L to 34L)
  private lazy val ops: DataFrame = Scenarios.propertyOps(spark, seeds).cache()
  private lazy val state: DataFrame = CdcOps.withState(ops)

  private def laneStatusCounts(actual: DataFrame, orderCol: String): Map[String, Long] = {
    val expected = state.select(
      concat_ws("::", col("tbl"), CdcOps.opCode(col("op")), col("pk")).as("key"),
      col("t").as("time"), col("lsn").as("ord"))
    Diff.laneTotals(Diff.lanePairs(expected, actual, orderCol))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("log lane: complete, no extras, ordered, lag within fetch interval") {
    val lane = Capture.log(state, fetchIntervalMs = 25L)
    val counts = laneStatusCounts(
      lane.select(
        concat_ws("::", col("tbl"), col("op_code"), col("pk")).as("key"),
        col("emitted_ts").as("time"), col("lsn").as("ord")), "ord")
    assert(counts.getOrElse("missing", 0L) === 0L)
    assert(counts.getOrElse("extra", 0L) === 0L)
    assert(counts("matched") === ops.count())

    val inversions = Diff.orderingInversions(
      lane, Seq("tbl"), Seq(col("emitted_ts"), col("lsn")), "lsn")
      .filter(col("inverted")).count()
    assert(inversions === 0L)

    val maxLag = lane.agg(max("lag_ms")).collect().head.getLong(0)
    assert(maxLag <= 25L)
  }

  test("trigger lane: complete, no extras, ordered, lag bounded") {
    val lane = Capture.trigger(state, triggerOverheadMs = 6L, extractIntervalMs = 150L)
    val counts = laneStatusCounts(
      lane.select(
        concat_ws("::", col("tbl"), col("op_code"), col("pk")).as("key"),
        col("emitted_ts").as("time"), col("audit_seq").as("ord")), "ord")
    assert(counts.getOrElse("missing", 0L) === 0L)
    assert(counts.getOrElse("extra", 0L) === 0L)

    val inversions = Diff.orderingInversions(
      lane, Seq("tbl"), Seq(col("emitted_ts"), col("audit_seq")), "audit_seq")
      .filter(col("inverted")).count()
    assert(inversions === 0L)

    val maxLag = lane.agg(max("lag_ms")).collect().head.getLong(0)
    assert(maxLag <= 156L) // extract interval + trigger overhead
  }

  test("polling lane: no extras; deletes captured ≤ expected; none missed silently") {
    val lane = Capture.poll(state, pollIntervalMs = 200L)
    val counts = laneStatusCounts(
      lane.select(
        concat_ws("::", col("tbl"), col("op_code"), col("pk")).as("key"),
        col("poll_ts").as("time"), col("src_lsn").as("ord")), "ord")
    assert(counts.getOrElse("extra", 0L) === 0L)

    val expectedDeletes = ops.filter(col("op") === "delete").count()
    val capturedDeletes = lane.filter(col("op_code") === "d").count()
    assert(capturedDeletes <= expectedDeletes)

    // suppressed-delete accounting closes: captured(+soft) + overwritten == expected
    val overwrittenDeletes = state
      .withColumn("poll_window", expr("t div 200"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("tbl", "pk", "poll_window").orderBy(col("lsn").desc)))
      .filter(col("rn") > 1 && col("op") === "delete").count()
    assert(capturedDeletes + overwrittenDeletes === expectedDeletes)

    val maxLag = lane.select(max(col("poll_ts") - col("src_t"))).collect().head.getLong(0)
    assert(maxLag <= 200L)
  }

  test("lane event time is non-decreasing in delivery order") {
    val lane = Capture.log(state, fetchIntervalMs = 25L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("tbl").orderBy("emitted_ts", "lsn")
    val violations = lane
      .withColumn("prev_ts", lag("commit_ts", 1).over(w))
      .filter(col("prev_ts").isNotNull && col("commit_ts") < col("prev_ts"))
      .count()
    assert(violations === 0L)
  }

  test("merge-fold state equals window-replay state on every scenario") {
    val truth = ApplyEngine.applyState(ops)
    val replayed = ApplyEngine.replayEvents(Capture.log(state), "lsn")
    val statuses = Diff.diffStates(truth, replayed, Seq("val", "k"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.keySet === Set("match"))
  }
}
