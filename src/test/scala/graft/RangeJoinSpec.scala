package graft

import graft.operators.RangeJoin

/** Banded interval-join semantics on planted rows: both-ends-inclusive
  * window, band-boundary crossing, key isolation, and the no-nested-loop
  * plan-shape claim (the whole point of the banding rewrite).
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    (1L, 100L, "l1"), (1L, 995L, "l2"), // l2's window straddles a band edge
    (2L, 100L, "l3"))
    .toDF("k", "lt", "l_id")

  private val right = Seq(
    (1L, 99L, "r0"), // 1ms before l1 — must not match (gap < 0)
    (1L, 100L, "r1"), // gap 0 — inclusive lower bound
    (1L, 110L, "r2"),
    (1L, 1000L, "r3"), // next band for l2 (width 10): bands 99 vs 100
    (1L, 1005L, "r4"), // gap 10 from l2 — inclusive upper bound
    (1L, 1006L, "r5"), // gap 11 from l2 — out of window
    (2L, 105L, "r6")) // only visible to key 2
    .toDF("k", "rt", "r_id")

  test("pairs within [0, W] across band boundaries; nothing outside") {
    val out = RangeJoin.within(left, right, Seq("k"), "lt", "rt", 10L)
      .select("l_id", "r_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .sorted
    assert(out === Array(
      ("l1", "r1"), ("l1", "r2"), // gaps 0 and 10 (both ends inclusive)
      ("l2", "r3"), ("l2", "r4"), // band 99 → 100, gaps 5 and 10
      ("l3", "r6"))) // key isolation: l3 never sees key-1 rows
  }

  test("no duplicate pairs from the two-band probe when both land in one join") {
    // l at a band edge: probes bands (10, 11); r at the same ts is in band 10
    // only — the pair must appear exactly once.
    val l = Seq((1L, 100L, "edge")).toDF("k", "lt", "l_id")
    val r = Seq((1L, 100L, "same")).toDF("k", "rt", "r_id")
    val out = RangeJoin.within(l, r, Seq("k"), "lt", "rt", 10L).collect()
    assert(out.length === 1)
  }

  test("contract errors are clear requires, not analysis exceptions") {
    // reserved working column present → reject instead of corrupt
    intercept[IllegalArgumentException] {
      RangeJoin.within(left.withColumn("_band", left("lt")), right,
        Seq("k"), "lt", "rt", 10L)
    }
    // withinStream: same-name non-key clash must fail the same contract
    // require as within, not an opaque ambiguous-reference error
    val clashL = left.withColumnRenamed("l_id", "v")
    val clashR = right.withColumnRenamed("r_id", "v")
    intercept[IllegalArgumentException] {
      RangeJoin.withinStream(clashL, clashR, Seq("k"), "lt", "rt", 10L)
    }
    // withinStream: identical ts names collide in the derived _<ts>_evt
    intercept[IllegalArgumentException] {
      RangeJoin.withinStream(left.withColumnRenamed("lt", "t"),
        right.withColumnRenamed("rt", "t"), Seq("k"), "t", "t", 10L)
    }
  }

  test("streaming form: native stream-stream interval join == batch banding") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, String)]
    val rIn = MemoryStream[(Long, Long, String)]
    val q = RangeJoin.withinStream(
        lIn.toDF().toDF("k", "lt", "l_id"),
        rIn.toDF().toDF("k", "rt", "r_id"),
        Seq("k"), "lt", "rt", 10L, watermarkDelayMs = 10000L)
      .writeStream.format("memory").queryName("range_stream")
      .outputMode("append").start()
    // two batches with interleaved arrival — pairs across batches must form
    lIn.addData((1L, 100L, "l1"), (1L, 995L, "l2"))
    rIn.addData((1L, 99L, "r0"), (1L, 100L, "r1"))
    q.processAllAvailable()
    lIn.addData((2L, 100L, "l3"))
    rIn.addData((1L, 110L, "r2"), (1L, 1000L, "r3"), (1L, 1005L, "r4"),
      (1L, 1006L, "r5"), (2L, 105L, "r6"))
    q.processAllAvailable()
    val streamed = spark.table("range_stream").select("l_id", "r_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    q.stop()
    val batch = RangeJoin.within(left, right, Seq("k"), "lt", "rt", 10L)
      .select("l_id", "r_id")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamed === batch, "stream-stream interval join == batch banding")
  }

  test("plan: equality join on (key, band) — no nested-loop, no cartesian") {
    val plan = RangeJoin.within(left, right, Seq("k"), "lt", "rt", 10L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banding must keep this an equality join:\n$plan")
  }
}
