package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Sessions

/** Session-window semantics on planted event times (raw-nanos `ts`, the
  * events-table schema): gap merge, boundary exactness (end = last+gap),
  * and per-user isolation.
  */
class SessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(user: Long, tMs: Long*) =
    tMs.map(t => (user, t * 1000000L))

  test("events within the gap merge; a gap break starts a new session") {
    val gap = 1000L // 1s for the test
    val events = (ev(1L, 0L, 500L, 1400L) ++ // chain: 0→500→1400 all within 1s steps
      ev(1L, 10000L) ++ // 8.6s after 1400 → new session
      ev(2L, 200L)) // other user isolated
      .toDF("user_id", "ts")
    val out = Sessions.sessionize(events, gapMs = gap)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out === Array(
      (1L, 0L, 2400L, 3L), // end = 1400 + 1000
      (1L, 10000L, 11000L, 1L),
      (2L, 200L, 1200L, 1L)))
  }

  test("the same operator runs under Structured Streaming; sessions merge across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = Sessions.sessionize(input.toDF().toDF("user_id", "ts"), gapMs = 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()

    input.addData((1L, 0L), (1L, 900L * 1000000L))
    q.processAllAvailable()
    // batch 2 extends the open session: 1500 is within 1000ms of 900
    input.addData((1L, 1500L * 1000000L))
    q.processAllAvailable()
    val streamed = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val batch = Sessions.sessionize(
      Seq((1L, 0L), (1L, 900L * 1000000L), (1L, 1500L * 1000000L)).toDF("user_id", "ts"),
      gapMs = 1000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    q.stop()
    assert(streamed === batch)
    assert(streamed === Array((1L, 0L, 2500L, 3L)), "one merged session 0..1500+gap")
  }
}
