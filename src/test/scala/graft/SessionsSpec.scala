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

  test("session funnel: conversion needs a purchase AFTER the session's " +
      "first view, inside the same session") {
    val gap = 1000L
    val events = Seq(
      // u1 s1: view 0, purchase 500 -> converted
      (1L, 0L, "view"), (1L, 500L, "purchase"),
      // u1 s2 (new session): purchase only, no view -> not counted as from
      (1L, 10000L, "purchase"),
      // u2 s1: purchase 0 then view 500 -> view session, NOT converted
      (2L, 0L, "purchase"), (2L, 500L, "view"),
      // u3 s1: view only
      (3L, 0L, "view"),
      // u4 s1: no view no purchase
      (4L, 0L, "click"))
      .map { case (u, t, ty) => (u, t * 1000000L, ty) }
      .toDF("user_id", "ts", "event_type")
    val out = Sessions.sessionFunnel(events, gapMs = gap).collect().head
    assert((out.getAs[Long]("n_sessions"), out.getAs[Long]("n_with_from"),
      out.getAs[Long]("n_converted")) === ((5L, 3L, 1L)))
    assert(out.getAs[Double]("from_rate") === 3.0 / 5.0)
    assert(out.getAs[Double]("conversion_rate") === 1.0 / 3.0)
  }

  test("session funnel: a purchase in the NEXT session does not convert " +
      "the earlier view session") {
    val events = Seq(
      (1L, 0L, "view"), (1L, 10000L, "purchase")) // 10s apart, gap 1s
      .map { case (u, t, ty) => (u, t * 1000000L, ty) }
      .toDF("user_id", "ts", "event_type")
    val out = Sessions.sessionFunnel(events, gapMs = 1000L).collect().head
    assert((out.getAs[Long]("n_sessions"), out.getAs[Long]("n_with_from"),
      out.getAs[Long]("n_converted")) === ((2L, 1L, 0L)))
  }

  test("gap curve equals per-gap sessionize counts (one window, no re-runs)") {
    val events = (ev(1L, 0L, 500L, 2000L, 10000L) ++ ev(2L, 0L, 5000L))
      .toDF("user_id", "ts")
    val curve = Sessions.sessionGapCurve(events,
      gaps = Seq(1000L, 3000L, 60000L)).orderBy("gap_ms").collect()
      .map(r => r.getAs[Long]("gap_ms") -> r.getAs[Long]("n_sessions")).toMap
    for (g <- Seq(1000L, 3000L, 60000L)) {
      val direct = Sessions.sessionize(events, gapMs = g).count()
      assert(curve(g) === direct, s"gap $g: curve ${curve(g)} != sessionize $direct")
    }
    // hand check: g=1000 -> u1 {0,500},{2000},{10000} + u2 {0},{5000} = 5
    assert(curve(1000L) === 5L)
    assert(curve(60000L) === 2L)
  }

  test("session stats: exact means and interpolating percentiles over sessions") {
    // sessions (gap 1s): u1 {0,500} dur 1500 n=2; u1 {10000} dur 1000 n=1;
    // u2 {0,100,200,300} dur 1300 n=4
    val events = (ev(1L, 0L, 500L, 10000L) ++ ev(2L, 0L, 100L, 200L, 300L))
      .toDF("user_id", "ts")
    val out = Sessions.sessionStats(events, gapMs = 1000L).collect().head
    assert(out.getAs[Long]("n_sessions") === 3L)
    assert(out.getAs[Long]("n_events") === 7L)
    assert(out.getAs[Double]("mean_events") === 7.0 / 3.0)
    // n_events sorted (1, 2, 4): p50 = 2, p90 interpolates 2..4 at 0.8
    assert(out.getAs[Double]("p50_events") === 2.0)
    assert(out.getAs[Double]("p90_events") === 3.6)
    // durations sorted (1000, 1300, 1500)
    assert(out.getAs[Double]("mean_duration_ms") === 3800.0 / 3.0)
    assert(out.getAs[Double]("p50_duration_ms") === 1300.0)
    assert(out.getAs[Double]("p90_duration_ms") === 1460.0)
  }
}
