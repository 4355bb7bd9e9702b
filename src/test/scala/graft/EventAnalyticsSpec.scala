package graft

import graft.operators.EventAnalytics

/** Hand-computable funnel and retention fixtures — first-touch ordering
  * semantics are the part that silently breaks (a purchase BEFORE the
  * click must not convert). */
class EventAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.map { case (u, ty, tms) => (u, ty, tms * 1000000L, 1.0, "p1") }
      .toDF("user_id", "event_type", "ts", "value", "props")

  test("funnel: steps must complete strictly in order, first-touch") {
    val events = ev(Seq(
      (1L, "signup", 1000L), (1L, "click", 2000L), (1L, "purchase", 3000L),
      (2L, "signup", 1000L), (2L, "purchase", 1500L),   // skipped the click
      (3L, "click", 500L), (3L, "signup", 1000L),       // click BEFORE signup
      (4L, "signup", 1000L), (4L, "click", 1500L)))     // no purchase
    val out = EventAnalytics.funnel(events).orderBy("step").collect()
    assert(out.map(r => (r.getAs[Long]("step"), r.getAs[String]("step_name"),
      r.getAs[Long]("n_users"))).toSeq ===
      Seq((1L, "signup", 4L), (2L, "click", 2L), (3L, "purchase", 1L)))
    assert(out.map(_.getAs[Double]("conv_from_prev")).toSeq === Seq(1.0, 0.5, 0.5))
    assert(out.map(_.getAs[Double]("conv_from_first")).toSeq === Seq(1.0, 0.5, 0.25))
  }

  test("funnel: a repeat of an earlier step never re-opens the gate") {
    // u1's second click at 900 precedes signup; the only post-signup
    // purchase (800) precedes the first valid click — nothing converts
    val events = ev(Seq(
      (1L, "click", 500L), (1L, "purchase", 800L),
      (1L, "signup", 1000L), (1L, "click", 900L)))
    val out = EventAnalytics.funnel(events).orderBy("step").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 0L, 0L))
  }

  test("retention: triangle counts activity on/after the signup day only") {
    val day = 86400000L
    val events = ev(Seq(
      (1L, "signup", 0L), (1L, "click", day + 1),        // cohort 0, active d0 d1
      (2L, "signup", 10L),                               // cohort 0, active d0
      (3L, "view", 0L), (3L, "signup", day), (3L, "click", 2 * day))) // cohort 1
    val out = EventAnalytics.retention(events)
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset"),
        r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
        r.getAs[Double]("retention")))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 1L, 1L, 1L, 1.0)))
  }
}
