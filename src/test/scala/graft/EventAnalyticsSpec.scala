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

  test("windowed funnel: a step outside the window does not convert") {
    val day = 86400000L
    val events = ev(Seq(
      (1L, "signup", 0L), (1L, "click", day),                 // within 7d
      (1L, "purchase", 9 * day),                              // 8d after click: out
      (2L, "signup", 0L), (2L, "click", 8 * day),             // 8d after signup: out
      (3L, "signup", 0L), (3L, "click", day), (3L, "purchase", 2 * day)))
    val out = EventAnalytics.funnel(events, maxGapMs = Some(7 * day))
      .orderBy("step").collect().map(_.getAs[Long]("n_users"))
    assert(out.toSeq === Seq(3L, 2L, 1L))
    // the unwindowed form converts everyone — the window is the only gate
    val open = EventAnalytics.funnel(events)
      .orderBy("step").collect().map(_.getAs[Long]("n_users"))
    assert(open.toSeq === Seq(3L, 3L, 2L))
  }

  test("windowed funnel: the window anchors on the FIRST completion, " +
      "not the nearest retry") {
    val day = 86400000L
    // click day 1 (in window), purchase day 10: 9d after the first click.
    // A second click on day 8 would rescue it if the anchor slid — it must not.
    val events = ev(Seq(
      (1L, "signup", 0L), (1L, "click", day), (1L, "click", 8 * day),
      (1L, "purchase", 10 * day)))
    val out = EventAnalytics.funnel(events, maxGapMs = Some(7 * day))
      .orderBy("step").collect().map(_.getAs[Long]("n_users"))
    assert(out.toSeq === Seq(1L, 1L, 0L))
  }

  test("rfm: scores cut on recency/frequency/monetary; non-buyers drop") {
    val day = 86400000L
    val events = evId(Seq(
      // u1: bought yesterday, 3 purchases, 120.00 total -> r3 f2 m3
      (1L, 1L, "purchase", 27 * day, 40.0),
      (2L, 1L, "purchase", 28 * day, 40.0),
      (3L, 1L, "purchase", 29 * day, 40.0),
      // u2: bought day 0 (30d ago), once, 5.00 -> r2 f1 m1
      (4L, 2L, "purchase", 0L, 5.0),
      // u3: clicks only -> absent
      (5L, 3L, "click", 29 * day, 0.0),
      // the reference "now" is the feed's max day (u4's view on day 30)
      (6L, 4L, "view", 30 * day, 0.0)))
    val out = EventAnalytics.rfm(events).orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("recency_days"),
        r.getAs[Long]("frequency"), r.getAs[Double]("monetary"),
        r.getAs[String]("segment")))
    assert(out.toSeq === Seq(
      (1L, 1L, 3L, 120.0, "323"),
      (2L, 30L, 1L, 5.0, "211")))
  }

  // fixtures for the operators that read event_id (tie-break order) and value
  private def evId(rows: Seq[(Long, Long, String, Long, Double)]) =
    rows.map { case (id, u, ty, tms, v) => (id, u, ty, tms * 1000000L, v, "p") }
      .toDF("event_id", "user_id", "event_type", "ts", "value", "props")

  test("attribution: last prior touch wins; no prior touch is direct") {
    val events = evId(Seq(
      (1L, 1L, "purchase", 100L, 10.0),                  // before any touch
      (2L, 1L, "click", 200L, 0.0),
      (3L, 1L, "view", 300L, 0.0),
      (4L, 1L, "purchase", 400L, 5.5),                   // view is latest
      (5L, 2L, "click", 100L, 0.0),
      (6L, 2L, "error", 150L, 0.0),                      // not a touch type
      (7L, 2L, "purchase", 200L, 4.5)))                  // still the click
    val out = EventAnalytics.attribution(events).orderBy("channel").collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("n_purchases"),
        r.getAs[Double]("revenue"), r.getAs[Double]("revenue_share")))
    assert(out.toSeq === Seq(
      ("click", 1L, 4.5, 4.5 / 20.0),
      ("direct", 1L, 10.0, 10.0 / 20.0),
      ("view", 1L, 5.5, 5.5 / 20.0)))
  }

  test("attribution: a purchase at the exact touch timestamp is NOT credited" +
      " to it (strictly-prior frame, event_id breaks the tie)") {
    val events = evId(Seq(
      (1L, 1L, "click", 100L, 0.0),
      (2L, 1L, "purchase", 100L, 3.0)))  // same ms; click has the lower id
    val out = EventAnalytics.attribution(events).collect()
    assert(out.map(r => (r.getAs[String]("channel"),
      r.getAs[Long]("n_purchases"))).toSeq === Seq(("click", 1L)))
  }

  test("cohort LTV: weekly revenue, cumulative, and per-user division") {
    val day = 86400000L
    val events = evId(Seq(
      (1L, 1L, "signup", 0L, 0.0),
      (2L, 2L, "signup", 10L, 0.0),                       // same cohort day 0
      (3L, 1L, "purchase", day, 10.0),                    // week 0
      (4L, 1L, "purchase", 8 * day, 2.5),                 // week 1
      (5L, 2L, "purchase", 9 * day, 1.5),                 // week 1
      (6L, 3L, "purchase", day, 99.0)))                   // no cohort — dropped
    val out = EventAnalytics.cohortLtv(events)
      .orderBy("cohort_day", "week_offset").collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_purchases"), r.getAs[Double]("week_revenue"),
        r.getAs[Double]("cum_revenue"), r.getAs[Long]("cohort_size"),
        r.getAs[Double]("ltv_per_user")))
    assert(out.toSeq === Seq(
      (0L, 0L, 1L, 10.0, 10.0, 2L, 5.0),
      (0L, 1L, 2L, 4.0, 14.0, 2L, 7.0)))
  }

  test("interarrival: gaps pair consecutive events of the SAME type and user") {
    val events = evId(Seq(
      (1L, 1L, "click", 100L, 0.0),
      (2L, 1L, "view", 150L, 0.0),    // interleaved other type — no gap break
      (3L, 1L, "click", 300L, 0.0),   // click gap 200
      (4L, 1L, "click", 400L, 0.0),   // click gap 100
      (5L, 2L, "click", 1000L, 0.0))) // different user — no cross-user gap
    val out = EventAnalytics.interarrival(events).orderBy("event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_gaps"),
        r.getAs[Double]("mean_ms"), r.getAs[Double]("p50_ms")))
    // clicks: gaps {200, 100} -> mean 150, p50 150; views: single event, no gap
    assert(out.toSeq === Seq(("click", 2L, 150.0, 150.0)))
  }

  test("cohorted funnel: conversion slices by the stage-1 week") {
    val week = 604800000L
    val events = ev(Seq(
      // cohort week 0: two signups, one converts to click
      (1L, "signup", 1000L), (1L, "click", 2000L),
      (2L, "signup", 2000L),
      // cohort week 1: one signup, full conversion
      (3L, "signup", week + 1000L), (3L, "click", week + 2000L),
      (3L, "purchase", week + 3000L)))
    val out = EventAnalytics.cohortedFunnel(events)
      .orderBy("cohort_week", "step").collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("step"),
        r.getAs[Long]("n_users"), r.getAs[Double]("conv_from_first")))
    assert(out.toSeq === Seq(
      (0L, 1L, 2L, 1.0), (0L, 2L, 1L, 0.5),
      (1L, 1L, 1L, 1.0), (1L, 2L, 1L, 1.0), (1L, 3L, 1L, 1.0)))
  }

  test("bot filter: constant cadence flags, human jitter does not") {
    // u1: 25 events exactly 1000ms apart -> 24 gaps, 1 distinct -> bot
    // u2: 25 events with all-distinct gaps -> not a bot
    // u3: 5 events constant cadence -> too few gaps to flag
    val rows =
      (0 until 25).map(i => (100L + i, 1L, "click", i * 1000L, 0.0)) ++
      (0 until 25).map(i => (200L + i, 2L, "click", i * 1000L + i * (i + 1) / 2, 0.0)) ++
      (0 until 5).map(i => (300L + i, 3L, "click", i * 1000L, 0.0))
    val out = EventAnalytics.botFilter(evId(rows)).orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("n_distinct_gaps"), r.getAs[Boolean]("is_bot")))
    assert(out.toSeq === Seq(
      (1L, 24L, 1L, true),
      (2L, 24L, 24L, false),
      (3L, 4L, 1L, false)))
  }

  test("weekday profile: epoch-anchored hour-of-week cells and type shares") {
    val hour = 3600000L
    val events = ev(Seq(
      (1L, "click", 0L), (2L, "click", hour * 168L),   // same cell, week apart
      (3L, "click", hour), (4L, "view", hour)))
    val out = EventAnalytics.weekdayProfile(events)
      .orderBy("hour_of_week", "event_type").collect()
      .map(r => (r.getAs[Long]("hour_of_week"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("share")))
    assert(out.toSeq === Seq(
      (0L, "click", 2L, 2.0 / 3.0),
      (1L, "click", 1L, 1.0 / 3.0),
      (1L, "view", 1L, 1.0)))
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

  test("gini: zero for a uniform distribution, exact for a skewed one") {
    val uniform = ev(Seq(
      (1L, "click", 1L), (1L, "click", 2L),
      (2L, "view", 3L), (2L, "view", 4L)))
    val g0 = EventAnalytics.gini(uniform).collect().head
    assert(g0.getAs[Long]("n_users") === 2L)
    assert(g0.getAs[Long]("n_events") === 4L)
    assert(g0.getAs[Double]("gini") === 0.0)
    // counts 1, 1, 2 sorted -> sum i*x = 1 + 2 + 6 = 9;
    // G = (2*9 - 4*4) / (3*4) = 2/12
    val skewed = ev(Seq(
      (1L, "click", 1L), (2L, "click", 2L),
      (3L, "click", 3L), (3L, "click", 4L)))
    assert(EventAnalytics.gini(skewed).collect().head
      .getAs[Double]("gini") === 2.0 / 12.0)
  }

  test("newVsReturning: first-ever day counts as new, later days return") {
    val day = 86400000L
    val events = ev(Seq(
      (1L, "click", 0L), (1L, "click", day),        // new d0, returns d1
      (2L, "view", day), (2L, "view", day + 100L),  // new d1 (one user-day)
      (3L, "view", day)))                           // new d1
    val out = EventAnalytics.newVsReturning(events).orderBy("day").collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("dau"),
        r.getAs[Long]("new_users"), r.getAs[Long]("returning_users"),
        r.getAs[Double]("new_frac")))
    assert(out.toSeq === Seq(
      (0L, 1L, 1L, 0L, 1.0),
      (1L, 3L, 2L, 1L, 2.0 / 3.0)))
  }

  test("temporalSplit: integer midpoint cut; straddling users reported") {
    val day = 86400000L
    val events = ev(Seq(
      (1L, "click", 0L), (1L, "click", 3 * day),       // straddles the cut
      (2L, "view", day),                               // train only
      (3L, "view", 2 * day), (3L, "click", 3 * day)))  // test only
    // days 0..3 -> cut = (0 + 3 + 1) div 2 = 2
    val out = graft.llm.Sampling.temporalSplit(events).orderBy("split")
      .collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_users"), r.getAs[Long]("n_users_both"),
        r.getAs[Double]("user_leak_frac")))
    assert(out.toSeq === Seq(
      ("test", 3L, 2L, 1L, 1.0 / 3.0),
      ("train", 2L, 2L, 1L, 1.0 / 3.0)))
  }

  test("conversionLag: gaps measured from the first-touch chain only") {
    val events = ev(Seq(
      (1L, "signup", 1000L), (1L, "click", 3000L), (1L, "purchase", 6000L),
      (2L, "click", 500L), (2L, "signup", 1000L),          // click precedes signup
      (3L, "signup", 1000L), (3L, "click", 2000L),
      (3L, "purchase", 1500L)))                            // purchase precedes click
    val out = EventAnalytics.conversionLag(events).orderBy("step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("from_step"),
        r.getAs[String]("to_step"), r.getAs[Long]("n_users"),
        r.getAs[Double]("mean_ms"), r.getAs[Double]("p50_ms")))
    // step 1: u1 gap 2000, u3 gap 1000 -> mean 1500, p50 1500 (interpolated)
    // step 2: only u1 converts (u3's purchase precedes its click) -> 3000
    assert(out.toSeq === Seq(
      (1L, "signup", "click", 2L, 1500.0, 1500.0),
      (2L, "click", "purchase", 1L, 3000.0, 3000.0)))
  }

  test("growthAccounting: four-way ledger, churn clipped at the last " +
      "observed week, net_growth telescopes to the WAU delta") {
    val wk = 7 * 86400000L
    // u1 active weeks {0,1,3}; u2 {0}; u3 {2,3}
    val events = ev(Seq(
      (1L, "view", 0L), (1L, "view", 100L),    // dup events, one active week
      (1L, "view", wk), (1L, "view", 3 * wk),
      (2L, "view", 0L),
      (3L, "view", 2 * wk), (3L, "view", 3 * wk)))
    val out = EventAnalytics.growthAccounting(events).orderBy("week").collect()
      .map(r => (r.getAs[Long]("week"), r.getAs[Long]("new_users"),
        r.getAs[Long]("retained_users"), r.getAs[Long]("resurrected_users"),
        r.getAs[Long]("churned_users"), r.getAs[Long]("net_growth")))
    assert(out.toSeq === Seq(
      (0L, 2L, 0L, 0L, 0L, 2L),   // u1, u2 new
      (1L, 0L, 1L, 0L, 1L, -1L),  // u1 retained; u2 churned
      (2L, 1L, 0L, 0L, 1L, 0L),   // u3 new; u1 absent after week 1
      (3L, 0L, 1L, 1L, 0L, 1L))) // u3 retained; u1 resurrected; week-4 churn clipped
    // identity: net_growth = ΔWAU (WAU: 2,1,1,2)
    assert(out.map(_._6).toSeq === Seq(2L, -1L, 0L, 1L),
      "net_growth must equal the week-over-week WAU delta")
  }

  test("pageRank: a symmetric 2-cycle conserves mass at the uniform point") {
    // u1: A→B→A, u2: A→B ⇒ edges A→B (w 1.0), B→A (w 1.0); the uniform
    // distribution is the exact fixed point of the integer iteration
    val events = evId(Seq(
      (1L, 1L, "A", 1000L, 1.0), (2L, 1L, "B", 2000L, 1.0),
      (3L, 1L, "A", 3000L, 1.0),
      (4L, 2L, "A", 1000L, 1.0), (5L, 2L, "B", 2000L, 1.0)))
    val out = EventAnalytics.pageRank(events).orderBy("event_type").collect()
    assert(out.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("mass"), r.getAs[Double]("rank_share"))).toSeq ===
      Seq(("A", 1000000L), ("B", 1000000L)).map(t => (t._1, t._2, 0.5)))
  }

  test("pageRank: a sink with a self-loop accumulates to the exact integer " +
      "fixed point") {
    // u1: A→B→B ⇒ A only feeds B, B self-loops. Hand iteration:
    // m(A) drops to the 150000 re-seed; m(B) reaches the fixed point
    // 150000 + (150000·17 div 20) + (m(B)·17 div 20) ⇒ 1850000 by iter 2
    val events = evId(Seq(
      (1L, 1L, "A", 1000L, 1.0), (2L, 1L, "B", 2000L, 1.0),
      (3L, 1L, "B", 3000L, 1.0)))
    val out = EventAnalytics.pageRank(events).orderBy("event_type").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("mass")).toMap
    assert(out === Map("A" -> 150000L, "B" -> 1850000L))
  }
}
