package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the event stream — the canonical
  * behavioral-analytics rollup (and the session labeling step of an
  * interaction-data curation pipeline).
  *
  * Built on Spark's native `session_window` aggregation: one shuffle
  * keyed by (user, session-window), merged by the dedicated
  * UpdatingSessionsExec machinery — no self-join, no lag/cumsum window
  * pair, and the SAME operator works unchanged under Structured
  * Streaming with a watermark (batch here; the streaming form is the
  * point of choosing the native operator over a hand-rolled window).
  *
  * Session semantics (matches the SQL lag/cumsum formulation the oracle
  * uses): a session extends while consecutive events arrive within
  * `gapMs`; start = first event time, end = last event time + gap.
  * Times stay epoch-ms BIGINTs end to end — no float arithmetic.
  */
object Sessions {

  /** Per-session rollup: (user_id, session_start, session_end, n_events).
    * `events` must carry `user_id` and raw-nanos `ts` (the
    * [[graft.sources.Tables.events]] schema). */
  def sessionize(events: DataFrame, gapMs: Long = 28800000L): DataFrame =
    events
      .select(
        col("user_id"),
        timestamp_millis(expr("ts div 1000000")).as("_t"))
      .groupBy(
        col("user_id"),
        session_window(col("_t"), s"$gapMs milliseconds").as("_w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_millis(col("_w.start")).as("session_start"),
        unix_millis(col("_w.end")).as("session_end"),
        col("n_events"))

  /** Session-scoped conversion ledger — "of all sessions, how many saw a
    * `fromType`, and how many of those converted to a `toType` strictly
    * AFTER the session's first `fromType`?" — the within-visit funnel a
    * product team reads next to the all-time
    * [[graft.operators.EventAnalytics.funnel]].
    *
    * Existence of a conversion needs no traversal: a purchase after the
    * session's first view exists iff `max(purchase time) > min(view
    * time)` within the session — so the WHOLE question collapses into
    * ONE (user, session_window)-keyed conditional aggregate (the same
    * single shuffle [[sessionize]] costs) plus a 1-row rollup with two
    * exact-long divisions. No joins, no per-session subqueries.
    *
    * Times stay epoch-ms BIGINTs; the rates are single IEEE divisions of
    * exact longs. */
  def sessionFunnel(events: DataFrame, gapMs: Long = 28800000L,
      fromType: String = "view", toType: String = "purchase"): DataFrame = {
    val perSession = events
      .select(
        col("user_id"),
        timestamp_millis(expr("ts div 1000000")).as("_t"),
        col("event_type"))
      .groupBy(
        col("user_id"),
        session_window(col("_t"), s"$gapMs milliseconds").as("_w"))
      .agg(
        min(when(col("event_type") === fromType, unix_millis(col("_t"))))
          .as("_first_from"),
        max(when(col("event_type") === toType, unix_millis(col("_t"))))
          .as("_last_to"))
    perSession.agg(
      count(lit(1)).as("n_sessions"),
      count(col("_first_from")).as("n_with_from"),
      count(when(col("_last_to") > col("_first_from"), 1)).as("n_converted"))
      .select(
        col("n_sessions"), col("n_with_from"), col("n_converted"),
        when(col("n_sessions") === 0, lit(0.0))
          .otherwise(col("n_with_from").cast("double") / col("n_sessions"))
          .as("from_rate"),
        when(col("n_with_from") === 0, lit(0.0))
          .otherwise(col("n_converted").cast("double") / col("n_with_from"))
          .as("conversion_rate"))
  }

  /** Session-shape ledger — the one-row summary read before tuning the
    * gap or a session-scoped model: how many sessions, how big (event
    * count) and how long (duration, start→end, so it includes the
    * closing gap tail — deterministic on both engines). Means are single
    * IEEE divisions of exact long sums; p50/p90 are exact interpolating
    * percentiles rounded to 3 decimals on both engines (the repo's
    * lag-percentile parity rule).
    *
    * Shape: [[sessionize]]'s single (user, session-window) shuffle, then
    * ONE global aggregate over the session-cardinality frame — the same
    * exact-percentile trade [[graft.cdc.MetricsAgg]] documents (the
    * rolling sketch is the unbounded-stream form). */
  /** Gap-tuning curve — the table read BEFORE fixing [[sessionize]]'s
    * gap: for each candidate gap G, how many sessions the corpus splits
    * into and their mean size. Needs no per-gap sessionization: each
    * user's first event opens a session and every inter-event gap > G
    * opens one more, so `n_sessions(G) = n_users + |{gaps > G}|` — the
    * WHOLE curve reads off ONE user-keyed lag window, the sweep is
    * conditional counts (the threshold-curve discipline), and the mean
    * is one IEEE division per row of exact longs.
    *
    * One keyed window + a 1-row aggregate exploded to |gaps| rows. */
  def sessionGapCurve(events: DataFrame,
      gaps: Seq[Long] = Seq(900000L, 1800000L, 3600000L, 28800000L)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("_t")
    val g = events
      .select(col("user_id"), expr("ts div 1000000").as("_t"))
      .withColumn("_gap", col("_t") - lag("_t", 1).over(w))
    g.agg(
      countDistinct("user_id").as("_n_users"),
      (count(lit(1)).as("_n_events") +: gaps.map(gp =>
        count(when(col("_gap") > gp, 1)).as(s"_b_$gp"))): _*)
      .select(explode(array(gaps.map(gp =>
        struct(lit(gp).as("gap_ms"),
          (col("_n_users") + col(s"_b_$gp")).as("n_sessions"))): _*)).as("_r"),
        col("_n_events"))
      .select(col("_r.gap_ms").as("gap_ms"),
        col("_r.n_sessions").as("n_sessions"),
        (col("_n_events").cast("double") / col("_r.n_sessions"))
          .as("mean_events"))
  }

  def sessionStats(events: DataFrame, gapMs: Long = 28800000L): DataFrame =
    sessionize(events, gapMs)
      .select(
        (col("session_end") - col("session_start")).as("_dur"),
        col("n_events"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        round(expr("percentile(n_events, 0.5)"), 3).as("p50_events"),
        round(expr("percentile(n_events, 0.9)"), 3).as("p90_events"),
        sum("_dur").as("_sumdur"),
        round(expr("percentile(_dur, 0.5)"), 3).as("p50_duration_ms"),
        round(expr("percentile(_dur, 0.9)"), 3).as("p90_duration_ms"))
      .select(
        col("n_sessions"), col("n_events"),
        (col("n_events").cast("double") / col("n_sessions")).as("mean_events"),
        col("p50_events"), col("p90_events"),
        (col("_sumdur").cast("double") / col("n_sessions")).as("mean_duration_ms"),
        col("p50_duration_ms"), col("p90_duration_ms"))
}
