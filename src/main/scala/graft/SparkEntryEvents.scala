package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.cdc._
import graft.functions.GraftFunctions
import graft.llm.{Chunking, Clusters, Corpus, Dedup, Multimodal, Packing, Pii, Sampling, TextAnalysis}
import graft.llm.Similarity
import graft.operators.{AsOfJoin, RangeJoin, SaltedJoin, Sessions}
import graft.sources.{DebeziumSource, Tables}

/** Event-stream analytics queries (sessions, funnels, growth, joins) — one link of the ordered `SparkEntry` trait
  * chain (split from the single-file map by the round-12 verdict's
  * directive #7, the Oracles.scala recipe: pure relocation, the
  * `queries` map API and every entry body unchanged). */
private[graft] trait SparkEntryEvents extends SparkEntryTpch {
  private[graft] def eventsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_sessions" -> ((s, dir) =>
      Sessions.sessionize(Tables.events(s, dir))
        .orderBy("user_id", "session_start")),
    // one-row session-shape ledger (count/size/duration, exact means +
    // interpolating percentiles) on the same single session_window shuffle
    "events_session_stats" -> ((s, dir) =>
      Sessions.sessionStats(Tables.events(s, dir))),
    // gap-tuning curve: session count per candidate gap off ONE lag
    // window (n_sessions = n_users + breaks), no per-gap re-sessionization
    "events_session_gap_curve" -> ((s, dir) =>
      Sessions.sessionGapCurve(Tables.events(s, dir)).orderBy("gap_ms")),
    // temporal train/test split at the integer midpoint day, with the
    // inherent user-overlap leak REPORTED (the events-side leakage audit)
    "split_temporal" -> ((s, dir) =>
      graft.llm.Sampling.temporalSplit(Tables.events(s, dir)).orderBy("split")),
    // As-of join: each purchase attributed to the user's latest click
    // at-or-before it — one keyed shuffle, no join (operators/AsOfJoin).
    // Build side deduped to one row per (user, ms) for tie determinism.
    "q_events_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("t_ms"), col("event_type"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("t_ms"))
      val build = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "t_ms").agg(max("event_id").as("click_id"))
        .select(col("user_id"), col("t_ms"), col("click_id"),
          col("t_ms").as("click_t"))
      AsOfJoin.asOf(probe, build, Seq("user_id"), "t_ms")
        .select(col("user_id"), col("event_id"), col("t_ms"), col("click_id"),
          (col("t_ms") - col("click_t")).as("lag_ms"))
        .orderBy("event_id")
    }),
    // Banded interval join: click→purchase pairs inside a 1h attribution
    // window — equality join on (user, band), never a nested-loop theta
    // join (operators/RangeJoin).
    "q_events_window_pairs" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("t_ms"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("t_ms").as("click_t"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("t_ms").as("purchase_t"))
      RangeJoin.within(clicks, purchases, Seq("user_id"),
          "click_t", "purchase_t", 3600000L)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("purchase_t") - col("click_t")).as("gap_ms"))
        .orderBy("click_id", "purchase_id")
    }),
    // Salted fact⋈dim enrichment: the hot-key spread SCALE.md prescribes,
    // exercised end-to-end — results must be identical to the plain join.
    "q_events_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"))
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
      SaltedJoin.join(ev, dim, Seq("user_id"), salts = 8)
        .orderBy("event_id")
    }),
    // the self-sizing path end-to-end: salts measured from a sampled top-1
    // key share instead of caller-chosen — result rows identical to the
    // plain join whatever salt count the sample derives
    "q_events_salted_auto" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"))
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
      SaltedJoin.joinAuto(ev, dim, Seq("user_id"), fraction = 0.2)._1
        .orderBy("event_id")
    }),
    // join-key skew audit: exact top-10 heaviest user_ids with share,
    // running head share and the salt count autoSalts would derive
    "events_skew_profile" -> ((s, dir) =>
      SaltedJoin.skewProfile(
        Tables.events(s, dir).select("user_id", "event_id"), Seq("user_id"))
        .orderBy("rnk")),
    // ordered conversion funnel: per-stage user-cardinality aggregates,
    // first-touch semantics, no per-user ordered scan
    "events_funnel" -> ((s, dir) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, dir))
        .orderBy("step")),
    // cohort retention triangle: signup cohorts x day offset
    "events_retention" -> ((s, dir) =>
      graft.operators.EventAnalytics.retention(Tables.events(s, dir))
        .orderBy("cohort_day", "day_offset")),
    // PageRank centrality over the type-transition graph: integer-exact
    // power iteration (10 rounds) on the bounded edge table — one lead
    // pass over the stream, no per-iteration re-scan
    "events_pagerank" -> ((s, dir) =>
      graft.operators.EventAnalytics.pageRank(Tables.events(s, dir))
        .orderBy(col("mass").desc, col("event_type"))),
    // first-order Markov transition matrix over consecutive same-user events
    "events_transitions" -> ((s, dir) =>
      graft.operators.EventAnalytics.transitions(Tables.events(s, dir))
        .orderBy("from_type", "to_type")),
    // DAU / rolling-7-day active users / stickiness per day
    "events_dau" -> ((s, dir) =>
      graft.operators.EventAnalytics.activeUsers(Tables.events(s, dir))
        .orderBy("day")),
    // hourly volume vs median +- 3*MAD robust band: the pager query
    "events_anomaly" -> ((s, dir) =>
      graft.operators.EventAnalytics.hourlyAnomaly(Tables.events(s, dir))
        .orderBy("hour")),
    // top-10 most-travelled 3-step event paths (journey mining)
    "events_path_topk" -> ((s, dir) =>
      graft.operators.EventAnalytics.pathTopK(Tables.events(s, dir))
        .orderBy("rnk")),
    // per-user activity power-law octaves: the skew/bot-filter health check
    "events_user_octaves" -> ((s, dir) =>
      graft.operators.EventAnalytics.userActivityOctaves(Tables.events(s, dir))
        .orderBy("octave")),
    // last-touch revenue attribution: purchases credited to the most
    // recent prior click/view on the same user's timeline
    "events_attribution" -> ((s, dir) =>
      graft.operators.EventAnalytics.attribution(Tables.events(s, dir))
        .orderBy("channel")),
    // windowed funnel: each step must land within 7 days of the previous
    // step's first completion (same plan shape, an upper bound added)
    "events_funnel_windowed" -> ((s, dir) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, dir),
        maxGapMs = Some(604800000L)).orderBy("step")),
    // RFM segmentation: fixed integer-exact cutoffs, 1-row ref broadcast
    "events_rfm" -> ((s, dir) =>
      graft.operators.EventAnalytics.rfm(Tables.events(s, dir))
        .orderBy("user_id")),
    // within-session view->purchase conversion: ONE session-window
    // conditional aggregate + a 1-row rollup (existence = max > min)
    "events_session_funnel" -> ((s, dir) =>
      graft.operators.Sessions.sessionFunnel(Tables.events(s, dir))),
    // bot-cadence gate: distinct-gap ratio per user (variance-free,
    // integer-exact at any scale)
    "events_bot_filter" -> ((s, dir) =>
      graft.operators.EventAnalytics.botFilter(Tables.events(s, dir))
        .orderBy("user_id")),
    // hour-of-week x type seasonality heatmap (epoch-anchored arithmetic)
    "events_weekday_profile" -> ((s, dir) =>
      graft.operators.EventAnalytics.weekdayProfile(Tables.events(s, dir))
        .orderBy("hour_of_week", "event_type")),
    // funnel sliced by signup cohort week: growth accounting on the same
    // first-touch chain; stage-1 rows are the cohort sizes
    "events_funnel_cohorted" -> ((s, dir) =>
      graft.operators.EventAnalytics.cohortedFunnel(Tables.events(s, dir))
        .orderBy("cohort_week", "step")),
    // cohort LTV triangle: signup cohorts x week offset, exact decimal
    // revenue with a cohort-partitioned cumulative sum
    "events_cohort_ltv" -> ((s, dir) =>
      graft.operators.EventAnalytics.cohortLtv(Tables.events(s, dir))
        .orderBy("cohort_day", "week_offset")),
    // per-type inter-arrival gap ledger: count, mean, exact interpolating
    // p50/p90/p99 (the cadence table behind session-timeout tuning)
    "events_interarrival" -> ((s, dir) =>
      graft.operators.EventAnalytics.interarrival(Tables.events(s, dir))
        .orderBy("event_type")),
    // activity-concentration Gini over per-user event counts: exact
    // integer numerator/denominator (DECIMAL(38,0) rank-weighted sum via
    // the range-partitioned GlobalOrder rank), one IEEE division
    "events_gini" -> ((s, dir) =>
      graft.operators.EventAnalytics.gini(Tables.events(s, dir))),
    // daily new-vs-returning split (growth accounting): first-ever-day
    // per user off the persisted distinct user-day set
    "events_new_vs_returning" -> ((s, dir) =>
      graft.operators.EventAnalytics.newVsReturning(Tables.events(s, dir))
        .orderBy("day")),
    // weekly growth accounting: the four-way new/retained/resurrected/
    // churned user-flow ledger with the net-growth identity column
    "events_growth_accounting" -> ((s, dir) =>
      graft.operators.EventAnalytics.growthAccounting(Tables.events(s, dir))
        .orderBy("week")),
    // per-transition conversion delay (signup->click->purchase): the
    // funnel's first-touch chain with exact mean + interpolating p50/90/99
    "events_conversion_lag" -> ((s, dir) =>
      graft.operators.EventAnalytics.conversionLag(Tables.events(s, dir))
        .orderBy("step")),
    "q_events_hourly" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), expr("(ts div 1000000) div 3600000").as("hour_id"),
          col("value"))
        .groupBy("event_type", "hour_id")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .orderBy("event_type", "hour_id")),

    // ------------------------------------------------ dedup,
    "q_events_user_topk" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)),
  )
}
