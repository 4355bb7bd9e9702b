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
}
