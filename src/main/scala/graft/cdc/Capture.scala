package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The three CDC capture methods as pure `ops → events` transformations in
  * deterministic batch-replay form (the streaming forms live in
  * `graft.streaming`). Semantics follow the reference sim engines; each
  * doc-comment cites the behavior being reproduced.
  */
object Capture {

  /** Emission tick: an op committed at `t` is emitted by the next interval
    * tick strictly after it — `(t div interval + 1) * interval`. Mirrors the
    * reference's `setInterval`-driven drains (`sim/engines/LogEngine.ts:102-103`).
    */
  private def tickAfter(t: Column, intervalMs: Long): Column =
    t - (t % intervalMs) + intervalMs // pure integer arithmetic — exact

  /** Log-based capture (`sim/engines/LogEngine.ts:4-132`): every op appends a
    * WAL record with monotone `lsn`, full before/after images, commit ts = op
    * time; the fetcher drains the WAL suffix every `fetchIntervalMs` (default
    * 100, `LogEngine.ts:10`). Lossless and ordered.
    *
    * Input must be `CdcOps.withState(ops)`.
    */
  def log(stateOps: DataFrame, fetchIntervalMs: Long = 100L): DataFrame = {
    val emitted = tickAfter(col("t"), fetchIntervalMs)
    stateOps.select(
      col("lsn"), col("tbl"), col("pk"),
      CdcOps.opCode(col("op")).as("op_code"),
      col("prev_val").as("before_val"), col("prev_k").as("before_k"),
      col("cur_val").as("after_val"), col("cur_k").as("after_k"),
      col("t").as("commit_ts"),
      emitted.as("emitted_ts"),
      (emitted - col("t")).as("lag_ms"),
      concat(lit("tx-"), col("lsn").cast("string")).as("tx_id"))
  }

  /** Trigger-based capture (`sim/engines/TriggerEngine.ts:4-153`): a
    * synchronous audit write per op adds `triggerOverheadMs` (default 5,
    * `TriggerEngine.ts:13`) to the commit; the extractor drains the audit log
    * every `extractIntervalMs` (default 500, `TriggerEngine.ts:11`). Captures
    * full before/after; costs one extra write per op (write amplification,
    * `src/modes/triggerBased.ts:217`).
    */
  def trigger(
      stateOps: DataFrame,
      triggerOverheadMs: Long = 5L,
      extractIntervalMs: Long = 500L): DataFrame = {
    val commit = col("t") + triggerOverheadMs
    val emitted = tickAfter(commit, extractIntervalMs)
    stateOps.select(
      col("lsn").as("audit_seq"), col("tbl"), col("pk"),
      CdcOps.opCode(col("op")).as("op_code"),
      col("prev_val").as("before_val"), col("prev_k").as("before_k"),
      col("cur_val").as("after_val"), col("cur_k").as("after_k"),
      commit.as("commit_ts"),
      emitted.as("emitted_ts"),
      (emitted - col("t")).as("lag_ms"))
  }

  /** Polling / query-based capture (`sim/engines/PollingEngine.ts:4-85`,
    * `src/modes/queryBased.ts:258-310`): each poll tick sees only the *latest*
    * state per key — intermediate versions inside a poll window are lost by
    * design, and with `includeSoftDeletes = false` deletes are invisible
    * (suppressed and counted, `queryBased.ts:286-288`). Emitted op kind is
    * derived from the row version counter: deleted→d, version>1→u, else c
    * (`PollingEngine.ts:59-84`).
    *
    * Output: one event per (key, poll window) whose state changed in the
    * window. `before` is always null for polling (the query can't see it).
    */
  def poll(
      stateOps: DataFrame,
      pollIntervalMs: Long = 1000L,
      includeSoftDeletes: Boolean = true): DataFrame = {
    val windowed = stateOps.withColumn("poll_window", expr(s"t div $pollIntervalMs"))
    // Latest op per (tbl, pk, poll_window) — everything earlier in the window
    // is invisible to the poller.
    val w = Window.partitionBy("tbl", "pk", "poll_window").orderBy(col("lsn").desc)
    val latest = windowed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val emissions = latest.select(
      col("tbl"), col("pk"), col("poll_window"),
      when(col("op") === "delete", lit("d"))
        .when(col("ver") > 1, lit("u"))
        .otherwise(lit("c")).as("op_code"),
      col("cur_val").as("after_val"), col("cur_k").as("after_k"),
      col("ver").as("version"),
      ((col("poll_window") + 1) * pollIntervalMs).as("poll_ts"),
      col("t").as("src_t"), col("lsn").as("src_lsn"))
    if (includeSoftDeletes) emissions else emissions.filter(col("op_code") =!= "d")
  }

  /** Polling loss accounting, per table:
    *   - `missed_deletes`: (key, window) groups whose latest op is a delete —
    *     with soft deletes invisible these emissions are suppressed and
    *     counted (`src/modes/queryBased.ts:286-288`).
    *   - `lost_intermediates`: ops overwritten inside their poll window
    *     (never observable by any poll, `PollingEngine` design).
    */
  def pollLoss(stateOps: DataFrame, pollIntervalMs: Long = 1000L): DataFrame = {
    val windowed = stateOps.withColumn("poll_window", expr(s"t div $pollIntervalMs"))
    val w = Window.partitionBy("tbl", "pk", "poll_window").orderBy(col("lsn").desc)
    windowed
      .withColumn("rn", row_number().over(w))
      .groupBy("tbl")
      .agg(
        count(when(col("rn") === 1 && col("op") === "delete", 1)).as("missed_deletes"),
        count(when(col("rn") > 1, 1)).as("lost_intermediates"))
  }

  /** Snapshot phase (`src/modes/queryBased.ts:156-194`, `logBased.ts:147-187`):
    * emit one read/insert event per seed row with a snapshot txn id, before
    * tailing begins. `seed` is any seed table; `pkCol` its primary key.
    */
  def snapshot(seed: DataFrame, tableName: String, pkCol: String, payloadCols: Seq[String]): DataFrame = {
    val payloadHash = md5(concat_ws("|", payloadCols.map(col): _*))
    seed.select(
      lit("r").as("op"),
      lit(tableName).as("tbl"),
      col(pkCol).cast("string").as("pk"),
      payloadHash.as("payload_hash"),
      lit("snapshot-0").as("tx_id"))
  }

  /** Multi-table form of [[snapshot]] over a state frame keyed (tbl, pk):
    * one read event per live row, table taken from the seed's own `tbl`
    * column, payload columns riding along so the snapshot can be replayed
    * downstream (the reference seeds `after` with the full stored row,
    * `logBased.ts:167-180`). */
  def snapshotAll(seed: DataFrame, payloadCols: Seq[String]): DataFrame =
    seed.select(
      (Seq(
        lit("r").as("op_code"), col("tbl"), col("pk"),
        md5(concat_ws("|", payloadCols.map(col): _*)).as("payload_hash"),
        lit("snapshot-0").as("tx_id")) ++ payloadCols.map(col)): _*)
}
