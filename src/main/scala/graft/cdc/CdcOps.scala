package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Canonical CDC source-op stream derived deterministically from the driver's
  * `events` table, mirroring the reference's `SourceOp` model
  * (`src/domain/types.ts:88-111`: discriminated insert|update|delete with
  * logical-ms time `t`, table, pk, and a *partial* `after` payload).
  *
  * Mapping (fixed, shared with the DuckDB oracle SQL):
  *   - `t`   = epoch-ms of the event timestamp (logical clock).
  *   - `lsn` = `t * 1_000_000 + event_id` — a monotone, globally unique,
  *     *distribution-friendly* log sequence number (no global row_number —
  *     computable without a global sort, which matters at 100 TB; the
  *     reference only requires monotonicity, `sim/core/types.ts:70-82`).
  *   - `tbl` = `t<user_id % 3>` — a 3-table multiplex so multi-table
  *     semantics (per-table diff, state union) are exercised.
  *   - `pk`  = `user_id` as string.
  *   - op kind: signup→insert, error→delete, click/view/purchase→update.
  *   - Partial payloads: `val` is set by signup/click/purchase, `k` by
  *     signup/view/purchase — so updates are *partial* and last-row-wins is
  *     semantically wrong, exactly like the reference's merge-apply
  *     (`src/domain/storage.ts:159-163`).
  */
object CdcOps {

  val SetsVal: Seq[String] = Seq("signup", "click", "purchase")
  val SetsK: Seq[String] = Seq("signup", "view", "purchase")

  /** The canonical `Dataset` of source ops. */
  def ops(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val tMs = expr("ts div 1000000")
    e.select(
      tMs.as("t"),
      (tMs * lit(1000000L) + col("event_id")).as("lsn"),
      col("event_id"),
      concat(lit("t"), (col("user_id") % 3).cast("string")).as("tbl"),
      col("user_id").cast("string").as("pk"),
      when(col("event_type") === "signup", lit("insert"))
        .when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("update")).as("op"),
      col("event_type").isin(SetsVal: _*).as("sets_val"),
      col("event_type").isin(SetsK: _*).as("sets_k"),
      when(col("event_type").isin(SetsVal: _*), col("value")).as("val"),
      when(col("event_type").isin(SetsK: _*),
        regexp_extract(col("props"), "([0-9]+)", 1).cast("long")).as("k"))
  }

  /** Enrich ops with per-key row state: the previous and current merged row
    * image around each op, with delete resetting state ("epochs").
    *
    * This is the declarative (window-function) form of the reference's
    * before/after derivation (`sim/engines/LogEngine.ts:27-116` keeps a live
    * `Map<pk,Row>`; we reconstruct the same images relationally):
    *
    *   - `epoch_pre` — number of deletes strictly before this op on this key;
    *     partitioning by it scopes "last set value" windows to the current
    *     row lifetime (a delete clears state, so pre-delete values must not
    *     leak into the next lifetime).
    *   - `prev_val`/`prev_k` — the merged row image *before* this op (null
    *     for the first op of a lifetime).
    *   - `cur_val`/`cur_k` — the merged image *after* this op (null for
    *     deletes).
    *   - `ver` — ops seen on this key so far (the reference's row version
    *     counter, `sim/core/types.ts:1-8`).
    *   - `ver_epoch` — ops applied in the current lifetime (version of the
    *     materialized destination row).
    *
    * Scale note: both windows partition by key — no global sort anywhere.
    * The second window refines the first's partitioning (adds `epoch_pre`),
    * costing one extra shuffle; `ApplyEngine.applyState` shows the
    * single-pass secondary-sort alternative used on the hot path.
    */
  def withState(ops: DataFrame): DataFrame = {
    val byKey = Window.partitionBy("tbl", "pk").orderBy("lsn")
    val wPre = byKey.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withEpoch = ops
      .withColumn("ver", count(lit(1)).over(wAll))
      .withColumn("epoch_pre", count(when(col("op") === "delete", 1)).over(wPre))
    val byEpoch = Window.partitionBy("tbl", "pk", "epoch_pre").orderBy("lsn")
    val wEpPre = byEpoch.rowsBetween(Window.unboundedPreceding, -1)
    val wEpAll = byEpoch.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withEpoch
      .withColumn("prev_val", last(when(col("sets_val"), col("val")), ignoreNulls = true).over(wEpPre))
      .withColumn("prev_k", last(when(col("sets_k"), col("k")), ignoreNulls = true).over(wEpPre))
      .withColumn("ver_epoch", count(lit(1)).over(wEpAll))
      .withColumn("cur_val",
        when(col("op") === "delete", lit(null).cast("double"))
          .when(col("sets_val"), col("val"))
          .otherwise(col("prev_val")))
      .withColumn("cur_k",
        when(col("op") === "delete", lit(null).cast("long"))
          .when(col("sets_k"), col("k"))
          .otherwise(col("prev_k")))
  }

  /** Map the canonical op kind to the Debezium-style single-letter op code
    * (`sim/core/types.ts:42-54`: c/u/d; r is reserved for snapshot reads). */
  def opCode(op: Column): Column =
    when(op === "insert", lit("c"))
      .when(op === "delete", lit("d"))
      .otherwise(lit("u"))
}
