package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Schema-change capture + destination schema evolution
  * (`src/domain/types.ts:23-37`, `src/domain/storage.ts:201-242`,
  * `src/modes/logBased.ts:103-134`).
  *
  * Changes are data (`SCHEMA_ADD_COL` / `SCHEMA_DROP_COL` events carrying
  * `{action, column, previousVersion, nextVersion}`); destinations apply them
  * as `withColumn(name, null)` / `drop(name)` with the primary key protected
  * (`storage.ts:217`), and the table's schema version is the monotone max of
  * seen versions (`storage.ts:144-146`).
  */
object SchemaEvolution {

  case class SchemaChange(tbl: String, action: String, column: String, commitTs: Long)

  /** Enrich a change stream with per-table version transitions — the event
    * payload the reference emits (`previousVersion`/`nextVersion`). */
  def capture(changes: Dataset[SchemaChange]): DataFrame = {
    val w = Window.partitionBy("tbl").orderBy("commitTs", "column")
    changes.toDF()
      .withColumn("next_version", row_number().over(w) + 1)
      .withColumn("prev_version", col("next_version") - 1)
      .withColumn("kind",
        when(col("action") === "ADD_COLUMN", "SCHEMA_ADD_COL")
          .otherwise("SCHEMA_DROP_COL"))
  }

  /** Per-lane schema-change capture — the three capture engines emit the
    * SAME change at different (correct) times:
    *
    *   - log (`src/modes/logBased.ts:103-134`): `emitSchemaEvent` calls the
    *     emitter directly, bypassing the fetch-tick buffer row events go
    *     through → emitted at `commitTs` itself;
    *   - polling (`src/modes/queryBased.ts:109-138,263-265`):
    *     `queueSchemaEvent` pushes to `pendingSchemaEvents`, drained at the
    *     head of the NEXT poll tick → emitted at the next poll boundary;
    *   - trigger (`src/modes/triggerBased.ts:219-252`): the trigger applies
    *     at `commitTs + overhead` and `recordSchemaChange` stamps the audit
    *     row with that effective commit; extraction ships it at the next
    *     extract tick.
    *
    * Version transitions (`previousVersion`/`nextVersion`) are identical
    * across lanes — every lane sees every change in the same per-table
    * order (`storage.ts:144-146`: destination version = monotone max) — so
    * they are computed once and the three lanes explode from one row
    * (`explode(array(struct...))`: no extra shuffle, the window over
    * (tbl, commitTs, column) is the only exchange in the plan).
    */
  def captureLanes(
      changes: Dataset[SchemaChange],
      pollIntervalMs: Long = 1000L,
      extractIntervalMs: Long = 500L,
      triggerOverheadMs: Long = 5L): DataFrame = {
    val versioned = capture(changes)
    val src = col("commitTs")
    val trigCommit = src + triggerOverheadMs
    // integer tick arithmetic (div/%), matching the oracle SQL exactly
    val pollEmit = expr(s"((commitTs div $pollIntervalMs) + 1) * $pollIntervalMs")
    val trigEmit = expr(s"(commitTs + $triggerOverheadMs) " +
      s"- ((commitTs + $triggerOverheadMs) % $extractIntervalMs) + $extractIntervalMs")
    val lane = explode(array(
      struct(lit("log").as("method"), src.as("commit_ts"), src.as("emitted_ts")),
      struct(lit("poll").as("method"), src.as("commit_ts"), pollEmit.as("emitted_ts")),
      struct(lit("trigger").as("method"), trigCommit.as("commit_ts"), trigEmit.as("emitted_ts"))))
    versioned
      .select(col("tbl"), col("column").as("col_name"), col("action"), col("kind"),
        col("prev_version").cast("long").as("prev_version"),
        col("next_version").cast("long").as("next_version"),
        src.as("_src_ts"), lane.as("lane"))
      .select(col("tbl"), col("col_name"), col("action"), col("kind"),
        col("prev_version"), col("next_version"),
        col("lane.method").as("method"),
        col("lane.commit_ts").as("commit_ts"),
        col("lane.emitted_ts").as("emitted_ts"),
        (col("lane.emitted_ts") - col("_src_ts")).as("lag_ms"))
  }

  /** Apply an ordered list of schema changes to a destination table.
    * Add = null-filled column (existing rows keep no value for it);
    * drop = column removal, with `protectedCols` (the pk) never droppable.
    */
  def applyChanges(
      table: DataFrame,
      changes: Seq[SchemaChange],
      protectedCols: Set[String] = Set("id", "pk")): DataFrame =
    changes.sortBy(c => (c.commitTs, c.column)).foldLeft(table) { (df, c) =>
      c.action match {
        case "ADD_COLUMN" if !df.columns.contains(c.column) =>
          df.withColumn(c.column, lit(null).cast("string"))
        case "DROP_COLUMN" if !protectedCols.contains(c.column) =>
          df.drop(c.column)
        case _ => df
      }
    }

  /** Monotone schema version for a table after a set of changes
    * (`storage.ts:144-146,190-193`: version = max seen). */
  def versionAfter(changes: Seq[SchemaChange], tbl: String): Int =
    1 + changes.count(_.tbl == tbl)
}
