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
