package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Export sinks.
  *
  * - NDJSON event-log export (`src/ui/eventLogExport.ts:112-182`): one JSON
  *   object per line with coerced field types — numbers finite-checked,
  *   booleans, trimmed strings (`:65-97`).
  * - Destination table JSON download (`web/App.tsx:2513-2520`).
  * - Idempotent upsert writer (`consumer.mjs:292-356`): the canonical sink's
  *   `ON CONFLICT DO UPDATE` expressed as a deterministic merge — latest
  *   event per key wins, with CDC metadata columns carried alongside.
  */
object Sinks {

  /** Reference value coercions (`eventLogExport.ts:65-97`): non-numeric /
    * non-finite inputs coerce to null (ANSI cast would throw instead). */
  def coerceNumber(c: Column): Column = {
    val s = trim(c.cast("string"))
    when(s.rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"), s.cast("double"))
  }
  def coerceBoolean(c: Column): Column = c.cast("boolean")
  def coerceString(c: Column): Column = trim(c.cast("string"))

  /** Serialize events to NDJSON lines: a deterministic column order inside
    * the struct gives stable output (`serializeEventLogNdjson`). Returns a
    * single-column DataFrame of lines; write with `.text(path)`. */
  def ndjsonLines(events: DataFrame, cols: Seq[String]): DataFrame =
    events.select(to_json(struct(cols.map(col): _*)).as("line"))

  /** Destination table download: JSON file per table. */
  def writeJson(table: DataFrame, path: String): Unit =
    table.write.mode("overwrite").json(path)

  /** Idempotent upsert into a keyed destination: applying the same batch
    * twice yields the same state (replay-safe, the canonical sink's dedup +
    * upsert contract). Latest event per key by `seqCol` wins; deletes remove.
    * For a real external store this is the `foreachBatch { MERGE }` body —
    * here it returns the post-merge state for a table-valued destination. */
  def idempotentUpsert(
      current: DataFrame, // tbl, pk, payload cols
      batch: DataFrame, // tbl, pk, op_code, payload cols, seqCol
      seqCol: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("tbl", "pk").orderBy(col(seqCol).desc)
    val latest = batch
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val upserts = latest.filter(col("op_code") =!= "d")
      .select((Seq(col("tbl"), col("pk")) ++ payloadCols.map(col)): _*)
    val deletes = latest.filter(col("op_code") === "d").select("tbl", "pk")
    current
      .join(latest.select("tbl", "pk"), Seq("tbl", "pk"), "left_anti") // untouched rows
      .unionByName(upserts)
      .join(deletes, Seq("tbl", "pk"), "left_anti") // ensure deleted keys gone
  }
}
