package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, FloatType, IntegerType, LongType, StringType}

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

  /** REAL JDBC idempotent upsert — the executor-side body of the canonical
    * consumer's sink write (`consumer.mjs:292-356`: `INSERT ... ON
    * CONFLICT DO UPDATE` guarded by the event sequence), against any
    * `DriverManager`-resolvable URL. Exercised END-TO-END in tests against
    * embedded Derby (the sandbox's real JDBC database, shipped with
    * Spark); in production the URL is Postgres and the same two-statement
    * pattern applies.
    *
    * Per row: (1) `UPDATE ... WHERE pk = ? AND seq < ?` — a newer event
    * wins, an older replayed one is a no-op; (2) if no row matched, try
    * `INSERT` inside a per-row SAVEPOINT, rolling back to it on a
    * duplicate-key violation (the row exists with a newer-or-equal seq —
    * a stale replay). The savepoint matters on PostgreSQL: any statement
    * error there aborts the WHOLE transaction (SQLState 25P02 on every
    * subsequent statement), so merely swallowing the exception — fine on
    * statement-level-rollback engines like Derby — would lose the rest of
    * the partition's batch. Rolling back to the savepoint restores the
    * transaction on both families. The seq guard makes delivery idempotent
    * AND order-insensitive: replaying any batch, in any order, converges
    * to the max-seq image per key.
    *
    * Scale shape: the batch is repartitioned on the key so each pk lives
    * in exactly ONE partition — no two executors contend on a row, and
    * each partition holds one connection with batched statements inside
    * one transaction. `df.write.jdbc` cannot express the merge (it only
    * appends/overwrites); this is the standard foreachPartition upsert a
    * real CDC consumer runs. */
  def jdbcIdempotentUpsert(
      batch: DataFrame, // pkCol, payload cols, seqCol
      url: String,
      table: String,
      pkCol: String,
      seqCol: String,
      payloadCols: Seq[String]): Unit = {
    val cols = (pkCol +: payloadCols) :+ seqCol
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updateSql = s"UPDATE $table SET " +
      (payloadCols :+ seqCol).map(c => s"$c = ?").mkString(", ") +
      s" WHERE $pkCol = ? AND $seqCol < ?"
    val proj = batch.repartition(col(pkCol)).select(cols.map(col): _*)
    val sqlTypes = proj.schema.fields.map(_.dataType match {
      case LongType => java.sql.Types.BIGINT
      case IntegerType => java.sql.Types.INTEGER
      case DoubleType => java.sql.Types.DOUBLE
      case FloatType => java.sql.Types.FLOAT
      case BooleanType => java.sql.Types.BOOLEAN
      case StringType => java.sql.Types.VARCHAR
      case dt => throw new IllegalArgumentException(s"unsupported sink type $dt")
    })
    val nPayload = payloadCols.length
    proj.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ins = conn.prepareStatement(insertSql)
          val upd = conn.prepareStatement(updateSql)
          def set(st: java.sql.PreparedStatement, pos: Int, rowIdx: Int, r: Row): Unit =
            if (r.isNullAt(rowIdx)) st.setNull(pos, sqlTypes(rowIdx))
            else st.setObject(pos, r.get(rowIdx), sqlTypes(rowIdx))
          try {
            rows.foreach { r =>
              // UPDATE guard first: columns are (payload..., seq, pk, seq)
              (0 until nPayload).foreach(i => set(upd, i + 1, i + 1, r))
              set(upd, nPayload + 1, nPayload + 1, r) // seq value
              set(upd, nPayload + 2, 0, r) // pk in WHERE
              set(upd, nPayload + 3, nPayload + 1, r) // seq in guard
              if (upd.executeUpdate() == 0) {
                cols.indices.foreach(i => set(ins, i + 1, i, r))
                // per-row savepoint: on Postgres a failed statement aborts
                // the whole txn (25P02), so the 23505 swallow must restore
                // to here or every later row + the commit would fail
                val sp = conn.setSavepoint()
                try {
                  ins.executeUpdate()
                  conn.releaseSavepoint(sp)
                } catch {
                  case e: java.sql.SQLException if e.getSQLState == "23505" =>
                    // duplicate key: the row already holds a >= seq — stale replay
                    conn.rollback(sp)
                }
              }
            }
            conn.commit()
          } catch { case t: Throwable => conn.rollback(); throw t }
        } finally conn.close()
      }
    }
  }

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
