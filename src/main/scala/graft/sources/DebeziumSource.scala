package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style envelope decode
  * (`harness/verifier/index.js:254-283`,
  * `scenarios/01-canonical-reference/sink/consumer.mjs:157-173`):
  * parse a Kafka message value as the CDC envelope, unwrap the optional
  * `payload` wrapper, normalise op codes (`r` snapshot reads → insert), and
  * project `{op, table, pk, before, after, ts_ms, tx}`.
  *
  * Works identically on a batch DataFrame of strings and on a Kafka
  * `readStream` (`selectExpr("CAST(value AS STRING)")` first).
  */
object DebeziumSource {

  /** Envelope schema: payloads stay as raw JSON strings (open schema —
    * MapType-like handling downstream, SURVEY §1.3). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("ts_ms", LongType),
    StructField("source", StructType(Seq(
      StructField("table", StringType),
      StructField("lsn", LongType)))),
    StructField("tx", StructType(Seq(
      StructField("id", StringType),
      StructField("index", LongType),
      StructField("total", LongType),
      StructField("last", BooleanType)))),
    StructField("payload", StringType) // optional wrapper
  ))

  /** Decode a column of JSON envelope strings. Rows whose JSON cannot be
    * parsed decode to null fields (tracked, not dropped — the verifier
    * counts them). */
  def decode(df: DataFrame, valueCol: Column, tableAllowlist: Seq[String] = Nil): DataFrame = {
    val parsedOuter = df.withColumn("env", from_json(valueCol, envelopeSchema))
    // unwrap the optional {payload: {...}} wrapper (index.js:258-262)
    val parsed = parsedOuter.withColumn("env",
      when(col("env.payload").isNotNull, from_json(col("env.payload"), envelopeSchema))
        .otherwise(col("env")))
    val decoded = parsed.select(
      when(lower(col("env.op")).isin("c", "r"), "insert")
        .when(lower(col("env.op")) === "u", "update")
        .when(lower(col("env.op")) === "d", "delete").as("op"),
      col("env.source.table").as("tbl"),
      coalesce(
        get_json_object(col("env.after"), "$.id"),
        get_json_object(col("env.before"), "$.id")).as("pk"),
      col("env.before").as("before_json"),
      col("env.after").as("after_json"),
      col("env.ts_ms").as("ts_ms"),
      col("env.source.lsn").as("lsn"),
      col("env.tx.id").as("tx_id"),
      col("env.tx.index").as("tx_index"),
      col("env.tx.total").as("tx_total"),
      coalesce(col("env.tx.last"),
        col("env.tx.index") >= col("env.tx.total") - 1,
        lit(true)).as("tx_last"))
    if (tableAllowlist.isEmpty) decoded
    else decoded.filter(col("tbl").isin(tableAllowlist: _*)) // index.js:265-267
  }
}
