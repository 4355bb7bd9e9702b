package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Readers for the driver-provided parquet tables (`TESTDATA.md`).
  *
  * `events.ts` has been written as parquet `TIMESTAMP(NANOS)` (which Spark's
  * parquet reader rejects outright — `PARQUET_TYPE_ILLEGAL`) in some rounds
  * and `TIMESTAMP(MICROS)` in others. We read the physical INT64 directly via
  * an explicit `LongType` schema (works for every INT64-backed unit), then
  * normalize to epoch-NANOS by magnitude — the 2024-era epoch is ~1.7e9 s /
  * ~1.7e12 ms / ~1.7e15 µs / ~1.7e18 ns, three decades apart per unit, so the
  * band test is unambiguous for any timestamp between 1973 and 2200. All
  * downstream logic keeps the nanos contract (`ts div 1_000_000` → ms), which
  * matches DuckDB's `epoch_ms(ts)` exactly for these (positive) timestamps.
  */
object Tables {

  /** events.parquet with `ts` normalized to raw epoch-nanos (see note above). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, concat, lit, raise_error, when}
    val raw = col("ts")
    // each band is guarded on BOTH sides: the floor keeps the unit test
    // unambiguous (pre-1973 / null / negative → undecidable), the ceiling
    // keeps the nanos multiply representable (a µs/ms/s value past ~2262
    // would wrap the Long silently under non-ANSI eval — fail loudly on
    // both sides, symmetrically)
    val nanos = when(raw >= 100000000000000000L, raw)   // ≥ 1e17: already ns
      .when(raw >= 100000000000000L &&
        raw <= Long.MaxValue / 1000L, raw * 1000L)      // ≥ 1e14: µs → ns
      .when(raw >= 100000000000L &&
        raw <= Long.MaxValue / 1000000L, raw * 1000000L)    // ≥ 1e11: ms → ns
      .when(raw >= 100000000L &&
        raw <= Long.MaxValue / 1000000000L, raw * 1000000000L) // ≥ 1e8: s → ns
      .otherwise(raise_error(concat(
        lit("events.ts outside the decidable magnitude bands "),
        lit("(pre-1973/null → unit undecidable; post-2262 → nanos overflow): "),
        coalesce(raw.cast("string"), lit("null")))))
    spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", nanos)
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
