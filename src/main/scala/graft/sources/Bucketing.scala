package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing for co-located joins — the build-once/join-many
  * path a fact↔fact join takes at 100 TB.
  *
  * A shuffle join moves BOTH sides across the network every time it runs.
  * Writing each side once as a bucketed table (same bucket count, bucketed
  * on the join key, sorted within buckets) pins partitioning INTO THE
  * STORAGE LAYOUT: every later equi-join on the bucket key plans as a
  * sort-merge join with ZERO Exchange on either side (asserted in
  * BucketingSpec) — the join cost collapses to a co-partitioned merge,
  * amortizing one write-side shuffle across every downstream join, the
  * same build/probe economics as the IVF index split
  * (`llm/Similarity.scala`).
  *
  * Buckets also bound file sizes and give bucket pruning on point lookups.
  * At scale, bucket count sizes to (table size / healthy partition size)
  * and both sides MUST agree on it — mismatched counts fall back to a
  * shuffle on one side.
  */
object Bucketing {

  /** Per-JVM unique suffix for bucketed table names and paths. Two
    * concurrent runs (parallel bench/test processes on one machine) using
    * fixed names race on `DROP TABLE` + overwrite and can read each
    * other's half-written buckets — wrong results, not an error. The
    * Spark application id is unique per JVM, so suffixing names and paths
    * with it confines each run to its own namespace. */
  def runTag(spark: SparkSession): String =
    spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9_]", "_")

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, Int)]()

  /** [[bucketize]] exactly once per table name per JVM; later calls reuse
    * the registered table. This is the operator's whole economics — build
    * once, join many — made literal: a benchmark rep or repeated query
    * pays the write-side shuffle on first touch only, and every
    * subsequent run measures the zero-Exchange join the layout exists
    * for. Thread-safe via computeIfAbsent (parallel test suites).
    *
    * The memo records (path, key, buckets) from the first build; a later
    * call reusing the table name with a DIFFERENT layout is a caller bug
    * (it would silently serve the first build's data) and fails fast. */
  def bucketizeOnce(
      spark: SparkSession,
      df: => DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): DataFrame = {
    val layout = built.computeIfAbsent(table, _ => {
      bucketize(spark, df, table, path, key, buckets); (path, key, buckets)
    })
    require(layout == ((path, key, buckets)),
      s"bucketizeOnce($table): already built with layout $layout, " +
        s"requested (${path}, ${key}, ${buckets}) — use a distinct table name")
    spark.table(table)
  }

  /** Write `df` as an external parquet table bucketed + sorted on `key` at
    * `path`, registered as `table` (overwriting both), and return the
    * re-read frame whose scan carries the bucket layout. */
  def bucketize(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      buckets: Int): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
    spark.table(table)
  }
}
