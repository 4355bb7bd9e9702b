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
