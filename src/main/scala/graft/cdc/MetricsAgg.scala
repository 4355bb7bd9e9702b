package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lane metrics (`src/engine/metrics.ts`, `web/App.tsx:931-1020`): produced /
  * op-mix counters, exact interpolating lag percentiles, and write
  * amplification.
  */
object MetricsAgg {

  /** Per-lane op mix + write amplification. Write amplification =
    * `(sourceWrites + auxWrites) / sourceWrites` (`src/engine/metrics.ts:60-73`);
    * trigger capture costs one audit write per op → 2.0, log/poll → 1.0.
    */
  def laneMix(events: DataFrame, method: String, sourceWrites: Long, auxWrites: Long, opCol: String = "op_code"): DataFrame =
    events.groupBy()
      .agg(
        count(lit(1)).as("produced"),
        count(when(col(opCol) === "c", 1)).as("inserts"),
        count(when(col(opCol) === "u", 1)).as("updates"),
        count(when(col(opCol) === "d", 1)).as("deletes"))
      .select(
        lit(method).as("method"),
        col("produced"), col("inserts"), col("updates"), col("deletes"),
        lit((sourceWrites + auxWrites).toDouble / sourceWrites).as("write_amp"))

  /** Exact (linear-interpolation) lag percentiles — matches the reference's
    * `percentile` (`src/engine/metrics.ts:131-139`: `index = (n-1)*p`,
    * interpolate between floor and ceil). Spark's `percentile` aggregate uses
    * the same definition (as does DuckDB's `quantile_cont`).
    */
  def lagPercentiles(events: DataFrame, method: String, lagCol: String = "lag_ms"): DataFrame =
    events.groupBy()
      .agg(
        expr(s"round(percentile($lagCol, 0.5), 3)").as("p50"),
        expr(s"round(percentile($lagCol, 0.95), 3)").as("p95"),
        max(col(lagCol)).as("max_lag"))
      .select(lit(method).as("method"), col("p50"), col("p95"), col("max_lag"))
}
