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

  /** Backlog/consumed time series (`src/engine/metrics.ts:23-46`; backlog
    * derivation `src/changefeed/model.ts:375-382`): per consumer lane and
    * 50ms tick, how many events became available (produced), how many the
    * throttle drained, and the running backlog Σ(produced − drained).
    *
    * Input is `Consumer.throttleDrain` output (method, availableAt,
    * drainTick). Only active ticks materialize (sparse series); the running
    * backlog window is partitioned by lane, so the scan parallelizes across
    * lanes — no global window.
    */
  def backlogSeries(drained: DataFrame, stepMs: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val produced = drained
      .select(col("method"), expr(s"((availableAt - 1) div $stepMs) + 1").as("tick"))
      .groupBy("method", "tick").agg(count(lit(1)).as("produced"))
    val consumed = drained
      .select(col("method"), col("drainTick").as("tick"))
      .groupBy("method", "tick").agg(count(lit(1)).as("drained"))
    val perLane = Window.partitionBy("method").orderBy("tick")
    produced.join(consumed, Seq("method", "tick"), "full_outer")
      .select(col("method"), col("tick"),
        (col("tick") * stepMs).as("tick_ms"),
        coalesce(col("produced"), lit(0L)).as("produced"),
        coalesce(col("drained"), lit(0L)).as("drained"))
      .withColumn("backlog", sum(col("produced") - col("drained")).over(perLane))
  }

  /** Exact (linear-interpolation) lag percentiles — matches the reference's
    * `percentile` (`src/engine/metrics.ts:131-139`: `index = (n-1)*p`,
    * interpolate between floor and ceil). Spark's `percentile` aggregate uses
    * the same definition (as does DuckDB's `quantile_cont`).
    *
    * Bounded-state shape (the global percentile is a keyless aggregate, so
    * its final merge runs on ONE reducer — the state must be provably
    * small): (a) lag values saturate at `capMs` (default 2^20−1 ms ≈ 17.5
    * minutes — a CDC lane whose lag exceeds that has failed in a way no
    * percentile needs to resolve), capping distinct values at 2^20, the
    * same grid recipe as `Corpus.qualityPercentiles`; (b) the raw rows are
    * first reduced to a (lag → count) histogram by a KEYED aggregation —
    * parallel across reducers at any row count — and the percentile runs
    * over the histogram with `count` as the frequency argument, which is
    * the identical interpolating computation over the expanded multiset
    * (bit-exact vs DuckDB `quantile_cont` on the raw rows). The keyless
    * final merge therefore combines ≤2^20-entry maps built from histogram
    * rows, never row-proportional state, no matter how many billions of
    * events a lane carries.
    */
  def lagPercentiles(
      events: DataFrame, method: String, lagCol: String = "lag_ms",
      capMs: Long = (1L << 20) - 1): DataFrame = {
    val hist = events
      .select(least(col(lagCol), lit(capMs)).as("_lag"))
      .groupBy("_lag").agg(count(lit(1)).as("_n"))
    hist.groupBy()
      .agg(
        expr("round(percentile(_lag, 0.5D, _n), 3)").as("p50"),
        expr("round(percentile(_lag, 0.95D, _n), 3)").as("p95"),
        max(col("_lag")).as("max_lag"))
      .select(lit(method).as("method"), col("p50"), col("p95"), col("max_lag"))
  }

  /** Lag SLA attainment ledger — the freshness question percentiles
    * don't answer ("what fraction of events land within OUR budget?"):
    * per candidate SLA threshold, the count and fraction of the lane's
    * events whose capture lag fits. Read next to
    * [[lagPercentiles]]: p95 describes the lane, this scores it against
    * a contract. One aggregate row of conditional counts per lane (one
    * pair per threshold — map-side combine, nothing explodes), `stack`
    * unpivoted; cost is one pass however many thresholds are scored. */
  def lagSla(events: DataFrame, method: String,
      thresholds: Seq[Long] = Seq(10L, 100L, 1000L, 10000L),
      lagCol: String = "lag_ms"): DataFrame = {
    require(thresholds.nonEmpty)
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      count(when(col(lagCol) <= t, 1)).as(s"_w$i")
    } :+ count(lit(1)).as("_n")
    val one = events.agg(aggs.head, aggs.tail: _*)
    val stackArgs = thresholds.zipWithIndex
      .map { case (t, i) => s"CAST($t AS BIGINT), _w$i" }.mkString(", ")
    one.selectExpr(
      s"stack(${thresholds.size}, $stackArgs) AS (sla_ms, n_within)", "_n")
      .select(lit(method).as("method"), col("sla_ms"), col("n_within"),
        col("_n").as("n_events"),
        (col("n_within").cast("double") / col("_n")).as("within_frac"))
  }

  /** Rolling-window lag percentiles — the reference's MetricsStore keeps only
    * the LAST 2000 lag samples per lane in a ring buffer
    * (`src/engine/metrics.ts:42-44`) and computes p50/p95 over that window, so
    * a long-running feed's dashboard tracks recent lag, not lifetime lag.
    *
    * Input is a union of lanes: (method, ord1, ord2, lagCol) where
    * (ord1, ord2) is the lane's delivery order (unique per event). The last-N
    * slice is exact and never sorts a whole lane: phase 1 prunes each input
    * partition to its own top-N by delivery order (window keyed by
    * (method, input partition) — parallel in the number of partitions), so
    * phase 2's per-lane ranking sorts at most N × numPartitions survivors.
    * A ring buffer of 2000 makes both sorts trivially bounded at any corpus
    * size; the lane partitioning keeps every window distributed.
    */
  def lagPercentilesRolling(lanes: DataFrame, lastN: Int = 2000, lagCol: String = "lag_ms"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col("ord1").desc, col("ord2").desc)
    val localW = Window.partitionBy(col("method"), col("_pid")).orderBy(order: _*)
    val laneW = Window.partitionBy(col("method")).orderBy(order: _*)
    lanes
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(localW))
      .filter(col("_lrn") <= lastN)
      .withColumn("_rn", row_number().over(laneW))
      .filter(col("_rn") <= lastN)
      .groupBy("method")
      .agg(
        expr(s"round(percentile($lagCol, 0.5), 3)").as("p50"),
        expr(s"round(percentile($lagCol, 0.95), 3)").as("p95"),
        max(col(lagCol)).as("max_lag"),
        count(lit(1)).as("window_n"))
  }
}
