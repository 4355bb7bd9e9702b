package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: for each probe row, attach the single build
  * row with the greatest `ts` at-or-before (inclusive, the default) or
  * strictly-before the probe's `ts`, within the same key group. The shape a
  * feature-store lookup, last-click attribution, or slowly-changing-dimension
  * enrichment needs — and one Spark has no built-in operator for.
  *
  * Spark-first formulation: UNION + running `last(_, ignoreNulls)` window
  * instead of a join. Both inputs are tagged and unioned into one aligned
  * frame; a window partitioned by the keys and ordered by (ts, tag) carries
  * each build payload column forward as a running last-non-null; probe rows
  * then read the carried values and build rows are dropped.
  *
  * Why this beats the join formulations at scale:
  *   - ONE hash shuffle of probe+build by the keys (the union is a no-op
  *     narrow transform) — a join needs the same shuffle and then an extra
  *     per-key sort or build-side aggregation on top.
  *   - The window frame is UNBOUNDED PRECEDING..CURRENT ROW, which
  *     WindowExec evaluates with O(1) running state per row — never
  *     buffering a key group, so a hot key spills to the sorter, not to an
  *     in-memory map. No row_number, no self-join, no per-probe subquery.
  *   - Inequality-join rewrites (probe.ts >= build.ts) degenerate to
  *     BroadcastNestedLoopJoin; this stays a plain Exchange + Sort +
  *     Window whatever the input sizes.
  *
  * Tie semantics: a build row at exactly probe `ts` is visible when
  * `inclusive` (build sorts before probe on equal ts), invisible otherwise.
  * Determinism: build rows must be unique per (keys, ts) — dedup with
  * `max_by` upstream if they are not (equal-ts build rows have no defined
  * winner in any as-of engine, DuckDB's ASOF JOIN included).
  *
  * Reference anchor: the playground's lag/attribution analytics join each
  * consumed event to the latest source-bus state at-or-before its delivery
  * tick (sim/metrics.ts:118-139); this is that operator generalized.
  */
object AsOfJoin {

  /** Left as-of join of `probe` to `build`.
    *
    * @param probe    rows to enrich; all its columns pass through.
    * @param build    rows to look up; its non-key, non-ts columns are
    *                 appended (null when no build row is at-or-before).
    *                 Payload column names must not clash with probe's.
    * @param keys     equality key columns present on both sides.
    * @param ts       BIGINT event-time column present on both sides.
    * @param inclusive whether a build row at exactly probe `ts` matches.
    */
  def asOf(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      ts: String,
      inclusive: Boolean = true): DataFrame = {
    val probePayload = probe.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    val buildPayload = build.columns.toSeq.filterNot(c => keys.contains(c) || c == ts)
    require(probePayload.intersect(buildPayload).isEmpty,
      s"payload name clash: ${probePayload.intersect(buildPayload).mkString(",")}")
    val reserved = Seq("_tag", "_bpay")
    require(!(probe.columns ++ build.columns).exists(reserved.contains),
      s"reserved internal column names present: ${reserved.mkString(",")}")

    // One aligned schema: keys, ts, tag, probe payload (null on build rows),
    // and the ENTIRE build payload packed into one struct column (null on
    // probe rows). Build sorts before probe on equal ts iff inclusive.
    //
    // The struct pack is load-bearing for correctness, not style: carrying
    // each build column as its own last(_, ignoreNulls) would let a build row
    // with a null field inherit the PREVIOUS build row's value for that field
    // only — a column-wise chimera of two build rows, which no as-of
    // semantics permit. One non-null struct per build row makes the carry
    // atomic: a matched build row is taken whole, null fields included.
    val buildTag = if (inclusive) lit(0) else lit(2)
    val common: Seq[Column] = keys.map(col) :+ col(ts)
    val packed = struct(buildPayload.map(col): _*)
    val packedType = org.apache.spark.sql.types.StructType(
      buildPayload.map(c => build.schema(c)))
    val probeSide = probe.select(
      common ++ Seq(lit(1).as("_tag")) ++
        probePayload.map(col) :+
        lit(null).cast(packedType).as("_bpay"): _*)
    val buildSide = build.select(
      common ++ Seq(buildTag.as("_tag")) ++
        probePayload.map(c => lit(null).cast(probe.schema(c).dataType).as(c)) :+
        packed.as("_bpay"): _*)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col("_tag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)

    probeSide.unionByName(buildSide)
      .select(
        (keys.map(col) :+ col(ts) :+ col("_tag")) ++
          probePayload.map(col) :+
          last(col("_bpay"), ignoreNulls = true).over(w).as("_bpay"): _*)
      .where(col("_tag") === 1)
      .select(
        (keys.map(col) :+ col(ts)) ++
          probePayload.map(col) ++
          buildPayload.map(c => col("_bpay").getField(c).as(c)): _*)
  }
}
