package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lane/state diffing — the reference's verification queries.
  *
  * - `diffLane` (`sim/analysis/diff.ts:124-254`): bucket-positional match.
  *   Both sides are keyed `table::op::pk`; the i-th expected entry of a key
  *   pairs with the i-th actual entry; surplus expected → missing, surplus
  *   actual → extra; lag per matched pair = `max(0, actualTime - expectedTime)`.
  *   Relationally: per-key ordinals via `row_number`, then a full outer join
  *   on (key, ordinal) — shuffle is on the diff key, no global sort.
  * - `orderingInversions` (`sim/analysis/diff.ts:164-186`, per-table variant
  *   `harness/verifier/diff.js:153-179`): pairs delivered out of source order,
  *   found with a running-max window per table.
  * - `diffStates` (`harness/verifier/index.js:138-167`): full outer join of
  *   two materialized states on (tbl, pk), classifying missing/unexpected
  *   rows and per-field mismatches (null-safe compare).
  */
object Diff {

  /** Ordinal-matched lane diff. Inputs need `keyCols` + a `time` column and
    * a deterministic per-key order column. Returns per-pair rows with
    * status. The key stays multi-column end to end (window partition AND
    * join) — no concatenated string key to build, hash, or collide on a
    * separator. */
  def lanePairs(
      expected: DataFrame, // keyCols, time, ord source col
      actual: DataFrame,
      orderCol: String,
      keyCols: Seq[String] = Seq("key")): DataFrame = {
    def ordinal(df: DataFrame, prefix: String): DataFrame = {
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      df.select(
        keyCols.map(col) :+
          col("time").as(s"${prefix}_time") :+
          row_number().over(w).as("ordinal"): _*)
    }
    val e = ordinal(expected, "expected")
    val a = ordinal(actual, "actual")
    e.join(a, keyCols :+ "ordinal", "full_outer")
      .withColumn("status",
        when(col("expected_time").isNotNull && col("actual_time").isNotNull, "matched")
          .when(col("expected_time").isNotNull, "missing")
          .otherwise("extra"))
      .withColumn("lag_ms",
        when(col("status") === "matched",
          greatest(lit(0L), col("actual_time") - col("expected_time"))))
  }

  /** Diff totals (`sim/analysis/diff.ts:235-246`): counts per status plus
    * total matched lag. */
  def laneTotals(pairs: DataFrame): DataFrame =
    pairs.groupBy("status")
      .agg(count(lit(1)).as("cnt"), coalesce(sum("lag_ms"), lit(0L)).as("total_lag_ms"))

  /** Top-K matched pairs by lag (`sim/analysis/diff.ts:188-200`): top-5 by
    * lag desc among lag>0, deterministic tie-break. */
  def lagTopK(pairs: DataFrame, k: Int = 5, tieBreak: Seq[String] = Seq("key", "ordinal")): DataFrame =
    pairs.filter(col("status") === "matched" && col("lag_ms") > 0)
      .orderBy(col("lag_ms").desc +: tieBreak.map(col(_).asc): _*)
      .limit(k)

  /** Running-max inversion scan per partition key: rows whose sequence is
    * smaller than a previously delivered sequence (in delivery order). */
  def orderingInversions(
      df: DataFrame,
      partitionCols: Seq[String],
      deliveryOrder: Seq[Column],
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(deliveryOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("run_max", max(col(seqCol)).over(w))
      .withColumn("inverted", col("run_max").isNotNull && col(seqCol) < col("run_max"))
  }

  /** Golden state comparison: classify rows of two states keyed (tbl, pk).
    * `valCols` are compared null-safely; any difference → field_mismatch. */
  def diffStates(left: DataFrame, right: DataFrame, valCols: Seq[String]): DataFrame = {
    val l = left.select((Seq(col("tbl"), col("pk")) ++ valCols.map(c => col(c).as(s"l_$c"))): _*)
    val r = right.select((Seq(col("tbl"), col("pk")) ++ valCols.map(c => col(c).as(s"r_$c"))): _*)
    val lPresent = col(s"l_present")
    val rPresent = col(s"r_present")
    val joined = l.withColumn("l_present", lit(true))
      .join(r.withColumn("r_present", lit(true)), Seq("tbl", "pk"), "full_outer")
    val anyMismatch = valCols
      .map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    joined.withColumn("status",
      when(lPresent.isNull, "unexpected_row") // only right has it
        .when(rPresent.isNull, "missing_row") // only left has it
        .when(anyMismatch, "field_mismatch")
        .otherwise("match"))
  }

  /** Sampled per-column compare
    * (`scenarios/01-canonical-reference/verifier/verify.mjs:82-126`): take a
    * bounded sample of keys PRESENT ON BOTH sides, compare the configured
    * columns one by one in canonical form, report per-field match rows. The
    * reference samples randomly; here the sample is the first `n` common
    * keys in md5(tbl|pk) order — "random-looking" but deterministic, so the
    * check is reproducible and oracle-able (the nondeterministic
    * `ORDER BY rand()` form would defeat both). The inner join runs on the
    * already-aggregated states and the sort is a bounded top-n
    * (TakeOrdered), so sampling cost is independent of table width.
    */
  def verifySample(
      source: DataFrame, sink: DataFrame,
      valCols: Seq[String], n: Int = 10): DataFrame = {
    val s = source.select(
      (Seq(col("tbl"), col("pk")) ++
        valCols.map(c => Canonical.coerceComparable(col(c)).as(s"src_$c"))): _*)
    val k = sink.select(
      (Seq(col("tbl"), col("pk")) ++
        valCols.map(c => Canonical.coerceComparable(col(c)).as(s"snk_$c"))): _*)
    val sampled = s.join(k, Seq("tbl", "pk"))
      .withColumn("_ord", md5(concat_ws("|", col("tbl"), col("pk"))))
      .orderBy("_ord")
      .limit(n)
    val stacked = valCols
      .map(c => s"'$c', src_$c, snk_$c")
      .mkString(s"stack(${valCols.length}, ", ", ", ") AS (col_name, src_val, snk_val)")
    sampled
      .selectExpr("tbl", "pk", stacked)
      .withColumn("matches", col("src_val") <=> col("snk_val"))
  }

  /** Source↔sink verify (`scenarios/01-canonical-reference/verifier/verify.mjs:131-221`):
    * both-direction anti-join accounting in ONE job — per-key row counts on
    * each side, a single full-outer join of the (already tiny) aggregates,
    * and conditional sums. Summing the per-key counts keeps exact anti-join
    * row semantics under duplicate keys, and one pass replaces the four
    * separate count actions the naive form needs. */
  def verifyCounts(source: DataFrame, sink: DataFrame, keyCols: Seq[String]): DataFrame = {
    val s = source.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n_src"))
    val k = sink.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("_n_snk"))
    s.join(k, keyCols, "full_outer")
      .agg(
        coalesce(sum("_n_src"), lit(0L)).as("source_rows"),
        coalesce(sum("_n_snk"), lit(0L)).as("sink_rows"),
        coalesce(sum(when(col("_n_snk").isNull, col("_n_src"))), lit(0L)).as("missing_in_sink"),
        coalesce(sum(when(col("_n_src").isNull, col("_n_snk"))), lit(0L)).as("orphans_in_sink"))
      .selectExpr(
        """stack(4,
          |  'source_rows', source_rows,
          |  'sink_rows', sink_rows,
          |  'missing_in_sink', missing_in_sink,
          |  'orphans_in_sink', orphans_in_sink) AS (metric, cnt)""".stripMargin)
  }

  /** Repair-op emission — [[diffStates]] turned into ACTION: for every
    * divergent key, the op that converges the sink onto the source truth
    * (the "reconcile" step a verifier runs after the count/sample checks
    * flag drift): source-only → `insert`, both-but-different → `update`
    * (source image carried), sink-only → `delete`. Matching keys emit
    * nothing — the repair feed is divergence-sized, not table-sized.
    *
    * Shape: ONE (tbl, pk)-keyed full-outer join of two already-reduced
    * state images (both key-cardinality), the classification in the
    * projection — the same scale contract as [[diffStates]]; no second
    * pass, no window. */
  def reconcileOps(source: DataFrame, sink: DataFrame,
      valCols: Seq[String]): DataFrame = {
    val l = source.select(
      (Seq(col("tbl"), col("pk")) ++ valCols.map(c => col(c).as(s"l_$c"))): _*)
    val r = sink.select(
      (Seq(col("tbl"), col("pk")) ++ valCols.map(c => col(c).as(s"r_$c"))): _*)
    val joined = l.withColumn("l_present", lit(true))
      .join(r.withColumn("r_present", lit(true)), Seq("tbl", "pk"), "full_outer")
    val anyMismatch = valCols
      .map(c => !(col(s"l_$c") <=> col(s"r_$c")))
      .reduce(_ || _)
    joined
      .withColumn("repair_op",
        when(col("l_present").isNull, "delete")
          .when(col("r_present").isNull, "insert")
          .when(anyMismatch, "update")
          .otherwise("noop"))
      .filter(col("repair_op") =!= "noop")
      .select((Seq(col("tbl"), col("pk"), col("repair_op")) ++
        valCols.map(c => col(s"l_$c").as(c))): _*)
  }
}
