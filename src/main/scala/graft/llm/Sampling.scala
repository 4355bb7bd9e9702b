package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hash31

/** Deterministic sampling for corpus construction.
  *
  * A 100 TB pretraining build samples per stratum (language, source,
  * quality band) with different rates — and the selection must be
  * DETERMINISTIC so reruns, audits, and incremental rebuilds keep the same
  * documents (`rand()`-based sampling re-rolls every run and every retry of
  * a failed task). Selection here is the reference's own fault-injection
  * primitive (`shouldDrop`, `src/changefeed/model.ts:100-104`) pointed at
  * doc ids: keep iff `hash31(id) % 100 < floor(rate·100)` — a pure per-row
  * projection, no shuffle, reproducible in any engine with the same hash.
  */
object Sampling {

  /** Keep-decision column: stratum-dependent deterministic Bernoulli.
    * `rates` maps stratum value → keep rate in [0, 1] (floor(rate·100)
    * percent resolution — the reference's `shouldDrop` scaling). */
  def stratifiedKeep(
      idCol: Column,
      strataCol: Column,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): Column = {
    def keep(rate: Double): Column =
      hash31(idCol.cast("string")) % 100 < lit(math.floor(rate * 100).toLong)
    rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(false))) { case (acc, (s, r)) =>
        acc.when(strataCol === s, keep(r))
      }
      .otherwise(keep(defaultRate))
  }

  /** Per-stratum sampling report over `documents`: total, kept, and the
    * applied rate — the audit table a sampled corpus ships with. One scan,
    * one partial-agg shuffle keyed by the (low-cardinality) stratum. */
  def stratifiedSummary(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    val kept = stratifiedKeep(col("doc_id"), col("lang"), rates, defaultRate)
    docs
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(kept, 1)).as("n_kept"))
      .withColumn("kept_frac",
        col("n_kept").cast("double") / col("n_docs"))
  }
}
