package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.{ApplyEngine, Capture, Diff}

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2 + the LLM-pipeline extensions), each with a DuckDB oracle in
  * `Oracles`. Spark-side column names/aliases match the oracle SQL exactly
  * (the driver's compare sorts columns by name before hashing).
  *
  * The entries live in an ordered trait chain split by domain
  * (round-12 verdict directive #7, the Oracles.scala recipe):
  * [[SparkEntryBase]] (shared helpers) ← [[SparkEntryCdc]] ←
  * [[SparkEntryTpch]] ← [[SparkEntryEvents]] ← [[SparkEntryDedup]] ←
  * [[SparkEntryAnn]] ← [[SparkEntryText]] ← [[SparkEntryMedia]] ← this
  * object. The `queries` map API is unchanged — the chain exists so no
  * single file regrows past ~1k lines as waves append.
  */
object SparkEntry extends SparkEntryMedia {

  /** Flagship: the SURVEY §7.2 end-to-end slice on sf0.001 — log capture →
    * event replay → state diff against the ordered merge-fold apply. All
    * rows must classify as `match` (log capture is lossless). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val state = st(spark, dir)
    val logLane = Capture.log(state)
    val replayed = ApplyEngine.replayEvents(logLane, "lsn")
    val truth = ApplyEngine.applyState(ops(spark, dir))
    Diff.diffStates(truth, replayed, Seq("val", "k"))
      .groupBy("status").agg(count(lit(1)).as("cnt"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    cdcQueries ++ tpchQueries ++ eventsQueries ++ dedupQueries ++
      annQueries ++ textQueries ++ mediaQueries

  /** DuckDB oracle SQL per query (same keys as `queries`). */
  def oracleSql: Map[String, String] = Oracles.all
}
