package graft.testutil

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.WorkloadGen

/** Test scenario builders, backed by the engine's deterministic workload
  * generators (`graft.sources.WorkloadGen` — the reference's seeded LCG
  * harness, `sim/tests/property-tests.mjs:29-132`).
  */
object Scenarios {

  /** Build an ops DataFrame (CdcOps.ops schema) from tuples of
    * (t, tbl, pk, op, setsVal, val, setsK, k); lsn/event_id by position. */
  def opsDf(spark: SparkSession, rows: Seq[WorkloadGen.OpTuple]): DataFrame =
    WorkloadGen.toOpsDf(spark, rows)

  /** Union of one random scenario per seed, one table per seed (`s<seed>`),
    * as a single ops DataFrame — invariant checks run in one pass. */
  def propertyOps(spark: SparkSession, seeds: Seq[Long]): DataFrame =
    opsDf(spark, seeds.flatMap(seed => WorkloadGen.randomScenario(seed, s"s$seed")))
}
