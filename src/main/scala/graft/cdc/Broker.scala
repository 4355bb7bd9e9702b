package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Partitioned broker semantics (`src/changefeed/model.ts:47-50,92-167`):
  * hash-partition routing, deterministic drop-based fault injection, and
  * commit-drift reordering. All three use the reference's exact `hash31 mod
  * 9973` hash (see [[graft.functions.Hash31]]) so partition assignment, drop
  * decisions, and drift delays are bit-identical to the reference trace.
  *
  * Hash-parity CONTRACT: [[graft.functions.Hash31]] folds Unicode CODE
  * POINTS, the reference's `charCodeAt` loop folds UTF-16 code units —
  * identical on the Basic Multilingual Plane, divergent for supplementary-
  * plane characters (emoji, rare CJK). Routing/drop/drift parity with the
  * reference trace is therefore guaranteed for BMP keys only; keys
  * containing astral code points are OUT OF CONTRACT for trace-level
  * parity (the routing itself stays deterministic and well-distributed —
  * only the specific partition/drop choices differ from the reference's).
  */
object Broker {

  /** Route events to `partitions` queues by pk and mark dropped events
    * (`model.ts:100-109`): `part = hash31(pk) % n`,
    * `dropped = hash31(lsn) % 100 < floor(p*100)`. */
  def route(events: DataFrame, pkCol: Column, lsnCol: Column, partitions: Int, dropProbability: Double): DataFrame =
    events
      .withColumn("part", partitionForKey(pkCol, partitions))
      .withColumn("dropped", shouldDrop(lsnCol.cast("string"), dropProbability))

  /** Commit drift (`model.ts:140-149`): delay availability of half the
    * events (by txn-derived hash parity) by `driftMs`, producing late /
    * reordered arrivals. Returns `available_at`.
    *
    * Drift also changes the ENQUEUE POSITION in the reference: drifted mode
    * `splice`s every event into the front of its partition queue
    * (`model.ts:144` — `insertAt = 0`), turning the queue LIFO. That
    * delivery-order consequence is modeled exactly by
    * [[graft.cdc.Consumer.brokerDeliverDriftExact]]; the FIFO trace (drift
    * off) by [[graft.cdc.Consumer.brokerDeliverExact]]. */
  def withDrift(events: DataFrame, txKeyCol: Column, commitTsCol: Column, driftMs: Long = 50L): DataFrame =
    events.withColumn("available_at",
      commitTsCol + (hash31(txKeyCol.cast("string")) % 2L) * driftMs)

  /** Per-partition delivery order = (available_at, lsn); inversion counting
    * over that order is `Diff.orderingInversions`. */
}
