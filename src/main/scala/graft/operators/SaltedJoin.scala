package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equality join — the explicit skew weapon for the case AQE's
  * runtime skew-join split cannot reach: a single hot key on the probe
  * side whose matching build rows are too numerous to broadcast, arriving
  * through an exchange AQE has already planned.
  *
  * Mechanics: each probe row gets a deterministic salt in `[0, salts)`
  * (Murmur3 of the whole row — reproducible across retries, no
  * partition-id nondeterminism); the build side is replicated `salts`
  * ways with a narrow explode; the join key becomes (keys, salt). A key
  * that previously funneled through one reducer now spreads across
  * `salts` reducers, at the price of `salts`× the build side's shuffle
  * volume — the standard trade, made explicit and testable.
  *
  * Join types: `inner` and `left_outer` only. An unmatched probe row
  * joins nothing in exactly one salted bucket per replica — the left-outer
  * null row appears once, correct. Right/full outer would emit one
  * unmatched-build row PER REPLICA and are rejected.
  *
  * At 100 TB: use when key-frequency stats (or a failed stage) identify
  * skew; `salts` sizes to the hot key's overload factor. AQE's
  * `skewJoin` handles sort-merge skew transparently — this operator is
  * for the cases it does not (aggregated build sides below a shuffle
  * hash join, deterministic pre-planned spread, bucketed inputs).
  */
object SaltedJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted $joinType would duplicate unmatched build rows")
    val l = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s)): _*)))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }
}
