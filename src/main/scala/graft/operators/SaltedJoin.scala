package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Salted equality join — the explicit skew weapon for the case AQE's
  * runtime skew-join split cannot reach: a single hot key on the probe
  * side whose matching build rows are too numerous to broadcast, arriving
  * through an exchange AQE has already planned.
  *
  * Mechanics: each probe row gets a deterministic salt in `[0, salts)`
  * (Murmur3 of the row's hashable columns — reproducible across retries,
  * no partition-id nondeterminism); the build side is replicated `salts`
  * ways with a narrow explode; the join key becomes (keys, salt). A key
  * that previously funneled through one reducer now spreads across
  * `salts` reducers, at the price of `salts`× the build side's shuffle
  * volume — the standard trade, made explicit and testable.
  *
  * Salt entropy, honestly: the salt is a pure function of the probe row's
  * content (MapType columns excluded — Spark's `hash` rejects maps). Rows
  * that are EXACT duplicates therefore land on one salt and that slice of
  * the skew persists; this is the price of retry determinism (partition-id
  * or RNG salts re-deal rows on task retry and can double-count under
  * shuffle replay). If exact-duplicate fact rows at a hot key are the
  * dominant skew, carry a distinguishing column from the source (Kafka
  * offset, `input_file_name` + row position, an ingest uuid) into the
  * probe schema — any such column restores full spread while keeping the
  * salt deterministic.
  *
  * Join types: `inner` and `left_outer` only. An unmatched probe row
  * joins nothing in exactly one salted bucket per replica — the left-outer
  * null row appears once, correct. Right/full outer would emit one
  * unmatched-build row PER REPLICA and are rejected.
  *
  * At 100 TB: use when key-frequency stats (or a failed stage) identify
  * skew; `salts` sizes to the hot key's overload factor — or let
  * [[autoSalts]] measure it from a sample so the weapon self-sizes.
  * AQE's `skewJoin` handles sort-merge skew transparently — this operator
  * is for the cases it does not (aggregated build sides below a shuffle
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
    require(!(left.columns ++ right.columns).contains("_salt"),
      "reserved internal column name present: _salt")
    // hash() raises on MapType (maps have no canonical order); salt from
    // the remaining columns — still deterministic, maps just add no entropy.
    val hashable = left.schema.fields.toSeq
      .filterNot(_.dataType.isInstanceOf[MapType]).map(f => col(f.name))
    val saltCol =
      if (hashable.isEmpty) lit(0) else pmod(hash(hashable: _*), lit(salts))
    val l = left.withColumn("_salt", saltCol)
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s)): _*)))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Measure the probe side's key skew on a sample and derive a salt
    * count, so callers don't have to guess.
    *
    * Estimator: sample `fraction` of `probe` (deterministic seed),
    * `groupBy(keys).count`, take the top-1 key's share of the sampled
    * rows. Under even hashing a reducer holds `1/shufflePartitions` of
    * the data, so the hot key overloads its reducer by
    * `share × shufflePartitions`; that overload factor IS the number of
    * ways the key must split to look average. Clamped to
    * `[1, maxSalts]` — 1 means "no skew, use a plain join".
    *
    * Driver cost: one aggregate of two scalars over the sample — a
    * partial-agg shuffle of the sampled rows only, no data collect. At
    * 100 TB with fraction=1e-4 that is a ~10 GB scan producing one row;
    * run it once and cache the decision per (table, keys).
    *
    * Reducer-count source: `spark.sql.shuffle.partitions` when it parses
    * as an int, else `sparkContext.defaultParallelism` (the conf value may
    * be symbolic, e.g. "auto"). AQE caveat: with partition coalescing the
    * configured value can overstate the real post-coalesce reducer count,
    * which inflates the derived salt count — harmless (over-splitting a
    * hot key costs only extra build replication, clamped by `maxSalts`).
    */
  def autoSalts(
      probe: DataFrame,
      keys: Seq[String],
      fraction: Double = 0.01,
      maxSalts: Int = 64,
      seed: Long = 42L): Int = {
    require(fraction > 0 && fraction <= 1, "fraction must be in (0,1]")
    require(maxSalts >= 1, "maxSalts must be >= 1")
    val parts = probe.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.getOrElse(probe.sparkSession.sparkContext.defaultParallelism)
    val row = probe.sample(withReplacement = false, fraction, seed)
      .groupBy(keys.map(col): _*).count()
      .agg(max("count").as("top1"), sum("count").as("total"))
      .head()
    if (row.isNullAt(0) || row.getLong(1) == 0L) 1
    else {
      val share = row.getLong(0).toDouble / row.getLong(1).toDouble
      math.min(maxSalts.toLong, math.max(1L, math.ceil(share * parts).toLong)).toInt
    }
  }

  /** [[join]] with `salts` derived by [[autoSalts]] on the probe side.
    * Returns the chosen salt count alongside the frame so callers can log
    * the decision.
    */
  def joinAuto(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      fraction: Double = 0.01,
      maxSalts: Int = 64,
      seed: Long = 42L): (DataFrame, Int) = {
    val salts = autoSalts(left, keys, fraction, maxSalts, seed)
    (join(left, right, keys, salts, joinType), salts)
  }

  /** Exact join-key skew ledger — the audit a pipeline engineer runs
    * BEFORE choosing between a plain join, AQE skew split, or [[join]]:
    * the top-`k` heaviest keys with their row share, the running share
    * of the head, and the per-key salt count [[autoSalts]]' estimator
    * would derive at `parts` reducers (`⌈share × parts⌉` — the overload
    * factor). `cum_share` divides an exact integer running count by the
    * exact total (one division per row — never a re-associated running
    * double sum), so the ledger hashes identically on any engine.
    *
    * Shape at 100 TB: one keyed count with map-side combine (key
    * cardinality crosses the wire, not rows), a 1-row total broadcast,
    * and a `TakeOrderedAndProject` top-k — the running-share window runs
    * over the k surviving rows only, never over the key universe. */
  def skewProfile(df: DataFrame, keys: Seq[String], k: Int = 10,
      parts: Int = 32): DataFrame = {
    val keyCols = keys.map(col)
    val ord = col("key_count").desc +: keyCols
    val counts = df.groupBy(keyCols: _*).agg(count(lit(1)).as("key_count"))
    val total = counts.agg(sum("key_count").as("_total"))
    val topK = counts.orderBy(ord: _*).limit(k).crossJoin(broadcast(total))
    BoundedWindow.cumulative(
      topK, struct((-col("key_count")).as("_nc") +: keyCols: _*),
      Seq("key_count" -> "_cum_count"), Some("rnk"))
      .withColumn("share", col("key_count").cast("double") / col("_total"))
      .withColumn("cum_share",
        col("_cum_count").cast("double") / col("_total"))
      .withColumn("salts_needed",
        ceil(col("key_count").cast("double") / col("_total") * parts).cast("long"))
      .select((col("rnk") +: keyCols) ++ Seq(col("key_count"), col("share"),
        col("cum_share"), col("salts_needed")): _*)
  }
}
