package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.cdc._
import graft.functions.GraftFunctions
import graft.llm.{Chunking, Clusters, Corpus, Dedup, Multimodal, Packing, Pii, Sampling, Similarity, TextAnalysis}
import graft.operators.{AsOfJoin, RangeJoin, SaltedJoin, Sessions}
import graft.sources.{DebeziumSource, Tables}

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2 + the LLM-pipeline extensions), each with a DuckDB oracle in
  * `Oracles`. Spark-side column names/aliases match the oracle SQL exactly
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  private def ops(s: SparkSession, dir: String): DataFrame = CdcOps.ops(s, dir)
  private def st(s: SparkSession, dir: String): DataFrame = CdcOps.withState(ops(s, dir))

  /** Near-dup cluster index for `dir`: star contraction run once per JVM,
    * persisted as parquet, shared by every consumer (dedup_clusters_persisted,
    * corpus_filter's funnel). */
  private def clusterIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"clusters:$dir") { d =>
      val docs = Tables.documents(s, dir)
      Clusters.indexWrite(docs, Dedup.scalableCandidates(docs), d)
    }

  /** Standing admission signature index for `dir` (corpus = doc_id%10!=0,
    * the same split `corpus_admission` and `dedup_incremental` use): built
    * once per JVM, persisted as parquet, so every admission batch times
    * only its own row-wise work + the signature join — the production
    * amortization (the index build is a full corpus scan + shuffle; the
    * gate is not). */
  private def admissionIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"admission:$dir") { d =>
      Corpus.admissionIndex(
        Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0))
        .write.mode("overwrite").parquet(d)
    }

  /** Stored media column for `dir`: the corpus PNG-encoded ONCE per JVM
    * (ingest-time work in a real pipeline), so the mm_* decode paths read
    * stored bytes and time decode+process, not re-encode. */
  private def mediaIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"media:$dir") { d =>
      Multimodal.encodeCorpus(Tables.documents(s, dir))
        .write.mode("overwrite").parquet(d)
    }

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ CDC capture engines
    "cdc_log_capture" -> ((s, dir) =>
      Capture.log(st(s, dir)).orderBy("lsn")),
    "cdc_trigger_capture" -> ((s, dir) =>
      Capture.trigger(st(s, dir)).orderBy("audit_seq")),
    "cdc_poll_capture" -> ((s, dir) =>
      Capture.poll(st(s, dir))
        .select("tbl", "pk", "poll_window", "op_code", "after_val", "after_k", "version", "poll_ts")
        .orderBy("tbl", "pk", "poll_window")),
    "cdc_poll_loss" -> ((s, dir) =>
      Capture.pollLoss(st(s, dir)).orderBy("tbl")),
    "cdc_contracts" -> ((s, dir) =>
      // ingestion-time data-contract assertion: both counters must be 0 on
      // conforming input (null set-payloads would diverge the sentinel scan
      // from the merge fold; lsn/t inversions would reorder the fold)
      CdcOps.contractViolations(CdcOps.ops(s, dir))),
    "cdc_verify_sample" -> ((s, dir) => {
      // deterministic-sample per-column compare of truth vs replayed state
      // (verify.mjs:82-126); log replay is lossless so every field matches
      val truth = ApplyEngine.applyState(ops(s, dir))
      val replayed = ApplyEngine.replayEvents(Capture.log(st(s, dir)), "lsn")
      Diff.verifySample(truth, replayed, Seq("val", "k"))
        .orderBy("tbl", "pk", "col_name")
    }),
    "cdc_snapshot" -> ((s, dir) =>
      Capture.snapshot(Tables.customer(s, dir), "customer", "c_custkey", Seq("c_name", "c_mktsegment"))
        .orderBy(col("pk").cast("bigint"))),

    // ------------------------------------------------ apply / state fold
    "cdc_apply_state" -> ((s, dir) =>
      ApplyEngine.applyState(ops(s, dir)).orderBy("tbl", "pk")),
    // SCD Type-2 dimension history off the change feed: merged row image
    // per version with [valid_from, valid_to) and is_current; deletes
    // close intervals without opening a row
    "cdc_scd2" -> ((s, dir) =>
      ApplyEngine.scd2(st(s, dir)).orderBy("tbl", "pk", "ver")),
    "cdc_replay_events" -> ((s, dir) =>
      ApplyEngine.replayEvents(Capture.log(st(s, dir)), "lsn").orderBy("tbl", "pk")),
    // open-schema apply: the generic JSON reduce over the partial-payload
    // feed — the operator real fixture schemas drive (index.js:59-76)
    "cdc_apply_json" -> ((s, dir) =>
      ApplyEngine.applyJsonState(CdcOps.jsonOps(ops(s, dir)), "lsn")
        .orderBy("tbl", "pk")),
    // snapshot → tailing composition (logBased.ts:147-187): seed-row read
    // events emitted AHEAD of the tail with CONTINUOUS offsets — snapshot
    // rows rank 1..S by (tbl, pk), tail events continue S+1.. in lsn order.
    // Both ranks via GlobalOrder (no single-partition window); the dense
    // offset sequence in the oracle hash IS the continuity check.
    "cdc_snapshot_tail" -> ((s, dir) => {
      // ONE enriched lineage feeds both phases: the seed is the state at
      // the cut, read off the cumulative window images (argmax by lsn over
      // rows at or before the cut) — no second merge fold, no second
      // parquet scan. Projected before persisting; both phases and the cut
      // aggregate scan the same cache.
      val state = st(s, dir)
        .select("tbl", "pk", "op", "lsn", "t", "prev_val", "prev_k",
          "cur_val", "cur_k")
        .persist()
      val cut = state.agg(expr("(min(t) + max(t)) div 2").as("cut"))
      val seed = state.crossJoin(broadcast(cut))
        .filter(col("t") <= col("cut"))
        .groupBy("tbl", "pk")
        .agg(max_by(
          struct(col("op"), col("cur_val"), col("cur_k")), col("lsn")).as("last"))
        .filter(col("last.op") =!= "delete")
        .select(col("tbl"), col("pk"),
          col("last.cur_val").as("val"), col("last.cur_k").as("k"))
      val snap = GlobalOrder.rank(
        Capture.snapshotAll(seed, Seq("val", "k")),
        Seq(col("tbl"), col("pk")), "offset")
        .select(col("offset"), lit("snapshot").as("phase"), col("tbl"),
          col("pk"), col("op_code"), col("val"), col("k"))
      val nSnap = seed.agg(count(lit(1)).as("n_snap"))
      val tail0 = Capture.log(state).crossJoin(broadcast(cut))
        .filter(col("commit_ts") > col("cut"))
      val tail = GlobalOrder.rank(tail0, Seq(col("lsn")), "tail_rank")
        .crossJoin(broadcast(nSnap))
        .select((col("tail_rank") + col("n_snap")).as("offset"),
          lit("tail").as("phase"), col("tbl"), col("pk"), col("op_code"),
          col("after_val").as("val"), col("after_k").as("k"))
      graft.operators.CacheLifecycle.releaseAfterUse(
        snap.unionAll(tail).orderBy("offset"), Seq(state))
    }),
    // DBLog / Debezium incremental snapshot: chunked key-space read
    // interleaved with the tail; chunk rows superseded by in-window log
    // events are discarded — the non-blocking snapshot's chunk ledger
    "cdc_incremental_snapshot" -> ((s, dir) =>
      Capture.incrementalSnapshot(st(s, dir)).orderBy("chunk")),
    // the backfill failure drill: historical rows captured NOW — per-table
    // business-time lateness and watermark skew of the designated keys
    "cdc_backfill_audit" -> ((s, dir) =>
      Capture.backfillAudit(ops(s, dir)).orderBy("tbl")),
    // Kafka compacted-topic audit: per table, what compaction would retain
    // (last event per key; deletes as tombstones) vs the full log
    "cdc_compaction" -> ((s, dir) =>
      Capture.compactionAudit(ops(s, dir)).orderBy("tbl")),
    // per-table op-sequence legality audit (double inserts, updates and
    // deletes on dead rows) — the check a verifier runs before any apply
    "cdc_chain_integrity" -> ((s, dir) =>
      Capture.chainIntegrity(ops(s, dir)).orderBy("tbl")),
    // liveness ledger: consecutive-event gap distribution per table with
    // gaps over the stall threshold counted — the heartbeat monitor table
    "cdc_heartbeat_gap" -> ((s, dir) =>
      Capture.heartbeatGaps(ops(s, dir)).orderBy("tbl")),
    // compaction retention planning: GC-eligible tombstones vs the
    // high-water mark, with reborn keys counted (why GC keys on LAST op)
    "cdc_tombstone_gc" -> ((s, dir) =>
      Capture.tombstoneGc(ops(s, dir)).orderBy("tbl")),
    // allowed-lateness tuning curve over the backfill stream: dropped-late
    // fraction per candidate watermark delay
    "cdc_watermark_curve" -> ((s, dir) =>
      Capture.watermarkCurve(ops(s, dir)).orderBy("delay_ms")),
    // Debezium end-to-end without a broker: encode the op feed as envelope
    // JSON (payload-wrapped evens, r-snapshot inserts, before-only deletes)
    // → decode → txn assembly → JSON apply, diffed against the state built
    // directly from the feed — the verifier pipeline
    // (harness/verifier/index.js:254-283,169-205) as one oracled query
    "cdc_debezium_e2e" -> ((s, dir) => {
      // the feed drives both the envelope round-trip and the direct truth
      // fold; the decoded stream drives txn assembly and the JSON apply —
      // persist each so the JSON print/parse work runs once per row.
      // repartition BEFORE the render: the sf inputs are one parquet split,
      // which would serialize the whole per-row JSON round trip on a single
      // thread (at scale the input arrives pre-split; this only fixes up
      // the local shape). Keyed on (tbl, pk) so the truth-side apply's
      // window reuses the partitioning instead of re-shuffling.
      val feed = CdcOps.jsonOps(ops(s, dir).repartition(col("tbl"), col("pk")))
        .persist()
      val dec = DebeziumSource.decode(
        DebeziumSource.encode(feed), col("value"))
      // lsn = t·10⁶ + event_id is invertible, so the decoded stream
      // re-derives the txn grouping key without a side channel
      val recOps = dec.select(
        col("ts_ms").as("t"),
        (col("lsn") - col("ts_ms") * lit(1000000L)).as("event_id"),
        col("tbl"), col("pk"), col("op"), col("lsn"), col("after_json"))
        .persist()
      val txns = Txn.assemble(recOps)
      val actual = ApplyEngine.applyJsonState(recOps, "lsn")
      val truth = ApplyEngine.applyJsonState(feed, "lsn")
      val diff = Diff.diffStates(truth, actual, Seq("row_json"))
        .agg(
          count(when(col("status") === "match", 1)).as("keys_match"),
          count(when(col("status") =!= "match", 1)).as("keys_mismatch"))
      val txAgg = txns.agg(
        count(lit(1)).as("txns"),
        sum(col("n_events")).cast("long").as("tx_events"))
      graft.operators.CacheLifecycle.releaseAfterUse(
        diff.crossJoin(txAgg)
          .selectExpr(
            """stack(4,
              |  'keys_match', keys_match,
              |  'keys_mismatch', keys_mismatch,
              |  'tx_events', tx_events,
              |  'txns', txns) AS (metric, value)""".stripMargin)
          .orderBy("metric"),
        Seq(feed, recOps))
    }),

    // ------------------------------------------------ diff / verification
    "cdc_difflane" -> ((s, dir) => {
      // multi-column diff key (no string-concat key to build or hash)
      val state = st(s, dir)
      val expected = state.select(
        col("tbl"), CdcOps.opCode(col("op")).as("opc"), col("pk"),
        col("t").as("time"), col("lsn").as("ord"))
      val actual = Capture.poll(state).select(
        col("tbl"), col("op_code").as("opc"), col("pk"),
        col("poll_ts").as("time"), col("src_lsn").as("ord"))
      Diff.laneTotals(Diff.lanePairs(expected, actual, "ord", Seq("tbl", "opc", "pk")))
        .orderBy("status")
    }),
    "cdc_lag_topk" -> ((s, dir) =>
      Capture.trigger(st(s, dir))
        .select("audit_seq", "tbl", "pk", "lag_ms")
        .orderBy(col("lag_ms").desc, col("audit_seq"))
        .limit(5)),
    "cdc_diffstates" -> ((s, dir) => {
      val state = st(s, dir)
      val truth = ApplyEngine.applyState(ops(s, dir))
      val pollEmissions = Capture.poll(state, includeSoftDeletes = false)
      val w = Window.partitionBy("tbl", "pk").orderBy(col("poll_window").desc)
      val pollState = pollEmissions
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("tbl"), col("pk"), col("after_val").as("val"), col("after_k").as("k"))
      Diff.diffStates(truth, pollState, Seq("val", "k"))
        .groupBy("status").agg(count(lit(1)).as("cnt")).orderBy("status")
    }),
    // diffStates turned into ACTION: per divergent key, the repair op
    // (insert/update/delete, source image carried) that converges the
    // sink onto the source truth — divergence-sized, not table-sized
    "cdc_reconcile_repair" -> ((s, dir) => {
      val state = st(s, dir)
      val truth = ApplyEngine.applyState(ops(s, dir))
      val pollEmissions = Capture.poll(state, includeSoftDeletes = false)
      val w = Window.partitionBy("tbl", "pk").orderBy(col("poll_window").desc)
      val pollState = pollEmissions
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("tbl"), col("pk"), col("after_val").as("val"), col("after_k").as("k"))
      Diff.reconcileOps(truth, pollState, Seq("val", "k")).orderBy("tbl", "pk")
    }),
    "cdc_ordering_drift" -> ((s, dir) => {
      val drifted = Broker.withDrift(
        ops(s, dir), concat(lit("tx-"), col("lsn").cast("string")), col("t"))
      Diff.orderingInversions(drifted, Seq("tbl"), Seq(col("available_at"), col("lsn")), "lsn")
        .groupBy("tbl")
        .agg(count(when(col("inverted"), 1)).as("inversions"))
        .orderBy("tbl")
    }),

    // ------------------------------------------------ metrics
    "cdc_metrics_lane" -> ((s, dir) => {
      val state = st(s, dir)
      MetricsAgg.laneMix(Capture.log(state), "log", 1, 0)
        .unionAll(MetricsAgg.laneMix(Capture.poll(state), "poll", 1, 0))
        .unionAll(MetricsAgg.laneMix(Capture.trigger(state), "trigger", 1, 1))
        .orderBy("method")
    }),
    "cdc_lag_percentiles" -> ((s, dir) => {
      val state = st(s, dir)
      val pollLag = Capture.poll(state).withColumn("lag_ms", col("poll_ts") - col("src_t"))
      MetricsAgg.lagPercentiles(Capture.log(state), "log")
        .unionAll(MetricsAgg.lagPercentiles(pollLag, "poll"))
        .unionAll(MetricsAgg.lagPercentiles(Capture.trigger(state), "trigger"))
        .orderBy("method")
    }),
    // per-lane SLA attainment: fraction of events captured within each
    // candidate freshness budget - the contract score next to the p95
    "cdc_lag_sla" -> ((s, dir) => {
      val state = st(s, dir)
      val pollLag = Capture.poll(state)
        .withColumn("lag_ms", col("poll_ts") - col("src_t"))
      MetricsAgg.lagSla(Capture.log(state), "log")
        .unionAll(MetricsAgg.lagSla(pollLag, "poll"))
        .unionAll(MetricsAgg.lagSla(Capture.trigger(state), "trigger"))
        .orderBy("method", "sla_ms")
    }),
    "cdc_lane_summary" -> ((s, dir) => {
      // cross-lane comparison (`web/App.tsx:985-1020`): best/worst lag
      // lanes, lag spread, argmax write amplification — min_by/max_by over
      // the 3-row lane table (no sort, no self-join)
      val state = st(s, dir)
      val pollLag = Capture.poll(state).withColumn("lag_ms", col("poll_ts") - col("src_t"))
      // write_amp comes from the measured laneMix rows (audit writes per
      // captured op), not asserted literals — same 3-row frame the
      // cdc_metrics_lane query reports, broadcast onto the lag lanes.
      val mix = MetricsAgg.laneMix(Capture.log(state), "log", 1, 0)
        .unionAll(MetricsAgg.laneMix(Capture.poll(state), "poll", 1, 0))
        .unionAll(MetricsAgg.laneMix(Capture.trigger(state), "trigger", 1, 1))
        .select(col("method"), col("write_amp"))
      val lanes = MetricsAgg.lagPercentiles(Capture.log(state), "log")
        .unionAll(MetricsAgg.lagPercentiles(pollLag, "poll"))
        .unionAll(MetricsAgg.lagPercentiles(Capture.trigger(state), "trigger"))
        .join(broadcast(mix), Seq("method"))
      lanes.agg(
        min_by(col("method"), col("p95")).as("best_lag_lane"),
        max_by(col("method"), col("p95")).as("worst_lag_lane"),
        (max(col("p95")) - min(col("p95"))).as("lag_spread"),
        max_by(col("method"), col("write_amp")).as("top_write_amp_lane"))
    }),
    "cdc_lag_rolling" -> ((s, dir) => {
      val state = st(s, dir)
      val lanes = Capture.log(state)
        .select(lit("log").as("method"), col("emitted_ts").as("ord1"),
          col("lsn").as("ord2"), col("lag_ms"))
        .unionAll(Capture.poll(state)
          .select(lit("poll").as("method"), col("poll_ts").as("ord1"),
            col("src_lsn").as("ord2"), (col("poll_ts") - col("src_t")).as("lag_ms")))
        .unionAll(Capture.trigger(state)
          .select(lit("trigger").as("method"), col("emitted_ts").as("ord1"),
            col("audit_seq").as("ord2"), col("lag_ms")))
      MetricsAgg.lagPercentilesRolling(lanes).orderBy("method")
    }),

    // ------------------------------------------------ txn + broker
    "cdc_txn_apply" -> ((s, dir) =>
      Txn.assemble(ops(s, dir)).orderBy("apply_order")),
    "cdc_broker_route" -> ((s, dir) =>
      Broker.route(ops(s, dir), col("pk"), col("lsn"), 3, 0.1)
        .groupBy("part")
        .agg(
          count(when(!col("dropped"), 1)).as("delivered"),
          count(when(col("dropped"), 1)).as("dropped_cnt"))
        .orderBy("part")),

    // ------------------------------------------------ analytics
    "q1_lineitem_agg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"),
          sum(col("l_discount").cast(DecimalType(18, 4))).cast("double").as("sum_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q_region_revenue" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy("r_name")),
    "q_top_orders" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          // parquet TIMESTAMP(isAdjustedToUTC=false) loads as TIMESTAMP_NTZ;
          // session tz is UTC so the cast preserves the instant
          unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),
    // TPC-H Q3 shape (shipping priority): segment-filtered customers
    // BROADCAST into the one big orders⨝lineitem keyed join; top-10 rides
    // a TakeOrdered heap, never a global sort. Revenue parity contract:
    // per-row cents = floor(price·(1−discount)·100) — an identical IEEE
    // op chain on both engines — summed as exact longs
    "q_shipping_priority" -> ((s, dir) => {
      val cut = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
      val c = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))
      val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .as("_cents"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_date_ms", "o_orderpriority")
        .agg(sum("_cents").as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderkey"))
        .limit(10)
    }),
    // TPC-H Q4 shape: EXISTS as a LEFT SEMI join (each order counted once
    // no matter how many late lines it has), priority-keyed rollup
    "q_late_orders" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),
    // TPC-H Q5 shape (local supplier volume): revenue by nation within one
    // region where the customer and supplier share a nation. The two big
    // fact joins (lineitem⨝orders on orderkey, then custkey/suppkey) stay
    // keyed shuffles; only the 25-row nation⊳region map broadcasts
    // explicitly — customer/supplier are SF-scaled, so AQE promotes them
    // at test scale without baking a 100TB-wrong hint into the plan.
    // Revenue parity: per-row floor-cents, summed as exact longs.
    "q_local_supplier_volume" -> ((s, dir) => {
      val nr = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val c = Tables.customer(s, dir)
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val su = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .as("_cents"))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .filter(col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(sum("_cents").as("revenue_cents"))
        .select(col("n_name"), col("revenue_cents"),
          (col("revenue_cents").cast("double") / 100).as("revenue"))
        .orderBy(col("revenue_cents").desc, col("n_name"))
    }),
    // TPC-H Q14 shape (promo revenue share): per ship-month, the share of
    // revenue from PROMO-type parts. One keyed fact⨝part join (AQE
    // broadcasts the dimension at test scale), month-keyed rollup, one
    // IEEE division of exactly-summed cents.
    "q_promo_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .select(col("p_partkey"), (col("p_type") === "PROMO").as("_promo"))
      val l = Tables.lineitem(s, dir).select(
        col("l_partkey"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ship_month"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .as("_cents"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("ship_month")
        .agg(
          sum(when(col("_promo"), col("_cents"))).as("promo_cents"),
          sum("_cents").as("total_cents"))
        .select(col("ship_month"), col("promo_cents"), col("total_cents"),
          (col("promo_cents").cast("double") / col("total_cents"))
            .as("promo_share"))
        .orderBy("ship_month")
    }),
    // TPC-H Q19 shape (disjunctive-predicate revenue): three brand/size/
    // quantity disjuncts over the one fact⨝part join. The derivable common
    // bound (l_quantity ≤ 30) is written EXPLICITLY on the fact select so
    // the parquet scan prunes rows the disjunction would otherwise drag
    // through the join — a disjunction alone does not push down, its
    // derived conjunct does. Per-brand rollup, floor-cents exact sums.
    "q_disjunctive_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
        .select(col("l_partkey"), col("l_quantity"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .as("_cents"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"), sum("_cents").as("revenue_cents"))
        .orderBy("p_brand")
    }),
    // TPC-H Q22 shape (cold customers): above-average-balance customers
    // DORMANT since the cutoff — no order on or after 2000-01-01. The
    // scalar subquery (avg positive balance) is a broadcast 1-row cross;
    // dormancy is a LEFT ANTI join against the date-filtered orders (the
    // cutoff pushes to the orders scan, the anti side prunes to one key
    // column). Balance kept in exact floor-cents; the average is the one
    // IEEE division, compared in double on both engines.
    "q_cold_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(
        col("c_custkey"), col("c_mktsegment"),
        floor(col("c_acctbal") * 100).cast("long").as("_bal_cents"))
        .persist() // the avg branch and the main stream both read it
      val avg = c.filter(col("_bal_cents") > 0)
        .agg((sum("_bal_cents").cast("double") / count(lit(1)))
          .as("_avg_cents"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >=
          lit("2000-01-01 00:00:00").cast("timestamp_ntz"))
        .select("o_custkey")
      graft.operators.CacheLifecycle.releaseAfterUse(
        c.join(broadcast(avg))
          .filter(col("_bal_cents").cast("double") > col("_avg_cents"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            sum("_bal_cents").as("bal_cents"))
          .orderBy("c_mktsegment"),
        Seq(c))
    }),
    // TPC-H Q18 shape (large-volume baskets): HAVING-subquery orders whose
    // total quantity clears a threshold, joined back to orders+customer.
    // The post-HAVING frame is selectivity-tiny, so AQE broadcasts it into
    // the orders join at runtime — the plan never hints a broadcast that
    // would be wrong if the threshold were loosened at 100 TB. Quantities
    // are integral doubles; cast long so the basket sums stay exact.
    "q_big_basket" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 300)
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"))
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_date_ms"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(20)
    }),
    // TPC-H Q15 shape (top supplier): argmax over a keyed aggregate with
    // ties KEPT — the per-supplier revenue rollup joins its own broadcast
    // 1-row max instead of sorting the aggregate or windowing over an
    // unpartitioned frame. Floor-cents exact, so "equal to the max" is an
    // integer equality, never a float-tolerance question.
    "q_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .select(col("l_suppkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .as("_cents"))
        .groupBy("l_suppkey")
        .agg(sum("_cents").as("revenue_cents"))
        .persist() // supplier-cardinality; both the max and the join read it
      val mx = rev.agg(max("revenue_cents").as("_max_cents"))
      graft.operators.CacheLifecycle.releaseAfterUse(
        rev.join(broadcast(mx), col("revenue_cents") === col("_max_cents"))
          .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
          .orderBy("s_suppkey"),
        Seq(rev))
    }),
    // TPC-H Q13 shape (order-count distribution): LEFT OUTER join keeps
    // zero-order customers in the histogram; two keyed aggregates — the
    // second collapses to ≤ max-orders-per-customer rows map-side. The
    // "histogram of counts" pattern every engagement dashboard runs.
    "q_order_count_distribution" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_orders").desc)
    }),
    // TPC-H Q10 shape (returned-item revenue): per-customer revenue from
    // R-flagged lines, top-20. The return filter pushes to the lineitem
    // scan; revenue sums exact floor-cents; top-20 rides a TakeOrdered
    // heap after the customer rejoin (name carried through the agg would
    // widen the shuffle for nothing).
    "q_returned_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .as("_cents"))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val rev = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum("_cents").as("revenue_cents"))
      rev.join(Tables.customer(s, dir).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey"))
        .limit(20)
    }),
    // TPC-H Q1 shape, full form (pricing summary): shipdate-filtered
    // single-pass rollup by (returnflag, linestatus). Every money/qty sum
    // is exact floor-cents longs (per-row IEEE chains identical on both
    // engines); the avg columns are derived doubles of exact sums, so no
    // re-associated float accumulation ever crosses engines.
    "q_pricing_summary" -> ((s, dir) => {
      val cut = lit("2001-09-01 00:00:00").cast("timestamp_ntz")
      Tables.lineitem(s, dir).filter(col("l_shipdate") <= cut)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("_q"),
          floor(col("l_extendedprice") * 100).as("_pc"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .as("_dc"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax")) * 100).as("_cc"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("_q").as("sum_qty"),
          sum("_pc").as("sum_price_cents"),
          sum("_dc").as("sum_disc_price_cents"),
          sum("_cc").as("sum_charge_cents"),
          count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("sum_price_cents"),
          col("sum_disc_price_cents"), col("sum_charge_cents"),
          (col("sum_qty").cast("double") / col("cnt")).as("avg_qty"),
          (col("sum_price_cents").cast("double") / 100 / col("cnt"))
            .as("avg_price"),
          col("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    // TPC-H Q6 shape (forecast revenue): pure filter + global agg — every
    // predicate (date window, discount band, quantity cap) reaches the
    // parquet scan as a pushed filter; zero joins, zero shuffles beyond
    // the final 1-row combine. The 100 TB plan is a scan and nothing else.
    "q_forecast_revenue" -> ((s, dir) => {
      val lo = lit("1996-01-01 00:00:00").cast("timestamp_ntz")
      val hi = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum(floor(col("l_extendedprice") * col("l_discount") * 100))
            .as("forecast_cents"),
          count(lit(1)).as("n_lines"))
    }),
    // TPC-H Q7 shape (volume shipping): revenue between one nation pair
    // per direction per year. Both dimension sides are PRE-FILTERED to the
    // two nations before touching the fact (supplier and customer shrink
    // to ~2/25, so AQE broadcasts them at any scale); the pair disjunction
    // is applied AFTER the joins on the two carried nation names — a
    // disjunction over join results does not prune scans, the nation
    // prefilters do.
    "q_volume_shipping" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val ns = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))
      val nc = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("_cnk"), col("n_name").as("cust_nation"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(ns), col("s_nationkey") === col("_snk"))
        .select("s_suppkey", "supp_nation")
      val cus = Tables.customer(s, dir)
        .join(broadcast(nc), col("c_nationkey") === col("_cnk"))
        .select("c_custkey", "cust_nation")
      val lo = lit("1996-01-01 00:00:00").cast("timestamp_ntz")
      val hi = lit("1998-01-01 00:00:00").cast("timestamp_ntz")
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .as("_cents"))
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      l.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cus, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(sum("_cents").as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),
    // TPC-H Q8 shape (national market share): one supplier nation's share
    // of the type-filtered revenue sold into one region, per order year.
    // The part filter prunes the fact first (keyed join, AQE-broadcast at
    // test scale); region-membership is a LEFT SEMI on orders (no row
    // multiplication); the share is one IEEE division of two exact sums.
    "q_market_share" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val rn = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("_rnk"))
      val cus = Tables.customer(s, dir)
        .join(broadcast(rn), col("c_nationkey") === col("_rnk"))
        .select("c_custkey")
      val oFil = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
        .join(cus, col("o_custkey") === col("c_custkey"), "left_semi")
      val supN = Tables.nation(s, dir)
        .select(col("n_nationkey").as("_snk"), col("n_name").as("supp_nation"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(supN), col("s_nationkey") === col("_snk"))
        .select("s_suppkey", "supp_nation")
      val l = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .as("_cents"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(oFil, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("_cents"))
            .otherwise(0L)).as("nation_cents"),
          sum("_cents").as("total_cents"))
        .select(col("o_year"), col("nation_cents"), col("total_cents"),
          (col("nation_cents").cast("double") / col("total_cents"))
            .as("mkt_share"))
        .orderBy("o_year")
    }),
    // TPC-H Q9 shape (product-line profit by nation and year), adapted:
    // the testdata carries no partsupp/ps_supplycost, so profit reduces to
    // revenue — the SHAPE is intact (name-pattern part prune into the
    // fact, supplier nation rollup crossed with order year). Cited
    // limitation, not a silent drop.
    "q_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_name").contains("widget"))
        .select("p_partkey")
      val supN = Tables.nation(s, dir)
        .select(col("n_nationkey").as("_snk"), col("n_name").as("nation"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(supN), col("s_nationkey") === col("_snk"))
        .select("s_suppkey", "nation")
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val l = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .as("_cents"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("nation", "o_year")
        .agg(sum("_cents").as("revenue_cents"))
        .orderBy("nation", "o_year")
    }),
    // TPC-H Q17 shape (small-quantity-order revenue): brand-filtered
    // parts, lines under 20% of their part's average quantity. The
    // correlated avg subquery becomes one per-part aggregate joined back;
    // the 0.2·avg threshold is evaluated EXACTLY in integers
    // (5·qty·n < Σqty ⇔ qty < 0.2·avg — quantities are integral), so no
    // float-boundary row can flip between engines.
    "q_small_qty_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#13")
        .select("p_partkey")
      val lp = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity").cast("long").as("_q"),
          floor(col("l_extendedprice") * 100).as("_pc"))
        .join(p, col("l_partkey") === col("p_partkey"))
      val avgQ = lp.groupBy(col("l_partkey").as("_pk"))
        .agg(sum("_q").as("_sumq"), count(lit(1)).as("_n"))
      lp.join(avgQ, col("l_partkey") === col("_pk"))
        .filter(col("_q") * 5 * col("_n") < col("_sumq"))
        .agg(
          sum("_pc").as("small_qty_cents"),
          count(lit(1)).as("n_lines"))
        .select(col("small_qty_cents"), col("n_lines"),
          (col("small_qty_cents").cast("double") / 100 / 7)
            .as("avg_yearly"))
    }),
    // TPC-H Q21 shape (suppliers who kept orders waiting), adapted: the
    // testdata has no commit/receipt dates, so "late" = shipped more than
    // 60 days after the order date. Q21's EXISTS/NOT-EXISTS pair says "s
    // shipped late, ANOTHER supplier shares the order, NO other supplier
    // was also late" — which is a per-ORDER property: ≥ 2 distinct
    // suppliers and EXACTLY ONE of them late, credited to that one. So
    // instead of the canonical three self-joins over distinct pairs (the
    // r12 rehearsal measured that form at decade-2 exponent 1.13 — three
    // 60M-row shuffles), ONE orderkey-keyed aggregate computes
    // (n_suppliers, n_late, the_late) and a supplier-keyed rollup counts
    // the blocks. The DuckDB oracle keeps the canonical EXISTS/NOT-EXISTS
    // SQL, so the rewrite's equivalence is verified per value, not argued.
    // The blocking aggregate deliberately avoids countDistinct: Catalyst
    // expands two distinct aggregates into an Expand + double shuffle
    // (the r12 100× rehearsal spilled three 60M-row shuffles, exponent
    // 1.13). Instead, a (l_orderkey, l_suppkey) pre-aggregate with
    // max(_late) makes the per-order rollup plain count/count-when/
    // min-when — and because the order join's sort-merge output is
    // already HashPartitioning(l_orderkey), which satisfies the
    // clustered distribution of BOTH groupBys (orderkey is a prefix of
    // (orderkey, suppkey)), the whole chain reuses the join's single
    // shuffle at scale.
    "q_waiting_suppliers" -> ((s, dir) => {
      val oF = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val lf = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(oF, col("l_orderkey") === col("o_orderkey"))
        .withColumn("_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val perSupp = lf.groupBy("l_orderkey", "l_suppkey")
        .agg(max(col("_late")).as("_late"))
      val blocking = perSupp.groupBy("l_orderkey")
        .agg(
          count(lit(1)).as("_ns"),
          count(when(col("_late"), lit(1))).as("_nl"),
          min(when(col("_late"), col("l_suppkey"))).as("_blocker"))
        .filter(col("_ns") > 1 && col("_nl") === 1)
      blocking.groupBy(col("_blocker").as("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        // supplier is SF-scaled — no explicit broadcast hint (house rule:
        // AQE promotes it at test scale without baking a 100TB-wrong hint)
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    }),
    // TPC-H Q12 shape (shipmode × order-priority counts), adapted twice
    // for the testdata: no l_shipmode column, so the two-valued ship
    // class is l_returnflag IN ('A','R') (mirrors Q12's shipmode IN
    // ('MAIL','SHIP')); no commit/receipt dates, so "late receipt" =
    // shipped > 60 days after the order date (same proxy q_waiting_
    // suppliers uses, cited not silent). The priority split is computed
    // in ONE fact pass — the returnflag + year predicates push to the
    // parquet scan, the orders side carries only (key, date, priority)
    // and the conditional counts are map-side partial aggregates into a
    // 2-row result.
    "q_ship_priority_mix" -> ((s, dir) => {
      val lo = lit("1996-01-01 00:00:00").cast("timestamp_ntz")
      val hi = lit("1997-01-01 00:00:00").cast("timestamp_ntz")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .select("l_orderkey", "l_returnflag", "l_shipdate")
        .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag").as("ship_class"))
        .agg(
          sum(when(high, lit(1)).otherwise(lit(0)).cast("long"))
            .as("high_line_count"),
          sum(when(high, lit(0)).otherwise(lit(1)).cast("long"))
            .as("low_line_count"))
        .orderBy("ship_class")
    }),
    // ROLLUP revenue cube: (priority, status), per-priority subtotals and
    // the grand total in ONE pass (Expand + partial agg — no re-scan per
    // level); NULL rollup keys are labeled ALL for a stable cross-engine
    // sort (None does not order against strings)
    "q_orders_rollup" -> ((s, dir) =>
      Tables.orders(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("revenue"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n_orders"), col("revenue"))
        .orderBy("priority", "status")),
    "q_orders_returned" -> ((s, dir) =>
      // LEFT SEMI shape: orders having at least one returned line item —
      // the EXISTS predicate stays a semi join, never a row-multiplying one
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("returned_value"))
        .orderBy("o_orderpriority")),
    "q_customer_top_order" -> ((s, dir) => {
      // per-group top-1 via keyed window (rank partitions by customer — no
      // global sort until the bounded 10-row output ordering)
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q_supplier_nation" -> ((s, dir) =>
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_suppliers"),
          sum(col("s_acctbal").cast(DecimalType(18, 2))).cast("double").as("total_acctbal"))
        .orderBy("n_name")),
    "q_events_sessions" -> ((s, dir) =>
      Sessions.sessionize(Tables.events(s, dir))
        .orderBy("user_id", "session_start")),
    // one-row session-shape ledger (count/size/duration, exact means +
    // interpolating percentiles) on the same single session_window shuffle
    "events_session_stats" -> ((s, dir) =>
      Sessions.sessionStats(Tables.events(s, dir))),
    // gap-tuning curve: session count per candidate gap off ONE lag
    // window (n_sessions = n_users + breaks), no per-gap re-sessionization
    "events_session_gap_curve" -> ((s, dir) =>
      Sessions.sessionGapCurve(Tables.events(s, dir)).orderBy("gap_ms")),
    // temporal train/test split at the integer midpoint day, with the
    // inherent user-overlap leak REPORTED (the events-side leakage audit)
    "split_temporal" -> ((s, dir) =>
      graft.llm.Sampling.temporalSplit(Tables.events(s, dir)).orderBy("split")),
    // As-of join: each purchase attributed to the user's latest click
    // at-or-before it — one keyed shuffle, no join (operators/AsOfJoin).
    // Build side deduped to one row per (user, ms) for tie determinism.
    "q_events_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("t_ms"), col("event_type"))
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("t_ms"))
      val build = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "t_ms").agg(max("event_id").as("click_id"))
        .select(col("user_id"), col("t_ms"), col("click_id"),
          col("t_ms").as("click_t"))
      AsOfJoin.asOf(probe, build, Seq("user_id"), "t_ms")
        .select(col("user_id"), col("event_id"), col("t_ms"), col("click_id"),
          (col("t_ms") - col("click_t")).as("lag_ms"))
        .orderBy("event_id")
    }),
    // Banded interval join: click→purchase pairs inside a 1h attribution
    // window — equality join on (user, band), never a nested-loop theta
    // join (operators/RangeJoin).
    "q_events_window_pairs" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000000").as("t_ms"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("t_ms").as("click_t"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("t_ms").as("purchase_t"))
      RangeJoin.within(clicks, purchases, Seq("user_id"),
          "click_t", "purchase_t", 3600000L)
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          (col("purchase_t") - col("click_t")).as("gap_ms"))
        .orderBy("click_id", "purchase_id")
    }),
    // Salted fact⋈dim enrichment: the hot-key spread SCALE.md prescribes,
    // exercised end-to-end — results must be identical to the plain join.
    "q_events_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"))
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
      SaltedJoin.join(ev, dim, Seq("user_id"), salts = 8)
        .orderBy("event_id")
    }),
    // the self-sizing path end-to-end: salts measured from a sampled top-1
    // key share instead of caller-chosen — result rows identical to the
    // plain join whatever salt count the sample derives
    "q_events_salted_auto" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"))
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
      SaltedJoin.joinAuto(ev, dim, Seq("user_id"), fraction = 0.2)._1
        .orderBy("event_id")
    }),
    // join-key skew audit: exact top-10 heaviest user_ids with share,
    // running head share and the salt count autoSalts would derive
    "events_skew_profile" -> ((s, dir) =>
      SaltedJoin.skewProfile(
        Tables.events(s, dir).select("user_id", "event_id"), Seq("user_id"))
        .orderBy("rnk")),
    // ordered conversion funnel: per-stage user-cardinality aggregates,
    // first-touch semantics, no per-user ordered scan
    "events_funnel" -> ((s, dir) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, dir))
        .orderBy("step")),
    // cohort retention triangle: signup cohorts x day offset
    "events_retention" -> ((s, dir) =>
      graft.operators.EventAnalytics.retention(Tables.events(s, dir))
        .orderBy("cohort_day", "day_offset")),
    // PageRank centrality over the type-transition graph: integer-exact
    // power iteration (10 rounds) on the bounded edge table — one lead
    // pass over the stream, no per-iteration re-scan
    "events_pagerank" -> ((s, dir) =>
      graft.operators.EventAnalytics.pageRank(Tables.events(s, dir))
        .orderBy(col("mass").desc, col("event_type"))),
    // first-order Markov transition matrix over consecutive same-user events
    "events_transitions" -> ((s, dir) =>
      graft.operators.EventAnalytics.transitions(Tables.events(s, dir))
        .orderBy("from_type", "to_type")),
    // DAU / rolling-7-day active users / stickiness per day
    "events_dau" -> ((s, dir) =>
      graft.operators.EventAnalytics.activeUsers(Tables.events(s, dir))
        .orderBy("day")),
    // hourly volume vs median +- 3*MAD robust band: the pager query
    "events_anomaly" -> ((s, dir) =>
      graft.operators.EventAnalytics.hourlyAnomaly(Tables.events(s, dir))
        .orderBy("hour")),
    // top-10 most-travelled 3-step event paths (journey mining)
    "events_path_topk" -> ((s, dir) =>
      graft.operators.EventAnalytics.pathTopK(Tables.events(s, dir))
        .orderBy("rnk")),
    // per-user activity power-law octaves: the skew/bot-filter health check
    "events_user_octaves" -> ((s, dir) =>
      graft.operators.EventAnalytics.userActivityOctaves(Tables.events(s, dir))
        .orderBy("octave")),
    // last-touch revenue attribution: purchases credited to the most
    // recent prior click/view on the same user's timeline
    "events_attribution" -> ((s, dir) =>
      graft.operators.EventAnalytics.attribution(Tables.events(s, dir))
        .orderBy("channel")),
    // windowed funnel: each step must land within 7 days of the previous
    // step's first completion (same plan shape, an upper bound added)
    "events_funnel_windowed" -> ((s, dir) =>
      graft.operators.EventAnalytics.funnel(Tables.events(s, dir),
        maxGapMs = Some(604800000L)).orderBy("step")),
    // RFM segmentation: fixed integer-exact cutoffs, 1-row ref broadcast
    "events_rfm" -> ((s, dir) =>
      graft.operators.EventAnalytics.rfm(Tables.events(s, dir))
        .orderBy("user_id")),
    // within-session view->purchase conversion: ONE session-window
    // conditional aggregate + a 1-row rollup (existence = max > min)
    "events_session_funnel" -> ((s, dir) =>
      graft.operators.Sessions.sessionFunnel(Tables.events(s, dir))),
    // bot-cadence gate: distinct-gap ratio per user (variance-free,
    // integer-exact at any scale)
    "events_bot_filter" -> ((s, dir) =>
      graft.operators.EventAnalytics.botFilter(Tables.events(s, dir))
        .orderBy("user_id")),
    // hour-of-week x type seasonality heatmap (epoch-anchored arithmetic)
    "events_weekday_profile" -> ((s, dir) =>
      graft.operators.EventAnalytics.weekdayProfile(Tables.events(s, dir))
        .orderBy("hour_of_week", "event_type")),
    // funnel sliced by signup cohort week: growth accounting on the same
    // first-touch chain; stage-1 rows are the cohort sizes
    "events_funnel_cohorted" -> ((s, dir) =>
      graft.operators.EventAnalytics.cohortedFunnel(Tables.events(s, dir))
        .orderBy("cohort_week", "step")),
    // cohort LTV triangle: signup cohorts x week offset, exact decimal
    // revenue with a cohort-partitioned cumulative sum
    "events_cohort_ltv" -> ((s, dir) =>
      graft.operators.EventAnalytics.cohortLtv(Tables.events(s, dir))
        .orderBy("cohort_day", "week_offset")),
    // per-type inter-arrival gap ledger: count, mean, exact interpolating
    // p50/p90/p99 (the cadence table behind session-timeout tuning)
    "events_interarrival" -> ((s, dir) =>
      graft.operators.EventAnalytics.interarrival(Tables.events(s, dir))
        .orderBy("event_type")),
    // activity-concentration Gini over per-user event counts: exact
    // integer numerator/denominator (DECIMAL(38,0) rank-weighted sum via
    // the range-partitioned GlobalOrder rank), one IEEE division
    "events_gini" -> ((s, dir) =>
      graft.operators.EventAnalytics.gini(Tables.events(s, dir))),
    // daily new-vs-returning split (growth accounting): first-ever-day
    // per user off the persisted distinct user-day set
    "events_new_vs_returning" -> ((s, dir) =>
      graft.operators.EventAnalytics.newVsReturning(Tables.events(s, dir))
        .orderBy("day")),
    // weekly growth accounting: the four-way new/retained/resurrected/
    // churned user-flow ledger with the net-growth identity column
    "events_growth_accounting" -> ((s, dir) =>
      graft.operators.EventAnalytics.growthAccounting(Tables.events(s, dir))
        .orderBy("week")),
    // per-transition conversion delay (signup->click->purchase): the
    // funnel's first-touch chain with exact mean + interpolating p50/90/99
    "events_conversion_lag" -> ((s, dir) =>
      graft.operators.EventAnalytics.conversionLag(Tables.events(s, dir))
        .orderBy("step")),
    "q_events_hourly" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), expr("(ts div 1000000) div 3600000").as("hour_id"),
          col("value"))
        .groupBy("event_type", "hour_id")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .orderBy("event_type", "hour_id")),

    // ------------------------------------------------ dedup
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactStats(Tables.documents(s, dir)).orderBy("lang")),
    "dedup_exact_keep" -> ((s, dir) =>
      Dedup.exactKeep(Tables.documents(s, dir)).orderBy("keep_id")),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(Tables.documents(s, dir)).orderBy("doc_id")),
    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashCandidates(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // the two-stage recall→precision pipeline: banded-LSH candidates,
    // exact trigram Jaccard computed on the candidate pairs only
    // the scale form: hot-bucket guard on the banded candidates — the
    // 10x rehearsal measured the uncapped pair set growing quadratically
    // (SCALE.md); cap 32 restores linear growth with stated recall trade
    "dedup_verify_capped" -> ((s, dir) =>
      Dedup.verifyCandidates(Tables.documents(s, dir),
          maxBucket = Dedup.DefaultMaxBucket)
        .orderBy("a_id", "b_id")),
    "dedup_verify_candidates" -> ((s, dir) =>
      Dedup.verifyCandidates(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // character-level verbatim spans ≥60 chars via rolling 40-char window
    // hashes (the Lee et al. 2021 dedup family, as a hash-window join)
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringSpans(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // the content-defined-sampling branch (hash ≡ 0 mod 8 anchors, extent
    // semantics) — the form a beyond-O(chars) corpus would actually run
    "dedup_substring_sampled" -> ((s, dir) =>
      Dedup.substringSpans(Tables.documents(s, dir), anchorMod = 8L)
        .orderBy("a_id", "b_id")),
    // the cleaning artifact: shared spans excised from the later doc,
    // unaffected docs pass through verbatim. Per-SEGMENT contract (row per
    // kept segment, md5-verified) — row-sorted comparison needs no ordered
    // reassembly on either side; the full-text form is DedupSpec-pinned.
    "dedup_substring_clean" -> ((s, dir) =>
      Dedup.substringCleanSegments(Tables.documents(s, dir))
        .orderBy("doc_id", "seg_idx")),
    "dedup_cross_source" -> ((s, dir) =>
      Dedup.crossSourceMatrix(Tables.documents(s, dir)).orderBy("source_a", "source_b")),
    "dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Clusters.assign(docs, Dedup.scalableCandidates(docs)).orderBy("doc_id")
    }),
    // the amortized build-once form: star contraction persisted as a
    // (doc_id, cluster_id, cluster_size) parquet index, loaded back —
    // pinned to the in-memory path by the shared oracle
    "dedup_clusters_persisted" -> ((s, dir) => {
      Clusters.indexLoad(s, clusterIndexDir(s, dir)).orderBy("doc_id")
    }),
    // cluster-size distribution off the persisted index: the retention-
    // policy ledger, no re-contraction in-plan
    "dedup_cluster_sizes" -> ((s, dir) =>
      Clusters.sizeHistogram(Clusters.indexLoad(s, clusterIndexDir(s, dir)))
        .orderBy("cluster_size")),
    // daily-increment split: every 10th doc arrives as the new batch
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalFlags(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
        .orderBy("doc_id")
    }),
    // same contract as dedup_incremental but through the STREAMING gate's
    // row-wise projected signatures (ingestGate run in batch mode — the
    // stream-static join plan is what a live feed executes per micro-batch)
    "dedup_ingest_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.ingestGate(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
        .orderBy("doc_id")
    }),
    "dedup_keep_best" -> ((s, dir) =>
      Dedup.keepBestByQuality(Tables.documents(s, dir)).orderBy("keep_id")),
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSummary(
        Tables.documents(s, dir), Map("en" -> 0.5, "de" -> 0.25), 0.1).orderBy("lang")),
    "mix_weights" -> ((s, dir) =>
      Sampling.mixtureWeights(Tables.documents(s, dir)).orderBy("source")),
    // curriculum schedule: per-phase weights annealing from the natural
    // token share to uniform-across-sources over 5 training phases
    "mix_schedule" -> ((s, dir) =>
      Sampling.mixSchedule(Tables.documents(s, dir)).orderBy("phase", "source")),
    // UniMax (Chung et al. 2023): equal-share token allocation under an
    // explicit per-source repeat cap — integer water-filling boundary,
    // one double division for the open equal share
    "mix_unimax" -> ((s, dir) =>
      Sampling.unimaxAllocation(Tables.documents(s, dir)).orderBy("source")),
    // temperature-scaled mixing (tau = 1/2 via IEEE-exact sqrt, integer-
    // quantized weights): the smooth low-resource up-weighting rule
    "mix_temperature" -> ((s, dir) =>
      Sampling.temperatureAllocation(Tables.documents(s, dir))
        .orderBy("source")),
    // the mixture MATERIALIZED: per-source keep rates against a 20k-token
    // budget, deterministic hash sample, audit of achieved vs target
    "mix_materialize" -> ((s, dir) =>
      Sampling.materializeMixture(Tables.documents(s, dir), 20000L).orderBy("source")),
    // deterministic 90/5/5 train/val/test assignment (hash-grid, stable
    // under rebuilds) with the per-(source, split) audit table
    "split_assign" -> ((s, dir) =>
      Sampling.splitSummary(Tables.documents(s, dir)).orderBy("source", "split")),
    // cluster-aware split: hash the near-dup CLUSTER id so no duplicate
    // pair straddles train/eval; leaked_pairs measured (0) beside the
    // doc-hash counterfactual — the contamination the guard prevented
    "split_leakage_guard" -> ((s, dir) =>
      Sampling.leakageGuardSplit(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("split")),
    // the guard's audit on the full grid: same-cluster pairs per
    // split x split cell under the naive doc-hash assignment (train x
    // test off-diagonal = the eval-invalidating leak), integer-exact
    // from member counts - no pair materialized
    "split_contamination_matrix" -> ((s, dir) =>
      Sampling.contaminationMatrix(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir)))
        .orderBy("split_a", "split_b")),
    // cluster-aware k-fold: fold hashes the near-dup CLUSTER id, so no
    // CV fold's held-out slice contains a paraphrase of another fold's
    // training data; per-fold balance ledger vs the uniform 1/k target
    "split_kfold_clustered" -> ((s, dir) =>
      Sampling.kfoldClustered(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("fold")),
    "dedup_winnow" -> ((s, dir) =>
      Dedup.winnowCandidates(Tables.documents(s, dir)).orderBy("fp_winnow")),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.documents(s, dir)).orderBy("doc_id")),
    // 3-gram shingles: on this 31-word vocabulary 2-grams are saturated
    // (73M join rows at sf0.1); trigrams are selective (2.8M) and isolate
    // exactly the planted near-duplicate pairs
    "dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), n = 3, threshold = 0.8).orderBy("a_id", "b_id")),
    // overlap coefficient |A∩B|/min(|A|,|B|): the quote/boilerplate-
    // inclusion detector Jaccard's union-dilution misses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), n = 3, threshold = 0.8)
        .orderBy("a_id", "b_id")),
    // duplicate-rate sweep: pair/doc counts at each candidate threshold —
    // the tuning curve read before fixing a dedup threshold; pairs are
    // computed once at the loosest cut and fanned out by a 5-row broadcast
    "dedup_threshold_curve" -> ((s, dir) =>
      Dedup.thresholdCurve(Tables.documents(s, dir)).orderBy("threshold")),
    // the scale form: same sweep over capped banded candidates + verified
    // trigram jaccard (the exact all-pairs join measured exponent 1.17 at
    // the 10x rehearsal; this one rides the linear capped-candidate path)
    "dedup_threshold_curve_capped" -> ((s, dir) =>
      Dedup.thresholdCurveCapped(Tables.documents(s, dir)).orderBy("threshold")),
    // sketch calibration: minhash Jaccard estimate vs the exact same-gram
    // Jaccard on every capped banded candidate pair
    "dedup_minhash_calibration" -> ((s, dir) =>
      Dedup.minhashCalibration(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // directed source-level n-gram containment matrix: which feed mirrors
    // which — per-shingle fanout bounded by n_sources², never doc-pairwise
    "dedup_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(Tables.documents(s, dir)).orderBy("source_a", "source_b")),
    // Bloom ingest gate: corpus digests fold into one broadcastable 8 KB
    // bitmask; arrivals screened row-wise, exact join audits the filter
    "dedup_bloom_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.bloomGate(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0)).orderBy("doc_id")
    }),
    // cumulative exact-dup rate by ingest-order decile: the curve that
    // says whether dedup investment grows with the crawl
    "dedup_growth_curve" -> ((s, dir) =>
      Dedup.growthCurve(Tables.documents(s, dir)).orderBy("bucket")),
    // Heaps-law vocabulary growth: new-type yield per ingest decile and
    // the running type/token ratio - the vocabulary-side twin of the curve
    "vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(Tables.documents(s, dir)).orderBy("bucket")),
    // Zipf ledger: types and token mass per frequency octave (integer-
    // exact floor(log2) via binary-string length) - the power-law check
    "vocab_zipf" -> ((s, dir) =>
      TextAnalysis.zipfBuckets(Tables.documents(s, dir)).orderBy("octave")),
    // top-N vocabulary token-coverage curve: the tokenizer budget question
    "vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir)).orderBy("n_top")),
    // top-20 bigram collocations by pointwise lift (transcendental-free
    // PMI ordering): the merge-candidate / templated-phrase miner
    "vocab_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(Tables.documents(s, dir)).orderBy("rnk")),
    // per-source subword/word fertility: the tokenizer-health audit
    "vocab_subword_fertility" -> ((s, dir) =>
      TextAnalysis.subwordFertility(Tables.documents(s, dir))
        .orderBy("source")),
    // LSH (bands x rows) design ledger: empirical bucket profile + pair
    // volumes (from group sizes - no pair materialized) + S-curve p
    "dedup_lsh_tuning" -> ((s, dir) =>
      Dedup.lshTuning(Tables.documents(s, dir)).orderBy(col("bands").desc)),
    // first BPE merge-round: corpus-wide adjacent char-pair frequencies
    // weighted by word occurrence - the distributed tokenizer-training step
    // apply the round-1 winner and recount: the merge iteration runs on
    // the weighted type table, never re-touching the corpus
    "bpe_merge_apply" -> ((s, dir) =>
      TextAnalysis.bpeMergeApply(Tables.documents(s, dir))
        .orderBy(col("pair_count").desc, col("pair"))),
    "bpe_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairStats(Tables.documents(s, dir))
        .orderBy(col("pair_count").desc, col("pair"))),
    // CCNet-style line dedup on fixed 10-word blocks: per-doc fraction
    // of blocks whose exact text repeats anywhere in the corpus
    "dedup_blocks" -> ((s, dir) =>
      Dedup.blockDedup(Tables.documents(s, dir)).orderBy("doc_id")),

    // benchmark decontamination: eval set = every 17th doc; flag corpus
    // docs sharing any 13-gram with it (GPT-3 appendix-C methodology)
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.contamination(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0))
        .orderBy("doc_id")
    }),

    // context-window packing plan: concat-then-split at 512 tokens via a
    // distributed prefix sum (GlobalOrder.runningSum — no global window)
    "pack_plan" -> ((s, dir) =>
      Packing.packPlan(Tables.documents(s, dir)).orderBy("doc_id")),
    "pack_efficiency" -> ((s, dir) =>
      Packing.packEfficiency(Tables.documents(s, dir))),
    // window-size sweep off ONE prefix-sum pass: the context-length table
    "pack_efficiency_curve" -> ((s, dir) =>
      Packing.packEfficiencyCurve(Tables.documents(s, dir))
        .orderBy("window_tokens")),
    // the cost of NOT packing: per length-octave pad-token bill under
    // one-doc-per-sequence training — read next to pack_efficiency's fill
    "pack_padding_waste" -> ((s, dir) =>
      Packing.paddingWaste(Tables.documents(s, dir)).orderBy("octave")),

    // ------------------------------------------------ similarity search
    "ann_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // embedding-table health checks — run BEFORE any index is built:
    // per-label norm envelope (dead head / bad batch tell) ...
    "emb_norm_profile" -> ((s, dir) =>
      Similarity.normProfile(Tables.embeddings(s, dir)).orderBy("label")),
    // ... anisotropy: mean cosine to the corpus centroid (the cone
    // pathology that decides centering/whitening) ...
    "emb_centroid_cone" -> ((s, dir) =>
      Similarity.centroidCone(Tables.embeddings(s, dir))),
    // ... and the per-dimension variance ledger (dead/dominant dims)
    "emb_dim_variance" -> ((s, dir) =>
      Similarity.dimVariance(Tables.embeddings(s, dir)).orderBy("pos")),
    // hard-negative mining: per probe, top-k most-similar vectors of a
    // DIFFERENT label — the near-miss negatives contrastive training needs
    "ann_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // pre-filter vs post-filter recall for metadata-filtered search: the
    // table that says when to over-fetch k or push the filter into the index
    "ann_filtered_recall" -> ((s, dir) =>
      Similarity.filteredSearchAudit(Tables.embeddings(s, dir)).orderBy("q_id")),
    // the fix, measured: recall recovered by over-fetching k'=k..8k before
    // filtering — one scored stream, one rank, the sweep as conditional counts
    "ann_overfetch_curve" -> ((s, dir) =>
      Similarity.overfetchCurve(Tables.embeddings(s, dir))
        .orderBy("q_id", "fetch_k")),
    // int8 scalar quantization (4x vector bytes): scales cancel in cosine,
    // so the quantized score is integer-exact and hash-stable by design
    "ann_quantized_topk" -> ((s, dir) =>
      Similarity.quantizedTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    "ann_quantized_recall" -> ((s, dir) =>
      Similarity.quantizedRecall(Tables.embeddings(s, dir)).orderBy("q_id")),
    // product quantization: m=4 subspace codebooks + ADC lookup scoring —
    // the 64x-compression scan (m code bytes per candidate, no float reads)
    "ann_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // PQ codebook-utilization health check: per-subspace code loads
    "ann_pq_balance" -> ((s, dir) =>
      Similarity.pqBalance(Tables.embeddings(s, dir)).orderBy("s")),
    // recall@{1,3,5} of the ADC scan vs exact float top-k, one pass
    "ann_pq_recall_curve" -> ((s, dir) =>
      Similarity.pqRecallCurve(Tables.embeddings(s, dir)).orderBy("k")),
    // IVF list-balance health check: hot/starved lists before probe tuning
    "ann_ivf_balance" -> ((s, dir) =>
      Similarity.ivfBalance(Tables.embeddings(s, dir)).orderBy("list_id")),
    "ann_pq_recall" -> ((s, dir) =>
      Similarity.pqRecall(Tables.embeddings(s, dir)).orderBy("q_id")),
    // PQ coarse scan -> exact float rescore: the recall-repair composition
    // PQ serving ships (coarseK float dots per query, never a corpus scan)
    "ann_pq_rerank" -> ((s, dir) =>
      Similarity.pqRerank(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // standing PQ index: codebooks + 32x-compressed code table on parquet,
    // built once per JVM; queries never touch the float corpus. Same
    // codebooks => row-identical to ann_pq_topk, same oracle pins it
    "ann_pq_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"pq:$dir")(d =>
        Similarity.pqIndexWrite(emb, d))
      val (cb, codes) = Similarity.pqIndexLoad(s, idxDir)
      Similarity.pqPersistedTopK(emb, cb, codes).orderBy("q_id", "rnk")
    }),
    // IVF-SQ composition: coarse quantizer prunes the scan, int8 codes
    // shrink the list payloads — the knobs multiply at corpus scale
    "ann_ivfsq_topk" -> ((s, dir) =>
      Similarity.ivfSqTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // packed-code form: 64-byte binary codes on parquet (the realized 4x
    // compression), built once per JVM, scored byte-level via Int8Dot —
    // row-identical to the array form, pinned by the same oracle
    "ann_quantized_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"sq:$dir")(d =>
        Similarity.quantizedIndexWrite(emb, d))
      Similarity.quantizedPersistedTopK(Similarity.quantizedIndexLoad(s, idxDir))
        .orderBy("q_id", "rnk")
    }),
    // IVF-PQ: the FAISS-shape composed index — coarse lists prune the
    // scan, ADC lookups score the probed candidates at ~3% of float bytes
    "ann_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // IVF-PQ off BOTH standing indexes: probe the persisted centroids,
    // score persisted codes in the probed lists — zero training in-plan
    "ann_ivfpq_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ivfDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val pqDir = graft.sources.IndexCache.dirFor(s"pq:$dir")(d =>
        Similarity.pqIndexWrite(emb, d))
      val (centroids, lists) = Similarity.ivfIndexLoad(s, ivfDir)
      val (cb, codes) = Similarity.pqIndexLoad(s, pqDir)
      Similarity.ivfPqPersistedTopK(emb, centroids, lists, cb, codes)
        .orderBy("q_id", "rnk")
    }),
    // two-stage retrieval: int8 coarse top-20 re-scored by exact float
    // cosine — the serving shape; winners keep their coarse rank so the
    // ledger shows where the quantized stage mis-ordered the head
    "ann_rerank" -> ((s, dir) =>
      Similarity.rerankTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // recall-vs-nProbe tuning curve probed against the PERSISTED index
    // (shared ivf:$dir IndexCache build with ann_ivf_persisted) — the
    // curve measures probing, not a per-invocation Lloyd re-train; the
    // in-memory ivfProbeCurve form stays as the build-included baseline
    // and both share one oracle by the centroid determinism contract
    "ann_probe_curve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val (centroids, lists) = Similarity.ivfIndexLoad(s, idxDir)
      Similarity.ivfProbeCurveFrom(emb, centroids, lists).orderBy("n_probe")
    }),
    // hybrid retrieval: exact-cosine and trigram-Jaccard top-10 fused by
    // reciprocal-rank 1/(60+rank) - rank arithmetic, no score mixing
    "search_hybrid_rrf" -> ((s, dir) =>
      Similarity.hybridRrfTopK(
        Tables.documents(s, dir), Tables.embeddings(s, dir))
        .orderBy("q_id", "rnk")),
    // semantic decontamination: nearest eval vector (every 17th, the
    // text_decontaminate convention) per corpus vector + threshold flag
    "ann_decontaminate" -> ((s, dir) =>
      Similarity.semanticDecontaminate(Tables.embeddings(s, dir))
        .orderBy("vec_id")),
    // the scale form: eval set FIXED (ids < 500) so only one join side
    // grows with the corpus - the fraction-of-corpus eval definition
    // above measured exponent 1.50 at the 10x rehearsal
    "ann_decontaminate_capped" -> ((s, dir) =>
      Similarity.semanticDecontaminate(Tables.embeddings(s, dir), evalCap = 500L)
        .orderBy("vec_id")),
    // matryoshka truncation sweep: recall of prefix-width cosine top-5 vs
    // the full width — the embedding-width serving tradeoff curve
    "ann_matryoshka" -> ((s, dir) =>
      Similarity.matryoshkaRecall(Tables.embeddings(s, dir)).orderBy("dims")),
    // sliding-window chunk plan (RAG/SFT prep): explode-only, shuffle-free
    "chunk_plan" -> ((s, dir) =>
      Chunking.chunkPlan(Tables.documents(s, dir)).orderBy("doc_id", "chunk_idx")),
    "chunk_stats" -> ((s, dir) =>
      Chunking.chunkStats(Tables.documents(s, dir)).orderBy("source")),
    "ann_lsh_buckets" -> ((s, dir) =>
      Similarity.lshBuckets(Tables.embeddings(s, dir)).orderBy("bucket")),
    // embedding-side incremental dedup: arrivals (vec_id % 10 == 0) flagged
    // against the standing banded index — same split as dedup_incremental
    "ann_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.incrementalNearDup(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0))
        .orderBy("vec_id")
    }),
    "ann_near_dup" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables.embeddings(s, dir)).orderBy("a_id", "b_id")),
    // SemDeDup (Abbas et al. 2023): k-means clusters, screen each member
    // against prior-ranked cluster-mates, keep the centroid-farthest copy
    "ann_semdedup" -> ((s, dir) =>
      Similarity.semDedup(Tables.embeddings(s, dir)).orderBy("vec_id")),
    // rank-banded SemDeDup screen: n*band work instead of sum(|cluster|^2)
    // - the prescribed scale default (exact form caught at exponent 1.40
    // in the 100x rehearsal; see SCALE.md)
    "ann_semdedup_capped" -> ((s, dir) =>
      Similarity.semDedupBanded(Tables.embeddings(s, dir)).orderBy("vec_id")),
    "ann_near_dup_banded" -> ((s, dir) =>
      Similarity.nearDupPairsBanded(Tables.embeddings(s, dir)).orderBy("a_id", "b_id")),
    // mutual k-NN graph over the banded LSH candidates: per-vector top-3
    // by exact cosine, edge kept iff BOTH endpoints rank each other
    "ann_knn_graph" -> ((s, dir) =>
      Similarity.knnGraph(Tables.embeddings(s, dir)).orderBy("a_id", "b_id")),
    // per-cluster size / label purity / quantized-mean cohesion over the
    // deterministic k-means index — the curation pass's topic view
    "ann_cluster_profile" -> ((s, dir) =>
      Similarity.clusterProfile(Tables.embeddings(s, dir)).orderBy("list_id")),

    // ------------------------------------------------ text analysis
    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langScores(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // Simpson concentration: exact-rational repetition filter (integer
    // pair counts, one division) — entropy's job without entropy's ulp drift
    "text_simpson" -> ((s, dir) =>
      TextAnalysis.simpsonConcentration(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_gopher" -> ((s, dir) =>
      TextAnalysis.gopherStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // which Gopher rule does the work: per-rule alone/marginal removal in
    // docs and tokens, plus the composite 'any' row — one corpus pass
    "quality_ablation" -> ((s, dir) =>
      TextAnalysis.gopherAblation(Tables.documents(s, dir)).orderBy("rule")),
    // PII scrub over deterministically augmented text (the synthetic corpus
    // carries no PII-shaped tokens, so the query plants a known mix —
    // identically in the oracle — and the scrubber must count and redact it).
    "text_pii" -> ((s, dir) => {
      val aug = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".com"),
          repeat(
            concat(lit(" tel 555-"),
              lpad(((col("doc_id") * 37) % 10000).cast("string"), 4, "0")),
            (col("doc_id") % 3).cast("int")),
          repeat(
            concat(lit(" ip 10.0.0."), (col("doc_id") % 256).cast("string")),
            (col("doc_id") % 2).cast("int"))).as("text"))
      Pii.scrub(aug, "doc_id", "text").orderBy("doc_id")
    }),
    "vocab_topk" -> ((s, dir) =>
      TextAnalysis.vocabulary(Tables.documents(s, dir))
        .orderBy(col("n_occ").desc, col("tok"))),
    // sketch-then-recount heavy hitters: Misra–Gries candidates + exact
    // recount — deterministic output, so the vocab_topk oracle pins it
    "vocab_topk_sketch" -> ((s, dir) =>
      TextAnalysis.vocabularySketch(Tables.documents(s, dir))
        .orderBy(col("n_occ").desc, col("tok"))),
    // KMV distinct sketch beside the exact count: the bounded-state
    // replacement for countDistinct at scale, bit-deterministic (min-k is
    // a pure function of the input set) so the estimate oracles exactly
    "vocab_kmv" -> ((s, dir) =>
      TextAnalysis.kmvShingleDistinct(Tables.documents(s, dir)).orderBy("source")),
    // per-source OOV rate against the corpus top-20 vocabulary head
    "vocab_oov" -> ((s, dir) =>
      TextAnalysis.oovStats(Tables.documents(s, dir)).orderBy("source")),
    // power-of-two length-bucketed batching ledger: the padding waste the
    // bucket-and-pad batching shape pays vs pack_plan's concatenation
    "batch_buckets" -> ((s, dir) =>
      Packing.lengthBuckets(Tables.documents(s, dir)).orderBy("bucket")),
    // integer-exact weighted priority sampling: k winners per source,
    // inclusion odds proportional-ish to token count, reproducible anywhere
    "sample_priority" -> ((s, dir) =>
      Sampling.prioritySample(Tables.documents(s, dir)).orderBy("source", "rnk")),
    // deterministic per-source uniform k-sample (the order-free reservoir):
    // bottom-k by doc-id hash within each source
    "sample_reservoir" -> ((s, dir) =>
      Sampling.reservoirSample(Tables.documents(s, dir)).orderBy("source", "rnk")),
    // deterministic training-shard shuffle: hash31-keyed shard + in-shard
    // position, reproducible under re-partitioning and incremental rebuilds
    "export_shards" -> ((s, dir) =>
      Sampling.shardAssign(Tables.documents(s, dir)).orderBy("shard", "pos")),
    // the balance ledger a shard write ships with: per-shard doc/token
    // mass and each shard's token share vs the uniform target
    "export_shard_stats" -> ((s, dir) =>
      Sampling.shardStats(Tables.documents(s, dir)).orderBy("shard")),
    // per-shard write manifest: order-free content checksum + positional
    // stream checksum, both exact BIGINT sums on the 2^20 digest grid
    "export_manifest" -> ((s, dir) =>
      Sampling.exportManifest(Tables.documents(s, dir)).orderBy("shard")),
    // DSIR-style importance scoring (Xie et al. 2023) with a rational
    // affinity (integer word-mass sums, one division) in place of the
    // log-likelihood ratio, so the oracle compares bit-exactly
    "sample_importance" -> ((s, dir) =>
      Sampling.importanceAffinity(Tables.documents(s, dir)).orderBy("doc_id")),
    // the resampling half: top-50 by (affinity desc, doc_id) with strata
    "sample_importance_top" -> ((s, dir) =>
      Sampling.importanceResample(Tables.documents(s, dir)).orderBy("rnk")),
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir))
        .orderBy("doc_id", "rnk")),
    // BM25 (rational idf) top-10 for the query {stream, hash, window}
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(Tables.documents(s, dir),
        Seq("stream", "hash", "window"))),
    // bigram-LM fluency scoring (the CCNet perplexity-filter stage):
    // train on the hash31 half-slice, score every doc in fixed point
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(Tables.documents(s, dir)).orderBy("doc_id")),
    // linear quality-classifier gate (fastText-style filter; sign of a
    // fixed left-to-right IEEE chain over the bit-exact quality features)
    "quality_logit" -> ((s, dir) =>
      TextAnalysis.qualityLogit(Tables.documents(s, dir)).orderBy("doc_id")),
    // corpus snapshot diff: v_old drops doc_id%11==0, v_new drops
    // doc_id%7==0 and revises the text of doc_id%13==0 — every status
    // branch (added/removed/modified/unchanged) exercised deterministically
    "corpus_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vOld = docs.filter(col("doc_id") % 11 =!= 0)
      val vNew = docs.filter(col("doc_id") % 7 =!= 0).select(
        col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      Corpus.snapshotDiff(vOld, vNew).orderBy("doc_id")
    }),
    // the streaming admission controller in batch form: same %10 split as
    // dedup_incremental; quality sign-gate + PII threshold + dedup gate
    // against the PERSISTED corpus signature index (built once per JVM per
    // data dir — reps time the arrivals' row-wise work + join only)
    "corpus_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.admissionGateWithIndex(
        docs.filter(col("doc_id") % 10 === 0),
        s.read.parquet(admissionIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    "corpus_filter" -> ((s, dir) =>
      // funnel consumes the persisted cluster index (built once per JVM
      // per data dir) instead of re-running the star contraction
      Corpus.filterFunnel(Tables.documents(s, dir),
        clusterIndex = Some(Clusters.indexLoad(s, clusterIndexDir(s, dir))))
        .orderBy("doc_id")),
    "quality_percentiles" -> ((s, dir) =>
      Corpus.qualityPercentiles(Tables.documents(s, dir)).orderBy("source")),
    // token-budget selection: best-first by classifier logit until the
    // budget fills — cumsum via GlobalOrder.runningSum, never a
    // single-partition window
    "corpus_token_budget" -> ((s, dir) =>
      Corpus.tokenBudget(Tables.documents(s, dir)).orderBy("cum_tokens")),
    // per-source ingestion-order budget gate: the ingest-time quota (the
    // streaming twin carries the same running total as keyed state)
    "corpus_budget_by_source" -> ((s, dir) =>
      Corpus.sourceBudget(Tables.documents(s, dir)).orderBy("source", "doc_id")),
    // n-gram novelty: fraction of a doc's trigrams first seen in it —
    // the marginal-contribution ranking signal for sources and documents
    "text_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // char-collision diversity (Rényi-2 surrogate): integer sums + one
    // division, no transcendentals — bit-stable across engines
    "text_char_stats" -> ((s, dir) =>
      TextAnalysis.charStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // pre-training data-quality profile of the corpus table
    "corpus_profile" -> ((s, dir) =>
      Corpus.profile(Tables.documents(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("col_name")),
    // quality-decile × duplication cross-ledger off the persisted cluster
    // index: is low quality where the duplicates live?
    "quality_vs_dup" -> ((s, dir) =>
      Corpus.qualityVsDup(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("decile")),
    // quality-gate threshold sweep: docs/tokens retained per candidate
    // cutoff in one corpus pass - the knee picks the gate
    "quality_threshold_sweep" -> ((s, dir) =>
      Corpus.qualityThresholdSweep(Tables.documents(s, dir))
        .orderBy("threshold")),
    // source x quality-band matrix: which source ships the junk — read
    // before setting per-source admission rates
    "quality_source_matrix" -> ((s, dir) =>
      TextAnalysis.sourceQualityMatrix(Tables.documents(s, dir))
        .orderBy("source", "band")),
    // dedup-first vs filter-first retention, same gates and cluster index:
    // filter-first can only rescue (measured), never drop
    "corpus_funnel_order" -> ((s, dir) =>
      Corpus.funnelOrder(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("source")),
    // length-distribution drift between even/odd source slices: per
    // bucket integer ppm rates and absolute drift (the shift pager)
    "corpus_drift" -> ((s, dir) =>
      Corpus.lengthDrift(Tables.documents(s, dir)).orderBy("bucket")),

    // ------------------------------------------------ multimodal plumbing
    "mm_binary_meta" -> ((s, dir) =>
      // real decode over the STORED media column (encoded once per JVM —
      // ingest-time work): project the oracle-predictable decoded
      // properties (dims + pixel sum); payload size/hash depend on the
      // deflate stream and stay API-only
      Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir)))
        .select("doc_id", "width", "height", "n_frames", "sum_red")
        .orderBy("doc_id")),
    // perceptual aHash over the decoded raster — the oracle recomputes the
    // same 64 bits arithmetically from the payload generator's contract
    "mm_phash" -> ((s, dir) =>
      Multimodal.aHash(s.read.parquet(mediaIndexDir(s, dir))).orderBy("doc_id")),
    // image near-dup pairs: 8×8-bit banded equality join (full recall to
    // Hamming 7 by pigeonhole) + exact popcount verify — never all-pairs
    "mm_phash_dups" -> ((s, dir) =>
      Multimodal.phashDups(
        Multimodal.aHash(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("a_id", "b_id")),
    // Hamming threshold sweep over the verified pair set: exact to d=7 by
    // the pigeonhole band bound, an 8-row rollup on top of the same join
    "mm_phash_threshold" -> ((s, dir) =>
      Multimodal.phashThresholdCurve(
        Multimodal.aHash(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("threshold")),
    // image near-dup cluster-size histogram: the SAME star contraction
    // the text dedup uses, fed the banded phash pair set
    "mm_phash_clusters" -> ((s, dir) => {
      val media = s.read.parquet(mediaIndexDir(s, dir))
      val hashes = Multimodal.aHash(media)
      // doc ids off the index scan — the hash frame's lineage is the
      // full-corpus decode
      Clusters.sizeHistogram(Clusters.assign(
        media.select(col("doc_id")),
        Multimodal.phashDups(hashes).select("a_id", "b_id")))
        .orderBy("cluster_size")
    }),
    // modality mix over the DECODED metadata (stills vs clips vs video by
    // real decoded frame count): item + pixel-mass shares — the GPU-hour
    // budget split of a multimodal corpus
    "mm_modality_mix" -> ((s, dir) =>
      Multimodal.modalityMix(
        Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("modality")),
    // per-modality brightness/shape envelope off the real decoded
    // rasters (corpus normalization stats); oracle re-derives the cyclic
    // pixel sums arithmetically — decode verified end-to-end again
    "mm_pixel_profile" -> ((s, dir) =>
      Multimodal.pixelProfile(
        Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("modality")),
    // frame-level reclaim from clip near-dup dedup: phash clusters priced
    // in frames (keep min-doc member per cluster)
    "mm_frame_dedup" -> ((s, dir) =>
      Multimodal.frameDedupLedger(s.read.parquet(mediaIndexDir(s, dir)))),
    // SCALE-path twins (the r12 second-decade rehearsal caught the 8-bit
    // bands' n²/512 pair join at exponent 1.24-1.34 — these ride
    // phashDupsWide: 16-bit bands + hot-bucket cap + star edges, the
    // prescribed default past ~100k images; Hamming ≤ 3 contract)
    "mm_phash_clusters_capped" -> ((s, dir) => {
      val media = s.read.parquet(mediaIndexDir(s, dir))
      val hashes = Multimodal.aHash(media)
      Clusters.sizeHistogram(Clusters.assign(
        media.select(col("doc_id")),
        Multimodal.phashDupsWide(hashes).select("a_id", "b_id")))
        .orderBy("cluster_size")
    }),
    "mm_frame_dedup_capped" -> ((s, dir) =>
      Multimodal.frameDedupLedgerCapped(
        s.read.parquet(mediaIndexDir(s, dir)))),
    // the standing-pipeline form: the aHash table persists like the
    // ivf:/pq: indexes, so the corpus decodes ONCE PER SNAPSHOT and every
    // later dedup pass is a 4-longs-per-image parquet scan. Identical
    // result to mm_phash_clusters_capped (aHash is deterministic) — one
    // oracle pins both paths, the ann_ivf_persisted pattern.
    "mm_phash_clusters_persisted" -> ((s, dir) => {
      val media = s.read.parquet(mediaIndexDir(s, dir))
      val hashDir = graft.sources.IndexCache.dirFor(s"mmhash:$dir")(d =>
        Multimodal.aHash(media).write.mode("overwrite").parquet(d))
      val hashes = s.read.parquet(hashDir)
      Clusters.sizeHistogram(Clusters.assign(
        media.select(col("doc_id")),
        Multimodal.phashDupsWide(hashes).select("a_id", "b_id")))
        .orderBy("cluster_size")
    }),
    // aspect-ratio bucketed batching ledger off the DECODED dims: nearest
    // ladder rung by exact integer cross-multiplied distance, letterbox
    // padding waste per bucket (the image twin of pack_padding_waste)
    "mm_aspect_buckets" -> ((s, dir) =>
      Multimodal.aspectBuckets(
        Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("bucket")),

    // ------------------------------------------------ evaluate / consumer / hash
    "cdc_evaluate" -> ((s, dir) => {
      // the enriched op-state and poll lane each feed several report
      // subtrees — persist so the single-job report computes them once.
      // Project to the columns the report reads BEFORE persisting: the
      // cached frame (scanned by five subtrees) drops the unused
      // before-images/payload columns the window stage had to compute
      val state = st(s, dir)
        .select("tbl", "pk", "op", "lsn", "t", "ver", "cur_val", "cur_k")
        .persist()
      val poll = Capture.poll(state).persist()
      val actual = poll.select(
        col("poll_ts").as("time"), col("src_lsn").as("ord"),
        col("op_code"), col("tbl"), col("pk"))
      // last polled row per key: argmax by poll_window (unique per key) as
      // a hash aggregation — no per-key sort stage on the cached lane
      val pollState = poll
        .groupBy("tbl", "pk")
        .agg(max_by(
          struct(col("op_code"), col("after_val"), col("after_k")),
          col("poll_window")).as("last"))
        .filter(col("last.op_code") =!= "d")
        .select(col("tbl"), col("pk"),
          col("last.after_val").as("val"), col("last.after_k").as("k"))
      // `state` is a superset of the ops columns — passing it as the op
      // stream reuses the one cached lineage instead of re-reading parquet
      graft.operators.CacheLifecycle.releaseAfterUse(
        Evaluate.lane(state, state, actual, pollState).orderBy("metric"),
        Seq(state, poll))
    }),
    "cdc_evaluate_log" -> ((s, dir) => {
      // the same harness report over the LOG lane: lossless capture must
      // report zero missing/extra/mismatches and pass = 1 — the lane-generic
      // counterpart to the polling-lane cdc_evaluate
      val state = st(s, dir)
        .select("tbl", "pk", "op", "lsn", "t", "prev_val", "prev_k", "cur_val", "cur_k")
        .persist()
      val lane = Capture.log(state).persist()
      val actual = lane.select(
        col("emitted_ts").as("time"), col("lsn").as("ord"),
        col("op_code"), col("tbl"), col("pk"))
      val replayed = ApplyEngine.replayEvents(lane, "lsn")
      graft.operators.CacheLifecycle.releaseAfterUse(
        Evaluate.lane(state, state, actual, replayed).orderBy("metric"),
        Seq(state, lane))
    }),

    "cdc_commit_floor" -> ((s, dir) => {
      val drifted = Broker.withDrift(
        ops(s, dir), concat(lit("tx-"), col("lsn").cast("string")), col("t"))
      val txns = drifted
        .withColumn("tx_num", expr("event_id div 3"))
        .groupBy("tx_num")
        .agg(
          (max(col("t")) + 100L).as("commit_ts"),
          min(col("lsn")).as("first_lsn"),
          max(col("available_at")).as("ready_at"))
        .withColumn("tx_id", concat(lit("tx-"), col("tx_num").cast("string")))
      Txn.applyOnCommit(txns)
        .select("tx_id", "commit_ts", "first_lsn", "ready_at",
          "apply_order", "applied_at", "held_ms")
        .orderBy("apply_order")
    }),
    "cdc_broker_delivery" -> ((s, dir) => {
      val drifted = Broker.withDrift(
        ops(s, dir), concat(lit("tx-"), col("lsn").cast("string")), col("t"))
        .withColumn("part", graft.functions.GraftFunctions.partitionForKey(col("pk"), 3))
      Consumer.brokerDelivery(drifted, "lsn")
        .select("part", "lsn", "available_at", "queue_pos", "deliver_tick", "deliver_ms")
        .orderBy("part", "queue_pos")
    }),
    "cdc_broker_exact" -> ((s, dir) => {
      // exact FIFO-queue per-tick delivery (head-of-line blocking, drops
      // consuming quota) over 32 hash-routed partitions — the sequential
      // counterpart to cdc_broker_delivery's closed-form schedule
      import s.implicits._
      val routed = Broker.route(
        Broker.withDrift(ops(s, dir), concat(lit("tx-"), col("lsn").cast("string")), col("t")),
        col("pk"), col("lsn"), 32, 0.1)
      Consumer.brokerDeliverExact(
        routed.select(col("part").cast("int").as("part"), col("lsn"),
          col("available_at").as("availableAt"), col("dropped")).as[Consumer.BrokerIn])
        .toDF()
        .select(col("part").cast("long").as("part"), col("lsn"),
          col("availableAt"), col("dropped"), col("deliverTick"), col("deliverMs"))
        .orderBy("part", "lsn")
    }),
    "cdc_broker_drift_exact" -> ((s, dir) => {
      // exact drift-on delivery trace: queue-FRONT insertion per
      // `model.ts:141-149` makes each partition queue a LIFO stack; a
      // drifted head blocks older events beneath it
      import s.implicits._
      val routed = Broker.route(
        Broker.withDrift(ops(s, dir), concat(lit("tx-"), col("lsn").cast("string")), col("t")),
        col("pk"), col("lsn"), 32, 0.1)
      Consumer.brokerDeliverDriftExact(
        routed.select(col("part").cast("int").as("part"), col("lsn"),
          col("t"), col("available_at").as("availableAt"), col("dropped"))
          .as[Consumer.DriftIn])
        .toDF()
        .select(col("part").cast("long").as("part"), col("lsn"),
          col("availableAt"), col("dropped"), col("deliverTick"), col("deliverMs"))
        .orderBy("part", "lsn")
    }),

    "cdc_state_hash" -> ((s, dir) => {
      val state = ApplyEngine.applyState(ops(s, dir))
      state.select(
        col("tbl"), col("pk"),
        sha2(concat_ws("|",
          col("tbl"), col("pk"),
          coalesce(col("val").cast("string"), lit("")),
          coalesce(col("k").cast("string"), lit("")),
          col("version").cast("string"), col("updated_at").cast("string")), 256).as("row_hash"))
        .orderBy("tbl", "pk")
    }),
    "cdc_throttle_drain" -> ((s, dir) => {
      // 32 consumer lanes sharded by pk — lanes drain independently (the
      // parallelism axis of the per-lane sequential fold); the DuckDB oracle
      // replays the same token bucket as a recursive CTE advancing all lane
      // states one event per iteration
      import s.implicits._
      val lane = Capture.log(st(s, dir))
      Consumer.throttleDrain(
        lane.select(
          concat(lit("lane-"),
            lpad(pmod(col("pk").cast("long"), lit(32)).cast("string"), 2, "0")).as("method"),
          col("lsn").as("seq"),
          col("emitted_ts").as("availableAt")).as[Consumer.DeliveryIn],
        rate = 200.0)
        .toDF().orderBy("method", "drainTick", "seq")
    }),

    "cdc_backlog_series" -> ((s, dir) => {
      // produced − drained per (lane, tick) with running backlog — the
      // time-series companion to cdc_throttle_drain (same 32-lane drain)
      import s.implicits._
      val lane = Capture.log(st(s, dir))
      val drained = Consumer.throttleDrain(
        lane.select(
          concat(lit("lane-"),
            lpad(pmod(col("pk").cast("long"), lit(32)).cast("string"), 2, "0")).as("method"),
          col("lsn").as("seq"),
          col("emitted_ts").as("availableAt")).as[Consumer.DeliveryIn],
        rate = 200.0)
      MetricsAgg.backlogSeries(drained.toDF()).orderBy("method", "tick")
    }),

    "cdc_schema_capture" -> ((s, dir) => {
      // deterministic DDL stream derived from the op stream: every 250th
      // event issues a schema change on its table, alternating add/drop
      import s.implicits._
      val changes = ops(s, dir)
        .filter(col("event_id") % 250 === 0)
        .select(col("tbl"),
          when(col("event_id") % 500 === 0, "ADD_COLUMN")
            .otherwise("DROP_COLUMN").as("action"),
          concat(lit("c"), (col("event_id") % 7).cast("string")).as("column"),
          col("t").as("commitTs"))
        .as[SchemaEvolution.SchemaChange]
      SchemaEvolution.captureLanes(changes)
        .orderBy("tbl", "next_version", "method")
    }),

    // ------------------------------------------------ more analytics
    "q_lineitem_orders_join" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy("o_orderpriority")),
    // The same fact⋈fact join through the bucketed build-once/join-many
    // path (sources/Bucketing): both sides written bucketed on the join
    // key, the join itself plans with zero Exchange (BucketingSpec pins
    // the plan; this row pins the results). Table names and paths carry a
    // per-run tag (no cross-process races) and the build happens once per
    // JVM (bucketizeOnce) — bench reps past the first time the join, not
    // the table write.
    "q_bucketed_join" -> ((s, dir) => {
      val tag = sources.Bucketing.runTag(s) + "_" +
        java.lang.Integer.toHexString(dir.hashCode)
      val tmp = System.getProperty("java.io.tmpdir")
      val li = sources.Bucketing.bucketizeOnce(s,
        Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice"),
        s"graft_bq_lineitem_$tag", s"$tmp/graft_bucketed_$tag/lineitem", "l_orderkey", 16)
      val o = sources.Bucketing.bucketizeOnce(s,
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        s"graft_bq_orders_$tag", s"$tmp/graft_bucketed_$tag/orders", "o_orderkey", 16)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),
    "q_events_user_topk" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)),
    "cdc_event_search" -> ((s, dir) => {
      val lane = Capture.log(st(s, dir))
      val hay = Canonical.haystack(Seq(col("tbl"), col("op_code"), col("pk")))
      lane
        .filter(col("op_code").isin("c", "d") && Canonical.matchesAllTerms(hay, Seq("7")))
        .groupBy("op_code").agg(count(lit(1)).as("cnt"))
        .orderBy("op_code")
    }),
    "cdc_bus_totals" -> ((s, dir) => {
      val state = st(s, dir)
      val lanes =
        Capture.log(state).groupBy().agg(count(lit(1)).as("produced"))
          .select(lit("log").as("method"), col("produced"))
          .unionAll(Capture.poll(state).groupBy().agg(count(lit(1)).as("produced"))
            .select(lit("poll").as("method"), col("produced")))
          .unionAll(Capture.trigger(state).groupBy().agg(count(lit(1)).as("produced"))
            .select(lit("trigger").as("method"), col("produced")))
      lanes
        .unionAll(lanes.groupBy().agg(sum("produced").as("produced"))
          .select(lit("total").as("method"), col("produced")))
        .orderBy("method")
    }),
    "q_part_pushdown" -> ((s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_size") > 25 && col("p_type") === "ECONOMY")
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double").as("retail"))
        .orderBy("p_brand")),
    "ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // the amortized build-once form: index written as parquet (lists
    // partitioned by list_id), loaded back, probed — results pinned to the
    // in-memory path by the shared oracle; the list_id equality join prunes
    // the probe to the probed partitions (DPP — asserted in DedupSpec)
    "ann_ivf_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // built ONCE per JVM per data dir (IndexCache) so repeated
      // invocations — bench reps included — time only load+probe, the
      // query's stated amortized contract; the temp dir is reclaimed at
      // JVM exit instead of leaking one per rep
      val idxDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val (centroids, lists) = Similarity.ivfIndexLoad(s, idxDir)
      Similarity.ivfProbe(emb.filter(col("vec_id") < 10), centroids, lists)
        .orderBy("q_id", "rnk")
    }),
    "ann_ivf_recall" -> ((s, dir) =>
      Similarity.ivfRecall(Tables.embeddings(s, dir)).orderBy("q_id")),
    // incremental index maintenance: a synthetic arrival batch (reversed
    // embeddings of vec_id < 50, offset ids — deterministic, not near
    // their sources) assigned to the PERSISTED centroids without any
    // retraining — the per-ingest-batch path; retraining is a periodic
    // rebuild. Shares the ivf:$dir IndexCache build with ann_ivf_persisted.
    "ann_ivf_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val (centroids, _) = Similarity.ivfIndexLoad(s, idxDir)
      val arrivals = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
      Similarity.ivfIncrementalAssign(arrivals, centroids).orderBy("vec_id")
    }),
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(Tables.documents(s, dir)).orderBy("doc_id", "frame_idx")),
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeFromPayloads(s.read.parquet(mediaIndexDir(s, dir)))
        .orderBy("doc_id")),
    "cdc_verify_counts" -> ((s, dir) => {
      // source↔sink verify: sink := source minus every 50th key, plus a few
      // synthetic orphans — deterministic drift for the anti-join check
      val source = Tables.customer(s, dir).select(col("c_custkey").as("id"))
      val sink = source.filter(col("id") % 50 =!= 0)
        .unionAll(source.filter(col("id") < 5).select((col("id") + 1000000L).as("id")))
      Diff.verifyCounts(source, sink, Seq("id")).orderBy("metric")
    }))

  /** DuckDB oracle SQL per query (same keys as `queries`). */
  def oracleSql: Map[String, String] = Oracles.all
}
