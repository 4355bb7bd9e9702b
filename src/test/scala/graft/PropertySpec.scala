package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.{ApplyEngine, Capture, CdcOps, Diff}
import graft.testutil.Scenarios

/** The reference's property-test invariants (`sim/tests/property-tests.mjs:
  * 207-243`) over 24 seeded random scenarios, run with the test-config
  * intervals (poll=200, extract=150+6, fetch=25, `:140-142`):
  *
  *   - trigger/log: zero missing, zero extra, zero ordering issues;
  *   - polling: zero extra; captured deletes ≤ expected;
  *   - lag bounds: log ≤ fetch interval, trigger ≤ extract + overhead;
  *   - event ts non-decreasing per lane in delivery order.
  *
  * All 24 scenarios are unioned into one DataFrame (table = seed) so each
  * invariant is a single distributed pass.
  */
class PropertySpec extends SparkSpec {

  // the reference's exact seed set (`sim/tests/seeds.json`)
  private val seeds: Seq[Long] = (11L to 34L)
  private lazy val ops: DataFrame = Scenarios.propertyOps(spark, seeds).cache()
  private lazy val state: DataFrame = CdcOps.withState(ops)

  private def laneStatusCounts(actual: DataFrame, orderCol: String): Map[String, Long] = {
    val expected = state.select(
      concat_ws("::", col("tbl"), CdcOps.opCode(col("op")), col("pk")).as("key"),
      col("t").as("time"), col("lsn").as("ord"))
    Diff.laneTotals(Diff.lanePairs(expected, actual, orderCol))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("log lane: complete, no extras, ordered, lag within fetch interval") {
    val lane = Capture.log(state, fetchIntervalMs = 25L)
    val counts = laneStatusCounts(
      lane.select(
        concat_ws("::", col("tbl"), col("op_code"), col("pk")).as("key"),
        col("emitted_ts").as("time"), col("lsn").as("ord")), "ord")
    assert(counts.getOrElse("missing", 0L) === 0L)
    assert(counts.getOrElse("extra", 0L) === 0L)
    assert(counts("matched") === ops.count())

    val inversions = Diff.orderingInversions(
      lane, Seq("tbl"), Seq(col("emitted_ts"), col("lsn")), "lsn")
      .filter(col("inverted")).count()
    assert(inversions === 0L)

    val maxLag = lane.agg(max("lag_ms")).collect().head.getLong(0)
    assert(maxLag <= 25L)
  }

  test("trigger lane: complete, no extras, ordered, lag bounded") {
    val lane = Capture.trigger(state, triggerOverheadMs = 6L, extractIntervalMs = 150L)
    val counts = laneStatusCounts(
      lane.select(
        concat_ws("::", col("tbl"), col("op_code"), col("pk")).as("key"),
        col("emitted_ts").as("time"), col("audit_seq").as("ord")), "ord")
    assert(counts.getOrElse("missing", 0L) === 0L)
    assert(counts.getOrElse("extra", 0L) === 0L)

    val inversions = Diff.orderingInversions(
      lane, Seq("tbl"), Seq(col("emitted_ts"), col("audit_seq")), "audit_seq")
      .filter(col("inverted")).count()
    assert(inversions === 0L)

    val maxLag = lane.agg(max("lag_ms")).collect().head.getLong(0)
    assert(maxLag <= 156L) // extract interval + trigger overhead
  }

  test("polling lane: no extras; deletes captured ≤ expected; none missed silently") {
    val lane = Capture.poll(state, pollIntervalMs = 200L)
    val counts = laneStatusCounts(
      lane.select(
        concat_ws("::", col("tbl"), col("op_code"), col("pk")).as("key"),
        col("poll_ts").as("time"), col("src_lsn").as("ord")), "ord")
    assert(counts.getOrElse("extra", 0L) === 0L)

    val expectedDeletes = ops.filter(col("op") === "delete").count()
    val capturedDeletes = lane.filter(col("op_code") === "d").count()
    assert(capturedDeletes <= expectedDeletes)

    // suppressed-delete accounting closes: captured(+soft) + overwritten == expected
    val overwrittenDeletes = state
      .withColumn("poll_window", expr("t div 200"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("tbl", "pk", "poll_window").orderBy(col("lsn").desc)))
      .filter(col("rn") > 1 && col("op") === "delete").count()
    assert(capturedDeletes + overwrittenDeletes === expectedDeletes)

    val maxLag = lane.select(max(col("poll_ts") - col("src_t"))).collect().head.getLong(0)
    assert(maxLag <= 200L)
  }

  test("lane event time is non-decreasing in delivery order") {
    val lane = Capture.log(state, fetchIntervalMs = 25L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("tbl").orderBy("emitted_ts", "lsn")
    val violations = lane
      .withColumn("prev_ts", lag("commit_ts", 1).over(w))
      .filter(col("prev_ts").isNotNull && col("commit_ts") < col("prev_ts"))
      .count()
    assert(violations === 0L)
  }

  test("merge-fold state equals window-replay state on every scenario") {
    val truth = ApplyEngine.applyState(ops)
    val replayed = ApplyEngine.replayEvents(Capture.log(state), "lsn")
    val statuses = Diff.diffStates(truth, replayed, Seq("val", "k"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses.keySet === Set("match"))
  }

  test("chain integrity equals a per-key sequential replica on every scenario") {
    val got = Capture.chainIntegrity(ops).collect()
      .map(r => r.getAs[String]("tbl") -> (r.getAs[Long]("n_double_insert"),
        r.getAs[Long]("n_update_without_row"),
        r.getAs[Long]("n_delete_without_row"))).toMap
    // driver-side replica: walk each key's lsn-ordered ops with one flag
    val rows = ops.select("tbl", "pk", "lsn", "op").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = rows.groupBy(_._1).map { case (tbl, trs) =>
      var di = 0L; var uw = 0L; var dw = 0L
      trs.groupBy(_._2).values.foreach { keyOps =>
        var prev: Option[String] = None
        keyOps.sortBy(_._3).foreach { case (_, _, _, op) =>
          (op, prev) match {
            case ("insert", Some("insert") | Some("update")) => di += 1
            case ("update", None | Some("delete")) => uw += 1
            case ("delete", None | Some("delete")) => dw += 1
            case _ =>
          }
          prev = Some(op)
        }
      }
      tbl -> ((di, uw, dw))
    }
    assert(got === want, "distributed lag-window audit == sequential walk")
  }

  test("scd2 history equals the streaming fold's replica on every scenario") {
    import graft.streaming.Streams
    val got = ApplyEngine.scd2(state).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("pk"),
        r.getAs[Long]("ver"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        Option(r.getAs[java.lang.Double]("val")).map(_.toDouble),
        Option(r.getAs[java.lang.Long]("k")).map(_.toLong),
        r.getAs[Boolean]("is_current"))).toSet
    // replica: the streaming fold per key — closed versions plus the open
    // version from the final state (the stream's in-state current row)
    val rows = ops.select("tbl", "pk", "lsn", "t", "op", "sets_val", "val",
        "sets_k", "k").collect()
      .map(r => Streams.ScdIn(r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getBoolean(5),
        Option(r.getAs[java.lang.Double]("val")).map(_.toDouble).getOrElse(0.0),
        r.getBoolean(7),
        Option(r.getAs[java.lang.Long]("k")).map(_.toLong).getOrElse(0L)))
    val want = rows.groupBy(o => (o.tbl, o.pk)).flatMap { case ((tbl, pk), keyOps) =>
      val (st, closed) = Streams.scd2Fold(None, keyOps.toSeq)
      val closedRows = closed.map(c =>
        (tbl, pk, c.ver, c.validFrom, Some(c.validTo), c.v, c.kk, false))
      val openRow = st.filter(_.open).map(s =>
        (tbl, pk, s.openVer, s.validFrom, None, s.v, s.kk, true))
      closedRows ++ openRow
    }.toSet
    assert(got === want,
      "batch scd2 == streaming fold replica (closed + in-state open rows)")
  }

  test("tombstone ledger: GC-eligible ⊆ tombstones; reborn keys are live") {
    val out = Capture.tombstoneGc(ops).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_gc_eligible") <= r.getAs[Long]("n_tombstones"))
      assert(r.getAs[Long]("n_tombstones") <= r.getAs[Long]("n_keys"))
      // a reborn key's LAST insert follows its last delete, so it cannot
      // also be a tombstone unless deleted again afterwards; the two sets
      // can overlap only through a later delete — bound, not equality
      assert(r.getAs[Long]("n_reborn") <= r.getAs[Long]("n_keys"))
    }
    // totals: tombstones across tables == keys whose argmax-op is delete
    val wantTombs = ops.groupBy("tbl", "pk")
      .agg(max_by(col("op"), col("lsn")).as("lastOp"))
      .filter(col("lastOp") === "delete").count()
    assert(out.map(_.getAs[Long]("n_tombstones")).sum === wantTombs)
  }
}
