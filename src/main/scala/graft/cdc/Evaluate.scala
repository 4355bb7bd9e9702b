package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The harness verifier's `evaluate()` report
  * (`harness/verifier/index.js:169-205`): compose lane diff, delete-capture
  * accounting, ordering check, and state diff into one metrics report;
  * `pass = complete && orderingOk`.
  */
object Evaluate {

  /** Evaluate a capture lane against the source op stream. Returns
    * (metric, value) rows: produced, matched/missing/extra, deletes
    * expected/captured, ordering issues, state mismatches, pass (0/1).
    *
    * `actual` needs (key, time, ord, op_code, tbl, pk); `stateActual` the
    * lane's replayed destination state.
    */
  def lane(
      ops0: DataFrame,
      state: DataFrame,
      actual0: DataFrame,
      stateActual: DataFrame): DataFrame = {
    // the report fires several small aggregate jobs over these two inputs —
    // persist them so the capture lineage is not recomputed per metric
    val ops = ops0.persist()
    val actual = actual0.persist()
    val expected = state.select(
      concat_ws("::", col("tbl"), CdcOps.opCode(col("op")), col("pk")).as("key"),
      col("t").as("time"), col("lsn").as("ord"))
    val pairs = Diff.lanePairs(expected, actual.select("key", "time", "ord"), "ord")
    val statusCounts = pairs.groupBy("status").agg(count(lit(1)).as("cnt"))
    val truth = ApplyEngine.applyState(ops)
    val stateDiff = Diff.diffStates(truth, stateActual, Seq("val", "k"))
      .filter(col("status") =!= "match")
      .agg(count(lit(1)).as("mismatches"))
    val deletes = ops.agg(
      count(when(col("op") === "delete", 1)).as("expected_deletes"))
    val capturedDeletes = actual.agg(
      count(when(col("op_code") === "d", 1)).as("captured_deletes"))
    val ordering = Diff.orderingInversions(
      actual, Seq.empty, Seq(col("time"), col("ord")), "ord")
      .agg(count(when(col("inverted"), 1)).as("inversions"))

    val spark = ops.sparkSession
    import spark.implicits._
    val sc = statusCounts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = sc.getOrElse("missing", 0L)
    val extra = sc.getOrElse("extra", 0L)
    val matched = sc.getOrElse("matched", 0L)
    val mism = stateDiff.collect().head.getLong(0)
    val expDel = deletes.collect().head.getLong(0)
    val capDel = capturedDeletes.collect().head.getLong(0)
    val inv = ordering.collect().head.getLong(0)
    ops.unpersist()
    actual.unpersist()
    val pass = if (missing == 0 && inv == 0 && mism == 0) 1L else 0L
    Seq(
      ("matched", matched), ("missing", missing), ("extra", extra),
      ("deletes_expected", expDel), ("deletes_captured", capDel),
      ("ordering_issues", inv), ("state_mismatches", mism), ("pass", pass)
    ).toDF("metric", "value")
  }
}
