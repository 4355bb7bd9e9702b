package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{ApplyEngine, CdcOps, Diff}
import graft.sources.ScenarioSource

/** End-to-end replay of the reference's OWN harness fixtures:
  * fixture JSON → `ScenarioSource` normalise → log capture emission →
  * `applyJsonState` reduce, asserting the verifier's gate
  * (`harness/verifier/index.js:169-205`: pass = missing==0 && extra==0 &&
  * ordering==0, state diff all-match; CI additionally requires
  * `total_events >= scenario.ops.length`, `scripts/run-harness-ci.mjs:136,165`).
  * This is the reference's own definition of done for a capture lane.
  */
class FixtureReplaySpec extends SparkSpec {

  private def decodeOp(opCode: org.apache.spark.sql.Column) =
    when(opCode === "d", "delete").when(opCode === "u", "update").otherwise("insert")

  /** Run one fixture through the verifier gate; returns total events. */
  private def replayGate(path: String): Long = {
    val scen = ScenarioSource.read(spark, path)
    val expectedEvents = scen.select(size(col("ops"))).collect().head.getInt(0).toLong

    val ops = ScenarioSource.normaliseOps(scen)
      // deterministic per-feed sequence — fixtures are tiny, so a test-local
      // global window is fine here (the engine path uses GlobalOrder.rank)
      .withColumn("lsn", row_number().over(Window.orderBy("t", "tbl", "pk")).cast("long"))
      .persist()

    // log-capture lane: lossless, before/after images, next-fetch-tick emission
    val lane = ops.select(
      col("tbl"), col("pk"),
      CdcOps.opCode(col("op")).as("op_code"),
      when(col("op") =!= "delete", col("after_json")).as("after_json"),
      col("t"), col("lsn"),
      (col("t") - (col("t") % 100) + 100).as("emitted_ts")).persist()

    // --- verifier gate -----------------------------------------------------
    val totalEvents = lane.count()
    assert(totalEvents >= expectedEvents, s"total_events $totalEvents < expected $expectedEvents")
    assert(lane.filter(col("op_code") === "d").count() ===
      ops.filter(col("op") === "delete").count(), "deletes_captured != deletes_expected")

    val expectedKeyed = ops.select(
      concat_ws("::", col("tbl"), col("op"), col("pk")).as("key"),
      col("t").as("time"), col("lsn").as("ord"))
    val actualKeyed = lane.select(
      concat_ws("::", col("tbl"), decodeOp(col("op_code")), col("pk")).as("key"),
      col("emitted_ts").as("time"), col("lsn").as("ord"))
    val nonMatched = Diff.lanePairs(expectedKeyed, actualKeyed, "ord")
      .filter(col("status") =!= "matched").count()
    assert(nonMatched === 0L, "missing/extra pairs in lane diff")

    val inversions = Diff.orderingInversions(
      lane, Seq.empty, Seq(col("emitted_ts"), col("lsn")), "lsn")
      .filter(col("inverted")).count()
    assert(inversions === 0L, "ordering issues in delivery order")

    val expState = ApplyEngine.applyJsonState(
      ops.select(col("tbl"), col("pk"), col("op"), col("after_json"), col("lsn").as("ord")))
    val actState = ApplyEngine.applyJsonState(
      lane.select(col("tbl"), col("pk"), decodeOp(col("op_code")).as("op"),
        col("after_json"), col("lsn").as("ord")))
    val stateMismatches = Diff.diffStates(expState, actState, Seq("row_json"))
      .filter(col("status") =!= "match").count()
    assert(stateMismatches === 0L, "state diff not all-match")

    ops.unpersist()
    lane.unpersist()
    totalEvents
  }

  test("EVERY reference harness fixture passes the verifier gate") {
    val dir = new java.io.File("/root/reference/harness/fixtures")
    val fixtures = dir.listFiles().filter(_.getName.endsWith(".json")).map(_.getPath).sorted
    assert(fixtures.length >= 15, "fixture directory unexpectedly small")
    fixtures.foreach { path =>
      withClue(s"fixture $path: ") { assert(replayGate(path) > 0L) }
    }
  }

  test("crud-basic fixture passes the verifier gate (delete ends empty)") {
    assert(replayGate("/root/reference/harness/fixtures/crud-basic.json") === 3L)
    // trailing delete ⇒ final state empty
    val scen = ScenarioSource.read(spark, "/root/reference/harness/fixtures/crud-basic.json")
    val ops = ScenarioSource.normaliseOps(scen)
      .withColumn("ord", row_number().over(Window.orderBy("t", "tbl", "pk")).cast("long"))
    assert(ApplyEngine.applyJsonState(ops).count() === 0L)
  }

  test("schema-evolution fixture: implicit widening + nested payloads survive the gate") {
    assert(replayGate("/root/reference/harness/fixtures/schema-evolution.json") === 4L)
    val scen = ScenarioSource.read(
      spark, "/root/reference/harness/fixtures/schema-evolution.json")
    val ops = ScenarioSource.normaliseOps(scen)
      .withColumn("ord", row_number().over(Window.orderBy("t", "tbl", "pk")).cast("long"))
    val state = ApplyEngine.applyJsonState(ops).collect()
      .map(r => r.getAs[String]("pk") -> r.getAs[String]("row_json")).toMap
    // the update introduced columns the insert never had (implicit schema
    // evolution); nested objects kept as their raw JSON text
    val c880 = state("C-880")
    assert(c880.contains("\"loyalty_tier\":\"gold\"")) // updated over insert
    assert(c880.contains("\"name\":\"Mira\"")) // merged from insert
    assert(c880.contains("marketing_opt_in")) // nested payload survived
  }

  test("orders-items-transactions fixture passes the verifier gate with merged state") {
    assert(replayGate(
      "/root/reference/harness/fixtures/orders-items-transactions.json") === 4L)
    val scen = ScenarioSource.read(
      spark, "/root/reference/harness/fixtures/orders-items-transactions.json")
    val ops = ScenarioSource.normaliseOps(scen)
      .withColumn("ord", row_number().over(Window.orderBy("t", "tbl", "pk")).cast("long"))
    val state = ApplyEngine.applyJsonState(ops).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("pk")) -> r.getAs[String]("row_json"))
      .toMap
    assert(state.size === 3) // ORD-720 + two order_items
    // the update's partial payload merged over the insert's fields
    val order = state(("orders", "ORD-720"))
    assert(order.contains("\"customer_id\":\"C-32\"") && order.contains("\"subtotal\""))
  }
}
