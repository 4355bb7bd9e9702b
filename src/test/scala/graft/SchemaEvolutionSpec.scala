package graft

import graft.cdc.SchemaEvolution
import graft.cdc.SchemaEvolution.SchemaChange

/** Schema-change capture and destination evolution
  * (`src/domain/storage.ts:201-242`). */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("add then drop evolves destination columns; pk protected") {
    val table = Seq((1L, "x")).toDF("id", "name")
    val changes = Seq(
      SchemaChange("t0", "ADD_COLUMN", "email", 100L),
      SchemaChange("t0", "DROP_COLUMN", "name", 200L),
      SchemaChange("t0", "DROP_COLUMN", "id", 300L)) // must be refused
    val evolved = SchemaEvolution.applyChanges(table, changes)
    assert(evolved.columns.toSeq === Seq("id", "email"))
    assert(evolved.collect().head.isNullAt(1), "added column is null-filled")
  }

  test("duplicate add is idempotent") {
    val table = Seq((1L, "x")).toDF("id", "name")
    val evolved = SchemaEvolution.applyChanges(table, Seq(
      SchemaChange("t0", "ADD_COLUMN", "email", 100L),
      SchemaChange("t0", "ADD_COLUMN", "email", 200L)))
    assert(evolved.columns.count(_ == "email") === 1)
  }

  test("capture stamps monotone version transitions per table") {
    val changes = Seq(
      SchemaChange("t0", "ADD_COLUMN", "a", 100L),
      SchemaChange("t0", "DROP_COLUMN", "a", 200L),
      SchemaChange("t1", "ADD_COLUMN", "z", 150L)).toDS()
    val events = SchemaEvolution.capture(changes).collect()
      .map(r => (r.getAs[String]("tbl"), r.getAs[String]("column"),
        r.getAs[Int]("prev_version"), r.getAs[Int]("next_version"),
        r.getAs[String]("kind")))
    assert(events.toSet === Set(
      ("t0", "a", 1, 2, "SCHEMA_ADD_COL"),
      ("t0", "a", 2, 3, "SCHEMA_DROP_COL"),
      ("t1", "z", 1, 2, "SCHEMA_ADD_COL")))
    assert(SchemaEvolution.versionAfter(
      Seq(SchemaChange("t0", "ADD_COLUMN", "a", 1L)), "t0") === 2)
  }

  test("captureLanes: same change, three lanes, reference emission times") {
    // one change at t=1234: log emits immediately; polling queues it to the
    // next poll tick (2000); trigger applies at 1234+5 and the extractor
    // ships it at the next 500ms tick (1500)
    val changes = Seq(SchemaChange("t0", "ADD_COLUMN", "a", 1234L)).toDS()
    val lanes = SchemaEvolution.captureLanes(changes).collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("commit_ts"), r.getAs[Long]("emitted_ts"), r.getAs[Long]("lag_ms"))))
      .toMap
    assert(lanes("log") === ((1234L, 1234L, 0L)))
    assert(lanes("poll") === ((1234L, 2000L, 766L)))
    assert(lanes("trigger") === ((1239L, 1500L, 266L)))
    // version transition identical across lanes
    val vers = SchemaEvolution.captureLanes(changes).collect()
      .map(r => (r.getAs[Long]("prev_version"), r.getAs[Long]("next_version"))).toSet
    assert(vers === Set((1L, 2L)))
  }
}
