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
}
