package graft

import org.apache.spark.sql.Row
import graft.cdc.ApplyEngine
import graft.cdc.ApplyEngine.OpIn

/** Semantics of the ordered merge-fold (`src/domain/storage.ts:137-164`):
  * partial payloads merge (NOT last-row-wins), delete clears state, version
  * counts the current lifetime.
  */
class ApplyEngineSpec extends SparkSpec {

  private def runFold(ops: Seq[OpIn]): Map[(String, String), Row] = {
    import spark.implicits._
    val df = ops.toDS().toDF()
      .withColumnRenamed("setsVal", "sets_val")
      .withColumnRenamed("valV", "val")
      .withColumnRenamed("setsK", "sets_k")
      .withColumnRenamed("kV", "k")
    ApplyEngine.applyState(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
  }

  test("partial after-payloads merge; last-row-wins would be wrong") {
    val ops = Seq(
      OpIn("t0", "1", 1, 10, "insert", setsVal = true, Some(1.0), setsK = true, Some(100L)),
      OpIn("t0", "1", 2, 20, "update", setsVal = true, Some(2.0), setsK = false, None), // touches only val
      OpIn("t0", "1", 3, 30, "update", setsVal = false, None, setsK = true, Some(300L))) // touches only k
    val st = runFold(ops)(("t0", "1"))
    // merged image: val from op2, k from op3 — a naive last() would null val
    assert(st.getDouble(2) === 2.0)
    assert(st.getLong(3) === 300L)
    assert(st.getLong(4) === 3L) // version: 3 ops this lifetime
    assert(st.getLong(5) === 30L) // updated_at
  }

  test("delete removes the row; trailing delete yields no row") {
    val ops = Seq(
      OpIn("t0", "1", 1, 10, "insert", setsVal = true, Some(1.0), setsK = true, Some(1L)),
      OpIn("t0", "1", 2, 20, "delete", setsVal = false, None, setsK = false, None))
    assert(runFold(ops).isEmpty)
  }

  test("re-insert after delete starts a fresh lifetime (no value leak)") {
    val ops = Seq(
      OpIn("t0", "1", 1, 10, "insert", setsVal = true, Some(1.0), setsK = true, Some(1L)),
      OpIn("t0", "1", 2, 20, "delete", setsVal = false, None, setsK = false, None),
      OpIn("t0", "1", 3, 30, "update", setsVal = true, Some(9.0), setsK = false, None))
    val st = runFold(ops)(("t0", "1"))
    assert(st.getDouble(2) === 9.0)
    assert(st.isNullAt(3), "k must not leak from the pre-delete lifetime")
    assert(st.getLong(4) === 1L) // fresh lifetime: 1 op
  }

  test("keys fold independently across tables") {
    val ops = Seq(
      OpIn("t0", "1", 1, 10, "insert", setsVal = true, Some(1.0), setsK = false, None),
      OpIn("t1", "1", 2, 20, "insert", setsVal = true, Some(2.0), setsK = false, None),
      OpIn("t0", "2", 3, 30, "delete", setsVal = false, None, setsK = false, None))
    val st = runFold(ops)
    assert(st.size === 2)
    assert(st(("t0", "1")).getDouble(2) === 1.0)
    assert(st(("t1", "1")).getDouble(2) === 2.0)
  }

  test("schema-drift projection drops the drifted column, never the row") {
    // mirrors `changefeed-playground.test.ts` "handles schema drift by
    // projecting or ignoring the extra column" (applyRowChange,
    // model.ts:110-120)
    import spark.implicits._
    val ops = Seq(
      ("t0", "1", 1L, "insert", """{"name":"ada","priority_flag":"1"}"""),
      ("t0", "1", 2L, "update", """{"city":"x"}"""),
      ("t0", "2", 3L, "insert", """{"priority_flag":"1"}""") // drift-only row
    ).toDF("tbl", "pk", "ord", "op", "after_json")
    // projected (drift visible): flag survives
    val visible = ApplyEngine.applyJsonState(ops)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(visible("1") === """{"city":"x","name":"ada","priority_flag":"1"}""")
    // ignored (projectSchemaDrift off): flag deleted from every row; the
    // drift-only row still exists as {}
    val dropped = ApplyEngine.applyJsonState(ops, dropColumns = Seq("priority_flag"))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(dropped("1") === """{"city":"x","name":"ada"}""")
    assert(dropped("2") === "{}", "row survives with its drifted column removed")
  }

  private def scd2Of(ops: Seq[OpIn]): Seq[Row] = {
    import spark.implicits._
    val df = ops.toDS().toDF()
      .withColumnRenamed("setsVal", "sets_val")
      .withColumnRenamed("valV", "val")
      .withColumnRenamed("setsK", "sets_k")
      .withColumnRenamed("kV", "k")
    ApplyEngine.scd2(graft.cdc.CdcOps.withState(df))
      .orderBy("tbl", "pk", "ver").collect().toSeq
  }

  test("scd2: versions chain [valid_from, valid_to); delete closes the " +
      "interval without opening a row") {
    val out = scd2Of(Seq(
      OpIn("t0", "1", 1, 10, "insert", setsVal = true, Some(1.0), setsK = true, Some(100L)),
      OpIn("t0", "1", 2, 20, "update", setsVal = true, Some(2.0), setsK = false, None),
      OpIn("t0", "1", 3, 30, "delete", setsVal = false, None, setsK = false, None),
      OpIn("t0", "1", 4, 40, "insert", setsVal = true, Some(5.0), setsK = false, None)))
    // the delete (ver 3) emits no row; it closes ver 2's interval at t=30
    assert(out.map(_.getAs[Long]("ver")) === Seq(1L, 2L, 4L))
    assert(out.map(_.getAs[Long]("valid_from")) === Seq(10L, 20L, 40L))
    assert(out.map(r => Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong)) ===
      Seq(Some(20L), Some(30L), None))
    // merged images at each version; k does not leak across the delete
    assert(out.map(_.getAs[Double]("val")) === Seq(1.0, 2.0, 5.0))
    assert(out.map(r => Option(r.getAs[java.lang.Long]("k")).map(_.toLong)) ===
      Seq(Some(100L), Some(100L), None))
    assert(out.map(_.getAs[Boolean]("is_current")) === Seq(false, false, true))
  }

  test("scd2: a trailing delete leaves the key with no current version") {
    val out = scd2Of(Seq(
      OpIn("t0", "9", 1, 10, "insert", setsVal = true, Some(1.0), setsK = false, None),
      OpIn("t0", "9", 2, 20, "delete", setsVal = false, None, setsK = false, None)))
    assert(out.size === 1)
    assert(!out.head.getAs[Boolean]("is_current"))
    assert(out.head.getAs[Long]("valid_to") === 20L)
  }
}
