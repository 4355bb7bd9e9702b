package graft

import graft.operators.AsOfJoin

/** As-of join semantics on planted rows: latest-at-or-before selection,
  * inclusive vs strict ties, left-join nulls, key isolation — and the plan
  * shape claims (one shuffle, no nested-loop join).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val build = Seq(
    // key, ts, build payload
    (1L, 10L, "b10"), (1L, 20L, "b20"), (1L, 30L, "b30"),
    (2L, 15L, "c15"))
    .toDF("k", "t", "b_val")

  private val probe = Seq(
    (1L, 5L, 100L), // before any build row
    (1L, 20L, 101L), // exactly on a build row
    (1L, 25L, 102L), // between builds
    (1L, 99L, 103L), // after all builds
    (2L, 16L, 104L), // other key sees only its own builds
    (3L, 50L, 105L)) // key with no builds at all
    .toDF("k", "t", "p_id")

  test("latest at-or-before per key; null when nothing qualifies") {
    val out = AsOfJoin.asOf(probe, build, Seq("k"), "t")
      .orderBy("p_id")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("p_id")),
        Option(r.getAs[String]("b_val"))))
    assert(out === Array(
      (100L, None),
      (101L, Some("b20")), // inclusive: equal ts matches
      (102L, Some("b20")),
      (103L, Some("b30")),
      (104L, Some("c15")),
      (105L, None)))
  }

  test("strict (exclusive) mode hides the equal-ts build row") {
    val out = AsOfJoin.asOf(probe, build, Seq("k"), "t", inclusive = false)
      .orderBy("p_id")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("p_id")),
        Option(r.getAs[String]("b_val"))))
    assert(out(1) === ((101L, Some("b10"))), "equal-ts build invisible when strict")
    assert(out(2) === ((102L, Some("b20"))), "strictness only moves the tie")
  }

  test("plan: exactly one keyed shuffle, no join operator at all") {
    val df = AsOfJoin.asOf(probe, build, Seq("k"), "t")
    assert(df.columns.toSeq === Seq("k", "t", "p_id", "b_val"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition exchange:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"one keyed exchange expected:\n$plan")
  }
}
