package graft

import graft.operators.SaltedJoin

/** Salted-join semantics: result parity with the plain join under planted
  * skew (inner and left-outer), salt actually in the join key, and the
  * outer-type guard.
  */
class SaltedJoinSpec extends SparkSpec {

  import spark.implicits._

  // one hot key (900 of 1000 rows), plus a key with no build match
  private val probe = ((1 to 900).map(i => (1L, i.toLong)) ++
    (1 to 99).map(i => (2L, 1000L + i)) :+ ((3L, 9999L)))
    .toDF("k", "p_id")
  private val build = Seq((1L, "hot"), (2L, "warm")).toDF("k", "b_val")

  test("inner salted join == plain join under planted skew") {
    for (salts <- Seq(1, 8)) {
      val salted = SaltedJoin.join(probe, build, Seq("k"), salts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      val plain = probe.join(build, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
      assert(salted === plain, s"salts=$salts")
      assert(salted.length === 999)
    }
  }

  test("left-outer salted join: unmatched probe row appears exactly once") {
    val out = SaltedJoin.join(probe, build, Seq("k"), 8, "left_outer")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
    assert(out.length === 1000)
    assert(out.count(_._1 == 3L) === 1)
    assert(out.find(_._1 == 3L).get._3 === None)
  }

  test("autoSalts sizes from measured skew; joinAuto keeps parity") {
    // 90% of rows on one key → top-1 share ≈ 0.9; with 32 shuffle
    // partitions the overload factor is ~29 — autoSalts must spread wide.
    val skewed = SaltedJoin.autoSalts(probe, Seq("k"), fraction = 1.0)
    assert(skewed > 1, s"planted skew must derive >1 salts, got $skewed")
    assert(skewed <= 64)
    // uniform keys: every key holds ~1/1000 of the rows → no salting
    val uniform = (1L to 1000L).map(i => (i, i)).toDF("k", "p_id")
    assert(SaltedJoin.autoSalts(uniform, Seq("k"), fraction = 1.0) === 1)
    // empty probe: degenerate but defined
    assert(SaltedJoin.autoSalts(probe.limit(0), Seq("k"), fraction = 1.0) === 1)

    val (auto, salts) = SaltedJoin.joinAuto(probe, build, Seq("k"), fraction = 1.0)
    assert(salts === skewed)
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val plain = probe.join(build, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(got === plain)
  }

  test("reserved _salt column is rejected, not overwritten") {
    val bad = probe.withColumnRenamed("p_id", "_salt")
    intercept[IllegalArgumentException] {
      SaltedJoin.join(bad, build, Seq("k"), 4)
    }
  }

  test("salt is part of the join key; outer types are rejected") {
    val plan = SaltedJoin.join(probe, build, Seq("k"), 8)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("_salt"), s"salt must reach the join keys:\n$plan")
    intercept[IllegalArgumentException] {
      SaltedJoin.join(probe, build, Seq("k"), 8, "full_outer")
    }
  }
}
