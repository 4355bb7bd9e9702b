package graft

import org.apache.spark.sql.functions._
import graft.cdc.Diff

/** diffLane bucket-positional semantics (`sim/analysis/diff.ts:124-254`):
  * i-th expected pairs with i-th actual per key; surplus → missing/extra;
  * lag clamps at 0; ordering inversions via running max.
  */
class DiffSpec extends SparkSpec {

  import spark.implicits._

  test("sampled verify compares columns canonically and flags the planted mismatch") {
    val source = Seq(
      ("t0", "1", Some(12.5), Some(7L)),
      ("t0", "2", Some(42.0), None: Option[Long]),
      ("t0", "3", None: Option[Double], Some(9L))
    ).toDF("tbl", "pk", "val", "k")
    val sink = Seq(
      ("t0", "1", Some(12.5), Some(7L)),
      ("t0", "2", Some(42.0), Some(8L)), // planted: k differs (None vs 8)
      ("t0", "3", None: Option[Double], Some(9L))
    ).toDF("tbl", "pk", "val", "k")
    val rows = Diff.verifySample(source, sink, Seq("val", "k"), n = 10)
      .collect()
    assert(rows.length === 6, "3 sampled keys x 2 columns")
    val bad = rows.filter(!_.getAs[Boolean]("matches"))
    assert(bad.map(r => (r.getAs[String]("pk"), r.getAs[String]("col_name"))).toSeq
      === Seq(("2", "k")))
    // canonical form: 42.0 renders as "42" on both sides (JS Number parity)
    val v2 = rows.find(r => r.getAs[String]("pk") == "2" &&
      r.getAs[String]("col_name") == "val").get
    assert(v2.getAs[String]("src_val") === "42" && v2.getAs[Boolean]("matches"))
    // nulls compare null-safe: pk 3 val (None == None) matches
    assert(rows.find(r => r.getAs[String]("pk") == "3" &&
      r.getAs[String]("col_name") == "val").get.getAs[Boolean]("matches"))
  }

  test("ordinal match pairs i-th with i-th; surplus classified") {
    val expected = Seq(
      ("k1", 10L, 1L), ("k1", 20L, 2L), ("k1", 30L, 3L), // 3 expected k1
      ("k2", 15L, 4L)
    ).toDF("key", "time", "ord")
    val actual = Seq(
      ("k1", 12L, 1L), ("k1", 25L, 2L), // only 2 arrived
      ("k3", 99L, 3L) // never expected
    ).toDF("key", "time", "ord")
    val pairs = Diff.lanePairs(expected, actual, "ord").collect()
    val byStatus = pairs.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    assert(byStatus === Map("matched" -> 2, "missing" -> 2, "extra" -> 1))
    val lags = pairs.filter(_.getAs[String]("status") == "matched")
      .map(_.getAs[Long]("lag_ms")).sorted
    assert(lags.toSeq === Seq(2L, 5L))
  }

  test("lag clamps at zero for early arrivals") {
    val expected = Seq(("k", 100L, 1L)).toDF("key", "time", "ord")
    val actual = Seq(("k", 50L, 1L)).toDF("key", "time", "ord")
    val lag = Diff.lanePairs(expected, actual, "ord").collect().head.getAs[Long]("lag_ms")
    assert(lag === 0L)
  }

  test("lagTopK returns top-5 by lag with deterministic ties") {
    val expected = (1 to 10).map(i => (s"k$i", 0L, i.toLong)).toDF("key", "time", "ord")
    val actual = (1 to 10).map(i => (s"k$i", i * 10L, i.toLong)).toDF("key", "time", "ord")
    val top = Diff.lagTopK(Diff.lanePairs(expected, actual, "ord")).collect()
    assert(top.map(_.getAs[Long]("lag_ms")).toSeq === Seq(100L, 90L, 80L, 70L, 60L))
  }

  test("running-max scan finds exactly the inverted deliveries") {
    val df = Seq(
      ("p", 1L, 1L), ("p", 2L, 3L), ("p", 3L, 2L), // seq 2 after 3 → inverted
      ("p", 4L, 4L)
    ).toDF("part", "deliver_at", "seq")
    val inverted = Diff.orderingInversions(df, Seq("part"), Seq(col("deliver_at")), "seq")
      .filter(col("inverted")).select("seq").as[Long].collect()
    assert(inverted.toSeq === Seq(2L))
  }

  test("diffStates classifies rows both directions plus field mismatches") {
    val left = Seq(
      ("t0", "1", Some(1.0), Some(10L)), // match
      ("t0", "2", Some(2.0), Some(20L)), // field mismatch
      ("t0", "3", Some(3.0), Some(30L)) // missing on right
    ).toDF("tbl", "pk", "val", "k")
    val right = Seq(
      ("t0", "1", Some(1.0), Some(10L)),
      ("t0", "2", Some(2.0), Some(99L)),
      ("t0", "4", Some(4.0), Some(40L)) // unexpected on right
    ).toDF("tbl", "pk", "val", "k")
    val statuses = Diff.diffStates(left, right, Seq("val", "k"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(statuses === Map(
      "match" -> 1L, "field_mismatch" -> 1L, "missing_row" -> 1L, "unexpected_row" -> 1L))
  }

  test("reconcileOps emits exactly the converging op per divergent key") {
    val source = Seq(
      ("t0", "1", Some(1.0), Some(10L)), // match -> emits nothing
      ("t0", "2", Some(2.0), Some(20L)), // sink stale -> update, source image
      ("t0", "3", Some(3.0), Some(30L))  // missing in sink -> insert
    ).toDF("tbl", "pk", "val", "k")
    val sink = Seq(
      ("t0", "1", Some(1.0), Some(10L)),
      ("t0", "2", Some(2.0), Some(99L)),
      ("t0", "4", Some(4.0), Some(40L))  // orphan in sink -> delete
    ).toDF("tbl", "pk", "val", "k")
    val out = Diff.reconcileOps(source, sink, Seq("val", "k"))
      .orderBy("pk").collect()
      .map(r => (r.getAs[String]("pk"), r.getAs[String]("repair_op"),
        Option(r.getAs[java.lang.Long]("k")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("2", "update", Some(20L)),
      ("3", "insert", Some(30L)),
      ("4", "delete", None))) // delete carries no source image
  }

  test("null-safe compare: null == null is a match, null vs value is not") {
    val left = Seq(("t0", "1", None: Option[Double], Some(1L))).toDF("tbl", "pk", "val", "k")
    val right1 = Seq(("t0", "1", None: Option[Double], Some(1L))).toDF("tbl", "pk", "val", "k")
    val right2 = Seq(("t0", "1", Some(0.0), Some(1L))).toDF("tbl", "pk", "val", "k")
    def status(r: org.apache.spark.sql.DataFrame) =
      Diff.diffStates(left, r, Seq("val", "k")).collect().head.getAs[String]("status")
    assert(status(right1) === "match")
    assert(status(right2) === "field_mismatch")
  }
}
