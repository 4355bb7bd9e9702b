package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** The co-located-join claim, proven in-plan: joining two tables bucketed
  * on the join key with the same bucket count produces a sort-merge join
  * with ZERO Exchange; a mismatched bucket count degrades to shuffling
  * one side only.
  */
class BucketingSpec extends SparkSpec {

  import spark.implicits._

  // per-run tag: two concurrent sbt test JVMs must not race on the same
  // table names / paths (same hazard ADVICE flagged for q_bucketed_join)
  private lazy val tag = Bucketing.runTag(spark)

  private def tbl(name: String) = s"${name}_$tag"

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_bucketing_spec_$tag/$name"

  /** Both tables are tiny, so the planner would broadcast and skip bucket
    * use entirely; force the shuffle-join path the technique targets. */
  private def withoutBroadcast[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("same-bucket-count join plans with zero exchanges; results correct") {
    withoutBroadcast {
    val left = (1L to 500L).map(i => (i % 50, i)).toDF("k", "l_id")
    val right = (1L to 200L).map(i => (i % 50, i * 10)).toDF("k", "r_val")
    val lb = Bucketing.bucketize(spark, left, tbl("bspec_left"), tmp("l"), "k", 4)
    val rb = Bucketing.bucketize(spark, right, tbl("bspec_right"), tmp("r"), "k", 4)
    val joined = lb.join(rb, "k")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"bucketed co-located join must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    // correctness: same rows as the plain join of the original frames
    assert(joined.count() === left.join(right, "k").count())
    val a = joined.agg(sum(col("l_id") * col("r_val"))).head.getLong(0)
    val b = left.join(right, "k").agg(sum(col("l_id") * col("r_val"))).head.getLong(0)
    assert(a === b)
    }
  }

  test("mismatched bucket counts shuffle exactly one side") {
    withoutBroadcast {
    val left = (1L to 100L).map(i => (i % 10, i)).toDF("k", "l_id")
    val right = (1L to 100L).map(i => (i % 10, i)).toDF("k", "r_id")
    val lb = Bucketing.bucketize(spark, left, tbl("bspec_l8"), tmp("l8"), "k", 8)
    val rb = Bucketing.bucketize(spark, right, tbl("bspec_r4"), tmp("r4"), "k", 4)
    val plan = lb.join(rb, "k").queryExecution.executedPlan.toString()
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"one side re-bucketed, the other stays put:\n$plan")
    }
  }
}
