package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.GlobalOrder

/** `GlobalOrder.rank` must agree exactly with the single-partition window
  * it replaces (global row_number + running max), on data spread over many
  * input partitions and with the range partitioner actually engaged.
  */
class GlobalOrderSpec extends SparkSpec {

  import spark.implicits._

  private lazy val rows = {
    // deterministic pseudo-random order keys; 4k rows over 8 partitions
    val xs = (0 until 4000).map { i =>
      val key = (i.toLong * 2654435761L) % 100003L
      (key, i.toLong, (i % 97).toLong)
    }
    xs.toDF("sort_key", "tie", "payload").repartition(8)
  }

  test("rank matches a global window row_number") {
    val scalable = GlobalOrder.rank(rows, Seq(col("sort_key"), col("tie")), "rnk")
      .select("sort_key", "tie", "rnk")
    val reference = rows.withColumn("rnk_ref",
      row_number().over(Window.orderBy("sort_key", "tie")).cast("long"))
      .select("sort_key", "tie", "rnk_ref")
    val joined = scalable.join(reference, Seq("sort_key", "tie"))
    assert(joined.count() === 4000L)
    assert(joined.filter(col("rnk") =!= col("rnk_ref")).count() === 0L)
  }

  test("running max matches a global window running max") {
    val scalable = GlobalOrder.rank(
      rows, Seq(col("sort_key"), col("tie")), "rnk",
      runningMax = Some("payload" -> "run_max"))
    val w = Window.orderBy("sort_key", "tie")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val reference = rows
      .withColumn("ref_max", max(col("payload")).over(w))
      .select("sort_key", "tie", "ref_max")
    val joined = scalable.join(reference, Seq("sort_key", "tie"))
    assert(joined.filter(col("run_max") =!= col("ref_max")).count() === 0L)
  }

  test("running sum matches a global window cumulative sum; packing plan is consistent") {
    val scalable = GlobalOrder.runningSum(
      rows, Seq(col("sort_key"), col("tie")), "payload", "cum")
      .select("sort_key", "tie", "cum")
    val reference = rows.withColumn("cum_ref",
      sum("payload").over(Window.orderBy("sort_key", "tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("sort_key", "tie", "cum_ref")
    val joined = scalable.join(reference, Seq("sort_key", "tie"))
    assert(joined.count() === 4000L)
    assert(joined.filter(col("cum") =!= col("cum_ref")).count() === 0L)
    // packing plan over a tiny corpus: spans abut exactly (doc N+1 starts
    // where doc N ended) and `crosses` marks boundary-straddling docs
    val docs = Seq(
      (1L, Seq.fill(6)("w").mkString(" ")), // tokens 1..6   → bin 0
      (2L, Seq.fill(6)("w").mkString(" ")), // tokens 7..12  → crosses 0→1
      (3L, Seq.fill(4)("w").mkString(" ")), // tokens 13..16 → bin 1
      (4L, Seq.fill(9)("w").mkString(" "))  // tokens 17..25 → crosses 1→2
    ).toDF("doc_id", "text")
    val plan = graft.llm.Packing.packPlan(docs, windowTokens = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(plan.toSeq === Seq(
      (1L, 6L, 0L, 0L, false),
      (2L, 6L, 0L, 1L, true),
      (3L, 4L, 1L, 1L, false),
      (4L, 9L, 1L, 2L, true)))
  }

  test("no single-partition exchange in the physical plan") {
    val plan = GlobalOrder.rank(rows, Seq(col("sort_key"), col("tie")), "rnk")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("SinglePartition"), s"single-partition exchange found:\n$plan")
  }
}
