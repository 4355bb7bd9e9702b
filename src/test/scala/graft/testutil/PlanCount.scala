package graft.testutil

/** Local helper main: print executedPlan operator counts for queries, the
  * same strings PlansSpec pins count — used when authoring new pins. */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.drop(1)) {
      val p = graft.SparkEntry.queries(n)(spark, sf)
        .queryExecution.executedPlan.toString()
      def c(s: String) = s.r.findAllIn(p).length
      println(s"PLANCOUNT $n BNLJ=${c("BroadcastNestedLoopJoin")} " +
        s"BHJ=${c("BroadcastHashJoin")} SMJ=${c("SortMergeJoin")} " +
        s"Cart=${c("CartesianProduct")} Window=${c("Window")} " +
        s"ExHash=${c("Exchange hashpartitioning")} " +
        s"ExSingle=${c("Exchange SinglePartition")} " +
        s"TakeOrdered=${c("TakeOrderedAndProject")}")
    }
    spark.stop()
  }
}
