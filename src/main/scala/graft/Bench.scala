package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR`, printing ONE JSON line
  * `{"metric","value","unit","queries",...}`. Failed queries are reported in
  * a separate `"failed"` list and excluded from timings, so a failure can
  * never deflate the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Force FULL evaluation of every output column: a bare count() lets
    // Catalyst prune projection-only query bodies down to a parquet row
    // count, which would systematically understate the work. The noop v2
    // writer consumes every row on the executors without collecting.
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Warm up the JVM/codegen paths once (cheap, deterministic query) so
    // the first measured query does not absorb class-loading + codegen.
    try exec(SparkEntry.queries.getOrElse("q_top_orders", SparkEntry.queries.head._2)(spark, sfDir))
    catch { case _: Throwable => () }

    // Optional comma-separated subset for local iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    var failed = List.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        exec(fn(spark, sfDir))
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case _: Throwable =>
          failed ::= name
          None
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
