package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR`, printing ONE JSON line
  * `{"metric","value","unit","queries",...}`.
  *
  * Measurement hygiene (each guard exists because its absence corrupted a
  * previous round's numbers):
  *   - every query runs `SPARK_GRAFT_REPS` times (default 3) and reports the
  *     MEDIAN — a single co-tenant CPU spike can no longer own a number;
  *   - `rel_spread` reports (max−min)/median per query so a contaminated run
  *     is visible in the artifact itself instead of silently shipping;
  *   - the machine's 1-min load average is sampled BEFORE the JVM warms up
  *     and published as `preload` — if it is high, the whole artifact is
  *     suspect (orphaned sbt JVMs are the known failure mode; kill them
  *     before measuring);
  *   - `spark.sql.codegen.fallback=false`: a whole-stage-codegen compile
  *     failure fails the query into the `failed` list instead of silently
  *     running 10× slower interpreted;
  *   - the cache is cleared between reps so queries that persist lineage
  *     (evaluate, GlobalOrder) measure cold each rep, not cache hits.
  *
  * Failed queries are excluded from timings, so a failure can never deflate
  * the total.
  */
object Bench {

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").getLines().next().split(" ").head.toDouble
    catch { case _: Throwable => -1.0 }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val preload = loadAvg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.fallback", "false")
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
    var failed = Map.empty[String, String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.flatMap { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          exec(fn(spark, sfDir))
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case t: Throwable =>
            failed += name -> t.getClass.getSimpleName
            None
        }
      }
      if (failed.contains(name) || times.isEmpty) None
      else {
        val med = median(times)
        val spread = if (med > 0) (times.max - times.min) / med else 0.0
        Some((name, med, spread))
      }
    }
    def jmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> r._2))
    val sp = jmap(results.map(r => r._1 -> r._3))
    val fs = failed.toSeq.sorted.map { case (k, v) => "\"" + k + ":" + v + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rel_spread":$sp,"failed":$fs,"reps":$reps,"preload":$preload,"sf":"$sfDir"}""")
    spark.stop()
  }
}
