package graft

import graft.cdc.MetricsAgg
import org.apache.spark.sql.functions._

/** Rolling lag-percentile window (`src/engine/metrics.ts:42-44`): only the
  * last N samples per lane (in delivery order) feed the percentile.
  */
class MetricsAggSpec extends SparkSpec {
  import spark.implicits._

  test("lagPercentilesRolling slices the last N samples per lane") {
    // Lane "a": 10 samples delivered in ord1 order with lag == ord1.
    // Last 4 are lags 7,8,9,10. Lane "b": 2 samples (fewer than N).
    val lanes = (1L to 10L).map(i => ("a", i, i, i)).toDF("method", "ord1", "ord2", "lag_ms")
      .unionAll(Seq(("b", 1L, 1L, 100L), ("b", 2L, 2L, 200L))
        .toDF("method", "ord1", "ord2", "lag_ms"))
      .repartition(3) // force multiple input partitions through the local prune
    val out = MetricsAgg.lagPercentilesRolling(lanes, lastN = 4)
      .orderBy("method").collect()

    assert(out.length === 2)
    val a = out(0)
    assert(a.getAs[String]("method") === "a")
    assert(a.getAs[Long]("window_n") === 4L)
    // exact interpolating percentiles over {7,8,9,10}
    assert(a.getAs[Double]("p50") === 8.5)
    assert(a.getAs[Double]("p95") === 9.85)
    assert(a.getAs[Long]("max_lag") === 10L)

    val b = out(1)
    assert(b.getAs[Long]("window_n") === 2L)
    assert(b.getAs[Double]("p50") === 150.0)
    assert(b.getAs[Long]("max_lag") === 200L)
  }

  test("rolling window equals all-events percentiles when lane fits in N") {
    val lanes = (1L to 50L).map(i => ("log", i, i, i % 7)).toDF("method", "ord1", "ord2", "lag_ms")
    val rolling = MetricsAgg.lagPercentilesRolling(lanes, lastN = 2000)
      .select("method", "p50", "p95", "max_lag").collect().head
    val all = MetricsAgg.lagPercentiles(lanes.filter($"method" === "log"), "log")
      .collect().head
    assert(rolling.getAs[Double]("p50") === all.getAs[Double]("p50"))
    assert(rolling.getAs[Double]("p95") === all.getAs[Double]("p95"))
    assert(rolling.getAs[Long]("max_lag") === all.getAs[Long]("max_lag"))
  }
}
