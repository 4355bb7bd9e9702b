package graft.testutil

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test scenario builders: hand-written op lists and the seeded LCG scenario
  * generator mirroring the reference's property-test harness
  * (`sim/tests/property-tests.mjs:29-132`: Park–Miller
  * `state*16807 % (2^31-1)`, 6–17 weighted ops — 45% insert / 35% update /
  * 20% delete — inserts always new keys, ≥1 delete guaranteed).
  */
object Scenarios {

  case class Op(
      t: Long, lsn: Long, event_id: Long, tbl: String, pk: String, op: String,
      sets_val: Boolean, sets_k: Boolean, val_ : Option[Double], k: Option[Long])

  /** Build an ops DataFrame (CdcOps.ops schema) from tuples of
    * (t, tbl, pk, op, setsVal, val, setsK, k); lsn/event_id by position. */
  def opsDf(
      spark: SparkSession,
      rows: Seq[(Long, String, String, String, Boolean, Option[Double], Boolean, Option[Long])]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, tbl, pk, op, sv, v, sk, k), i) =>
      Op(t, i + 1L, i.toLong, tbl, pk, op, sv, sk, v, k)
    }.toDF("t", "lsn", "event_id", "tbl", "pk", "op", "sets_val", "sets_k", "val_", "k")
      .withColumnRenamed("val_", "val")
  }

  /** Park–Miller minimal-standard LCG — the reference's seeded rng. */
  final class Lcg(seed: Long) {
    private var state: Long = {
      val s = seed % 2147483647L
      if (s <= 0) s + 2147483646L else s
    }
    def next(): Double = {
      state = state * 16807L % 2147483647L
      (state - 1).toDouble / 2147483646.0
    }
    def nextInt(n: Int): Int = (next() * n).toInt
  }

  /** One random scenario: weighted ops over a live-key set; inserts always
    * mint fresh keys (so polling can never over-emit), at least one delete. */
  def randomScenario(seed: Long, tbl: String): Seq[(Long, String, String, String, Boolean, Option[Double], Boolean, Option[Long])] = {
    val rng = new Lcg(seed)
    val n = 6 + rng.nextInt(12)
    var t = 0L
    var nextId = 0
    val live = scala.collection.mutable.ArrayBuffer[String]()
    val ops = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Boolean, Option[Double], Boolean, Option[Long])]()

    def vVal() = Some(math.floor(rng.next() * 10000) / 100.0)
    def vK() = Some(rng.nextInt(100).toLong)

    def insert(): Unit = {
      val pk = s"ins-$nextId"; nextId += 1; live += pk
      ops += ((t, tbl, pk, "insert", true, vVal(), true, vK()))
    }
    def update(): Unit =
      if (live.isEmpty) insert()
      else {
        val pk = live(rng.nextInt(live.size))
        rng.nextInt(3) match {
          case 0 => ops += ((t, tbl, pk, "update", true, vVal(), false, None))
          case 1 => ops += ((t, tbl, pk, "update", false, None, true, vK()))
          case _ => ops += ((t, tbl, pk, "update", true, vVal(), true, vK()))
        }
      }
    def delete(): Unit =
      if (live.isEmpty) insert()
      else {
        val i = rng.nextInt(live.size)
        val pk = live.remove(i)
        ops += ((t, tbl, pk, "delete", false, None, false, None))
      }

    (0 until n).foreach { _ =>
      t += 5 + rng.nextInt(200)
      val r = rng.next()
      if (r < 0.45) insert() else if (r < 0.80) update() else delete()
    }
    if (!ops.exists(_._4 == "delete")) { t += 5 + rng.nextInt(200); delete() }
    ops.toSeq
  }

  /** Union of `seeds.size` scenarios, one table per seed (`s<seed>`), as a
    * single ops DataFrame — lets invariant checks run in one pass. */
  def propertyOps(spark: SparkSession, seeds: Seq[Long]): DataFrame = {
    val all = seeds.flatMap(seed => randomScenario(seed, s"s$seed"))
    opsDf(spark, all)
  }
}
