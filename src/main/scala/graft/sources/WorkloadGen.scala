package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic workload generators.
  *
  * - [[Lcg]]: the reference property-test rng — Park–Miller minimal
  *   standard, `state = state * 16807 % (2^31-1)`
  *   (`sim/tests/property-tests.mjs:29-44`).
  * - [[randomScenario]]: seeded random op script — 6–17 weighted ops (45%
  *   insert / 35% update / 20% delete), inserts mint fresh keys, at least
  *   one delete guaranteed (`property-tests.mjs:60-132`).
  * - [[liveWorkload]]: the deterministic cycling generator of the live
  *   comparator (`src/ui/generator.ts:171-254`: cycle mod 6 — delete on
  *   0 and 4, update on 1–3, insert otherwise, against a rolling key set).
  *
  * Generators are driver-side iterators feeding `MemoryStream`/`Dataset`;
  * at scale a generated workload would be `spark.range(n)` + deterministic
  * column functions instead.
  */
object WorkloadGen {

  /** Park–Miller minimal-standard LCG (seeded, deterministic). */
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

  /** One op row: (t, tbl, pk, op, setsVal, val, setsK, k). */
  type OpTuple = (Long, String, String, String, Boolean, Option[Double], Boolean, Option[Long])

  def randomScenario(seed: Long, tbl: String): Seq[OpTuple] = {
    val rng = new Lcg(seed)
    val n = 6 + rng.nextInt(12)
    var t = 0L
    var nextId = 0
    val live = scala.collection.mutable.ArrayBuffer[String]()
    val ops = scala.collection.mutable.ArrayBuffer[OpTuple]()

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

  /** Live-comparator cycling workload: delete on cycle 0/4, update on 1–3,
    * insert otherwise, over a rolling live-key window. */
  def liveWorkload(nOps: Int, seed: Long, tbl: String, stepMs: Long = 250L): Seq[OpTuple] = {
    val rng = new Lcg(seed)
    var nextId = 0
    val live = scala.collection.mutable.ArrayBuffer[String]()
    (0 until nOps).map { i =>
      val t = (i + 1) * stepMs
      val cycle = i % 6
      if ((cycle == 0 || cycle == 4) && live.nonEmpty) {
        val pk = live.remove(rng.nextInt(live.size))
        (t, tbl, pk, "delete", false, None, false, None)
      } else if (cycle >= 1 && cycle <= 3 && live.nonEmpty) {
        val pk = live(rng.nextInt(live.size))
        (t, tbl, pk, "update", true, Some(math.floor(rng.next() * 10000) / 100.0), false, None)
      } else {
        val pk = s"live-$nextId"; nextId += 1; live += pk
        (t, tbl, pk, "insert", true, Some(math.floor(rng.next() * 10000) / 100.0),
          true, Some(rng.nextInt(100).toLong))
      }
    }
  }

  /** Materialize op tuples as a canonical ops DataFrame (CdcOps schema). */
  def toOpsDf(spark: SparkSession, rows: Seq[OpTuple]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((t, tbl, pk, op, sv, v, sk, k), i) =>
      (t, i + 1L, i.toLong, tbl, pk, op, sv, sk, v, k)
    }.toDF("t", "lsn", "event_id", "tbl", "pk", "op", "sets_val", "sets_k", "valx", "k")
      .withColumnRenamed("valx", "val")
  }
}
