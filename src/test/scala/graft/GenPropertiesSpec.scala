package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.cdc.ApplyEngine
import graft.cdc.ApplyEngine.OpIn
import graft.functions.Hash31

/** ScalaCheck-generator randomized properties (sampled with fixed seeds for
  * reproducibility — no scalatestplus bridge in the offline cache):
  * hash31 against an independently written model of the reference algorithm,
  * and the distributed merge-fold against a naive single-threaded reference
  * fold over arbitrary op sequences.
  */
class GenPropertiesSpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  // independent reimplementation of src/changefeed/model.ts:92-98
  private def modelHash(s: String, mod: Long): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % mod)

  test("hash31 matches the reference model on random ASCII strings") {
    val gen = Gen.zip(Gen.asciiPrintableStr, Gen.oneOf(9973L, 65521L, 104729L, 1000003L))
    samples(gen, 200).foreach { case (s, mod) =>
      assert(Hash31.hash(s, mod) === modelHash(s, mod))
      assert(Hash31.hash(s, mod) >= 0 && Hash31.hash(s, mod) < mod)
    }
  }

  test("hash31 matches on random unicode strings (UTF-16 code units)") {
    val gen = Gen.listOf(Gen.choose(1, 0xFFFF).map(_.toChar)).map(_.mkString)
    samples(gen, 100).foreach { s =>
      assert(Hash31.hash(s, 9973L) === modelHash(s, 9973L))
    }
  }

  /** Naive reference fold: the semantics of `src/domain/storage.ts:137-164`
    * applied sequentially in memory. */
  private def naiveFold(ops: Seq[OpIn]): Map[(String, String), (Option[Double], Option[Long], Long, Long)] = {
    var state = Map.empty[(String, String), (Option[Double], Option[Long], Long, Long)]
    ops.sortBy(_.lsn).foreach { op =>
      val key = (op.tbl, op.pk)
      if (op.op == "delete") state -= key
      else {
        val (v, k, ver, _) = state.getOrElse(key, (None, None, 0L, 0L))
        state += key -> (
          if (op.setsVal) op.valV else v,
          if (op.setsK) op.kV else k,
          ver + 1, op.t)
      }
    }
    state
  }

  private val opsGen: Gen[Seq[OpIn]] = {
    val one = for {
      tbl <- Gen.oneOf("t0", "t1")
      pk <- Gen.oneOf("1", "2", "3")
      kind <- Gen.frequency(4 -> "insert", 4 -> "update", 2 -> "delete")
      sv <- Gen.oneOf(true, false)
      sk <- Gen.oneOf(true, false)
      v <- Gen.choose(0.0, 100.0)
      k <- Gen.choose(0L, 100L)
    } yield (tbl, pk, kind, sv, sk, v, k)
    Gen.listOfN(30, one).map { raw =>
      raw.zipWithIndex.map { case ((tbl, pk, kind, sv0, sk, v, k), i) =>
        val isDel = kind == "delete"
        val sv = sv0 || !sk // non-delete ops must set something
        OpIn(tbl, pk, i + 1L, (i + 1) * 10L, kind,
          setsVal = !isDel && sv, if (!isDel && sv) Some(v) else None,
          setsK = !isDel && sk, if (!isDel && sk) Some(k) else None)
      }
    }
  }

  test("distributed merge-fold equals the naive reference fold on random op sequences") {
    import spark.implicits._
    samples(opsGen, 8).foreach { ops =>
      val df = ops.toDS().toDF()
        .withColumnRenamed("setsVal", "sets_val")
        .withColumnRenamed("valV", "val")
        .withColumnRenamed("setsK", "sets_k")
        .withColumnRenamed("kV", "k")
      val folded = ApplyEngine.applyState(df).collect().map { r =>
        (r.getString(0), r.getString(1)) -> ((
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(4), r.getLong(5)))
      }.toMap
      assert(folded === naiveFold(ops))
    }
  }

  /** Naive tick-BY-tick simulator of the drift-on broker
    * (`model.ts:141-149,246-263`): walks every tick from 1 without clock
    * jumps — an independent implementation validating the event-driven
    * fold's jump logic. */
  private def naiveDriftSim(
      evts: Seq[graft.cdc.Consumer.DriftIn],
      tickMs: Long, cap: Int): Map[Long, Long] = {
    def tickOf(x: Long) = (x - 1) / tickMs + 1
    val byArr = evts.sortBy(_.lsn)
    val out = scala.collection.mutable.Map.empty[Long, Long]
    val stack = scala.collection.mutable.ListBuffer.empty[graft.cdc.Consumer.DriftIn]
    var i = 0
    val maxTick = (evts.map(e => tickOf(e.availableAt)).max + evts.length / cap + 2)
    var t = 1L
    while (t <= maxTick && (i < byArr.length || stack.nonEmpty)) {
      while (i < byArr.length && tickOf(byArr(i).t) <= t) {
        stack.prepend(byArr(i)); i += 1
      }
      var used = 0
      while (stack.nonEmpty && used < cap && tickOf(stack.head.availableAt) <= t) {
        out(stack.remove(0).lsn) = t
        used += 1
      }
      t += 1
    }
    out.toMap
  }

  private def driftGen: Gen[Seq[graft.cdc.Consumer.DriftIn]] = {
    val one = for {
      part <- Gen.choose(0, 2)
      gap <- Gen.choose(0L, 120L)
      drifted <- Gen.oneOf(0L, 50L)
      dropped <- Gen.oneOf(true, false)
    } yield (part, gap, drifted, dropped)
    Gen.listOfN(40, one).map { raw =>
      var t = 0L
      raw.zipWithIndex.map { case ((part, gap, drifted, dropped), i) =>
        t += gap
        graft.cdc.Consumer.DriftIn(part, 1000L + i, math.max(t, 1L),
          math.max(t, 1L) + drifted, dropped)
      }
    }
  }

  test("rolling lag window equals a naive ring buffer on random feeds") {
    import spark.implicits._
    val gen = Gen.listOfN(60, Gen.zip(
      Gen.oneOf("log", "poll"), Gen.choose(0L, 500L)))
    samples(gen, 6).foreach { raw =>
      val samplesIn = raw.zipWithIndex.map { case ((m, lag), i) =>
        (m, i.toLong, i.toLong, lag) // delivery order = index
      }
      val df = samplesIn.toDF("method", "ord1", "ord2", "lag_ms")
      val n = 16
      val out = graft.cdc.MetricsAgg.lagPercentilesRolling(df, lastN = n)
        .collect().map(r => r.getAs[String]("method") ->
          (r.getAs[Double]("p50"), r.getAs[Long]("max_lag"), r.getAs[Long]("window_n"))).toMap
      // naive: last n lags per lane in arrival order
      samplesIn.groupBy(_._1).foreach { case (m, s) =>
        val ring = s.sortBy(_._2).takeRight(n).map(_._4)
        val sorted = ring.sorted.toIndexedSeq
        // independent interpolating percentile (src/engine/metrics.ts:131-139)
        val idx = (sorted.length - 1) * 0.5
        val (lo, hi) = (math.floor(idx).toInt, math.ceil(idx).toInt)
        val p50 =
          if (lo == hi) sorted(lo).toDouble
          else sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
        val expected = (BigDecimal(p50).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble,
          ring.max, ring.length.toLong)
        assert(out(m) === expected, s"lane $m")
      }
    }
  }

  test("drift broker fold equals a naive tick-by-tick simulation on random feeds") {
    import spark.implicits._
    samples(driftGen, 8).foreach { evts =>
      val folded = graft.cdc.Consumer
        .brokerDeliverDriftExact(evts.toDS(), tickMs = 50L, maxApplyPerTick = 3)
        .collect().map(e => e.lsn -> e.deliverTick).toMap
      val naive = evts.groupBy(_.part).values
        .map(g => naiveDriftSim(g.toSeq, 50L, 3)).reduce(_ ++ _)
      assert(folded === naive)
    }
  }
}
