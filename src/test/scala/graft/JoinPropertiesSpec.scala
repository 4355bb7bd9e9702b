package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AsOfJoin, RangeJoin}

/** Randomized model parity for the join operators Spark lacks natively:
  * the distributed as-of (union + running-last) and banded interval join
  * against naive in-memory reference models over arbitrary key/ts
  * layouts — deliberately including heavy ts collisions, empty sides,
  * and band-edge values. Fixed seeds (no scalatestplus bridge offline).
  */
class JoinPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(71L + i)))

  // small domains force key/ts collisions so tie rules actually fire
  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 40L)
      id <- Gen.choose(0L, 1000000L)
    } yield (k, t, id))

  test("as-of join matches a naive latest-at-or-before model (both tie modes)") {
    samples(Gen.zip(rowsGen, rowsGen), 12).foreach { case (probeRows, buildRaw) =>
      // operator contract: build unique per (key, ts) — dedup by max id
      val buildRows = buildRaw.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toList
      val probe = probeRows.toDF("k", "t", "p_id")
      val build = buildRows.map { case (k, t, id) => (k, t, id) }.toDF("k", "t", "b_id")
      for (inclusive <- Seq(true, false)) {
        val got = AsOfJoin.asOf(probe, build, Seq("k"), "t", inclusive)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long])))
          .sorted
        val expected = probeRows.map { case (k, t, pid) =>
          val cands = buildRows.filter(b =>
            b._1 == k && (if (inclusive) b._2 <= t else b._2 < t))
          (k, t, pid,
            if (cands.isEmpty) None
            else Some(cands.maxBy(b => (b._2, b._3))._3))
        }.sorted
        assert(got.toSeq === expected, s"inclusive=$inclusive")
      }
    }
  }

  test("salted join matches the plain join for any salt count") {
    samples(Gen.zip(rowsGen, rowsGen, Gen.oneOf(1, 2, 7, 32)), 8)
      .foreach { case (probeRows, buildRaw, salts) =>
        // operator contract: build unique per key here so row counts match
        val buildRows = buildRaw.groupBy(_._1)
          .map { case (k, rs) => (k, rs.map(_._3).max) }.toList
        val probe = probeRows.toDF("k", "t", "p_id")
        val build = buildRows.toDF("k", "b_id")
        val salted = graft.operators.SaltedJoin
          .join(probe, build, Seq("k"), salts, "left_outer")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long])))
          .sorted
        val plain = probe.join(build, Seq("k"), "left_outer")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long])))
          .sorted
        assert(salted.toSeq === plain.toSeq, s"salts=$salts")
      }
  }

  test("banded interval join matches a naive all-pairs model") {
    samples(Gen.zip(rowsGen, rowsGen, Gen.oneOf(1L, 7L, 10L, 64L)), 12)
      .foreach { case (leftRows, rightRows, w) =>
        val left = leftRows.toDF("k", "lt", "l_id")
        val right = rightRows.toDF("k", "rt", "r_id")
        val got = RangeJoin.within(left, right, Seq("k"), "lt", "rt", w)
          .select("k", "l_id", "r_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sorted
        val expected = (for {
          l <- leftRows
          r <- rightRows
          if l._1 == r._1 && r._2 - l._2 >= 0 && r._2 - l._2 <= w
        } yield (l._1, l._3, r._3)).sorted
        assert(got.toSeq === expected, s"w=$w")
      }
  }
}
