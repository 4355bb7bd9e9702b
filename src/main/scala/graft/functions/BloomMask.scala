package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter bitmask (Bloom 1970) as a typed Spark `Aggregator`: the
  * state is a fixed `mBits`-bit array (`mBits/64` longs), each input a bit
  * position to set. Like [[KMinValues]], the sketch is a pure function of
  * the input SET — bit-OR is commutative, associative and idempotent — so
  * the mask is bit-identical under any partition/merge order and a DuckDB
  * oracle can pin everything derived from it exactly (membership through
  * the mask equals membership in the distinct-position set).
  *
  * This is the constant-size corpus-membership artifact of an ingest
  * pipeline: at 100 TB the corpus digest set cannot join against every
  * arrival batch, but an 8 KB mask (`mBits` = 2¹⁶) broadcasts to every
  * executor; definite-absent arrivals (the common case) skip the exact
  * join entirely and only maybe-present ones pay it. No false negatives
  * by construction; false positives are bounded by the (1−e^(−kn/m))^k
  * envelope and audited by the gate's ledger columns.
  */
class BloomMask(mBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  require(mBits > 0 && mBits % 64 == 0, "mask width must be a positive multiple of 64")

  override def zero: Array[Long] = new Array[Long](mBits / 64)

  /** Set one bit; positions outside [0, mBits) are a contract violation
    * upstream (callers reduce hashes mod mBits) — fail loudly, not wrap. */
  override def reduce(b: Array[Long], pos: Long): Array[Long] = {
    require(pos >= 0 && pos < mBits, s"bloom position $pos outside [0, $mBits)")
    b(pos.toInt >> 6) |= 1L << (pos.toInt & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
