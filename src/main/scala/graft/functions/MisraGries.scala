package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; the "mergeable
  * summaries" form of Agarwal et al., PODS 2012) as a typed Spark
  * `Aggregator` — the bounded-state path to heavy hitters when the domain
  * is too wide to hash-aggregate exactly (URLs, n-grams, user ids at
  * 100 TB: a full groupBy shuffles every distinct key; this shuffles
  * NOTHING but ≤ `capacity` (item, weight) pairs per partition).
  *
  * Guarantees (standard MG):
  *   - any item with true frequency > N / (capacity + 1) is IN the sketch;
  *   - every kept weight underestimates by at most N / (capacity + 1).
  *
  * The merge operation is the summary-merge: add weights, then subtract
  * the (capacity+1)-th largest weight from everything and drop the
  * non-positive remainder — associative within the error bound, which is
  * exactly why the sketch distributes (partial sketches per partition,
  * one bounded final merge).
  *
  * The SKETCH CONTENT depends on partition/merge order (weights are lower
  * bounds, the retained tail varies) — so callers who need deterministic
  * output use it as a CANDIDATE GENERATOR and recount the candidates
  * exactly ([[graft.llm.TextAnalysis.vocabularySketch]]): any superset of
  * the true top-k yields the identical final answer.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  require(capacity > 0, "sketch capacity must be positive")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    b.get(item) match {
      case Some(w) => b.update(item, w + 1L)
      case None if b.size < capacity => b.update(item, 1L)
      case None =>
        // decrement-all step; amortized O(1) per arrival
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { k =>
          val w = b(k) - 1L
          if (w <= 0L) dead += k else b.update(k, w)
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(
      a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, w) => a.update(k, a.getOrElse(k, 0L) + w) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest weight, drop the non-positive
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { k =>
        val w = a(k) - cut
        if (w <= 0L) dead += k else a.update(k, w)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
