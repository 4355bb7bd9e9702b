package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the estimator
  * family behind Theta sketches) as a typed Spark `Aggregator` — the
  * bounded-state path to distinct counting when the domain is too wide to
  * `countDistinct` exactly: the exact count shuffles every distinct key;
  * this shuffles NOTHING but ≤ `k` longs per partition.
  *
  * State is the sorted array of the k smallest DISTINCT hash values seen.
  * Unlike Misra–Gries (whose sketch content is merge-order dependent), the
  * k-min set is a pure function of the input SET: min-k is commutative,
  * associative and idempotent, so the sketch — and everything derived from
  * it — is bit-identical under any partition/merge order, which is what
  * lets a DuckDB oracle pin the estimate exactly.
  *
  * Estimator (consumed by `TextAnalysis.kmvShingleDistinct`): with hashes
  * uniform on [0, M), the k-th smallest h_(k) ≈ k·M/n, so
  * n̂ = (k−1)·M / h_(k) (the unbiased form); when fewer than k distinct
  * hashes exist the sketch IS the exact distinct set and n̂ = |sketch|.
  */
class KMinValues(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {

  require(k > 0, "sketch size must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert into the sorted distinct min-k set; O(log k) search + O(k)
    * shift only when the value actually enters (k is small — 16/64). */
  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b // not among the k smallest
    }
  }

  /** Merge = sorted-distinct merge truncated at k. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
