package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing-style document fingerprint: the minimum of `hash31` over every
  * `window`-char substring (Schleimer et al. '03), computed with a ROLLING
  * hash — one pass over the string, O(1) per shift — instead of re-hashing
  * each window from scratch (the `transform(sequence(...), substring...)`
  * formulation is O(len·window) with a substring allocation per shift; this
  * expression took the `text_fingerprint` query from ~3.6s to well under a
  * second at sf0.1).
  *
  * Exactly equivalent to `min_i hash31(s[i, i+window))`: with
  * `h_i = Σ_j c_{i+j}·31^(window-1-j) mod m`, shifting is
  * `h_{i+1} = (h_i − c_i·31^{window-1})·31 + c_{i+window} mod m` — modular
  * identity, no approximation, so the DuckDB oracle (which evaluates each
  * window independently) matches bit-for-bit. Strings shorter than `window`
  * hash whole, matching `substring`'s clamping in the expression form.
  *
  * Native Catalyst expression with codegen; the static helper is named
  * `minHash`, NOT `eval` (see the forwarder-suppression note in `Hash31`).
  */
case class WinnowMin(child: Expression, window: Int, modulus: Long)
    extends UnaryExpression {

  require(window > 0, "winnow window must be positive")
  require(modulus > 0, "winnow modulus must be positive")
  // the roll step computes cp·top with cp < 2^21 and top < modulus — see
  // the overflow bound note in RollingHashes
  require(modulus < (1L << 41), "winnow modulus must fit 41 bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "winnow_min"

  override def nullSafeEval(input: Any): Any =
    WinnowMin.minHash(input.asInstanceOf[UTF8String].toString, window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowMin.minHash($c.toString(), $window, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMin =
    copy(child = newChild)
}

object WinnowMin {

  /** Min over all `window`-length substring hash31 values via rolling hash.
    * Windows count Unicode code points — see the note in RollingHashes. */
  def minHash(s: String, window: Int, mod: Long): Long = {
    val cps = Hash31.codePoints(s)
    val n = cps.length
    if (n <= window) return Hash31.hash(s, mod)
    // 31^(window-1) mod m — the outgoing char's weight
    var top = 1L
    var w = 1
    while (w < window) { top = (top * 31) % mod; w += 1 }
    // first window
    var h = 0L
    var i = 0
    while (i < window) { h = (h * 31 + cps(i).toLong) % mod; i += 1 }
    var min = h
    while (i < n) {
      // drop s[i-window], shift, add s[i]; keep the remainder non-negative
      val dropped = (h - (cps(i - window).toLong * top) % mod + mod) % mod
      h = (dropped * 31 + cps(i).toLong) % mod
      if (h < min) min = h
      i += 1
    }
    min
  }
}
