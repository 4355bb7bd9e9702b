package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Every `window`-char substring hash of a string, as one array — the
  * stride-1 character-window decomposition behind exact-substring dedup
  * ([[graft.llm.Dedup.substringPairs]]).
  *
  * Same rolling recurrence as [[WinnowMin]]
  * (`h_{i+1} = (h_i − c_i·31^{w-1})·31 + c_{i+w} mod m`, exact modular
  * identity — element k equals `hash31(s[k, k+window))` bit-for-bit, so a
  * DuckDB oracle hashing each window independently matches), but KEEPING
  * all `len − window + 1` hashes instead of folding them to the min: any
  * verbatim span of length ≥ `window` shared by two documents yields
  * identical hash values at identical span-relative positions in both,
  * which turns substring search into an equality join. Strings shorter
  * than `window` produce their single whole-string hash (matching
  * WinnowMin's clamping), so short-doc pairs still compare.
  *
  * One pass, O(1) per shift, primitive long array, inside whole-stage
  * codegen. Output size is O(chars) — the honest cost of character-level
  * dedup (a suffix array is also Ω(chars)); callers downsample with a
  * content-defined anchor filter (`hash % q = 0`), which keeps SHARED
  * spans detectable because both sides sample the same positions of the
  * span by construction.
  */
case class RollingHashes(child: Expression, window: Int, modulus: Long)
    extends UnaryExpression {

  require(window > 0, "rolling window must be positive")
  require(modulus > 0, "rolling modulus must be positive")
  // 31^window overflows are avoided by taking mod each step; the subtract
  // step computes cp·top with cp ≤ 0x10FFFF (< 2^21) and top < modulus,
  // so modulus < 2^41 keeps the product inside a signed long
  require(modulus < (1L << 41), "rolling modulus must fit 41 bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(input: Any): Any =
    RollingHashes.hashes(input.asInstanceOf[UTF8String].toString, window, modulus)

  // static helper deliberately not named `eval` — see the forwarder-
  // suppression note in Hash31
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingHashes.hashes($c.toString(), $window, ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {

  /** All `window`-length substring hash31 values via one rolling pass.
    * Windows and positions count Unicode CODE POINTS (surrogate pairs are
    * one position), so emitted offsets line up with Spark's
    * `substring`/`length` and DuckDB's `substr`/`len` on any input. */
  def hashes(s: String, window: Int, mod: Long): GenericArrayData = {
    val cps = Hash31.codePoints(s)
    val n = cps.length
    if (n <= window) return new GenericArrayData(Array(Hash31.hash(s, mod)))
    val out = new Array[Long](n - window + 1)
    // 31^(window-1) mod m — the outgoing char's weight
    var top = 1L
    var w = 1
    while (w < window) { top = (top * 31) % mod; w += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = (h * 31 + cps(i).toLong) % mod; i += 1 }
    out(0) = h
    var k = 1
    while (i < n) {
      // ((h - c_out*top mod m) * 31 + c_in) mod m, kept non-negative
      h = (h - (cps(k - 1).toLong * top) % mod + mod) % mod
      h = (h * 31 + cps(i).toLong) % mod
      out(k) = h
      k += 1
      i += 1
    }
    new GenericArrayData(out)
  }
}
