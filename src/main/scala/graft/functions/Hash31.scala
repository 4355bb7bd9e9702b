package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash `acc = (acc * 31 + codePoint) % modulus` over the
  * Unicode CODE POINTS of a string.
  *
  * Code points — not UTF-16 code units — so the hash agrees with every
  * code-point-based string engine: DuckDB (`ascii()` / `substr` / `len`),
  * Spark SQL's own `length`/`substring`, and JS `for (c of s)` iteration.
  * For BMP text (ASCII included) code units and code points coincide, so
  * this also reproduces, bit for bit, the deterministic hash the reference
  * engine uses for broker partition routing and fault injection
  * (`src/changefeed/model.ts:92-109`: `hash` with modulus 9973, `shouldDrop`,
  * `partitionForKey`) on its ASCII keys. Implemented as a native Catalyst
  * expression with codegen so it stays inside whole-stage codegen (no UDF
  * boundary).
  */
case class Hash31(child: Expression, modulus: Long) extends UnaryExpression {

  require(modulus > 0, "hash31 modulus must be positive")
  // acc*31 + cp must stay in a long: acc < m ⇒ need 31·m + 2^21 < 2^63
  require(modulus < (1L << 57), "hash31 modulus must fit 57 bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hash31"

  override def nullSafeEval(input: Any): Any =
    Hash31.hash(input.asInstanceOf[UTF8String].toString, modulus)

  // NOTE: the static helper must NOT be named `eval` — this class inherits
  // `eval(InternalRow)` from Expression, and any same-named class method
  // suppresses Scala's static forwarder for the companion method, so the
  // generated Java below would fail to compile (Janino resolves
  // `Hash31.eval(String, long)` against the class and finds only the
  // InternalRow overload) and the whole stage would silently fall back to
  // interpreted evaluation.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash31.hash($c.toString(), ${modulus}L)")

  override protected def withNewChildInternal(newChild: Expression): Hash31 =
    copy(child = newChild)
}

object Hash31 {

  /** Code-point fold; on BMP text identical to the reference's
    * `for (c of s) acc = (acc*31 + charCode) % mod`. */
  def hash(s: String, mod: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp.toLong) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Unicode code points of `s` as an int array (surrogate pairs fused) —
    * the shared decode step of the rolling-hash family, so positions and
    * window widths count code points exactly as Spark's `substring`/`length`
    * and DuckDB's `substr`/`len` do. */
  def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.codePointCount(0, s.length))
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    out
  }
}

/** Column-level helpers around the graft custom expressions. */
object GraftFunctions {

  /** The reference's broker hash modulus (`src/changefeed/model.ts:95`). */
  val BrokerModulus: Long = 9973L

  def hash31(c: Column, modulus: Long = BrokerModulus): Column =
    GraftBridge.column(Hash31(GraftBridge.expression(c), modulus))

  /** Deterministic drop decision: `hash31(key) % 100 < floor(p*100)`
    * (`src/changefeed/model.ts:100-104`). */
  def shouldDrop(key: Column, dropProbability: Double): Column =
    hash31(key) % 100L < math.floor(dropProbability * 100).toLong

  /** Broker partition routing: `hash31(pk) % partitions`
    * (`src/changefeed/model.ts:106-109`). */
  def partitionForKey(pk: Column, partitions: Int): Column =
    hash31(pk) % partitions.toLong

  /** Winnowing fingerprint: min hash31 over all `window`-char substrings,
    * single-pass rolling hash (see `WinnowMin`). */
  def winnowMin(c: Column, window: Int, modulus: Long): Column =
    GraftBridge.column(WinnowMin(GraftBridge.expression(c), window, modulus))

  /** All `window`-char substring hashes in one rolling pass (see
    * `RollingHashes`). */
  def rollingHashes(c: Column, window: Int, modulus: Long): Column =
    GraftBridge.column(RollingHashes(GraftBridge.expression(c), window, modulus))

  /** Codegen'd left-to-right array dot product (see `ArrayDot`). */
  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Per-row argmax-by-cosine over a broadcast centroid array (see
    * `NearestCentroid`). */
  def nearestCentroid(emb: Column, nrm: Column, cands: Column): Column =
    GraftBridge.column(NearestCentroid(GraftBridge.expression(emb),
      GraftBridge.expression(nrm), GraftBridge.expression(cands)))

  /** Per-row m-subspace PQ code assignment over a broadcast codebook array
    * (see `PqBestCodes`). */
  def pqBestCodes(emb: Column, cb: Column, m: Int): Column =
    GraftBridge.column(PqBestCodes(GraftBridge.expression(emb),
      GraftBridge.expression(cb), m))

  /** Pack int8-quantized integral doubles to one byte per dim (see
    * `PackInt8`). */
  def packInt8(c: Column): Column =
    GraftBridge.column(PackInt8(GraftBridge.expression(c)))

  /** Unpack a `packInt8` code back to integral doubles (see
    * `UnpackInt8`). */
  def unpackInt8(c: Column): Column =
    GraftBridge.column(UnpackInt8(GraftBridge.expression(c)))

  /** Codegen'd byte-level int8 dot product (see `Int8Dot`). */
  def int8Dot(a: Column, b: Column): Column =
    GraftBridge.column(Int8Dot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** All (field, value) entries of a JSON object in one parse (see
    * `JsonEntries`). */
  def jsonEntries(c: Column): Column =
    GraftBridge.column(JsonEntries(GraftBridge.expression(c)))

  /** All LSH band keys of an embedding in one fused pass (see
    * `LshBandKeys`). */
  def lshBandKeys(emb: Column, nBands: Int, bitsPerBand: Int, dims: Int = 64): Column =
    GraftBridge.column(LshBandKeys(GraftBridge.expression(emb), nBands, bitsPerBand, dims))

  /** Make `hash31(str, modulus)` callable from SQL / `expr(...)` lambdas
    * (needed inside higher-order functions like `transform`). Idempotent. */
  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(
      spark,
      "hash31",
      { exprs =>
        require(exprs.size == 2, "hash31(str, modulus) takes 2 arguments")
        val mod = exprs(1) match {
          case Literal(v: Int, _)   => v.toLong
          case Literal(v: Long, _)  => v
          case other =>
            throw new IllegalArgumentException(
              s"hash31 modulus must be an integer literal, got $other")
        }
        Hash31(exprs.head, mod)
      })
}
