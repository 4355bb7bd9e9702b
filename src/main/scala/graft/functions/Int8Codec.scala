package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Pack an int8-quantized vector (integral doubles in [-127, 127], the
  * `Similarity.quantizeInt8` output) into a `binary` column of one signed
  * byte per dimension — the on-disk/in-memory form that realizes the 4×
  * compression the quantization promises: a 64-dim float32 embedding is
  * 256 payload bytes, its packed code 64.
  *
  * Values are truncated to byte range by the Java narrowing cast; inputs
  * outside [-127, 127] are a contract violation upstream (quantizeInt8
  * saturates at ±127 by construction), not something this codec defends.
  *
  * Input type is CHECKED (`array<double>`): `nullSafeEval`/codegen read
  * elements via `getDouble`, which bit-reinterprets any other element
  * storage (the raw `array<float>` embedding column would silently pack
  * garbage) — `checkInputDataTypes` turns that misuse into an analysis
  * error instead; callers cast explicitly.
  */
case class PackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_int8 requires array<double> (getDouble would bit-reinterpret " +
        s"other element storage), got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_int8"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = arr.getDouble(i).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) $a.getDouble($i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackInt8 =
    copy(child = newChild)
}

/** Unpack a [[PackInt8]] code back to integral doubles — the inverse used
  * where a consumer needs the array form (debugging, interop); the scoring
  * hot path goes through [[Int8Dot]] and never materializes arrays. */
case class UnpackInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_int8 requires binary (a pack_int8 code), got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unpack_int8"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Double](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = bytes(i).toDouble
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |double[] $out = new double[$a.length];
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $out[$i] = (double) $a[$i];
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnpackInt8 =
    copy(child = newChild)
}

/** Dot product of two [[PackInt8]] codes as double, straight over the
  * bytes — the int8 scoring hot path with zero array materialization:
  * per candidate it reads 2×64 bytes, multiplies in int, accumulates in
  * long (|sum| ≤ 64·127² ≪ 2⁶³ — exact), and converts once at the end.
  * Bit-identical to `ArrayDot` over the unpacked arrays, so the DuckDB
  * oracles for the array form pin this path too. Codes of different
  * lengths fold over the shorter prefix (same contract as `ArrayDot`).
  */
case class Int8Dot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int8_dot requires two binary pack_int8 codes, " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i).toInt * y(i).toInt
      i += 1
    }
    acc.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((int) $a[$i]) * ((int) $b[$i]);
         |}
         |${ev.value} = (double) $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}
