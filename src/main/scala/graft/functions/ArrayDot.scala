package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Deterministic left-to-right dot product of two numeric arrays as double.
  *
  * Semantically identical to the
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, x) -> acc + x)`
  * formulation every similarity operator needs — same element casts, same
  * ascending fold order, so results (and the DuckDB `list_reduce` oracles)
  * stay bit-identical. The difference is execution: higher-order functions
  * are `CodegenFallback` in Spark — every row pays interpreted-lambda
  * dispatch per element — while this expression generates a tight primitive
  * loop inside whole-stage codegen (no boxing, no intermediate array).
  *
  * Element nulls are read as 0 (the embedding corpus has none; zip_with
  * would instead poison the product to null — documented divergence, not
  * reachable on this data). Arrays of different lengths fold over the
  * shorter prefix.
  */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  /** Physical element reader per declared element type — reading a long (or
    * int) array through `getDouble` would silently reinterpret the raw bits
    * as IEEE doubles (NaN garbage), so each numeric element type gets its
    * own accessor. */
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case DoubleType => arr.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"array_dot: unsupported element type $other")
    }
    val xt = elemType(left)
    val yt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(x, xt, i) * get(y, yt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, t: DataType): String = t match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case LongType => s"(double) $arr.getLong($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case ShortType => s"(double) $arr.getShort($i)"
        case ByteType => s"(double) $arr.getByte($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case other => throw new IllegalArgumentException(
          s"array_dot: unsupported element type $other")
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}
