package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `nBands` signed-random-projection band keys of an embedding in ONE
  * pass over the vector.
  *
  * Semantically identical to building the key array from per-plane
  * `ArrayDot` projections (`Similarity.lshBandKey`: band b, bit j ⇒ plane
  * b·bits+j of the deterministic lattice
  * `w(p,i) = (((p·dims+i+1)·2654435761) mod 1000)/1000 − 0.5`, key bit set
  * iff the projection ≥ 0) — each accumulator still sums in ascending
  * element order, so every projection is bit-identical to the composed form
  * and to the DuckDB oracle's `list_reduce` fold. The difference is
  * traversal count: the composed form walks the embedding once per plane
  * (nBands·bits passes); this expression walks it once, carrying
  * nBands·bits accumulators through a tight primitive loop inside
  * whole-stage codegen.
  */
case class LshBandKeys(child: Expression, nBands: Int, bitsPerBand: Int, dims: Int = 64)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val total = nBands * bitsPerBand
    val acc = new Array[Double](total)
    val n = math.min(dims, arr.numElements())
    var i = 0
    while (i < n) {
      val v = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      var p = 0
      while (p < total) {
        val w = (((p * dims + i + 1).toLong * 2654435761L) % 1000L).toDouble / 1000.0 - 0.5
        acc(p) += v * w
        p += 1
      }
      i += 1
    }
    val keys = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0L
      var j = 0
      while (j < bitsPerBand) {
        if (acc(b * bitsPerBand + j) >= 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val total = nBands * bitsPerBand
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val v = ctx.freshName("v")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val key = ctx.freshName("key")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |double[] $acc = new double[$total];
         |int $n = java.lang.Math.min($dims, $a.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $get;
         |  for (int $p = 0; $p < $total; $p++) {
         |    $acc[$p] += $v *
         |      ((double) ((((long) ($p * $dims + $i + 1)) * 2654435761L) % 1000L) / 1000.0 - 0.5);
         |  }
         |}
         |long[] $keys = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $bitsPerBand; $j++) {
         |    if ($acc[$b * $bitsPerBand + $j] >= 0) $key |= (1L << $j);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}
