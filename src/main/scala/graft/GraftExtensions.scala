package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArrayDot, Hash31, JsonEntries, LshBandKeys, RollingHashes, WinnowMin}

/** Standard `SparkSessionExtensions` injector: add
  * `spark.sql.extensions=graft.GraftExtensions` and the graft native
  * expressions become SQL-callable in every session built with that conf —
  * the idiomatic integration point for users who own session construction.
  * (The driver harness builds its own sessions, so the per-session
  * `GraftFunctions.register` path exists too; both routes register the
  * same builders.)
  *
  *   - `hash31(str, modLiteral)` — reference routing hash
  *   - `winnow_min(str, windowLiteral, modLiteral)` — rolling fingerprint
  *   - `array_dot(a, b)` — codegen'd left-to-right dot product
  *   - `lsh_band_keys(emb, bandsLiteral, bitsLiteral[, dimsLiteral])` —
  *     fused signed-projection band keys (one embedding pass)
  *   - `rolling_hashes(str, windowLiteral, modLiteral)` — every window
  *     hash of a string in one pass
  *   - `json_entries(json)` — all (field, value) pairs of a JSON object
  *     in one parse
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("hash31"),
      new ExpressionInfo("graft.functions", "hash31"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 2, "hash31(str, modulus) takes 2 arguments")
        Hash31(exprs.head, longLit(exprs(1), "hash31 modulus"))
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_min"),
      new ExpressionInfo("graft.functions", "winnow_min"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 3, "winnow_min(str, window, modulus) takes 3 arguments")
        WinnowMin(exprs.head, longLit(exprs(1), "winnow window").toInt,
          longLit(exprs(2), "winnow modulus"))
      }))
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo("graft.functions", "array_dot"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 2, "array_dot(a, b) takes 2 arguments")
        ArrayDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_band_keys"),
      new ExpressionInfo("graft.functions", "lsh_band_keys"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 3 || exprs.size == 4,
          "lsh_band_keys(emb, bands, bitsPerBand[, dims]) takes 3 or 4 arguments")
        val dims =
          if (exprs.size == 4) longLit(exprs(3), "lsh_band_keys dims").toInt else 64
        LshBandKeys(exprs.head,
          longLit(exprs(1), "lsh_band_keys bands").toInt,
          longLit(exprs(2), "lsh_band_keys bitsPerBand").toInt, dims)
      }))
    ext.injectFunction((
      FunctionIdentifier("rolling_hashes"),
      new ExpressionInfo("graft.functions", "rolling_hashes"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 3, "rolling_hashes(str, window, modulus) takes 3 arguments")
        RollingHashes(exprs.head, longLit(exprs(1), "rolling window").toInt,
          longLit(exprs(2), "rolling modulus"))
      }))
    ext.injectFunction((
      FunctionIdentifier("json_entries"),
      new ExpressionInfo("graft.functions", "json_entries"),
      { exprs: Seq[Expression] =>
        require(exprs.size == 1, "json_entries(json) takes 1 argument")
        JsonEntries(exprs.head)
      }))
  }
}
