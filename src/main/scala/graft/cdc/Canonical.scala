package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value canonicalisation + stable row hashing — the verifier's comparison
  * machinery (`harness/verifier/index.js:78-136`):
  * `coerceComparable` (trim strings, numeric-strings → numbers),
  * `stableStringify` (deterministic JSON: sorted keys), equality by
  * canonical form. Plus the storage layer's `inferColumnType`
  * (`src/domain/storage.ts:35-43`) and search-haystack build
  * (`web/App.tsx:1428-1444`).
  */
object Canonical {

  /** Canonical comparable form of a scalar column: trimmed; numeric strings
    * normalize through an actual numeric round-trip — `'1.50'→'1.5'`,
    * `'007'→'7'`, `'1e3'→'1000'` — matching the reference's `Number()`
    * coercion (`coerceComparable`, `index.js:84-87`).
    *
    * JS `String(Number(x))` renders plain decimal notation for magnitudes in
    * roughly [1e-6, 1e21), while Spark's double→string cast switches to
    * scientific notation outside [1e-3, 1e7) — so the canonical form goes
    * through DECIMAL(38,18) plain-string rendering (trailing zeros trimmed)
    * whenever the value fits; only beyond ±1e20 / below 1e-18 does it fall
    * back to the double's scientific form. */
  def coerceComparable(c: Column): Column = {
    val t = trim(c.cast("string"))
    val numeric = t.rlike("^-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$")
    val d = t.cast("double")
    // DECIMAL(38,18) always renders plain notation with a decimal point, so
    // trimming trailing zeros then a dangling point is lossless; -0 → 0
    val fits = d.isNotNull && abs(d) < lit(1e20) // ANSI decimal cast throws past DECIMAL(38,18)
    val dec = when(fits, d).otherwise(lit(null)).cast("decimal(38,18)")
    val plain = regexp_replace(
      regexp_replace(regexp_replace(dec.cast("string"), "0+$", ""), "\\.$", ""),
      "^-0$", "0")
    val canon = coalesce(plain, regexp_replace(d.cast("string"), "\\.0+$", ""))
    when(numeric, canon).otherwise(t)
  }

  /** Deterministic JSON of selected columns — field order fixed by sorting
    * names (`stableStringify`'s sorted keys). */
  def stableJson(df: DataFrame, cols: Seq[String]): Column =
    to_json(struct(cols.sorted.map(n => coerceComparable(col(n)).as(n)): _*))

  /** Stable row hash over the canonical JSON (drives state-diff equality and
    * the golden-state oracle check). */
  def rowHash(df: DataFrame, cols: Seq[String]): Column =
    sha2(stableJson(df, cols), 256)

  /** `inferColumnType` (`storage.ts:35-43`): booleans → bool; numbers whose
    * key matches /_ts$|timestamp$/i → timestamp, else number; everything
    * else string. Operates on a (key, value-string) pair. */
  def inferColumnType(key: Column, value: Column): Column =
    when(lower(value).isin("true", "false"), "bool")
      .when(value.rlike("^-?[0-9]+(\\.[0-9]+)?$") &&
        lower(key).rlike("(_ts|timestamp)$"), "timestamp")
      .when(value.rlike("^-?[0-9]+(\\.[0-9]+)?$"), "number")
      .otherwise("string")

  /** `sanitizeRow` (`index.js:43-57`): null-valued fields dropped from the
    * canonical JSON. Spark's `to_json` already omits nulls — provided here
    * as the explicit projection for map payloads. */
  def sanitizeJson(mapCol: Column): Column =
    to_json(map_filter(mapCol, (_, v) => v.isNotNull))

  /** Search haystack (`web/App.tsx:1428-1444`): lowercase concat of the
    * searchable fields, built once as a column (Catalyst caches the
    * projection; whole-stage codegen fuses the filter). */
  def haystack(cols: Seq[Column]): Column =
    lower(concat_ws(" ", cols: _*))

  /** Token AND-match over the haystack (`scenarioFilters.ts:177-217`). */
  def matchesAllTerms(hay: Column, terms: Seq[String]): Column =
    terms.map(t => hay.contains(t.toLowerCase)).foldLeft(lit(true))(_ && _)

  /** Write-amplification display helpers (`src/ui/writeAmplification.ts`). */
  def formatWriteAmp(wa: Column): Column = format_string("%.1fx", wa)
  def describeWriteAmp(wa: Column): Column =
    when(wa < 1.05, lit("no meaningful amplification"))
      .otherwise(concat(lit("~"), format_string("%.1f", wa - 1), lit(" extra writes/change")))
}
