package graft.functions

import java.io.CharArrayWriter

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All (field, value) entries of a JSON object in ONE Jackson pass —
  * the fused form of `explode(json_object_keys(j))` followed by a per-key
  * `get_json_object(j, '$[key]')`, which costs 1+K full parses per row on
  * the open-schema apply path (`harness/verifier/index.js:59-76` merges
  * arbitrary partial payloads, so the field set is data-dependent).
  *
  * Semantics are a drop-in for that pair:
  *   - non-object / unparseable / null input → null (the caller's
  *     `explode_outer` then emits its null marker row, exactly as
  *     `json_object_keys` returning null does);
  *   - `{}` → empty array (same marker row via `explode_outer`);
  *   - string values → their unescaped text; nested objects/arrays and
  *     non-string scalars → re-rendered by `JsonGenerator.
  *     copyCurrentStructure`, the same Jackson call `GetJsonObject` uses,
  *     so the rendered text is byte-identical to what `get_json_object`
  *     would have produced;
  *   - JSON `null` values → SQL null (the caller's sanitize filter drops
  *     them, `src/changefeed/model.ts` sanitizeRow);
  *   - duplicate keys keep the FIRST occurrence: `json_object_keys` lists
  *     every occurrence but the `get_json_object` path probe resolves each
  *     to the first match, so after the downstream per-field argmax the
  *     result is identical.
  */
case class JsonEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(JsonEntries.elementType, containsNull = false)
  override def prettyName: String = "json_entries"

  override def nullSafeEval(input: Any): Any =
    JsonEntries.entries(input.asInstanceOf[UTF8String])

  // the helper may return null (malformed / non-object input), so emit an
  // explicit null check instead of defineCodeGen's never-null contract
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonEntries.entries($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): JsonEntries =
    copy(child = newChild)
}

object JsonEntries {

  val elementType: StructType = StructType(Seq(
    StructField("field", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))

  private val factory = new JsonFactory() // thread-safe, shared

  /** One-pass (field, value) extraction; null unless the input is a
    * parseable JSON object. */
  def entries(json: UTF8String): GenericArrayData = {
    if (json == null) return null
    try {
      val parser = factory.createParser(json.toString)
      try {
        if (parser.nextToken() != JsonToken.START_OBJECT) return null
        val out = scala.collection.mutable.ArrayBuffer.empty[Any]
        val seen = new java.util.HashSet[String]()
        var tok = parser.nextToken()
        while (tok == JsonToken.FIELD_NAME) {
          val name = parser.currentName()
          val vtok = parser.nextToken()
          if (!seen.add(name)) {
            // repeat key: first occurrence already captured; skip the value
            if (vtok == JsonToken.START_OBJECT || vtok == JsonToken.START_ARRAY) {
              parser.skipChildren()
            }
          } else {
            val v: UTF8String = vtok match {
              case JsonToken.VALUE_NULL => null
              case JsonToken.VALUE_STRING => UTF8String.fromString(parser.getText)
              case _ => renderCurrent(parser) // nested structure or scalar
            }
            out += InternalRow(UTF8String.fromString(name), v)
          }
          tok = parser.nextToken()
        }
        if (tok != JsonToken.END_OBJECT) null
        else new GenericArrayData(out.toArray)
      } finally parser.close()
    } catch {
      case _: Exception => null
    }
  }

  /** Re-render the value at the parser's current token compactly — the
    * identical `copyCurrentStructure` call `GetJsonObject` makes, so
    * number normalisation and nested-object spacing match bit-for-bit. */
  private def renderCurrent(parser: JsonParser): UTF8String = {
    val w = new CharArrayWriter()
    val gen = factory.createGenerator(w)
    try gen.copyCurrentStructure(parser)
    finally gen.close()
    UTF8String.fromString(w.toString)
  }
}
