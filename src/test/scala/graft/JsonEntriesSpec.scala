package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** `JsonEntries` must be a drop-in for the `explode(json_object_keys(j))` +
  * per-key `get_json_object(j, '$[key]')` pair it fuses (one parse instead
  * of 1+K) — pinned here both on planted edge cases and by randomized
  * equivalence against the built-in pair itself.
  */
class JsonEntriesSpec extends SparkSpec {

  import spark.implicits._

  private def entriesOf(json: String): Option[Seq[(String, String)]] = {
    val rows = Seq(json).toDF("j")
      .select(GraftFunctions.jsonEntries(col("j")).as("e"))
      .collect()
    Option(rows.head.getSeq[org.apache.spark.sql.Row](0))
      .map(_.map(r => (r.getString(0), r.getString(1))))
  }

  test("object entries come back in document order with rendered values") {
    assert(entriesOf("""{"b":"x","a":1,"c":true}""") ===
      Some(Seq("b" -> "x", "a" -> "1", "c" -> "true")))
  }

  test("nested objects/arrays render as raw compact JSON text") {
    assert(entriesOf("""{"o": {"k": [1, 2]}, "a": [ "x" ]}""") ===
      Some(Seq("o" -> """{"k":[1,2]}""", "a" -> """["x"]""")))
  }

  test("JSON null values surface as SQL null; {} is an empty array") {
    assert(entriesOf("""{"a":null,"b":"v"}""") ===
      Some(Seq("a" -> null, "b" -> "v")))
    assert(entriesOf("{}") === Some(Seq.empty))
  }

  test("non-object, malformed, and null inputs return null (marker-row contract)") {
    assert(entriesOf("[1,2]") === None)
    assert(entriesOf("\"scalar\"") === None)
    assert(entriesOf("{\"a\": ") === None)
    val nullRow = Seq((1, null: String)).toDF("i", "j")
      .select(GraftFunctions.jsonEntries(col("j")).as("e")).collect()
    assert(nullRow.head.isNullAt(0))
  }

  test("duplicate keys keep the first occurrence (get_json_object parity)") {
    assert(entriesOf("""{"a":"first","a":"second","b":"x"}""") ===
      Some(Seq("a" -> "first", "b" -> "x")))
  }

  test("randomized equivalence with json_object_keys + get_json_object") {
    val rnd = new scala.util.Random(7)
    def randJson(): String = {
      val fields = (0 until rnd.nextInt(5)).map { i =>
        val name = s"f${rnd.nextInt(4)}$i"
        val v = rnd.nextInt(5) match {
          case 0 => "\"s" + rnd.nextInt(100) + " \\\"q\\\" \"" // escaped quotes
          case 1 => rnd.nextInt(1000).toString
          case 2 => (rnd.nextDouble() * 100).toString
          case 3 => """{"n":""" + rnd.nextInt(9) + "}"
          case _ => "null"
        }
        s""""$name": $v"""
      }
      "{" + fields.mkString(",") + "}"
    }
    val docs = (0 until 200).map(i => (i.toLong, randJson())).toDF("id", "j")
    val viaPair = docs
      .select(col("id"), explode_outer(json_object_keys(col("j"))).as("field"), col("j"))
      .withColumn("value",
        when(col("field").isNotNull,
          expr("get_json_object(j, concat('$[''', field, ''']'))")))
      .select("id", "field", "value")
    val viaEntries = docs
      .select(col("id"), explode_outer(GraftFunctions.jsonEntries(col("j"))).as("e"))
      .select(col("id"), col("e.field").as("field"), col("e.value").as("value"))
    assert(viaEntries.orderBy("id", "field").collect().toSeq ===
      viaPair.orderBy("id", "field").collect().toSeq)
  }
}
