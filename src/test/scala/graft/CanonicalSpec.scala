package graft

import org.apache.spark.sql.functions._
import graft.cdc.Canonical

/** Canonical comparison machinery (`harness/verifier/index.js:78-136`,
  * `src/domain/storage.ts:35-43`, `web/App.tsx:1428-1444`). */
class CanonicalSpec extends SparkSpec {

  import spark.implicits._

  test("coerceComparable trims and normalizes numeric strings") {
    val df = Seq(("  x  ", "42.0", "6.55", "abc")).toDF("a", "b", "c", "d")
      .select(
        Canonical.coerceComparable(col("a")).as("a"),
        Canonical.coerceComparable(col("b")).as("b"),
        Canonical.coerceComparable(col("c")).as("c"),
        Canonical.coerceComparable(col("d")).as("d"))
    val r = df.collect().head
    assert(r.getString(0) === "x")
    assert(r.getString(1) === "42") // trailing .0 dropped
    assert(r.getString(2) === "6.55")
    assert(r.getString(3) === "abc")
  }

  test("coerceComparable renders large/small magnitudes plain, like JS String(Number))") {
    val df = Seq(("10000000", "1e3", "0.0001", "-0.0", "20000000000000000000000000000000000000000"))
      .toDF("a", "b", "c", "d", "e")
      .select(Seq("a", "b", "c", "d", "e").map(n => Canonical.coerceComparable(col(n)).as(n)): _*)
    val r = df.collect().head
    assert(r.getString(0) === "10000000") // JS: "10000000"; bare double cast would say "1.0E7"
    assert(r.getString(1) === "1000")
    assert(r.getString(2) === "0.0001") // bare double cast would say "1.0E-4"
    assert(r.getString(3) === "0") // JS String(Number("-0")) === "0"
    assert(r.getString(4) === "2.0E40") // beyond DECIMAL(38) → double sci-notation fallback
  }

  test("stableJson sorts keys; rowHash is deterministic and order-insensitive") {
    val df1 = Seq((1.5, "a", 2L)).toDF("zcol", "acol", "mcol")
    val df2 = Seq((1.5, "a", 2L)).toDF("zcol", "acol", "mcol").select("mcol", "zcol", "acol")
    val j1 = df1.select(Canonical.stableJson(df1, Seq("zcol", "acol", "mcol")).as("j"))
      .as[String].collect().head
    assert(j1 === """{"acol":"a","mcol":"2","zcol":"1.5"}""")
    val h1 = df1.select(Canonical.rowHash(df1, Seq("zcol", "acol", "mcol"))).as[String].collect().head
    val h2 = df2.select(Canonical.rowHash(df2, Seq("mcol", "acol", "zcol"))).as[String].collect().head
    assert(h1 === h2)
  }

  test("inferColumnType follows the reference rules") {
    val df = Seq(
      ("flag", "true"), ("updated_ts", "1700000000"), ("amount", "12.5"), ("name", "ada")
    ).toDF("k", "v").select(col("k"), Canonical.inferColumnType(col("k"), col("v")).as("t"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map(
      "flag" -> "bool", "updated_ts" -> "timestamp", "amount" -> "number", "name" -> "string"))
  }

  test("haystack + term matching implements the AND-of-terms search filter") {
    val df = Seq(("Orders", "update", "pk-7"), ("users", "insert", "pk-9"))
      .toDF("tbl", "op", "pk")
      .withColumn("hay", Canonical.haystack(Seq(col("tbl"), col("op"), col("pk"))))
    assert(df.filter(Canonical.matchesAllTerms(col("hay"), Seq("orders", "pk-7"))).count() === 1)
    assert(df.filter(Canonical.matchesAllTerms(col("hay"), Seq("orders", "pk-9"))).count() === 0)
    assert(df.filter(Canonical.matchesAllTerms(col("hay"), Seq.empty)).count() === 2)
  }

  test("write-amp formatting matches reference display rules") {
    val df = Seq((2.0, 1.01)).toDF("hi", "lo").select(
      Canonical.formatWriteAmp(col("hi")).as("f"),
      Canonical.describeWriteAmp(col("hi")).as("dHi"),
      Canonical.describeWriteAmp(col("lo")).as("dLo"))
    val r = df.collect().head
    assert(r.getString(0) === "2.0x")
    assert(r.getString(1) === "~1.0 extra writes/change")
    assert(r.getString(2) === "no meaningful amplification")
  }
}
