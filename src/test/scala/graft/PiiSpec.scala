package graft

import graft.llm.Pii

/** PII scrub semantics on crafted strings: per-class counts, full
  * redaction (no residual match), non-PII text untouched, and the
  * zero-shuffle plan shape.
  */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  test("counts and redaction per PII class") {
    val df = Seq(
      (1L, "mail a.b@host.org and c@x.io, call 555-1234, from 10.0.0.7"),
      (2L, "no pii here at all"),
      (3L, "digits 12345 and a dotted 1.2 are not pii"))
      .toDF("id", "text")
    val out = Pii.scrub(df, "id", "text").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out === Array((1L, 2, 1, 1), (2L, 0, 0, 0), (3L, 0, 0, 0)))
  }

  test("redacted stream carries the placeholders, not the originals") {
    val df = Seq((1L, "x a.b@host.org y 555-1234 z 10.0.0.7 w")).toDF("id", "text")
    val expected = "x <EMAIL> y <PHONE> z <IP> w"
    val got = Pii.scrub(df, "id", "text").select("redacted_md5", "redacted_len")
      .collect().head
    assert(got.getString(0) ===
      org.apache.commons.codec.digest.DigestUtils.md5Hex(expected))
    assert(got.getInt(1) === expected.length)
  }

  test("clean text round-trips: md5 of the input itself") {
    val s = "only lowercase words and spaces"
    val got = Pii.scrub(Seq((1L, s)).toDF("id", "text"), "id", "text")
      .select("redacted_md5").collect().head.getString(0)
    assert(got === org.apache.commons.codec.digest.DigestUtils.md5Hex(s))
  }

  test("null text keeps the historical -1 contract (admission stays false, " +
      "never null)") {
    // size(regexp_extract_all(NULL)) under the legacy sizeOfNull default
    // counted -1 per class; regexp_count(NULL) alone would flip the count
    // to null and the admission gate's `piiCount === 0` from false to null
    val df = Seq((1L, Option("no pii")), (2L, Option.empty[String]))
      .toDF("id", "text")
    val counts = Pii.scrub(df, "id", "text").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(counts === Array((1L, 0, 0, 0), (2L, -1, -1, -1)))
    val gate = df.select(
      org.apache.spark.sql.functions.col("id"),
      (Pii.piiCount(org.apache.spark.sql.functions.col("text")) === 0)
        .as("pass_pii")).orderBy("id").collect()
    assert(gate.map(r => (r.getLong(0), r.isNullAt(1), !r.isNullAt(1) && r.getBoolean(1)))
      === Array((1L, false, true), (2L, false, false)),
      "a null text must FAIL the pii gate, not poison it to null")
  }

  test("plan: pure projection — no exchange, no aggregate") {
    val plan = Pii.scrub(Seq((1L, "t")).toDF("id", "text"), "id", "text")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange") && !plan.contains("Aggregate"),
      s"scrub must stay a per-row projection:\n$plan")
  }
}
