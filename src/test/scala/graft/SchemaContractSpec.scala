package graft

/** Output-contract gate for EVERY query on the oracled surface.
  *
  * Round 11's only two red rows (`emb_norm_profile`, `emb_dim_variance`)
  * were value-exact in an independent DuckDB compare at two scale factors
  * and still failed the driver's canonical hash — solely because their
  * output schemas exposed DECIMAL(38,0) columns, whose canonical
  * rendering (decimal vs hugeint vs plain integer string) differs
  * between engines. The lesson generalizes: DECIMAL may be the right
  * INTERNAL accumulator (overflow-proof Σ over unbounded corpora) but
  * must never cross a published output boundary. This suite makes the
  * whole class of bug unrepresentable: it builds every `SparkEntry
  * .queries` DataFrame against the sf0.001 fixture and asserts no
  * DECIMAL anywhere in the result schema (recursing through
  * struct/array/map via [[Verify.decimalColumns]]).
  */
class SchemaContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no query output schema exposes a DECIMAL column (driver-hash hazard)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cols = Verify.decimalColumns(fn(spark, sf).schema)
        if (cols.isEmpty) Nil else Seq(s"$name -> ${cols.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "DECIMAL in a published output contract is a canonical-hash hazard " +
        "(round-11 lesson); keep the DECIMAL accumulation internal and " +
        "emit a mod-ChecksumPrime BIGINT or a canonical string instead:\n" +
        offenders.mkString("\n"))
  }

  test("every oracled query has a queries entry and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${(o -- q).mkString(",")}")
  }
}
