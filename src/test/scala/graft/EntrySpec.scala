package graft

/** Flagship smoke — the driver checks rows > 0; this additionally pins the
  * semantic claim in `SparkEntry.entry`'s doc: log capture is lossless, so
  * every diffed key classifies as `match`.
  */
class EntrySpec extends SparkSpec {

  test("entry: rows > 0 and every status is match (log capture is lossless)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet === Set("match"), s"unexpected statuses: $byStatus")
    assert(byStatus("match") > 0)
  }
}
