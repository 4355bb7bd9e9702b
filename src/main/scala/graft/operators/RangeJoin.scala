package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: all pairs (l, r) sharing equality keys with
  * `0 <= r.ts - l.ts <= windowMs` — click→purchase attribution windows,
  * event-correlation joins, contamination windows around a cutoff.
  *
  * Spark plans a raw inequality join condition as
  * BroadcastNestedLoopJoin — O(|L|·|R|) per key and a driver-memory bomb
  * the moment neither side broadcasts. The scale-correct formulation is
  * BANDING: quantize both sides' times into bands of width `windowMs`.
  * Any qualifying pair is then either in the same band or in adjacent
  * bands, so emitting each left row into (band, band+1) and
  * equality-joining on (keys, band) finds every candidate with a plain
  * shuffle hash/sort-merge join; the exact inequality filters the ≤2×
  * band-collision false positives inside the joined stage.
  *
  * At 100 TB: one hash shuffle per side on (keys, band) — band
  * cardinality scales with the time span, so partitions stay balanced
  * even when a single key is hot across time; a key×band hotspot means a
  * genuinely quadratic pair output, which no join algorithm outruns. The
  * 2× left duplication is a narrow explode before the exchange; AQE can
  * still pick a broadcast join when one side turns out tiny.
  *
  * Reference anchor: the playground's lag histogram correlates each
  * delivered event with source-bus events inside a bounded tick window
  * (sim/metrics.ts:118-139, web/App.tsx lag panel); this is that
  * correlation as a reusable operator.
  */
object RangeJoin {

  /** Pairs of `left` and `right` rows sharing `keys` whose BIGINT time
    * columns satisfy `0 <= right.rightTs - left.leftTs <= windowMs`
    * (both ends inclusive). All columns of both inputs pass through;
    * non-key column names must be disjoint across the sides.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val lDup = left.columns.toSeq.filterNot(keys.contains)
      .intersect(right.columns.toSeq.filterNot(keys.contains))
    require(lDup.isEmpty, s"non-key name clash: ${lDup.mkString(",")}")
    require(!(left.columns ++ right.columns).contains("_band"),
      "reserved internal column name present: _band")

    // Left rows probe their own band and the next: a right row at
    // l.ts + windowMs lands at most one band above l's. Exact integer
    // division (SQL `div`) — no double rounding near band edges.
    val lBand = expr(s"`$leftTs` div ${windowMs}L")
    val l = left.withColumn("_band", explode(array(lBand, lBand + 1)))
    val r = right.withColumn("_band", expr(s"`$rightTs` div ${windowMs}L"))

    l.join(r, keys :+ "_band")
      .where((col(rightTs) - col(leftTs)).between(0, windowMs))
      .drop("_band")
  }

  /** Streaming form of [[within]] for two unbounded sides — here the
    * banding rewrite is deliberately ABSENT: Spark's native stream-stream
    * join (StreamingSymmetricHashJoin) already keys state by the equality
    * columns and uses the time-range condition plus the watermark to evict
    * buffered rows, which is exactly the bounded-state interval join a
    * stream pipeline wants. Per-side state ≈ rate × (windowMs +
    * watermarkDelayMs) per key — bounded, sharded by the key shuffle.
    * Inner join only: a row's pairs are complete once the other side's
    * watermark passes its window, and results append exactly once.
    *
    * Same contract as [[within]] (`0 <= right.rightTs - left.leftTs <=
    * windowMs`, BIGINT epoch-ms time columns, disjoint non-key names);
    * parity with the batch operator on a drained feed is asserted in spec.
    *
    * @param watermarkDelayMs how late either side may arrive, in event
    *                         time; rows later than this are dropped by the
    *                         engine (streaming reality — the batch form has
    *                         no such notion).
    */
  def withinStream(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      windowMs: Long,
      watermarkDelayMs: Long = 0L): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    require(leftTs != rightTs, "leftTs and rightTs must be distinct columns")
    val sDup = left.columns.toSeq.filterNot(keys.contains)
      .intersect(right.columns.toSeq.filterNot(keys.contains))
    require(sDup.isEmpty, s"non-key name clash: ${sDup.mkString(",")}")
    val lEvt = s"_${leftTs}_evt"
    val rEvt = s"_${rightTs}_evt"
    require(!(left.columns ++ right.columns).exists(Seq(lEvt, rEvt).contains),
      s"reserved internal column names present: $lEvt,$rEvt")
    val l = left
      .withColumn(lEvt, timestamp_millis(col(leftTs)))
      .withWatermark(lEvt, s"$watermarkDelayMs milliseconds")
    val r = right
      .withColumn(rEvt, timestamp_millis(col(rightTs)))
      .withWatermark(rEvt, s"$watermarkDelayMs milliseconds")
    val joined = l.join(r,
      keys.map(k => l(k) === r(k)).reduce(_ && _) &&
        col(rEvt) >= col(lEvt) &&
        col(rEvt) <= col(lEvt) + expr(s"INTERVAL $windowMs MILLISECONDS"))
    // keep one copy of each key column; the event-time helpers go away
    keys.foldLeft(joined)((d, k) => d.drop(r(k))).drop(lEvt, rEvt)
  }
}
