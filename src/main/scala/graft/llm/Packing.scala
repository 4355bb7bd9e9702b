package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cdc.GlobalOrder

/** Context-window packing plan — the concatenate-then-split batching step
  * of LLM pretraining (documents concatenate in corpus order, the token
  * stream splits at fixed window boundaries; GPT-style pipelines pack this
  * way rather than bin-packing per document).
  *
  * The plan needs each document's position in the GLOBAL token stream — a
  * prefix sum over the whole corpus. Computed with
  * `GlobalOrder.runningSum` (range partition → local cumulative sum → tiny
  * triangular prefix combine), so the corpus never funnels through a
  * single-partition window: the shape that survives 100 TB.
  */
object Packing {

  /** Per-document packing plan: whitespace token count (the `text_tokens`
    * ws definition), the document's start/end window ids in the
    * concatenated stream, and whether it straddles a boundary (a training
    * example split across sequences). Deterministic in corpus (doc_id)
    * order. */
  def packPlan(docs: DataFrame, windowTokens: Int = 512): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    GlobalOrder.runningSum(toks, Seq(col("doc_id")), "n_tokens", "cum_tokens")
      .select(
        col("doc_id"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $windowTokens").as("bin_start"),
        expr(s"(cum_tokens - 1) div $windowTokens").as("bin_end"))
      .withColumn("crosses", col("bin_end") > col("bin_start"))
  }

  /** Length-bucketed batching plan — the padding-based alternative to
    * concatenation that SFT/encoder training uses: each document goes to
    * the smallest power-of-two bucket ≥ its token count (floor 16, cap
    * 512 = the window size [[packPlan]] packs into), and every batch pads
    * its members to the bucket width. The per-bucket ledger shows the
    * padding waste that bucketing pays vs packing — the table the
    * batching decision is made on.
    *
    * Bucket assignment is a branch ladder on exact integers (no float
    * log2), so the bucketing — like the split/sample assignments — is
    * reproducible anywhere. Shape: one scan projection + one partial-agg
    * shuffle on the ≤ 7-value bucket key; `waste_frac` is one division of
    * exact integers. */
  def lengthBuckets(docs: DataFrame): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("_nt"))
    val bucket = when(col("_nt") <= 16, 16L)
      .when(col("_nt") <= 32, 32L)
      .when(col("_nt") <= 64, 64L)
      .when(col("_nt") <= 128, 128L)
      .when(col("_nt") <= 256, 256L)
      .otherwise(512L)
    toks
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("total_tokens"))
      .withColumn("padded_tokens", col("n_docs") * col("bucket"))
      .withColumn("waste_frac",
        (col("padded_tokens") - col("total_tokens")).cast("double") /
          col("padded_tokens"))
  }

  /** One-row packing-efficiency report over [[packPlan]] — the number a
    * batch-shape decision is made on: how many training windows the
    * corpus packs into, what fraction of documents straddle a window
    * boundary (their loss masks split across sequences), and the mean
    * fill of the windows. All exact-integer arithmetic plus one final
    * division; the aggregate is one partial-agg reduction over the plan
    * (the plan itself already scales via the distributed prefix sum). */
  def packEfficiency(docs: DataFrame, windowTokens: Int = 512): DataFrame =
    packPlan(docs, windowTokens)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (max("bin_end") + 1).as("n_windows"),
        sum(when(col("crosses"), 1L).otherwise(0L)).as("n_straddling"))
      .select(
        col("n_docs"), col("total_tokens"), col("n_windows"), col("n_straddling"),
        (col("n_straddling").cast("double") / col("n_docs")).as("straddle_frac"),
        (col("total_tokens").cast("double") / (col("n_windows") * windowTokens))
          .as("mean_fill"))

  /** Packing-efficiency sweep over candidate window sizes — the table
    * the context-length decision is read off: for each window in
    * `windows`, the window count, straddle fraction and mean fill. The
    * distributed prefix sum runs ONCE; every window's bin ids are pure
    * arithmetic on the same `cum_tokens` column, so the sweep costs one
    * corpus pass + one 1-row aggregate unpivoted with `stack` — the
    * [[graft.llm.Corpus.qualityThresholdSweep]] shape. */
  def packEfficiencyCurve(docs: DataFrame,
      windows: Seq[Int] = Seq(128, 256, 512, 1024)): DataFrame = {
    require(windows.nonEmpty)
    val toks = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val cum = GlobalOrder.runningSum(toks, Seq(col("doc_id")), "n_tokens",
      "cum_tokens")
    val aggs = windows.zipWithIndex.flatMap { case (w, i) => Seq(
      (max(expr(s"(cum_tokens - 1) div $w")) + 1).as(s"_w$i"),
      count(when(
        expr(s"(cum_tokens - 1) div $w") > expr(s"(cum_tokens - n_tokens) div $w"),
        1)).as(s"_s$i"))
    } ++ Seq(count(lit(1)).as("_docs"), sum("n_tokens").as("_toks"))
    val one = cum.agg(aggs.head, aggs.tail: _*)
    val stackArgs = windows.zipWithIndex
      .map { case (w, i) => s"CAST($w AS BIGINT), _w$i, _s$i" }.mkString(", ")
    one.selectExpr(
      s"stack(${windows.size}, $stackArgs) AS (window_tokens, n_windows, n_straddling)",
      "_docs", "_toks")
      .select(col("window_tokens"), col("n_windows"), col("n_straddling"),
        (col("n_straddling").cast("double") / col("_docs")).as("straddle_frac"),
        (col("_toks").cast("double") / (col("n_windows") * col("window_tokens")))
          .as("mean_fill"))
  }

  /** Padding-waste ledger — the cost of NOT packing, per document-length
    * octave: one-doc-per-sequence training pads every sequence to
    * `windowTokens` (long docs chunk into ⌈tokens/W⌉ sequences, the last
    * one padded), so per octave the ledger reports documents, tokens,
    * padded sequence count and the exact pad-token bill — read next to
    * [[packEfficiency]]'s `mean_fill` to price the packing pipeline
    * ("the sub-128-token octaves burn 80% of their window on padding").
    * All integer arithmetic (⌈n/W⌉ as `(n + W−1) div W`, octave =
    * `len(bin(n)) − 1` — the repo's transcendental-free ⌊log₂⌋); the
    * waste fraction is one IEEE division of exact longs.
    *
    * Shape: one corpus pass, one ≤ 64-row octave aggregate (map-side
    * combine) — no joins, no window. */
  def paddingWaste(docs: DataFrame, windowTokens: Int = 512): DataFrame =
    docs
      .select(size(split(col("text"), " ")).cast("long").as("_n"))
      .withColumn("octave", (length(bin(col("_n"))) - 1).cast("long"))
      .withColumn("_seqs", expr(s"(_n + ${windowTokens - 1}) div $windowTokens"))
      .groupBy("octave")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_n").as("n_tokens"),
        sum("_seqs").as("n_seqs_padded"),
        (sum("_seqs") * windowTokens - sum("_n")).as("pad_tokens"))
      .select(col("octave"), col("n_docs"), col("n_tokens"),
        col("n_seqs_padded"), col("pad_tokens"),
        (col("pad_tokens").cast("double")
          / (col("n_seqs_padded") * windowTokens)).as("waste_frac"))
}
