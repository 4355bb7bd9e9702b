package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hash31

/** Text-analysis operators for training-data curation over `documents`:
  * quality scoring, token counting, heuristic language scoring, and document
  * fingerprinting. All are narrow per-row projections (no shuffle at all) —
  * they run at scan speed and scale linearly.
  */
object TextAnalysis {

  /** Tiny function-word lists per language for the n-gram-heuristic language
    * scorer. (The corpus vocabulary is English-only, so on this data the
    * classifier degenerates deterministically — the operator is the point.) */
  val FunctionWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "y", "los"),
    "zh" -> Seq("的", "是", "了"))

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  private def toks: Column = split(col("text"), " ")

  /** Quality scoring: token stats, stopword ratio, alpha ratio, and a
    * composite score — the usual pre-training corpus filters (length,
    * repetition, symbol density). */
  def quality(docs: DataFrame): DataFrame = {
    val nToks = size(toks)
    val nDistinct = size(array_distinct(toks))
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*)))
    val nChars = length(col("text"))
    docs.select(
      col("doc_id"),
      nChars.cast("long").as("n_chars_obs"),
      nToks.cast("long").as("n_tokens"),
      nDistinct.cast("long").as("n_distinct"),
      // raw doubles, deliberately un-rounded: each is one deterministic
      // division/product, bit-identical in Spark and DuckDB — rounding is
      // what diverges (Spark rounds the shortest decimal string HALF_UP,
      // DuckDB rounds the binary value; exact ties like 0.25375 split)
      (nStop.cast("double") / nToks).as("stopword_ratio"),
      (nDistinct.cast("double") / nToks).as("ttr"),
      ((nChars - nToks + 1).cast("double") / nToks).as("avg_token_len"),
      // Composite quality: long enough, lexically diverse, not stopword soup.
      (least(nToks.cast("double") / 100.0, lit(1.0)) *
        (nDistinct.cast("double") / nToks) *
        (lit(1.0) - nStop.cast("double") / nToks)).as("quality_score"))
  }

  /** Token counting: whitespace tokens plus a BPE-ish sub-token estimate
    * (runs of letters, digits, or single other symbols — the common
    * pre-tokenizer regex shape). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toks).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
        .cast("long").as("re_tokens"),
      // crude BPE budget: ~1 token per 4 chars, ceil
      ceil(length(col("text")).cast("double") / 4.0).cast("long").as("bpe_est"))

  /** Heuristic language ID: score = count of function-word hits per language;
    * predicted language = argmax (ties broken by language code order). */
  def langScores(docs: DataFrame): DataFrame = {
    val scores = FunctionWords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words.map(lit(_)): _*)))
      struct(hits.cast("long").as("score"), lit(lang).as("lang"))
    }
    docs.select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      greatest(scores: _*).getField("lang").as("pred_lang"),
      greatest(scores: _*).getField("score").as("pred_score"))
  }

  /** Document fingerprinting: whole-document rolling hash plus a winnowing
    * -style minimum over all 8-char window hashes (Schleimer et al. '03,
    * "local" fingerprint that survives small edits). Requires
    * `GraftFunctions.register(spark)` (uses hash31 inside a SQL lambda). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      graft.functions.GraftFunctions.hash31(col("text"), 1000003L).as("fp_full"),
      expr(
        """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
          |  i -> hash31(substring(text, i, 8), 1000003)))""".stripMargin)
        .as("fp_winnow"))
}
