package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document sliding-window chunking — the retrieval/fine-tuning
  * counterpart of [[Packing]]'s concatenate-then-split: each document is
  * cut into fixed-size token windows with overlap (RAG indexing, long-doc
  * SFT, embedding-model input prep all consume this shape).
  *
  * Window starts step by `stride` (< `size` ⇒ `size - stride` tokens of
  * overlap between consecutive chunks); the last chunk may be short, and
  * every token of the document lands in at least one chunk.
  *
  * Scale shape: the whole operator is one projection + one `posexplode`
  * over a per-row `sequence` — embarrassingly parallel, no shuffle, no
  * state; output size is `Σ ceil` over documents, linear in corpus tokens.
  * Chunk payloads are emitted as md5 digests (computed at the scan, before
  * the explode multiplies rows) so the plan's shuffle-free property is
  * also a small-output property; a production sink would write the chunk
  * text or token ids instead.
  *
  * Tokenization is the corpus-wide ws contract (`split(text, ' ')`) shared
  * with `text_tokens` and `pack_plan`, so chunk counts reconcile across
  * the three views.
  */
object Chunking {

  /** Exploded chunk plan: one row per (doc, window). `n_chunks(n) =
    * 1 + ceil(max(0, n - size) / stride)` — exact integer arithmetic in
    * doubles far below 2⁵³, identical in the DuckDB oracle. */
  def chunkPlan(docs: DataFrame, size: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= size,
      s"chunkPlan requires 0 < stride <= size (got size=$size, stride=$stride): " +
        "stride > size would silently drop the tokens between windows")
    val toks = docs.select(
      col("doc_id"),
      split(col("text"), " ").as("toks"))
    val counted = toks
      .withColumn("n_tokens", org.apache.spark.sql.functions.size(col("toks")).cast("long"))
      .withColumn(
        "n_chunks",
        (lit(1L) + ceil(greatest(col("n_tokens") - size, lit(0L)).cast("double") / stride)
          .cast("long")))
    counted
      .select(
        col("doc_id"), col("toks"), col("n_tokens"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumnRenamed("col", "chunk_idx")
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("n_tok", least(lit(size.toLong), col("n_tokens") - col("start_tok")))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        col("start_tok"),
        col("n_tok"),
        md5(array_join(
          slice(col("toks"), (col("start_tok") + 1).cast("int"), col("n_tok").cast("int")),
          " ")).as("chunk_md5"))
  }

  /** Per-source chunking ledger over [[chunkPlan]] — the capacity view a
    * chunked index is provisioned from: chunk counts, emitted-token volume
    * (overlap counted once per emission, so `emitted / corpus` is the
    * duplication factor the overlap costs), and mean window fill. One
    * partial-agg reduction over the shuffle-free plan. */
  def chunkStats(docs: DataFrame, size: Int = 64, stride: Int = 48): DataFrame =
    chunkPlan(docs, size, stride)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).as("emitted_tokens"))
      .select(
        col("source"), col("n_docs"), col("n_chunks"), col("emitted_tokens"),
        (col("emitted_tokens").cast("double") / (col("n_chunks") * size)).as("mean_fill"))
}
