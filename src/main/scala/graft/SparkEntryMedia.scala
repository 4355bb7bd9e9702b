package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.cdc._
import graft.functions.GraftFunctions
import graft.llm.{Chunking, Clusters, Corpus, Dedup, Multimodal, Packing, Pii, Sampling, TextAnalysis}
import graft.llm.Similarity
import graft.operators.{AsOfJoin, RangeJoin, SaltedJoin, Sessions}
import graft.sources.{DebeziumSource, Tables}

/** Multimodal (image/audio/video payload) queries — one link of the ordered `SparkEntry` trait
  * chain (split from the single-file map by the round-12 verdict's
  * directive #7, the Oracles.scala recipe: pure relocation, the
  * `queries` map API and every entry body unchanged). */
private[graft] trait SparkEntryMedia extends SparkEntryText {
  private[graft] def mediaQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> ((s, dir) =>
      // real decode over the STORED media column (encoded once per JVM —
      // ingest-time work): project the oracle-predictable decoded
      // properties (dims + pixel sum); payload size/hash depend on the
      // deflate stream and stay API-only
      Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir)))
        .select("doc_id", "width", "height", "n_frames", "sum_red")
        .orderBy("doc_id")),
    // perceptual aHash over the decoded raster — the oracle recomputes the
    // same 64 bits arithmetically from the payload generator's contract
    "mm_phash" -> ((s, dir) =>
      Multimodal.aHash(s.read.parquet(mediaIndexDir(s, dir))).orderBy("doc_id")),
    // image near-dup pairs: 8×8-bit banded equality join (full recall to
    // Hamming 7 by pigeonhole) + exact popcount verify — never all-pairs
    "mm_phash_dups" -> ((s, dir) =>
      Multimodal.phashDups(
        Multimodal.aHash(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("a_id", "b_id")),
    // Hamming threshold sweep over the verified pair set: exact to d=7 by
    // the pigeonhole band bound, an 8-row rollup on top of the same join
    "mm_phash_threshold" -> ((s, dir) =>
      Multimodal.phashThresholdCurve(
        Multimodal.aHash(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("threshold")),
    // image near-dup cluster-size histogram: the SAME star contraction
    // the text dedup uses, fed the banded phash pair set
    "mm_phash_clusters" -> ((s, dir) => {
      val media = s.read.parquet(mediaIndexDir(s, dir))
      val hashes = Multimodal.aHash(media)
      // doc ids off the index scan — the hash frame's lineage is the
      // full-corpus decode
      Clusters.sizeHistogram(Clusters.assign(
        media.select(col("doc_id")),
        Multimodal.phashDups(hashes).select("a_id", "b_id")))
        .orderBy("cluster_size")
    }),
    // modality mix over the DECODED metadata (stills vs clips vs video by
    // real decoded frame count): item + pixel-mass shares — the GPU-hour
    // budget split of a multimodal corpus
    "mm_modality_mix" -> ((s, dir) =>
      Multimodal.modalityMix(
        Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("modality")),
    // per-modality brightness/shape envelope off the real decoded
    // rasters (corpus normalization stats); oracle re-derives the cyclic
    // pixel sums arithmetically — decode verified end-to-end again
    "mm_pixel_profile" -> ((s, dir) =>
      Multimodal.pixelProfile(
        Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("modality")),
    // frame-level reclaim from clip near-dup dedup: phash clusters priced
    // in frames (keep min-doc member per cluster)
    "mm_frame_dedup" -> ((s, dir) =>
      Multimodal.frameDedupLedger(s.read.parquet(mediaIndexDir(s, dir)))),
    // SCALE-path twins (the r12 second-decade rehearsal caught the 8-bit
    // bands' n²/512 pair join at exponent 1.24-1.34 — these ride
    // phashDupsWide: 16-bit bands + hot-bucket cap + star edges, the
    // prescribed default past ~100k images; Hamming ≤ 3 contract)
    "mm_phash_clusters_capped" -> ((s, dir) => {
      val media = s.read.parquet(mediaIndexDir(s, dir))
      val hashes = Multimodal.aHash(media)
      Clusters.sizeHistogram(Clusters.assign(
        media.select(col("doc_id")),
        Multimodal.phashDupsWide(hashes).select("a_id", "b_id")))
        .orderBy("cluster_size")
    }),
    "mm_frame_dedup_capped" -> ((s, dir) =>
      Multimodal.frameDedupLedgerCapped(
        s.read.parquet(mediaIndexDir(s, dir)))),
    // the standing-pipeline form: the aHash table persists like the
    // ivf:/pq: indexes, so the corpus decodes ONCE PER SNAPSHOT and every
    // later dedup pass is a 4-longs-per-image parquet scan. Identical
    // result to mm_phash_clusters_capped (aHash is deterministic) — one
    // oracle pins both paths, the ann_ivf_persisted pattern.
    "mm_phash_clusters_persisted" -> ((s, dir) => {
      val media = s.read.parquet(mediaIndexDir(s, dir))
      val hashDir = graft.sources.IndexCache.dirFor(s"mmhash:$dir")(d =>
        Multimodal.aHash(media).write.mode("overwrite").parquet(d))
      val hashes = s.read.parquet(hashDir)
      Clusters.sizeHistogram(Clusters.assign(
        media.select(col("doc_id")),
        Multimodal.phashDupsWide(hashes).select("a_id", "b_id")))
        .orderBy("cluster_size")
    }),
    // aspect-ratio bucketed batching ledger off the DECODED dims: nearest
    // ladder rung by exact integer cross-multiplied distance, letterbox
    // padding waste per bucket (the image twin of pack_padding_waste)
    "mm_aspect_buckets" -> ((s, dir) =>
      Multimodal.aspectBuckets(
        Multimodal.metaFromPayloads(s.read.parquet(mediaIndexDir(s, dir))))
        .orderBy("bucket")),

    // ------------------------------------------------ evaluate / consumer / hash,
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.frameSample(Tables.documents(s, dir)).orderBy("doc_id", "frame_idx")),
    "mm_resize" -> ((s, dir) =>
      Multimodal.resizeFromPayloads(s.read.parquet(mediaIndexDir(s, dir)))
        .orderBy("doc_id")),
  )
}
