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

/** Text quality / corpus health / export / sampling queries — one link of the ordered `SparkEntry` trait
  * chain (split from the single-file map by the round-12 verdict's
  * directive #7, the Oracles.scala recipe: pure relocation, the
  * `queries` map API and every entry body unchanged). */
private[graft] trait SparkEntryText extends SparkEntryAnn {
  private[graft] def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langScores(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // Simpson concentration: exact-rational repetition filter (integer
    // pair counts, one division) — entropy's job without entropy's ulp drift
    "text_simpson" -> ((s, dir) =>
      TextAnalysis.simpsonConcentration(Tables.documents(s, dir)).orderBy("doc_id")),
    "text_gopher" -> ((s, dir) =>
      TextAnalysis.gopherStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // which Gopher rule does the work: per-rule alone/marginal removal in
    // docs and tokens, plus the composite 'any' row — one corpus pass
    "quality_ablation" -> ((s, dir) =>
      TextAnalysis.gopherAblation(Tables.documents(s, dir)).orderBy("rule")),
    // PII scrub over deterministically augmented text (the synthetic corpus
    // carries no PII-shaped tokens, so the query plants a known mix —
    // identically in the oracle — and the scrubber must count and redact it).
    "text_pii" -> ((s, dir) => {
      val aug = Tables.documents(s, dir).select(
        col("doc_id"),
        concat(
          col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".com"),
          repeat(
            concat(lit(" tel 555-"),
              lpad(((col("doc_id") * 37) % 10000).cast("string"), 4, "0")),
            (col("doc_id") % 3).cast("int")),
          repeat(
            concat(lit(" ip 10.0.0."), (col("doc_id") % 256).cast("string")),
            (col("doc_id") % 2).cast("int"))).as("text"))
      Pii.scrub(aug, "doc_id", "text").orderBy("doc_id")
    }),
    "vocab_topk" -> ((s, dir) =>
      TextAnalysis.vocabulary(Tables.documents(s, dir))
        .orderBy(col("n_occ").desc, col("tok"))),
    // sketch-then-recount heavy hitters: Misra–Gries candidates + exact
    // recount — deterministic output, so the vocab_topk oracle pins it
    "vocab_topk_sketch" -> ((s, dir) =>
      TextAnalysis.vocabularySketch(Tables.documents(s, dir))
        .orderBy(col("n_occ").desc, col("tok"))),
    // KMV distinct sketch beside the exact count: the bounded-state
    // replacement for countDistinct at scale, bit-deterministic (min-k is
    // a pure function of the input set) so the estimate oracles exactly
    "vocab_kmv" -> ((s, dir) =>
      TextAnalysis.kmvShingleDistinct(Tables.documents(s, dir)).orderBy("source")),
    // per-source OOV rate against the corpus top-20 vocabulary head
    "vocab_oov" -> ((s, dir) =>
      TextAnalysis.oovStats(Tables.documents(s, dir)).orderBy("source")),
    // power-of-two length-bucketed batching ledger: the padding waste the
    // bucket-and-pad batching shape pays vs pack_plan's concatenation
    "batch_buckets" -> ((s, dir) =>
      Packing.lengthBuckets(Tables.documents(s, dir)).orderBy("bucket")),
    // integer-exact weighted priority sampling: k winners per source,
    // inclusion odds proportional-ish to token count, reproducible anywhere
    "sample_priority" -> ((s, dir) =>
      Sampling.prioritySample(Tables.documents(s, dir)).orderBy("source", "rnk")),
    // deterministic per-source uniform k-sample (the order-free reservoir):
    // bottom-k by doc-id hash within each source
    "sample_reservoir" -> ((s, dir) =>
      Sampling.reservoirSample(Tables.documents(s, dir)).orderBy("source", "rnk")),
    // deterministic training-shard shuffle: hash31-keyed shard + in-shard
    // position, reproducible under re-partitioning and incremental rebuilds
    "export_shards" -> ((s, dir) =>
      Sampling.shardAssign(Tables.documents(s, dir)).orderBy("shard", "pos")),
    // the balance ledger a shard write ships with: per-shard doc/token
    // mass and each shard's token share vs the uniform target
    "export_shard_stats" -> ((s, dir) =>
      Sampling.shardStats(Tables.documents(s, dir)).orderBy("shard")),
    // per-shard write manifest: order-free content checksum + positional
    // stream checksum, both exact BIGINT sums on the 2^20 digest grid
    "export_manifest" -> ((s, dir) =>
      Sampling.exportManifest(Tables.documents(s, dir)).orderBy("shard")),
    // DSIR-style importance scoring (Xie et al. 2023) with a rational
    // affinity (integer word-mass sums, one division) in place of the
    // log-likelihood ratio, so the oracle compares bit-exactly
    "sample_importance" -> ((s, dir) =>
      Sampling.importanceAffinity(Tables.documents(s, dir)).orderBy("doc_id")),
    // the resampling half: top-50 by (affinity desc, doc_id) with strata
    "sample_importance_top" -> ((s, dir) =>
      Sampling.importanceResample(Tables.documents(s, dir)).orderBy("rnk")),
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, dir))
        .orderBy("doc_id", "rnk")),
    // BM25 (rational idf) top-10 for the query {stream, hash, window}
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(Tables.documents(s, dir),
        Seq("stream", "hash", "window"))),
    // bigram-LM fluency scoring (the CCNet perplexity-filter stage):
    // train on the hash31 half-slice, score every doc in fixed point
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.lmScore(Tables.documents(s, dir)).orderBy("doc_id")),
    // linear quality-classifier gate (fastText-style filter; sign of a
    // fixed left-to-right IEEE chain over the bit-exact quality features)
    "quality_logit" -> ((s, dir) =>
      TextAnalysis.qualityLogit(Tables.documents(s, dir)).orderBy("doc_id")),
    // corpus snapshot diff: v_old drops doc_id%11==0, v_new drops
    // doc_id%7==0 and revises the text of doc_id%13==0 — every status
    // branch (added/removed/modified/unchanged) exercised deterministically
    "corpus_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val vOld = docs.filter(col("doc_id") % 11 =!= 0)
      val vNew = docs.filter(col("doc_id") % 7 =!= 0).select(
        col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      Corpus.snapshotDiff(vOld, vNew).orderBy("doc_id")
    }),
    // the streaming admission controller in batch form: same %10 split as
    // dedup_incremental; quality sign-gate + PII threshold + dedup gate
    // against the PERSISTED corpus signature index (built once per JVM per
    // data dir — reps time the arrivals' row-wise work + join only)
    "corpus_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.admissionGateWithIndex(
        docs.filter(col("doc_id") % 10 === 0),
        Corpus.readAdmissionIndex(s, admissionIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    // the PRODUCTION admission shape: a FIXED micro-batch (doc_id < 2000,
    // replica-0 rows on every rehearsal slice) against the corpus-sized
    // standing index — the bucket-pruned read is what keeps per-batch
    // admission O(batch), not O(corpus), as the corpus grows
    "corpus_admission_batch" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // readAdmissionIndex restores the recorded bucket count, so the
      // prune folds batch signatures with the index's own write-time count
      Corpus.admissionGatePruned(
        docs.filter(col("doc_id") % 10 === 0 && col("doc_id") < 2000),
        Corpus.readAdmissionIndex(s, admissionIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    // the index-WRITE-path twin of the pruned gate: the standing index is
    // maintained INCREMENTALLY (base snapshot + one merged ingest
    // increment, only affected partitions rewritten) and the gate runs
    // against it — the oracle is the full-rebuild admission SQL, so
    // incremental maintenance == rebuild is checked row-exactly
    "corpus_admission_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.admissionGatePruned(
        docs.filter(col("doc_id") % 10 === 0),
        Corpus.readAdmissionIndex(s, admissionIncrIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    // the index-MAINTENANCE-lifecycle twin: grown through two increments
    // under the frozen base fold, then RE-BUCKETED to its own auto-size
    // (the split op needsRebucket's criterion calls for) — the oracle is
    // again the full-rebuild admission SQL, so increments + re-fold +
    // sidecar swap must be row-identical to a rebuild
    "corpus_admission_rebucket" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.admissionGatePruned(
        docs.filter(col("doc_id") % 10 === 0),
        Corpus.readAdmissionIndex(s, admissionRebucketIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    // the MULTI-WRITER maintenance twin: two ingest increments published
    // as append-only delta segments (the lock-free concurrent path —
    // updateAdmissionIndex is single-writer by contract) and compacted
    // back into the base; the oracle is the full-rebuild admission SQL,
    // so a dropped segment or a wrong min-owner fold is a hash mismatch
    "corpus_admission_concurrent" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.admissionGatePruned(
        docs.filter(col("doc_id") % 10 === 0),
        Corpus.readAdmissionIndex(s, admissionConcurrentIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    // the BETWEEN-compactions read path: the same two segments still
    // pending, the gate reading base ∪ deltas min-folded AFTER the bucket
    // prune (the sig_bucket filter pushes below the fold into every
    // segment's scan, so the read stays O(touched partitions)) — again
    // oracled against the full-rebuild admission SQL
    "corpus_admission_delta_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Corpus.admissionGatePruned(
        docs.filter(col("doc_id") % 10 === 0),
        Corpus.readAdmissionIndexFolded(s, admissionDeltaIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    "corpus_filter" -> ((s, dir) =>
      // funnel consumes the persisted cluster index (built once per JVM
      // per data dir) instead of re-running the star contraction
      Corpus.filterFunnel(Tables.documents(s, dir),
        clusterIndex = Some(Clusters.indexLoad(s, clusterIndexDir(s, dir))))
        .orderBy("doc_id")),
    "quality_percentiles" -> ((s, dir) =>
      Corpus.qualityPercentiles(Tables.documents(s, dir)).orderBy("source")),
    // token-budget selection: best-first by classifier logit until the
    // budget fills — cumsum via GlobalOrder.runningSum, never a
    // single-partition window
    "corpus_token_budget" -> ((s, dir) =>
      Corpus.tokenBudget(Tables.documents(s, dir)).orderBy("cum_tokens")),
    // per-source ingestion-order budget gate: the ingest-time quota (the
    // streaming twin carries the same running total as keyed state)
    "corpus_budget_by_source" -> ((s, dir) =>
      Corpus.sourceBudget(Tables.documents(s, dir)).orderBy("source", "doc_id")),
    // n-gram novelty: fraction of a doc's trigrams first seen in it —
    // the marginal-contribution ranking signal for sources and documents
    "text_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // char-collision diversity (Rényi-2 surrogate): integer sums + one
    // division, no transcendentals — bit-stable across engines
    "text_char_stats" -> ((s, dir) =>
      TextAnalysis.charStats(Tables.documents(s, dir)).orderBy("doc_id")),
    // pre-training data-quality profile of the corpus table
    "corpus_profile" -> ((s, dir) =>
      Corpus.profile(Tables.documents(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("col_name")),
    // quality-decile × duplication cross-ledger off the persisted cluster
    // index: is low quality where the duplicates live?
    "quality_vs_dup" -> ((s, dir) =>
      Corpus.qualityVsDup(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("decile")),
    // quality-gate threshold sweep: docs/tokens retained per candidate
    // cutoff in one corpus pass - the knee picks the gate
    "quality_threshold_sweep" -> ((s, dir) =>
      Corpus.qualityThresholdSweep(Tables.documents(s, dir))
        .orderBy("threshold")),
    // source x quality-band matrix: which source ships the junk — read
    // before setting per-source admission rates
    "quality_source_matrix" -> ((s, dir) =>
      TextAnalysis.sourceQualityMatrix(Tables.documents(s, dir))
        .orderBy("source", "band")),
    // dedup-first vs filter-first retention, same gates and cluster index:
    // filter-first can only rescue (measured), never drop
    "corpus_funnel_order" -> ((s, dir) =>
      Corpus.funnelOrder(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("source")),
    // length-distribution drift between even/odd source slices: per
    // bucket integer ppm rates and absolute drift (the shift pager)
    "corpus_drift" -> ((s, dir) =>
      Corpus.lengthDrift(Tables.documents(s, dir)).orderBy("bucket")),

    // ------------------------------------------------ multimodal plumbing,
  )
}
