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

/** Dedup / sampling / mixing / split / vocab / packing queries — one link of the ordered `SparkEntry` trait
  * chain (split from the single-file map by the round-12 verdict's
  * directive #7, the Oracles.scala recipe: pure relocation, the
  * `queries` map API and every entry body unchanged). */
private[graft] trait SparkEntryDedup extends SparkEntryEvents {
  private[graft] def dedupQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactStats(Tables.documents(s, dir)).orderBy("lang")),
    "dedup_exact_keep" -> ((s, dir) =>
      Dedup.exactKeep(Tables.documents(s, dir)).orderBy("keep_id")),
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(Tables.documents(s, dir)).orderBy("doc_id")),
    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashCandidates(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // the two-stage recall→precision pipeline: banded-LSH candidates,
    // exact trigram Jaccard computed on the candidate pairs only
    // the scale form: hot-bucket guard on the banded candidates — the
    // 10x rehearsal measured the uncapped pair set growing quadratically
    // (SCALE.md); cap 32 restores linear growth with stated recall trade
    "dedup_verify_capped" -> ((s, dir) =>
      Dedup.verifyCandidates(Tables.documents(s, dir),
          maxBucket = Dedup.DefaultMaxBucket)
        .orderBy("a_id", "b_id")),
    "dedup_verify_candidates" -> ((s, dir) =>
      Dedup.verifyCandidates(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // character-level verbatim spans ≥60 chars via rolling 40-char window
    // hashes (the Lee et al. 2021 dedup family, as a hash-window join)
    "dedup_substring" -> ((s, dir) =>
      Dedup.substringSpans(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // the content-defined-sampling branch (hash ≡ 0 mod 8 anchors, extent
    // semantics) — the form a beyond-O(chars) corpus would actually run
    "dedup_substring_sampled" -> ((s, dir) =>
      Dedup.substringSpans(Tables.documents(s, dir), anchorMod = 8L)
        .orderBy("a_id", "b_id")),
    // the cleaning artifact: shared spans excised from the later doc,
    // unaffected docs pass through verbatim. Per-SEGMENT contract (row per
    // kept segment, md5-verified) — row-sorted comparison needs no ordered
    // reassembly on either side; the full-text form is DedupSpec-pinned.
    "dedup_substring_clean" -> ((s, dir) =>
      Dedup.substringCleanSegments(Tables.documents(s, dir))
        .orderBy("doc_id", "seg_idx")),
    "dedup_cross_source" -> ((s, dir) =>
      Dedup.crossSourceMatrix(Tables.documents(s, dir)).orderBy("source_a", "source_b")),
    "dedup_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Clusters.assign(docs, Dedup.scalableCandidates(docs)).orderBy("doc_id")
    }),
    // the amortized build-once form: star contraction persisted as a
    // (doc_id, cluster_id, cluster_size) parquet index, loaded back —
    // pinned to the in-memory path by the shared oracle
    "dedup_clusters_persisted" -> ((s, dir) => {
      Clusters.indexLoad(s, clusterIndexDir(s, dir)).orderBy("doc_id")
    }),
    // cluster-size distribution off the persisted index: the retention-
    // policy ledger, no re-contraction in-plan
    "dedup_cluster_sizes" -> ((s, dir) =>
      Clusters.sizeHistogram(Clusters.indexLoad(s, clusterIndexDir(s, dir)))
        .orderBy("cluster_size")),
    // daily-increment split: every 10th doc arrives as the new batch
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalFlags(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
        .orderBy("doc_id")
    }),
    // same contract as dedup_incremental but through the STREAMING gate's
    // row-wise projected signatures (ingestGate run in batch mode — the
    // stream-static join plan is what a live feed executes per micro-batch)
    "dedup_ingest_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.ingestGate(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
        .orderBy("doc_id")
    }),
    // the PRODUCTION live-admission shape: a fixed micro-batch gated
    // against the PERSISTED bucketed signature index with per-batch
    // bucket pruning — what each foreachBatch invocation of a live feed
    // executes; reads O(batch) index partitions, not O(corpus)
    "dedup_ingest_gate_pruned" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.ingestGateWithIndex(
        docs.filter(col("doc_id") % 10 === 0 && col("doc_id") < 2000),
        Corpus.readAdmissionIndex(s, admissionIndexDir(s, dir)))
        .orderBy("doc_id")
    }),
    "dedup_keep_best" -> ((s, dir) =>
      Dedup.keepBestByQuality(Tables.documents(s, dir)).orderBy("keep_id")),
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSummary(
        Tables.documents(s, dir), Map("en" -> 0.5, "de" -> 0.25), 0.1).orderBy("lang")),
    "mix_weights" -> ((s, dir) =>
      Sampling.mixtureWeights(Tables.documents(s, dir)).orderBy("source")),
    // curriculum schedule: per-phase weights annealing from the natural
    // token share to uniform-across-sources over 5 training phases
    "mix_schedule" -> ((s, dir) =>
      Sampling.mixSchedule(Tables.documents(s, dir)).orderBy("phase", "source")),
    // UniMax (Chung et al. 2023): equal-share token allocation under an
    // explicit per-source repeat cap — integer water-filling boundary,
    // one double division for the open equal share
    "mix_unimax" -> ((s, dir) =>
      Sampling.unimaxAllocation(Tables.documents(s, dir)).orderBy("source")),
    // temperature-scaled mixing (tau = 1/2 via IEEE-exact sqrt, integer-
    // quantized weights): the smooth low-resource up-weighting rule
    "mix_temperature" -> ((s, dir) =>
      Sampling.temperatureAllocation(Tables.documents(s, dir))
        .orderBy("source")),
    // the mixture MATERIALIZED: per-source keep rates against a 20k-token
    // budget, deterministic hash sample, audit of achieved vs target
    "mix_materialize" -> ((s, dir) =>
      Sampling.materializeMixture(Tables.documents(s, dir), 20000L).orderBy("source")),
    // deterministic 90/5/5 train/val/test assignment (hash-grid, stable
    // under rebuilds) with the per-(source, split) audit table
    "split_assign" -> ((s, dir) =>
      Sampling.splitSummary(Tables.documents(s, dir)).orderBy("source", "split")),
    // cluster-aware split: hash the near-dup CLUSTER id so no duplicate
    // pair straddles train/eval; leaked_pairs measured (0) beside the
    // doc-hash counterfactual — the contamination the guard prevented
    "split_leakage_guard" -> ((s, dir) =>
      Sampling.leakageGuardSplit(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("split")),
    // the guard's audit on the full grid: same-cluster pairs per
    // split x split cell under the naive doc-hash assignment (train x
    // test off-diagonal = the eval-invalidating leak), integer-exact
    // from member counts - no pair materialized
    "split_contamination_matrix" -> ((s, dir) =>
      Sampling.contaminationMatrix(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir)))
        .orderBy("split_a", "split_b")),
    // cluster-aware k-fold: fold hashes the near-dup CLUSTER id, so no
    // CV fold's held-out slice contains a paraphrase of another fold's
    // training data; per-fold balance ledger vs the uniform 1/k target
    "split_kfold_clustered" -> ((s, dir) =>
      Sampling.kfoldClustered(Tables.documents(s, dir),
        Clusters.indexLoad(s, clusterIndexDir(s, dir))).orderBy("fold")),
    "dedup_winnow" -> ((s, dir) =>
      Dedup.winnowCandidates(Tables.documents(s, dir)).orderBy("fp_winnow")),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.documents(s, dir)).orderBy("doc_id")),
    // 3-gram shingles: on this 31-word vocabulary 2-grams are saturated
    // (73M join rows at sf0.1); trigrams are selective (2.8M) and isolate
    // exactly the planted near-duplicate pairs
    "dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), n = 3, threshold = 0.8).orderBy("a_id", "b_id")),
    // overlap coefficient |A∩B|/min(|A|,|B|): the quote/boilerplate-
    // inclusion detector Jaccard's union-dilution misses
    "dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), n = 3, threshold = 0.8)
        .orderBy("a_id", "b_id")),
    // duplicate-rate sweep: pair/doc counts at each candidate threshold —
    // the tuning curve read before fixing a dedup threshold; pairs are
    // computed once at the loosest cut and fanned out by a 5-row broadcast
    "dedup_threshold_curve" -> ((s, dir) =>
      Dedup.thresholdCurve(Tables.documents(s, dir)).orderBy("threshold")),
    // the scale form: same sweep over capped banded candidates + verified
    // trigram jaccard (the exact all-pairs join measured exponent 1.17 at
    // the 10x rehearsal; this one rides the linear capped-candidate path)
    "dedup_threshold_curve_capped" -> ((s, dir) =>
      Dedup.thresholdCurveCapped(Tables.documents(s, dir)).orderBy("threshold")),
    // sketch calibration: minhash Jaccard estimate vs the exact same-gram
    // Jaccard on every capped banded candidate pair
    "dedup_minhash_calibration" -> ((s, dir) =>
      Dedup.minhashCalibration(Tables.documents(s, dir)).orderBy("a_id", "b_id")),
    // directed source-level n-gram containment matrix: which feed mirrors
    // which — per-shingle fanout bounded by n_sources², never doc-pairwise
    "dedup_source_overlap" -> ((s, dir) =>
      Dedup.sourceOverlap(Tables.documents(s, dir)).orderBy("source_a", "source_b")),
    // Bloom ingest gate: corpus digests fold into one broadcastable 8 KB
    // bitmask; arrivals screened row-wise, exact join audits the filter
    "dedup_bloom_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.bloomGate(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0)).orderBy("doc_id")
    }),
    // cumulative exact-dup rate by ingest-order decile: the curve that
    // says whether dedup investment grows with the crawl
    "dedup_growth_curve" -> ((s, dir) =>
      Dedup.growthCurve(Tables.documents(s, dir)).orderBy("bucket")),
    // Heaps-law vocabulary growth: new-type yield per ingest decile and
    // the running type/token ratio - the vocabulary-side twin of the curve
    "vocab_growth" -> ((s, dir) =>
      TextAnalysis.vocabGrowth(Tables.documents(s, dir)).orderBy("bucket")),
    // Zipf ledger: types and token mass per frequency octave (integer-
    // exact floor(log2) via binary-string length) - the power-law check
    "vocab_zipf" -> ((s, dir) =>
      TextAnalysis.zipfBuckets(Tables.documents(s, dir)).orderBy("octave")),
    // top-N vocabulary token-coverage curve: the tokenizer budget question
    "vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, dir)).orderBy("n_top")),
    // top-20 bigram collocations by pointwise lift (transcendental-free
    // PMI ordering): the merge-candidate / templated-phrase miner
    "vocab_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(Tables.documents(s, dir)).orderBy("rnk")),
    // per-source subword/word fertility: the tokenizer-health audit
    "vocab_subword_fertility" -> ((s, dir) =>
      TextAnalysis.subwordFertility(Tables.documents(s, dir))
        .orderBy("source")),
    // LSH (bands x rows) design ledger: empirical bucket profile + pair
    // volumes (from group sizes - no pair materialized) + S-curve p
    "dedup_lsh_tuning" -> ((s, dir) =>
      Dedup.lshTuning(Tables.documents(s, dir)).orderBy(col("bands").desc)),
    // first BPE merge-round: corpus-wide adjacent char-pair frequencies
    // weighted by word occurrence - the distributed tokenizer-training step
    // apply the round-1 winner and recount: the merge iteration runs on
    // the weighted type table, never re-touching the corpus
    "bpe_merge_apply" -> ((s, dir) =>
      TextAnalysis.bpeMergeApply(Tables.documents(s, dir))
        .orderBy(col("pair_count").desc, col("pair"))),
    "bpe_pairs" -> ((s, dir) =>
      TextAnalysis.bpePairStats(Tables.documents(s, dir))
        .orderBy(col("pair_count").desc, col("pair"))),
    // CCNet-style line dedup on fixed 10-word blocks: per-doc fraction
    // of blocks whose exact text repeats anywhere in the corpus
    "dedup_blocks" -> ((s, dir) =>
      Dedup.blockDedup(Tables.documents(s, dir)).orderBy("doc_id")),

    // benchmark decontamination: eval set = every 17th doc; flag corpus
    // docs sharing any 13-gram with it (GPT-3 appendix-C methodology)
    "text_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.contamination(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0))
        .orderBy("doc_id")
    }),

    // context-window packing plan: concat-then-split at 512 tokens via a
    // distributed prefix sum (GlobalOrder.runningSum — no global window)
    "pack_plan" -> ((s, dir) =>
      Packing.packPlan(Tables.documents(s, dir)).orderBy("doc_id")),
    "pack_efficiency" -> ((s, dir) =>
      Packing.packEfficiency(Tables.documents(s, dir))),
    // window-size sweep off ONE prefix-sum pass: the context-length table
    "pack_efficiency_curve" -> ((s, dir) =>
      Packing.packEfficiencyCurve(Tables.documents(s, dir))
        .orderBy("window_tokens")),
    // the cost of NOT packing: per length-octave pad-token bill under
    // one-doc-per-sequence training — read next to pack_efficiency's fill
    "pack_padding_waste" -> ((s, dir) =>
      Packing.paddingWaste(Tables.documents(s, dir)).orderBy("octave")),

    // ------------------------------------------------ similarity search,
  )
}
