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

/** Embedding similarity / ANN / quantization / chunking queries — one link of the ordered `SparkEntry` trait
  * chain (split from the single-file map by the round-12 verdict's
  * directive #7, the Oracles.scala recipe: pure relocation, the
  * `queries` map API and every entry body unchanged). */
private[graft] trait SparkEntryAnn extends SparkEntryDedup {
  private[graft] def annQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine_topk" -> ((s, dir) =>
      Similarity.cosineTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // embedding-table health checks — run BEFORE any index is built:
    // per-label norm envelope (dead head / bad batch tell) ...
    "emb_norm_profile" -> ((s, dir) =>
      Similarity.normProfile(Tables.embeddings(s, dir)).orderBy("label")),
    // ... anisotropy: mean cosine to the corpus centroid (the cone
    // pathology that decides centering/whitening) ...
    "emb_centroid_cone" -> ((s, dir) =>
      Similarity.centroidCone(Tables.embeddings(s, dir))),
    // ... and the per-dimension variance ledger (dead/dominant dims)
    "emb_dim_variance" -> ((s, dir) =>
      Similarity.dimVariance(Tables.embeddings(s, dir)).orderBy("pos")),
    // hard-negative mining: per probe, top-k most-similar vectors of a
    // DIFFERENT label — the near-miss negatives contrastive training needs
    "ann_hard_negatives" -> ((s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // pre-filter vs post-filter recall for metadata-filtered search: the
    // table that says when to over-fetch k or push the filter into the index
    "ann_filtered_recall" -> ((s, dir) =>
      Similarity.filteredSearchAudit(Tables.embeddings(s, dir)).orderBy("q_id")),
    // the fix, measured: recall recovered by over-fetching k'=k..8k before
    // filtering — one scored stream, one rank, the sweep as conditional counts
    "ann_overfetch_curve" -> ((s, dir) =>
      Similarity.overfetchCurve(Tables.embeddings(s, dir))
        .orderBy("q_id", "fetch_k")),
    // int8 scalar quantization (4x vector bytes): scales cancel in cosine,
    // so the quantized score is integer-exact and hash-stable by design
    "ann_quantized_topk" -> ((s, dir) =>
      Similarity.quantizedTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    "ann_quantized_recall" -> ((s, dir) =>
      Similarity.quantizedRecall(Tables.embeddings(s, dir)).orderBy("q_id")),
    // product quantization: m=4 subspace codebooks + ADC lookup scoring —
    // the 64x-compression scan (m code bytes per candidate, no float reads)
    "ann_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // PQ codebook-utilization health check: per-subspace code loads
    "ann_pq_balance" -> ((s, dir) =>
      Similarity.pqBalance(Tables.embeddings(s, dir)).orderBy("s")),
    // recall@{1,3,5} of the ADC scan vs exact float top-k, one pass
    "ann_pq_recall_curve" -> ((s, dir) =>
      Similarity.pqRecallCurve(Tables.embeddings(s, dir)).orderBy("k")),
    // IVF list-balance health check: hot/starved lists before probe tuning
    "ann_ivf_balance" -> ((s, dir) =>
      Similarity.ivfBalance(Tables.embeddings(s, dir)).orderBy("list_id")),
    "ann_pq_recall" -> ((s, dir) =>
      Similarity.pqRecall(Tables.embeddings(s, dir)).orderBy("q_id")),
    // PQ coarse scan -> exact float rescore: the recall-repair composition
    // PQ serving ships (coarseK float dots per query, never a corpus scan)
    "ann_pq_rerank" -> ((s, dir) =>
      Similarity.pqRerank(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // standing PQ index: codebooks + 32x-compressed code table on parquet,
    // built once per JVM; queries never touch the float corpus. Same
    // codebooks => row-identical to ann_pq_topk, same oracle pins it
    "ann_pq_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"pq:$dir")(d =>
        Similarity.pqIndexWrite(emb, d))
      val (cb, codes) = Similarity.pqIndexLoad(s, idxDir)
      Similarity.pqPersistedTopK(emb, cb, codes).orderBy("q_id", "rnk")
    }),
    // IVF-SQ composition: coarse quantizer prunes the scan, int8 codes
    // shrink the list payloads — the knobs multiply at corpus scale
    "ann_ivfsq_topk" -> ((s, dir) =>
      Similarity.ivfSqTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // packed-code form: 64-byte binary codes on parquet (the realized 4x
    // compression), built once per JVM, scored byte-level via Int8Dot —
    // row-identical to the array form, pinned by the same oracle
    "ann_quantized_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"sq:$dir")(d =>
        Similarity.quantizedIndexWrite(emb, d))
      Similarity.quantizedPersistedTopK(Similarity.quantizedIndexLoad(s, idxDir))
        .orderBy("q_id", "rnk")
    }),
    // IVF-PQ: the FAISS-shape composed index — coarse lists prune the
    // scan, ADC lookups score the probed candidates at ~3% of float bytes
    "ann_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // IVF-PQ off BOTH standing indexes: probe the persisted centroids,
    // score persisted codes in the probed lists — zero training in-plan
    "ann_ivfpq_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val ivfDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val pqDir = graft.sources.IndexCache.dirFor(s"pq:$dir")(d =>
        Similarity.pqIndexWrite(emb, d))
      val (centroids, lists) = Similarity.ivfIndexLoad(s, ivfDir)
      val (cb, codes) = Similarity.pqIndexLoad(s, pqDir)
      Similarity.ivfPqPersistedTopK(emb, centroids, lists, cb, codes)
        .orderBy("q_id", "rnk")
    }),
    // two-stage retrieval: int8 coarse top-20 re-scored by exact float
    // cosine — the serving shape; winners keep their coarse rank so the
    // ledger shows where the quantized stage mis-ordered the head
    "ann_rerank" -> ((s, dir) =>
      Similarity.rerankTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // recall-vs-nProbe tuning curve probed against the PERSISTED index
    // (shared ivf:$dir IndexCache build with ann_ivf_persisted) — the
    // curve measures probing, not a per-invocation Lloyd re-train; the
    // in-memory ivfProbeCurve form stays as the build-included baseline
    // and both share one oracle by the centroid determinism contract
    "ann_probe_curve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val (centroids, lists) = Similarity.ivfIndexLoad(s, idxDir)
      Similarity.ivfProbeCurveFrom(emb, centroids, lists).orderBy("n_probe")
    }),
    // hybrid retrieval: exact-cosine and trigram-Jaccard top-10 fused by
    // reciprocal-rank 1/(60+rank) - rank arithmetic, no score mixing
    "search_hybrid_rrf" -> ((s, dir) =>
      Similarity.hybridRrfTopK(
        Tables.documents(s, dir), Tables.embeddings(s, dir))
        .orderBy("q_id", "rnk")),
    // semantic decontamination: nearest eval vector (every 17th, the
    // text_decontaminate convention) per corpus vector + threshold flag
    "ann_decontaminate" -> ((s, dir) =>
      Similarity.semanticDecontaminate(Tables.embeddings(s, dir))
        .orderBy("vec_id")),
    // the scale form: eval set FIXED (ids < 500) so only one join side
    // grows with the corpus - the fraction-of-corpus eval definition
    // above measured exponent 1.50 at the 10x rehearsal
    "ann_decontaminate_capped" -> ((s, dir) =>
      Similarity.semanticDecontaminate(Tables.embeddings(s, dir), evalCap = 500L)
        .orderBy("vec_id")),
    // matryoshka truncation sweep: recall of prefix-width cosine top-5 vs
    // the full width — the embedding-width serving tradeoff curve
    "ann_matryoshka" -> ((s, dir) =>
      Similarity.matryoshkaRecall(Tables.embeddings(s, dir)).orderBy("dims")),
    // sliding-window chunk plan (RAG/SFT prep): explode-only, shuffle-free
    "chunk_plan" -> ((s, dir) =>
      Chunking.chunkPlan(Tables.documents(s, dir)).orderBy("doc_id", "chunk_idx")),
    "chunk_stats" -> ((s, dir) =>
      Chunking.chunkStats(Tables.documents(s, dir)).orderBy("source")),
    "ann_lsh_buckets" -> ((s, dir) =>
      Similarity.lshBuckets(Tables.embeddings(s, dir)).orderBy("bucket")),
    // embedding-side incremental dedup: arrivals (vec_id % 10 == 0) flagged
    // against the standing banded index — same split as dedup_incremental
    "ann_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.incrementalNearDup(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0))
        .orderBy("vec_id")
    }),
    "ann_near_dup" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables.embeddings(s, dir)).orderBy("a_id", "b_id")),
    // SemDeDup (Abbas et al. 2023): k-means clusters, screen each member
    // against prior-ranked cluster-mates, keep the centroid-farthest copy
    "ann_semdedup" -> ((s, dir) =>
      Similarity.semDedup(Tables.embeddings(s, dir)).orderBy("vec_id")),
    // rank-banded SemDeDup screen: n*band work instead of sum(|cluster|^2)
    // - the prescribed scale default (exact form caught at exponent 1.40
    // in the 100x rehearsal; see SCALE.md)
    "ann_semdedup_capped" -> ((s, dir) =>
      Similarity.semDedupBanded(Tables.embeddings(s, dir)).orderBy("vec_id")),
    "ann_near_dup_banded" -> ((s, dir) =>
      Similarity.nearDupPairsBanded(Tables.embeddings(s, dir)).orderBy("a_id", "b_id")),
    // mutual k-NN graph over the banded LSH candidates: per-vector top-3
    // by exact cosine, edge kept iff BOTH endpoints rank each other
    "ann_knn_graph" -> ((s, dir) =>
      Similarity.knnGraph(Tables.embeddings(s, dir)).orderBy("a_id", "b_id")),
    // per-cluster size / label purity / quantized-mean cohesion over the
    // deterministic k-means index — the curation pass's topic view
    "ann_cluster_profile" -> ((s, dir) =>
      Similarity.clusterProfile(Tables.embeddings(s, dir)).orderBy("list_id")),

    // ------------------------------------------------ text analysis,
    "ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir)).orderBy("q_id", "rnk")),
    // the amortized build-once form: index written as parquet (lists
    // partitioned by list_id), loaded back, probed — results pinned to the
    // in-memory path by the shared oracle; the list_id equality join prunes
    // the probe to the probed partitions (DPP — asserted in DedupSpec)
    "ann_ivf_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // built ONCE per JVM per data dir (IndexCache) so repeated
      // invocations — bench reps included — time only load+probe, the
      // query's stated amortized contract; the temp dir is reclaimed at
      // JVM exit instead of leaking one per rep
      val idxDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val (centroids, lists) = Similarity.ivfIndexLoad(s, idxDir)
      Similarity.ivfProbe(emb.filter(col("vec_id") < 10), centroids, lists)
        .orderBy("q_id", "rnk")
    }),
    "ann_ivf_recall" -> ((s, dir) =>
      Similarity.ivfRecall(Tables.embeddings(s, dir)).orderBy("q_id")),
    // incremental index maintenance: a synthetic arrival batch (reversed
    // embeddings of vec_id < 50, offset ids — deterministic, not near
    // their sources) assigned to the PERSISTED centroids without any
    // retraining — the per-ingest-batch path; retraining is a periodic
    // rebuild. Shares the ivf:$dir IndexCache build with ann_ivf_persisted.
    "ann_ivf_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idxDir = graft.sources.IndexCache.dirFor(s"ivf:$dir")(d =>
        Similarity.ivfIndexWrite(emb, d))
      val (centroids, _) = Similarity.ivfIndexLoad(s, idxDir)
      val arrivals = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
      Similarity.ivfIncrementalAssign(arrivals, centroids).orderBy("vec_id")
    }),
  )
}
