package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.CdcOps
import graft.llm.{Clusters, Corpus, Dedup, Multimodal}
import graft.sources.Tables

/** Shared helpers of the `SparkEntry` trait chain: the CDC ops feed and the
  * once-per-JVM persisted index builders every domain file reuses. Bottom
  * link of the chain (split from the single-file SparkEntry by the round-12
  * verdict's directive #7 — the Oracles.scala recipe). */
private[graft] trait SparkEntryBase {

  private[graft] def ops(s: SparkSession, dir: String): DataFrame = CdcOps.ops(s, dir)
  private[graft] def st(s: SparkSession, dir: String): DataFrame = CdcOps.withState(ops(s, dir))

  /** Near-dup cluster index for `dir`: star contraction run once per JVM,
    * persisted as parquet, shared by every consumer (dedup_clusters_persisted,
    * corpus_filter's funnel). */
  private[graft] def clusterIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"clusters:$dir") { d =>
      val docs = Tables.documents(s, dir)
      Clusters.indexWrite(docs, Dedup.scalableCandidates(docs), d)
    }

  /** Standing admission signature index for `dir` (corpus = doc_id%10!=0,
    * the same split `corpus_admission` and `dedup_incremental` use): built
    * once per JVM, persisted as parquet, so every admission batch times
    * only its own row-wise work + the signature join — the production
    * amortization (the index build is a full corpus scan + shuffle; the
    * gate is not). */
  private[graft] def admissionIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"admission:$dir") { d =>
      // bucketed layout (round 14): partitioned by sig_bucket so the
      // fixed-batch gate (corpus_admission_batch) prunes its read to the
      // partitions the batch's signatures hash into; the proportional
      // corpus_admission reads it whole (the partition column is dropped
      // by the gate) — same rows either way. Bucket count sized to the
      // corpus (round 15): a fixed 512 wrote hundreds of near-empty files
      // at sf0.1 whose open overhead was the unpruned gate's measured
      // constant; the count is recorded with the index (sidecar +
      // column metadata) so the pruned gate always folds with it.
      // Auto-sized form (round 16): ONE corpus scan — the index frame is
      // built once and its own row count sizes the fold, instead of a
      // corpus.count() pre-pass that both rescanned the corpus and
      // overestimated index rows (duplicate signatures collapse).
      val corpus = Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 0)
      Corpus.writeAdmissionIndexAutoSized(corpus, d)
      ()
    }

  /** Incrementally-maintained admission index for `dir`: base index built
    * from the doc_id%10 ∈ {2..9} slice, then the %10 == 1 slice MERGED in
    * via [[Corpus.updateAdmissionIndex]] (dynamic partition overwrite of
    * only the affected sig_bucket partitions). The final rows must be
    * identical to the full rebuild over doc_id%10 != 0 — which is exactly
    * what the `corpus_admission_incremental` oracle checks: it reuses the
    * full-corpus admission SQL, so any divergence between incremental
    * maintenance and rebuild (a dropped signature, a wrong min-owner
    * merge, an unrewritten partition) is a hash mismatch. */
  private[graft] def admissionIncrIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"admission_incr:$dir") { d =>
      val docs = Tables.documents(s, dir)
      Corpus.writeAdmissionIndexAutoSized(
        docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1), d)
      Corpus.updateAdmissionIndex(s, d, docs.filter(col("doc_id") % 10 === 1))
      ()
    }

  /** Admission index grown through increments THEN re-bucketed: base built
    * (auto-sized) from the doc_id%10 ∈ {3..9} slice, the %10 == 1 and
    * %10 == 2 slices merged in as two successive
    * [[Corpus.updateAdmissionIndex]] increments (the fold stays the
    * base-build count), then [[Corpus.rebucketAdmissionIndex]] re-folds
    * the grown index to its own auto-size. Rows must equal the full
    * rebuild over doc_id%10 != 0 — the `corpus_admission_rebucket` oracle
    * reuses the full-corpus admission SQL, so a dropped row, a wrong
    * re-fold, or a stale sidecar after the swap is a hash mismatch. */
  private[graft] def admissionRebucketIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"admission_rebucket:$dir") { d =>
      val docs = Tables.documents(s, dir)
      Corpus.writeAdmissionIndexAutoSized(
        docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1 &&
          col("doc_id") % 10 =!= 2), d)
      Corpus.updateAdmissionIndex(s, d, docs.filter(col("doc_id") % 10 === 1))
      Corpus.updateAdmissionIndex(s, d, docs.filter(col("doc_id") % 10 === 2))
      Corpus.rebucketAdmissionIndex(s, d)
      ()
    }

  /** Admission index maintained by CONCURRENT append-only delta segments,
    * then compacted: base built (auto-sized) from the doc_id%10 ∈ {3..9}
    * slice, the %10 == 1 and %10 == 2 slices published as two
    * [[Corpus.appendAdmissionDelta]] segments — the multi-writer path
    * (each writer owns its own immutable sibling directory; neither reads
    * the other's state, so publication order cannot matter) — and
    * [[Corpus.compactAdmissionIndex]] absorbs both into the base. Rows
    * must equal the full rebuild over doc_id%10 != 0: the
    * `corpus_admission_concurrent` oracle reuses the full-corpus
    * admission SQL, so a dropped segment, a wrong min-owner fold, or an
    * unabsorbed bucket is a hash mismatch. True thread-level concurrency
    * (two appenders racing) is drilled in CorpusHealthSpec. */
  private[graft] def admissionConcurrentIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"admission_concurrent:$dir") { d =>
      val docs = Tables.documents(s, dir)
      Corpus.writeAdmissionIndexAutoSized(
        docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1 &&
          col("doc_id") % 10 =!= 2), d)
      Corpus.appendAdmissionDelta(s, d, docs.filter(col("doc_id") % 10 === 1))
      Corpus.appendAdmissionDelta(s, d, docs.filter(col("doc_id") % 10 === 2))
      Corpus.compactAdmissionIndex(s, d)
      ()
    }

  /** Admission index with PENDING (uncompacted) delta segments: same base
    * and two appended segments as [[admissionConcurrentIndexDir]] but the
    * compaction has not run yet — the state a gate reads between a
    * writer's publish and the next maintenance cycle. The gate must see
    * the full corpus through [[Corpus.readAdmissionIndexFolded]] (base ∪
    * deltas, min-folded after the bucket prune): the
    * `corpus_admission_delta_gate` oracle is the full-rebuild admission
    * SQL, so a missed segment or a wrong fold is a hash mismatch. */
  private[graft] def admissionDeltaIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"admission_delta:$dir") { d =>
      val docs = Tables.documents(s, dir)
      Corpus.writeAdmissionIndexAutoSized(
        docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1 &&
          col("doc_id") % 10 =!= 2), d)
      // segments are SIBLINGS of the cached dir (the layout's concurrency
      // guarantee) — IndexCache's shutdown cleanup only covers d, so the
      // pending segments register their own
      Seq(Corpus.appendAdmissionDelta(s, d, docs.filter(col("doc_id") % 10 === 1)),
          Corpus.appendAdmissionDelta(s, d, docs.filter(col("doc_id") % 10 === 2)))
        .foreach { p =>
          sys.addShutdownHook {
            val root = java.nio.file.Paths.get(p)
            if (java.nio.file.Files.exists(root)) {
              import scala.jdk.CollectionConverters._
              java.nio.file.Files.walk(root).iterator().asScala.toSeq
                .reverseIterator
                .foreach(f => java.nio.file.Files.deleteIfExists(f))
            }
          }
          ()
        }
      ()
    }

  /** Stored media column for `dir`: the corpus PNG-encoded ONCE per JVM
    * (ingest-time work in a real pipeline), so the mm_* decode paths read
    * stored bytes and time decode+process, not re-encode. */
  private[graft] def mediaIndexDir(s: SparkSession, dir: String): String =
    graft.sources.IndexCache.dirFor(s"media:$dir") { d =>
      Multimodal.encodeCorpus(Tables.documents(s, dir))
        .write.mode("overwrite").parquet(d)
    }
}
