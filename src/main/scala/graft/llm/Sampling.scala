package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.hash31

/** Deterministic sampling for corpus construction.
  *
  * A 100 TB pretraining build samples per stratum (language, source,
  * quality band) with different rates — and the selection must be
  * DETERMINISTIC so reruns, audits, and incremental rebuilds keep the same
  * documents (`rand()`-based sampling re-rolls every run and every retry of
  * a failed task). Selection here is the reference's own fault-injection
  * primitive (`shouldDrop`, `src/changefeed/model.ts:100-104`) pointed at
  * doc ids: keep iff `hash31(id) % 100 < floor(rate·100)` — a pure per-row
  * projection, no shuffle, reproducible in any engine with the same hash.
  */
object Sampling {

  /** Keep-decision column: stratum-dependent deterministic Bernoulli.
    * `rates` maps stratum value → keep rate in [0, 1] (floor(rate·100)
    * percent resolution — the reference's `shouldDrop` scaling). */
  def stratifiedKeep(
      idCol: Column,
      strataCol: Column,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): Column = {
    def keep(rate: Double): Column =
      hash31(idCol.cast("string")) % 100 < lit(math.floor(rate * 100).toLong)
    rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(false))) { case (acc, (s, r)) =>
        acc.when(strataCol === s, keep(r))
      }
      .otherwise(keep(defaultRate))
  }

  /** Per-stratum sampling report over `documents`: total, kept, and the
    * applied rate — the audit table a sampled corpus ships with. One scan,
    * one partial-agg shuffle keyed by the (low-cardinality) stratum. */
  def stratifiedSummary(
      docs: DataFrame,
      rates: Map[String, Double],
      defaultRate: Double = 0.0): DataFrame = {
    val kept = stratifiedKeep(col("doc_id"), col("lang"), rates, defaultRate)
    docs
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(kept, 1)).as("n_kept"))
      .withColumn("kept_frac",
        col("n_kept").cast("double") / col("n_docs"))
  }

  /** Domain-mixture sampling weights — temperature-scaled source mixing
    * (the multilingual-sampling / data-mixture recipe: sample domain d with
    * probability ∝ n_d^α, α < 1 flattening the head so low-resource domains
    * are upweighted; Conneau & Lample 2019 §3.1 use the same form for
    * languages). α is fixed at 1/2: `sqrt` is an exactly-rounded IEEE op in
    * every engine, where a libm `pow(x, 0.7)` may differ in the last ulp
    * between JVM and C++.
    *
    * Oracle-exact at any parallelism: per-source token sums are BIGINT
    * (associative), the sqrt is quantized to an integer grid
    * (`floor(sqrt·2^20)` — the same trick as the IVF k-means means) so the
    * cross-source total is again an exact BIGINT sum, and each output
    * fraction is ONE double division of two exact integers. No
    * re-associated floating-point sums anywhere.
    *
    * Shape at 100 TB: one scan, one partial-agg shuffle keyed by the
    * low-cardinality source, then a 1-row broadcast of the totals. */
  /** Materialize the temperature-mixture corpus: turn [[mixtureWeights]]'
    * α=1/2 weights into per-source keep rates against a token budget,
    * sample deterministically ([[stratifiedKeep]]'s hash grid), and emit
    * the audit table the build ships with — per source: inputs, target,
    * applied rate, and what the sample actually achieved.
    *
    * All integer-exact: target_i = targetTokens·s_i div Σs (BIGINT
    * products of exact integers), rate = min(100, 100·target div
    * n_tokens) on the same percent grid as the reference's `shouldDrop`.
    * A weight that calls for MORE than 1× a source (upsampling the tail)
    * caps at rate 100 — duplication is epoch repetition at training time,
    * not a storage operation — and the audit's kept_tokens vs
    * target_tokens shows the shortfall instead of hiding it. kept_tokens
    * differs from target by sampling variance; that, too, is the point of
    * shipping the audit.
    *
    * Shape: one source-keyed partial agg (rates), one broadcast of the
    * |sources|-row rate table back onto the corpus stream, one more
    * source-keyed partial agg (audit). The corpus is scanned twice and
    * never shuffled on anything higher-cardinality than `source`. */
  def materializeMixture(docs: DataFrame, targetTokens: Long): DataFrame = {
    val perSource = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_toks").as("n_tokens"))
      .withColumn("_s",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1048576.0)).cast("long"))
    val totals = perSource.agg(sum("_s").as("_tot_s"))
    val rates = perSource.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr(s"CAST($targetTokens AS BIGINT) * _s div _tot_s").as("target_tokens"))
      .withColumn("rate_pct",
        least(lit(100L), expr("100 * target_tokens div n_tokens")))
    val kept = docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("_toks"))
      .join(broadcast(rates.select("source", "rate_pct")), "source")
      .filter(hash31(col("doc_id").cast("string")) % 100 < col("rate_pct"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("_toks").as("kept_tokens"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("rate_pct"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .withColumn("fill_frac",
        when(col("target_tokens") > 0,
          col("kept_tokens").cast("double") / col("target_tokens")))
  }

  /** Deterministic weighted priority sampling — k winners per source with
    * inclusion probability increasing in document weight (token count):
    * the "exponential race" shape of Efraimidis–Spirakis A-Res, made
    * integer-exact so any engine reproduces the same sample. Each doc's
    * priority is `(hash31(doc_id)·2²⁰) div n_tokens` — a BIGINT division
    * of exact integers (hash < 2³⁰, so the product is < 2⁵⁰; no float
    * `u^(1/w)` and its libm `pow` divergence) — and the k smallest
    * priorities per source win, ties broken by doc_id. A heavier doc
    * divides its hash by more, lands lower, wins more often; rerunning,
    * re-partitioning or rebuilding one source never changes a winner.
    *
    * Shape at 100 TB: priority is a pure projection; per-source top-k is
    * a source-keyed window — and because only k rows per source survive,
    * the production form pre-filters with a per-partition local top-k
    * before the shuffle (Spark's TakeOrderedAndProject does exactly this
    * for the global case). */
  def prioritySample(docs: DataFrame, k: Int = 10,
      modulus: Long = 1073741789L): DataFrame = {
    val weighted = docs.select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val prioritized = weighted
      .withColumn("_hp", hash31(col("doc_id").cast("string"), modulus) * lit(1048576L))
      .withColumn("priority", expr("_hp div n_tokens"))
    val w = Window.partitionBy("source").orderBy(col("priority"), col("doc_id"))
    prioritized
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_tokens"), col("priority"))
  }

  /** Deterministic train/val/test assignment — the split a 100 TB corpus
    * build must make REPRODUCIBLY: re-running the pipeline, adding a
    * source, or rebuilding one partition must never move a document
    * between splits (a val document leaking into train on a rebuild is
    * silent contamination). Assignment is a pure projection of the
    * document id — `hash31(doc_id) % 100` against cumulative percent
    * cutoffs — so it is stable under re-partitioning, retries, and
    * incremental rebuilds, and any engine with the same hash reproduces
    * it.
    *
    * Returns the per-(source, split) audit: document and token counts and
    * the realized fraction vs the requested one — the table a split ships
    * with so drift from the hash grid's granularity is visible, not
    * assumed away.
    *
    * Shape: one scan, one partial-agg shuffle on the low-cardinality
    * (source, split) key. The assignment column itself (`splitFor`) is
    * shuffle-free and composes into any downstream write
    * (`partitionBy("split")`). */
  def splitFor(idCol: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    val h = hash31(idCol.cast("string")) % 100
    when(h < trainPct, "train")
      .when(h < trainPct + valPct, "val")
      .otherwise("test")
  }

  def splitSummary(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame =
    docs
      .select(col("source"),
        splitFor(col("doc_id"), trainPct, valPct).as("split"),
        size(split(col("text"), " ")).cast("long").as("_toks"))
      .groupBy("source", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_toks").as("n_tokens"))
      .withColumn("frac_docs",
        col("n_docs").cast("double") /
          sum("n_docs").over(Window.partitionBy("source")))

  def mixtureWeights(docs: DataFrame): DataFrame = {
    val perSource = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("_toks"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("_toks").as("n_tokens"))
      .withColumn("_s",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1048576.0)).cast("long"))
    val totals = perSource.agg(
      sum("n_tokens").as("_tot_tokens"), sum("_s").as("_tot_s"))
    perSource.crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("_tot_tokens")).as("raw_share"),
        (col("_s").cast("double") / col("_tot_s")).as("mix_weight"),
        ((col("_s").cast("double") / col("_tot_s")) /
          (col("n_tokens").cast("double") / col("_tot_tokens"))).as("upsample"))
  }

  /** Curriculum mixture schedule — the data-scheduling half of mixture
    * design: per training phase `s ∈ [0, steps)`, the per-source sampling
    * weight interpolates linearly from the NATURAL token share (phase 0
    * matches the corpus, cheap early tokens) to the UNIFORM share
    * `1/n_sources` (final phase equalizes the rare sources — the standard
    * temperature-annealing endpoint at τ → ∞). `frac = s/(steps-1)` and
    * `w = raw + (uniform − raw)·frac` are each a fixed chain of IEEE
    * ops on exact integer inputs, bit-stable across engines; expected
    * tokens per (phase, source) is one further multiply against the
    * per-phase budget `total_tokens/steps`.
    *
    * Shape: one source-keyed partial agg + a 1-row totals broadcast,
    * then a constant `steps`-element `sequence` explode on the (tiny)
    * per-source frame — the corpus is scanned once, nothing wide ever
    * touches per-document rows. */
  def mixSchedule(docs: DataFrame, steps: Int = 5): DataFrame = {
    require(steps >= 2, "a schedule needs at least a start and an end phase")
    val perSource = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("_toks"))
      .groupBy("source")
      .agg(sum("_toks").as("n_tokens"))
    val totals = perSource.agg(
      sum("n_tokens").as("_tot"), count(lit(1)).as("_n_src"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("phase", explode(sequence(lit(0), lit(steps - 1))))
      .withColumn("_raw", col("n_tokens").cast("double") / col("_tot"))
      .withColumn("_uni", lit(1.0) / col("_n_src"))
      .withColumn("_frac", col("phase").cast("double") / lit((steps - 1).toDouble))
      .withColumn("weight", col("_raw") + (col("_uni") - col("_raw")) * col("_frac"))
      .withColumn("phase_tokens",
        col("weight") * (col("_tot").cast("double") / lit(steps.toDouble)))
      .select(col("phase").cast("long").as("phase"), col("source"),
        col("n_tokens"), col("weight"), col("phase_tokens"))
  }
}
