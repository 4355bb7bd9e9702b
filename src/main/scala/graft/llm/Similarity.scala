package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the `embeddings` table
  * (`vec_id, embedding: array<float>, label`).
  *
  * - `cosineTopK`: brute-force exact top-k — the correctness baseline. The
  *   dot product runs inside codegen via `zip_with` + `aggregate`; candidate
  *   generation broadcasts the (small) query set against the (huge) corpus,
  *   and per-query top-k uses a window rank after a partial `filter`, so the
  *   corpus is streamed once, never collected.
  * - `lshBuckets`: signed-random-projection LSH (Charikar '02) — the scale
  *   path: each vector maps to an `nPlanes`-bit bucket; near neighbors land
  *   in equal buckets and are found with an equality join instead of a scan.
  *   Projection directions are a deterministic rational lattice so the
  *   DuckDB oracle reproduces them exactly.
  * - `nearDupPairs`: embedding-cosine near-duplicate detection via the LSH
  *   buckets (candidate generation) + exact cosine verification.
  */
object Similarity {

  /** Sum of element-wise products as double — deterministic left-to-right
    * fold, identical evaluation order in Spark and the oracle. Native
    * codegen'd expression (`functions.ArrayDot`): higher-order functions
    * are CodegenFallback, which made every scoring row pay interpreted
    * lambda dispatch per dimension. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.arrayDot(a, b)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact cosine top-`k` neighbors for the `nQueries` lowest vec_ids. */
  def cosineTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val queries = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val cand = withNorm.select(
      col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos").as("cos_sim"))
  }

  /** Hard-negative mining for contrastive embedding training: for each of
    * the `nQueries` lowest vec_ids, the `k` most-similar vectors whose
    * `label` DIFFERS from the query's — the near-miss negatives that teach
    * the margin (a random negative is trivially far; the hard ones sit
    * just across the class boundary). The join predicate is the label
    * mismatch itself, so same-label rows never reach scoring.
    *
    * Same shape as [[cosineTopK]]: the query set broadcasts, the corpus
    * streams once through a codegen'd `ArrayDot`, and per-query top-k is
    * a window rank over the per-query candidate stream. At 100 TB the
    * production form swaps the exact scan for the IVF/LSH candidate path
    * with the label filter applied to the probed lists — the mining
    * predicate composes unchanged. */
  /** Filtered-search recall audit — vector search's pre-filter vs
    * post-filter question as a measured table: a metadata-filtered query
    * ("top-k most similar WITH my label") answered by filtering AFTER a
    * global top-k keeps only the same-label rows that survived — a
    * subset of the pre-filter truth (the global top-k's same-label rows
    * are exactly the best same-label rows, so recall is the count
    * surviving over the truth size). Per query: the label pool size,
    * how many same-label rows the global top-k retained, and the recall
    * — the table that says when k must be over-fetched or the filter
    * pushed into the index (IVF list pruning composes with the label
    * predicate exactly like [[hardNegatives]]' mining predicate).
    *
    * Shape: the corpus streams ONCE through the codegen'd dot against
    * the broadcast query set; one window rank (global) over the scored
    * stream; the audit is a conditional per-query aggregate. Exact
    * integers + one IEEE division. */
  def filteredSearchAudit(emb: DataFrame, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("label"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val queries = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val cand = withNorm.select(
      col("vec_id").as("n_id"), col("label").as("n_label"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .groupBy("q_id", "q_label")
      .agg(
        count(when(col("n_label") === col("q_label"), 1)).as("n_label_pool"),
        count(when(col("n_label") === col("q_label") && col("rnk") <= k, 1))
          .as("n_in_global_topk"))
      .select(col("q_id"), col("q_label"), col("n_label_pool"),
        col("n_in_global_topk"),
        (col("n_in_global_topk").cast("double") /
          least(lit(k.toLong), col("n_label_pool"))).as("postfilter_recall"))
  }

  /** Over-fetch tuning curve — [[filteredSearchAudit]]'s fix, measured:
    * post-filtering recovers recall by over-fetching the global top-k'
    * (k' = k, 2k, 4k, 8k) before applying the label filter. One row per
    * (query, k') with the survivors and recall, ALL off the same scored
    * stream and the same single window rank — the sweep is conditional
    * counts on `rnk ≤ k'`, never a re-scan per factor (the
    * threshold-curve discipline).
    *
    * Read the curve, pick the smallest k' whose recall is acceptable —
    * or conclude the filter must push into the index. */
  def overfetchCurve(emb: DataFrame, nQueries: Int = 10,
      k: Int = 5, factors: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("label"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val queries = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val cand = withNorm.select(
      col("vec_id").as("n_id"), col("label").as("n_label"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val ranked = scored
      .withColumn("rnk", row_number().over(w))
      .groupBy("q_id", "q_label")
      .agg(
        count(when(col("n_label") === col("q_label"), 1)).as("_pool"),
        factors.map(f =>
          count(when(col("n_label") === col("q_label") &&
            col("rnk") <= k * f, 1)).as(s"_kept_$f")): _*)
    ranked
      .select(col("q_id"), col("q_label"), col("_pool"),
        explode(array(factors.map(f =>
          struct(lit(k.toLong * f).as("fetch_k"),
            col(s"_kept_$f").as("n_kept"))): _*)).as("_r"))
      .select(col("q_id"), col("q_label"), col("_r.fetch_k").as("fetch_k"),
        col("_r.n_kept").as("n_kept"),
        (col("_r.n_kept").cast("double") /
          least(lit(k.toLong), col("_pool"))).as("recall"))
  }

  def hardNegatives(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("label"), col("embedding"), norm(col("embedding")).as("nrm"))
    val queries = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val cand = withNorm.select(
      col("vec_id").as("n_id"), col("label").as("n_label"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), col("q_label") =!= col("n_label"))
      .withColumn("cos", dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("q_label"), col("rnk").cast("long").as("rnk"),
        col("n_id"), col("n_label"), col("cos").as("cos_sim"))
  }

  /** Deterministic pseudo-random projection direction for plane `j`: Knuth
    * multiplicative lattice → uniform in [-0.5, 0.5). Computed once in
    * Scala and embedded as a LITERAL array, so each per-row projection is a
    * single codegen'd `ArrayDot` instead of a per-element interpreted
    * lambda regenerating the lattice. Same integers, same doubles as the
    * oracle's formula. */
  private def planeVector(j: Int, dims: Int): Seq[Double] =
    Seq.tabulate(dims)(i =>
      (((j * dims + i + 1).toLong * 2654435761L) % 1000L).toDouble / 1000.0 - 0.5)

  /** Signed-random-projection bucket id (one bit per plane). */
  def lshBucket(embCol: Column, nPlanes: Int = 8, dims: Int = 64): Column =
    (0 until nPlanes).map { j =>
      val proj = dot(embCol, typedlit(planeVector(j, dims)))
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucket histogram — the partition-shape view of the LSH index. */
  def lshBuckets(emb: DataFrame, nPlanes: Int = 8): DataFrame =
    emb
      .select(col("vec_id"), lshBucket(col("embedding"), nPlanes).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"))

  /** Rank all centroids per input vector by cosine (deterministic tie-break
    * on c_id); ranks ≤ nProbe = probe set. Sort-window shape — use only on
    * small inputs (the query set); assignment over the corpus goes through
    * [[assignNearest]]. */
  private def rankCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vectors.join(broadcast(centroids), col("vec_id").isNotNull)
      .withColumn("c_cos", dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
    val w = Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("c_id"))
    scored.withColumn("c_rank", row_number().over(w))
  }

  /** The centroid table folded to ONE sorted-array row (ascending c_id —
    * c_id leads the struct, so `array_sort` orders by it), ready to ride a
    * 1-row broadcast into a per-row argmax projection. */
  private def centArray(centroids: DataFrame): DataFrame =
    centroids.agg(array_sort(collect_list(
      struct(col("c_id"), col("c_emb"), col("c_nrm")))).as("_cands"))

  /** Nearest centroid per vector as a per-row PROJECTION (round-17): the
    * former `join(broadcast(centroids)) → groupBy(vec_id).max_by` shape
    * fanned every corpus row ×nLists and folded it back through a
    * corpus-sized hash Exchange; the codegen'd [[graft.functions.NearestCentroid]]
    * argmax over the broadcast centroid ARRAY computes the identical winner
    * (same `dot/(nrm·c_nrm)` arithmetic, same SQLOrderingUtil double
    * ordering, same smaller-c_id tie-break) with zero Exchange and zero row
    * fan-out. No null guard: the expression is null only for an EMPTY
    * centroid array (unreachable — the seed is the first nLists corpus
    * vectors), and a guard would be pushed into the broadcast join
    * condition, evaluating the argmax twice per row. Returns
    * (vec_id, list_id, embedding, nrm). */
  private def assignNearest(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centArray(centroids)))
      .withColumn("_best", graft.functions.GraftFunctions.nearestCentroid(
        col("embedding"), col("nrm"), col("_cands")))
      .select(col("vec_id"), col("_best.c_id").as("list_id"),
        col("embedding"), col("nrm"))

  /** Lloyd's k-means over the corpus, deterministically seeded with the
    * first `nLists` vectors. Each iteration: assign every vector to its
    * nearest (cosine) centroid — one broadcast join + codegen'd projection
    * over the corpus — then recompute centroids as per-list means.
    *
    * The mean is computed over QUANTIZED components: Σ floor(x·2²⁰) as
    * 64-bit integers, divided back once at the end. Integer sums are exact
    * and associative, so the result is bit-identical regardless of Spark's
    * partial-aggregation order AND reproducible in the DuckDB oracle —
    * float-sum means would make the index nondeterministic across runs.
    * (floor, not round: rounding has exact .5 ties on dyadic floats where
    * HALF_UP/HALF_EVEN engines diverge; floor has no ties.) The 2⁻²⁰
    * quantization error is orders below the float32 input precision.
    *
    * Scale shape per iteration: one broadcast of nLists centroids, one
    * corpus pass, one (list, dim)-keyed partial agg — no collect, no
    * quadratic term. Empty lists drop out (standard Lloyd behavior).
    */
  def kmeansCentroids(emb: DataFrame, nLists: Int = 16, iters: Int = 2): DataFrame = {
    val q = 1048576.0 // 2^20
    val withNorm = emb.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val seed = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_nrm"))
    (1 to iters).foldLeft(seed) { (cents, _) =>
      val assigned = assignNearest(withNorm, cents)
      val comps = assigned
        .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos")
        .agg(
          sum(floor(col("x").cast("double") * q)).as("s"),
          count(lit(1)).as("cnt"))
        .select(col("list_id"), col("pos"),
          (col("s").cast("double") / (lit(q) * col("cnt"))).as("comp"))
      comps.groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("comp")))).as("pc"))
        .select(col("list_id").as("c_id"),
          transform(col("pc"), p => p.getField("comp")).as("c_emb"))
        .withColumn("c_nrm", norm(col("c_emb")))
    }
  }

  /** IVF (inverted-file) ANN — the other classic scale path: a coarse
    * quantizer assigns every vector to its nearest centroid ("list"); a
    * query probes only the `nProbe` nearest lists and scores exactly within
    * them. Centroids come from `kmeansCentroids` (deterministic seed +
    * quantized-mean Lloyd, `kmeansIters` rounds; 0 = raw seed vectors), so
    * the oracle reproduces the index bit-for-bit.
    *
    * Scale shape: centroids broadcast (tiny); assignment is one codegen'd
    * projection over the corpus; the probe is an equality join on list id.
    * Corpus is never collected; per-list candidate sets shrink the scored
    * set by ~nLists/nProbe versus brute force.
    */
  def ivfTopK(emb: DataFrame, nLists: Int = 16, nProbe: Int = 4, nQueries: Int = 10, k: Int = 3,
      kmeansIters: Int = 2): DataFrame = {
    // nLists rows, but an iterated-aggregation lineage behind them — persist
    // so the assignment and probe branches build the index once, not twice
    val (centroids, assigned) = ivfIndexBuild(emb, nLists, kmeansIters)
    ivfProbe(emb.filter(col("vec_id") < nQueries), centroids, assigned, nProbe, k)
  }

  /** Build half of the IVF index: the k-means centroid table (tiny —
    * `nLists` rows) and the per-vector inverted-list assignment (one row per
    * corpus vector). Centroids are persisted in memory (iterated-aggregation
    * lineage; every consumer would otherwise rebuild the Lloyd rounds).
    *
    * A real pipeline builds this ONCE and amortizes it across every probe
    * batch — that is [[ivfIndexWrite]] / [[ivfIndexLoad]]: written as
    * parquet, the assignment side is `partitionBy(list_id)`, so a probe
    * reading `nProbe` of `nLists` lists prunes the scan to the probed
    * partitions (partition pruning on the equality join key) instead of
    * re-scoring the corpus.
    */
  def ivfIndexBuild(emb: DataFrame, nLists: Int = 16, kmeansIters: Int = 2): (DataFrame, DataFrame) = {
    val centroids = kmeansCentroids(emb, nLists, kmeansIters).persist()
    val withNorm = emb.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    (centroids, assignNearest(withNorm, centroids))
  }

  /** Build the IVF index and write it under `path` (`centroids/` +
    * `lists/` partitioned by list id). */
  def ivfIndexWrite(emb: DataFrame, path: String, nLists: Int = 16, kmeansIters: Int = 2): Unit = {
    val (centroids, assigned) = ivfIndexBuild(emb, nLists, kmeansIters)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/lists")
    centroids.unpersist()
  }

  /** Load a prebuilt IVF index written by [[ivfIndexWrite]]. */
  def ivfIndexLoad(spark: org.apache.spark.sql.SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/lists"))

  /** Incremental IVF update — assign a batch of NEW vectors to the
    * standing centroids without retraining: the index-maintenance path a
    * production ANN deployment runs per ingest batch (Lloyd retraining is
    * a periodic rebuild, not a per-batch cost). Emits one row per arrival
    * `(vec_id, list_id, cos_c)` — the appendable inverted-list delta.
    *
    * Shape at 100 TB: the nLists-row centroid table folds to one sorted
    * array and broadcasts; the arrivals stream through ONE codegen'd
    * argmax projection ([[assignNearest]]'s shape — no shuffle at all, an
    * ingest batch can be arbitrarily large). Same cosine + tie-break
    * (smaller c_id) as the build-time assignment, so the delta is exactly
    * what a rebuild would have produced. */
  def ivfIncrementalAssign(newVecs: DataFrame, centroids: DataFrame): DataFrame =
    newVecs
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(centArray(centroids)))
      .withColumn("_best", graft.functions.GraftFunctions.nearestCentroid(
        col("embedding"), col("nrm"), col("_cands")))
      .select(col("vec_id"), col("_best.c_id").as("list_id"),
        col("_best.c_cos").as("cos_c"))

  /** Per-cluster corpus profile over the deterministic k-means index — the
    * topic-distribution view a curation pass reads before deciding what to
    * keep: how big each cluster is, how label-pure it is (majority label +
    * distinct-label count), and how tight it is (mean member→centroid
    * cosine). SemDeDup-style pruning, mixture rebalancing, and outlier
    * triage all start from exactly this table.
    *
    * Cohesion is the mean of QUANTIZED cosines: Σ floor(cos·2²⁰) as BIGINT
    * (exact + associative under any partial-agg order), divided once at
    * the end — the same bit-stability recipe as the Lloyd means, so the
    * oracle reproduces it exactly. Majority label ties break on the
    * smaller label id.
    *
    * Shape at 100 TB: centroid training is the amortized
    * [[kmeansCentroids]]; the profile itself is ONE argmax projection over
    * the corpus scan (label rides the row — round-17 removed both the
    * centroid rejoin and the vec_id-keyed label self-join the old
    * aggregation shape forced), then two partial aggs whose keys shrink
    * to (list, label) and list. The projected `c_cos` is the argmax
    * winner's own cosine — the identical double the rejoin recomputed. */
  def clusterProfile(emb: DataFrame, nLists: Int = 16, kmeansIters: Int = 2): DataFrame = {
    val q = 1048576.0 // 2^20
    // consumed exactly once (the 1-row centArray fold) — no persist needed
    val centroids = kmeansCentroids(emb, nLists, kmeansIters)
    val member = emb
      .select(col("vec_id"), col("label"), col("embedding"),
        norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(centArray(centroids)))
      .withColumn("_best", graft.functions.GraftFunctions.nearestCentroid(
        col("embedding"), col("nrm"), col("_cands")))
      .select(col("vec_id"), col("label"), col("_best.c_id").as("list_id"),
        floor(col("_best.c_cos") * lit(q)).cast("long").as("qcos"))
    val byLabel = member.groupBy("list_id", "label")
      .agg(count(lit(1)).as("n"), sum("qcos").as("qsum"))
    byLabel.groupBy("list_id")
      .agg(
        sum("n").as("n_vecs"),
        count(lit(1)).as("n_labels"),
        max_by(struct(col("label"), col("n")),
          struct(col("n"), (-col("label")).as("neg"))).as("top"),
        sum("qsum").as("_qall"))
      .select(col("list_id"), col("n_vecs"), col("n_labels"),
        col("top.label").as("top_label"), col("top.n").as("top_label_n"),
        (col("_qall").cast("double") / (lit(q) * col("n_vecs"))).as("cohesion"))
  }

  /** Probe half of IVF: rank centroids per query (sort-window over the tiny
    * query×centroid cross — fine), keep the `nProbe` nearest lists, equality
    * join into the inverted lists, score exactly, per-query top-`k`.
    * `queries` needs (vec_id, embedding); `centroids`/`assigned` come from
    * [[ivfIndexBuild]] or [[ivfIndexLoad]] — with a loaded index the
    * `list_id` equality join prunes to the probed parquet partitions.
    */
  def ivfProbe(queries: DataFrame, centroids: DataFrame, assigned: DataFrame,
      nProbe: Int = 4, k: Int = 3): DataFrame = {
    val qNorm = queries.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val probes = rankCentroids(qNorm, centroids)
      .filter(col("c_rank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("c_id").as("list_id"))
    val lists = assigned.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      col("nrm").as("n_nrm"), col("list_id"))
    val scored = probes.join(lists, "list_id")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos").as("cos_sim"))
  }

  /** Recall@k of the IVF probe against the brute-force exact top-k — the
    * number a real ANN deployment watches: probing `nProbe` of `nLists`
    * lists trades exactly this much of the true neighbor set for the
    * ~nLists/nProbe scan reduction. Both sides are deterministic (exact
    * scoring, quantized-mean Lloyd), so the metric is oracle-checkable
    * bit-for-bit: per query, `n_hits` = |ivf top-k ∩ exact top-k| and
    * `recall_at_k` = n_hits/k (one small-integer division — bit-stable).
    *
    * Scale shape: the exact side is one corpus stream (the baseline you
    * run on a SAMPLE of queries, not all of them); the intersect is a
    * k·nQueries-row join — nothing beyond what the two operators already
    * pay. */
  def ivfRecall(emb: DataFrame, nLists: Int = 16, nProbe: Int = 4,
      nQueries: Int = 10, k: Int = 3, kmeansIters: Int = 2): DataFrame = {
    val exact = cosineTopK(emb, nQueries, k).select(col("q_id"), col("n_id"))
    val ivf = ivfTopK(emb, nLists, nProbe, nQueries, k, kmeansIters)
      .select(col("q_id"), col("n_id"))
    val hits = exact.intersect(ivf)
      .groupBy("q_id").agg(count(lit(1)).as("n_hits"))
    exact.select("q_id").distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / k).as("recall_at_k"))
  }

  /** Semantic deduplication — SemDeDup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * the LAION/DataComp curation recipe): cluster embeddings with k-means,
    * then within each cluster screen out every vector that is
    * ε-cosine-similar to a cluster-mate ranked before it, where the
    * ranking is ASCENDING similarity to the centroid — so of a duplicate
    * group, the member FARTHEST from the centroid survives (the paper's
    * keep-low-centroid-similarity choice: extreme points carry more
    * training signal than the cluster's dense middle).
    *
    * Screen rule, precisely: member x is dropped iff some cluster-mate y
    * with rank(y) < rank(x) has cos(x, y) ≥ eps — the one-pass variant of
    * the paper's screen (monotone in the rank order, so it is expressible
    * as a join + max aggregation and reproducible in the SQL oracle;
    * chained transitive removal would need recursion for marginal
    * difference). Rank ties break on vec_id; centroids are the
    * deterministic quantized-mean Lloyd ([[kmeansCentroids]]), so the
    * whole operator is bit-reproducible.
    *
    * Returns every vector with its cluster, rank, max similarity to any
    * prior-ranked cluster-mate (−1 when first), and the kept verdict.
    *
    * Scale shape: centroids broadcast; assignment is the one-shuffle
    * `max_by` aggregation; the screen is a list_id-keyed self-join whose
    * cost is Σ|cluster|²/2 — SemDeDup's documented cost, CONTROLLED by
    * nLists (size k ∝ corpus/target-cluster-size at 100 TB so clusters
    * stay ~10⁴-10⁵ and the quadratic term stays per-cluster-bounded, with
    * clusters parallelizing across the shuffle). On this synthetic
    * near-orthogonal corpus the meaningful band is ε ≈ 0.4 (the same
    * regime as [[nearDupPairs]]'s 0.45 threshold).
    */
  def semDedup(
      emb: DataFrame, nLists: Int = 16, eps: Double = 0.42,
      kmeansIters: Int = 2): DataFrame =
    semDedupImpl(emb, nLists, eps, kmeansIters, band = 0)

  /** Rank-BANDED SemDeDup — the prescribed form at scale. The exact
    * screen above compares every member against ALL prior ranks, so its
    * pair count is Σ|cluster|²/2: quadratic once clusters outgrow the
    * list count (the 100× rehearsal measured the fixed-nLists exact form
    * at second-decade exponent 1.40 — invisible at 10×, where clusters
    * were still small). This form screens each member against only the
    * `band` nearest PRIOR ranks in the centroid-cosine order — the
    * neighborhood where SemDeDup's duplicates actually sit, since
    * near-identical vectors get near-identical centroid cosines and
    * therefore adjacent ranks. Implemented as a true banded equality
    * join (rank-block key, each probe exploded to its two candidate
    * blocks), so join fanout is `2` rows per member and total work is
    * n·band — linear by construction, same shape as
    * [[nearDupPairsBanded]].
    *
    * Semantics: `max_prior_sim` is a LOWER bound of the exact screen's,
    * so `kept` is a SUPERSET — the band can only under-drop (miss a
    * far-rank duplicate), never over-drop. The exact form stays the
    * small-corpus baseline; production pairing documented in SCALE.md. */
  def semDedupBanded(
      emb: DataFrame, nLists: Int = 16, eps: Double = 0.42,
      kmeansIters: Int = 2, band: Int = 128): DataFrame = {
    require(band >= 1, s"band must be >= 1, got $band")
    semDedupImpl(emb, nLists, eps, kmeansIters, band)
  }

  private def semDedupImpl(
      emb: DataFrame, nLists: Int, eps: Double,
      kmeansIters: Int, band: Int): DataFrame = {
    val cents = kmeansCentroids(emb, nLists, kmeansIters)
    val withNorm = emb.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    // per-row argmax projection (round-17): same winner + cosine as the
    // former broadcast-join + max_by aggregation, minus its corpus Exchange
    val assigned = withNorm.crossJoin(broadcast(centArray(cents)))
      .withColumn("_best", graft.functions.GraftFunctions.nearestCentroid(
        col("embedding"), col("nrm"), col("_cands")))
      .select(col("vec_id"), col("_best.c_id").as("list_id"),
        col("embedding"), col("nrm"), col("_best.c_cos").as("c_cos"))
    val w = Window.partitionBy("list_id").orderBy(col("c_cos").asc, col("vec_id"))
    val memb = assigned.withColumn("rnk", row_number().over(w))
    val pairs =
      if (band <= 0) {
        val a = memb.select(col("list_id"), col("rnk").as("a_rnk"),
          col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
        val b = memb.select(col("list_id"), col("vec_id"), col("rnk").as("b_rnk"),
          col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
        a.join(b, Seq("list_id")).filter(col("a_rnk") < col("b_rnk"))
      } else {
        // banded: a rank window of `band` spans at most two rank-blocks,
        // so probing blocks {blk, blk−1} finds every in-window prior
        val a = memb.select(col("list_id"),
          expr(s"rnk div $band").as("_blk"), col("rnk").as("a_rnk"),
          col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
        val b = memb.select(col("list_id"), col("vec_id"), col("rnk").as("b_rnk"),
          col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
          .withColumn("_blk", explode(array(
            expr(s"b_rnk div $band"), expr(s"b_rnk div $band - 1"))))
        a.join(b, Seq("list_id", "_blk"))
          .filter(col("a_rnk") < col("b_rnk") &&
            col("a_rnk") >= col("b_rnk") - band)
      }
    val prior = pairs
      .groupBy("vec_id")
      .agg(max(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
        .as("mp"))
    memb.join(prior, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"), col("rnk"),
        coalesce(col("mp"), lit(-1.0)).as("max_prior_sim"),
        (coalesce(col("mp"), lit(-1.0)) < eps).as("kept"))
  }

  /** Near-duplicate pairs by embedding cosine ≥ `threshold`: LSH-bucketed
    * candidate generation (equality self-join on bucket) + exact re-check.
    * At 100 TB the bucket join replaces the quadratic scan; recall is tuned
    * by `nPlanes` (fewer planes → bigger buckets → higher recall) — but the
    * same knob also sets bucket width (2^nPlanes buckets), so recall and
    * per-bucket join cost fight each other. [[nearDupPairsBanded]] decouples
    * them. */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.45, nPlanes: Int = 4): DataFrame = {
    val bucketed = emb.select(
      col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes).as("bucket"),
      norm(col("embedding")).as("nrm"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos").as("cos_sim"))
      .distinct()
  }

  /** Per-band signed-projection key: the AND of `bitsPerBand` hyperplane
    * bits, band `b` drawing planes `[b·bits, (b+1)·bits)` from the same
    * deterministic lattice as [[lshBucket]]. */
  def lshBandKey(embCol: Column, band: Int, bitsPerBand: Int, dims: Int = 64): Column =
    (0 until bitsPerBand).map { i =>
      val proj = dot(embCol, typedlit(planeVector(band * bitsPerBand + i, dims)))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** One row per (vector, band) with the band's bucket key, self-joined on
    * (band, key): the banded candidate frame, carrying both embeddings for
    * the exact recheck. */
  /** `(vec_id, embedding, nrm, band, key)` — the banded SRP key frame
    * every LSH candidate path builds on. All band keys come from ONE fused
    * pass over the embedding (the composed per-band form walks the vector
    * nBands·bits times) — bit-identical to `array(lshBandKey(b) for b)`,
    * asserted in DedupSpec. Shared by the self-join ([[bandedJoin]]) and
    * the increment-vs-index form ([[incrementalNearDup]]) so the banding
    * scheme cannot drift between them. */
  private def bandedKeys(emb: DataFrame, nBands: Int, bitsPerBand: Int): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"),
        posexplode(graft.functions.GraftFunctions.lshBandKeys(
          col("embedding"), nBands, bitsPerBand)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")

  private def bandedJoin(emb: DataFrame, nBands: Int, bitsPerBand: Int): DataFrame = {
    val banded = bandedKeys(emb, nBands, bitsPerBand)
    val a = banded.select(col("band"), col("key"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
    val b = banded.select(col("band"), col("key"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    a.join(b, Seq("band", "key")).filter(col("a_id") < col("b_id"))
  }

  /** Distinct banded candidate pairs before the exact recheck — the
    * capacity-planning view: `count()` of this frame is the number of exact
    * cosine comparisons the banded scheme pays. */
  def bandedCandidatePairs(emb: DataFrame, nBands: Int = 8, bitsPerBand: Int = 8): DataFrame =
    bandedJoin(emb, nBands, bitsPerBand).select(col("a_id"), col("b_id")).distinct()

  /** Banded OR-composition near-duplicate pairs (multi-probe form of
    * [[nearDupPairs]]): AND `bitsPerBand` hyperplane bits within a band —
    * bucket width 2^bits, fixed independently of recall — and OR across
    * `nBands` bands — recall 1−(1−p^bits)^bands, tuned by adding bands.
    * Same banding shape as `Dedup.minhashCandidates`. A pair colliding in
    * several bands is deduplicated by the final `distinct`; the exact
    * cosine recheck keeps precision at 1. At corpus scale this replaces
    * [[nearDupPairs]]' single 2^nPlanes-bucket join (within-bucket work
    * ~n²/2^planes) with nBands joins of width-2^bits buckets
    * (~nBands·n²/2^bits — e.g. 8 bands × 8 bits ≍ half the comparisons of
    * the 4-plane single bucket, at strictly higher recall). */
  def nearDupPairsBanded(emb: DataFrame, threshold: Double = 0.4,
      nBands: Int = 8, bitsPerBand: Int = 8): DataFrame =
    bandedJoin(emb, nBands, bitsPerBand)
      .withColumn("cos", dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos").as("cos_sim"))
      .distinct()

  /** Mutual k-NN graph over the banded LSH candidates — the edge set that
    * graph-based corpus curation consumes (SemDeDup-style cluster pruning,
    * graph community detection, diversity sampling all start from "which
    * documents are each other's nearest neighbors").
    *
    * Construction: per vector, rank its banded candidates by exact cosine
    * (ties broken by neighbor id) and keep the top `k`; an undirected edge
    * survives iff BOTH endpoints kept it — the mutual filter that removes
    * hub vectors' one-sided edges (a hub appears in everyone's top-k;
    * requiring reciprocity keeps only its genuine neighborhood).
    *
    * Scale shape: candidates come from the banded equality join (never
    * all-pairs — recall is tuned by adding bands, not by widening a scan);
    * the per-vector top-k is one window over a shuffle keyed by the source
    * vector; the mutual filter is a self-equality join of the (≤ k·n)-row
    * directed edge list on the reversed key — every stage is keyed, no
    * broadcast of the corpus, no driver state. Output: `(a_id, b_id,
    * cos_sim, rnk_ab, rnk_ba)` with `a_id < b_id`, ranks being each
    * endpoint's position of the other in its top-k list. */
  def knnGraph(emb: DataFrame, k: Int = 3,
      nBands: Int = 8, bitsPerBand: Int = 8): DataFrame = {
    val cand = bandedJoin(emb, nBands, bitsPerBand)
      .withColumn("cos", dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .select(col("a_id"), col("b_id"), col("cos"))
      .distinct()
    val directed = cand
      .select(col("a_id").as("src"), col("b_id").as("dst"), col("cos"))
      .unionAll(cand.select(col("b_id").as("src"), col("a_id").as("dst"), col("cos")))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    val topk = directed
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
    topk.as("x")
      .join(topk.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src"))
      .filter(col("x.src") < col("x.dst"))
      .select(
        col("x.src").as("a_id"), col("x.dst").as("b_id"),
        col("x.cos").as("cos_sim"),
        col("x.rnk").cast("long").as("rnk_ab"),
        col("y.rnk").cast("long").as("rnk_ba"))
  }

  /** Incremental embedding near-dup flags — the embedding-side counterpart
    * of `Dedup.incrementalFlags`: the standing corpus becomes a banded
    * SRP-key index (built once, persistable exactly like the minhash
    * signature index), and each arriving vector is flagged against it —
    * candidate generation by band-key equality join, exact cosine verify,
    * one per-arrival rollup — without touching, rescoring, or
    * re-clustering the standing corpus.
    *
    * Output per arrival: `is_dup`, `n_matches` (distinct corpus vectors
    * ≥ threshold), `best_cos` (max verified cosine, null when clean),
    * `first_match` (smallest matching corpus id — deterministic
    * provenance). Scale shape: index is corpus×nBands rows keyed by
    * (band, key); the increment explodes to arrivals×nBands rows and
    * equality-joins — never an all-pairs scan of corpus or increment. */
  def incrementalNearDup(arrivals: DataFrame, corpus: DataFrame,
      threshold: Double = 0.4, nBands: Int = 8, bitsPerBand: Int = 8): DataFrame = {
    def keyed(df: DataFrame, id: String, emb: String, nrm: String): DataFrame =
      bandedKeys(df, nBands, bitsPerBand).select(
        col("band"), col("key"), col("vec_id").as(id),
        col("embedding").as(emb), col("nrm").as(nrm))
    val idx = keyed(corpus, "c_id", "c_emb", "c_nrm")
    val arr = keyed(arrivals, "a_id", "a_emb", "a_nrm")
    val matches = arr.join(idx, Seq("band", "key"))
      .withColumn("cos", dot(col("a_emb"), col("c_emb")) / (col("a_nrm") * col("c_nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("c_id"), col("cos"))
      .distinct()
    val flags = matches.groupBy("a_id").agg(
      count(lit(1)).as("n_matches"),
      max(col("cos")).as("best_cos"),
      min(col("c_id")).as("first_match"))
    arrivals.select(col("vec_id"))
      .join(flags.withColumnRenamed("a_id", "vec_id"), Seq("vec_id"), "left")
      .select(
        col("vec_id"),
        col("n_matches").isNotNull.as("is_dup"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best_cos"),
        col("first_match"))
  }

  // ------------------------------------------------------------ int8 SQ

  /** Per-vector symmetric int8 scalar quantization — the storage/bandwidth
    * scale path for embedding search. Each float32 dimension becomes one
    * signed byte: `scale = max|x|/127`, `q_i = floor(x_i/scale + 0.5)` —
    * a 4× cut in vector bytes, which at 100 TB is the difference between
    * an index that fits executor memory and one that spills. (The `qvec`
    * column here is integral doubles for arithmetic clarity; a production
    * sink would pack it to `binary(64)` on write.)
    *
    * Determinism: because the per-vector scales cancel inside cosine
    * (`cos_q = dot(qa,qb) / (|qa||qb|)`), the quantized score depends only
    * on the integer vectors, and every intermediate — products ≤ 127²,
    * sums ≤ 64·127² ≪ 2⁵³ — is exactly representable in double. The score
    * is therefore bit-identical across engines and summation orders by
    * construction, which is what lets the DuckDB oracle pin it hash-exact.
    *
    * The quantize map is a higher-order `transform` (one interpreted pass
    * per vector, paid once at index build); the O(queries×corpus) scoring
    * hot path runs on the quantized arrays through the codegen'd
    * [[graft.functions.ArrayDot]].
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    withQuantized(emb.select(col("vec_id"), col("embedding")))
      .select(col("vec_id"), col("qscale").as("scale"), col("qvec"))

  /** Brute-force top-`k` under the quantized metric — same broadcast-the-
    * queries / stream-the-corpus shape as [[cosineTopK]], but each score is
    * a 64-byte integer dot instead of a 256-byte float one: 4× less memory
    * bandwidth per candidate, the dominant cost of a brute-force scan. */
  def quantizedTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = quantizeInt8(emb).select(
      col("vec_id"), col("qvec"),
      greatest(sqrt(dot(col("qvec"), col("qvec"))), lit(1e-300)).as("qnrm"))
    val queries = q
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_q"), col("qnrm").as("q_nrm"))
    val cand = q.select(col("vec_id").as("n_id"), col("qvec").as("n_q"), col("qnrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos_q", dot(col("q_q"), col("n_q")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_q").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos_q"))
  }

  /** Add `qscale`/`qvec`/`qnrm` int8-quantization columns to any frame
    * carrying an `embedding` column, preserving the frame's other columns.
    * THE single holder of the quantization formula (`scale = max|x|/127`,
    * 1 for all-zero; `q_i = floor(x_i/scale + 0.5)`) — [[quantizeInt8]]
    * and [[ivfSqTopK]] both delegate here, and the DuckDB mirrors
    * (`Oracles.quantizedCte`, `Oracles.sqCte`) transcribe exactly this
    * expression. Also the composition hook that lets an index pipeline
    * quantize payloads IN PLACE instead of paying a corpus-wide self-join
    * against a separately-quantized table.
    *
    * `floor()` yields LONG; the cast back makes qvec `array<double>`
    * (integral values) — the element type the codegen'd ArrayDot reads. */
  private def withQuantized(df: DataFrame): DataFrame = {
    val x = col("embedding")
    df
      .withColumn("mx",
        aggregate(x, lit(0.0), (acc, v) => greatest(acc, abs(v.cast("double")))))
      .withColumn("qscale", when(col("mx") === 0.0, lit(1.0)).otherwise(col("mx") / 127.0))
      .withColumn("qvec",
        transform(x, v => floor(v.cast("double") / col("qscale") + 0.5).cast("double")))
      .withColumn("qnrm", greatest(sqrt(dot(col("qvec"), col("qvec"))), lit(1e-300)))
      .drop("mx")
  }

  /** IVF-SQ top-`k` — the composed production scale path: the IVF coarse
    * quantizer prunes candidate scoring to `nProbe` of `nLists` inverted
    * lists (~nLists/nProbe of the corpus), and int8 scalar quantization
    * shrinks every list payload 4× — at 100 TB the inverted lists are the
    * dominant stored/streamed artifact, so the two knobs multiply: read
    * nProbe/nLists of the corpus at a quarter the bytes per vector.
    *
    * Probe selection stays on the FLOAT centroids (`nLists` rows —
    * precision there costs nothing); candidate scoring runs entirely on
    * the quantized codes, which are attached to the assignment rows in
    * place ([[withQuantized]] — no corpus self-join to fetch codes).
    * Deterministic end to end: the Lloyd index is quantized-integer mean,
    * the SQ scores are integer-exact, ties break on neighbor id. */
  def ivfSqTopK(emb: DataFrame, nLists: Int = 16, nProbe: Int = 4,
      nQueries: Int = 10, k: Int = 3, kmeansIters: Int = 2): DataFrame = {
    // ivfIndexBuild persists the nLists-row centroid frame and leaves it
    // cached (same convention as ivfTopK): ~KBs per call, and the real
    // amortized path is the persisted index (IndexCache), which unpersists
    val (centroids, assigned) = ivfIndexBuild(emb, nLists, kmeansIters)
    val lists = withQuantized(assigned)
      .select(col("vec_id").as("n_id"), col("list_id"),
        col("qvec").as("n_q"), col("qnrm").as("n_qnrm"))
    val qNorm = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val probes = withQuantized(rankCentroids(qNorm, centroids).filter(col("c_rank") <= nProbe))
      .select(col("vec_id").as("q_id"), col("c_id").as("list_id"),
        col("qvec").as("q_q"), col("qnrm").as("q_qnrm"))
    val scored = lists.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_q", dot(col("q_q"), col("n_q")) / (col("q_qnrm") * col("n_qnrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_q").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos_q"))
  }

  /** Write the packed int8 code index under `path`: (vec_id, scale, code)
    * with `code` = one signed byte per dimension ([[graft.functions.PackInt8]]).
    * This is the artifact that REALIZES the 4× compression — 64 payload
    * bytes per vector on parquet instead of 256 — built once and reused by
    * every probe batch, like the IVF index. */
  def quantizedIndexWrite(emb: DataFrame, path: String): Unit =
    quantizeInt8(emb)
      .select(col("vec_id"), col("scale"),
        graft.functions.GraftFunctions.packInt8(col("qvec")).as("code"))
      .write.mode("overwrite").parquet(s"$path/codes")

  /** Load a packed code index written by [[quantizedIndexWrite]]. */
  def quantizedIndexLoad(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codes")

  /** Top-`k` over the PACKED code index — the production read path: each
    * candidate score is a byte-level [[graft.functions.Int8Dot]] over two
    * 64-byte codes, no array materialization anywhere. Integer-exact, so
    * the result is row-identical to [[quantizedTopK]] and the array-form
    * oracle pins this path too. */
  def quantizedPersistedTopK(codes: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val dot8 = graft.functions.GraftFunctions.int8Dot _
    val withNrm = codes.select(
      col("vec_id"), col("code"),
      greatest(sqrt(dot8(col("code"), col("code"))), lit(1e-300)).as("qnrm"))
    val queries = withNrm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("code").as("q_c"), col("qnrm").as("q_nrm"))
    val cand = withNrm.select(col("vec_id").as("n_id"), col("code").as("n_c"), col("qnrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(queries), col("q_id") =!= col("n_id"))
      .withColumn("cos_q", dot8(col("q_c"), col("n_c")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_q").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos_q"))
  }

  /** Recall of the quantized top-`k` against the exact float top-`k` — the
    * accuracy ledger one publishes next to the 4× compression: per query,
    * how many of the true `k` neighbors the int8 scan kept. Queries with no
    * overlap still appear (recall 0) via the left join from the query set. */
  def quantizedRecall(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    // both top-k results are ≤ nQueries·k rows — broadcast them so the
    // intersection and the left join never sort-merge at any corpus size
    val exact = cosineTopK(emb, nQueries, k).select(col("q_id"), col("n_id"))
    val quant = quantizedTopK(emb, nQueries, k).select(col("q_id"), col("n_id"))
    val hits = exact
      .join(broadcast(quant), Seq("q_id", "n_id"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_hit"))
    exact.select("q_id").distinct()
      .join(broadcast(hits), Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** Two-stage retrieval — the production ANN serving shape: a CHEAP int8
    * coarse scan keeps `coarseK` candidates per query (4× less memory
    * traffic than float, [[quantizedTopK]]), then ONLY those candidates are
    * re-scored with the exact float cosine and re-ranked to the final
    * top-`k`. Output keeps each winner's coarse rank so the ledger shows
    * where the quantized stage would have mis-ordered the head.
    *
    * Scale shape: the coarse result is ≤ nQueries·coarseK rows — it
    * BROADCASTS onto the embedding scan for the re-score (the corpus is
    * read, never shuffled), and the query vectors broadcast as in every
    * other ANN path. The final window partitions by query (nQueries
    * groups, never a global sort). */
  def rerankTopK(emb: DataFrame, nQueries: Int = 10, coarseK: Int = 20,
      k: Int = 5): DataFrame =
    rescoreExact(emb,
      quantizedTopK(emb, nQueries, coarseK)
        .select(col("q_id"), col("n_id"), col("rnk").as("coarse_rnk")),
      nQueries, k)

  /** Exact-rescore stage shared by the two-stage retrievers: the tiny
    * coarse candidate set (≤ nQueries·coarseK rows, with its coarse rank)
    * broadcasts onto the embedding scan, winners re-rank under exact
    * float cosine. The corpus is read, never shuffled. */
  private def rescoreExact(emb: DataFrame, coarse: DataFrame,
      nQueries: Int, k: Int): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val queries = withNorm
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val cand = withNorm.select(
      col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scored = cand
      .join(broadcast(coarse), "n_id")
      .join(broadcast(queries), "q_id")
      .withColumn("cos_exact",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos_exact").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"),
        col("cos_exact"), col("coarse_rnk"))
  }

  /** PQ-then-rerank — the recall-repair composition PQ serving actually
    * ships: the 32×-compressed ADC scan keeps `coarseK` candidates per
    * query (cheap, low-recall head ordering), then ONLY those re-score
    * under exact float cosine. On this corpus the raw ADC top-5 recall is
    * ~0.3 ([[pqRecall]]); the reranked top-5 recovers every true neighbor
    * the coarse stage kept — the measured answer to "is PQ usable at its
    * compression": yes, behind a rescore stage whose cost is `coarseK`
    * float dots per query, not a corpus scan. */
  def pqRerank(emb: DataFrame, m: Int = 8, kSub: Int = 32,
      nQueries: Int = 10, coarseK: Int = 20, k: Int = 5,
      iters: Int = 2): DataFrame =
    rescoreExact(emb,
      pqTopK(emb, m, kSub, nQueries, coarseK, iters)
        .select(col("q_id"), col("n_id"), col("rnk").as("coarse_rnk")),
      nQueries, k)

  /** IVF recall-vs-nProbe sweep — the tuning curve read before fixing the
    * probe count: total exact-top-k hits (and pooled recall) at each probe
    * setting, over ONE index build. The index (centroids + assignment) and
    * the exact baseline are computed once and persisted; each probe
    * setting reuses them, so the sweep costs one k-means + |probes| cheap
    * probe joins instead of |probes| full index builds.
    *
    * Pooled recall = Σ hits / (nQueries·k) — integer sums, one exact
    * division (per-query recall already exists as `ann_ivf_recall`). */
  /** Matryoshka truncation sweep — the embedding-width tradeoff curve
    * (Kusupati et al. 2022's MRL serving trick: score on a PREFIX of the
    * embedding, cutting memory traffic proportionally): pooled recall of
    * the top-`k` under cosine over the first `d` dims against the
    * full-width exact top-`k`, one row per candidate width. The full
    * width is included as the self-check row (recall 1 by construction).
    *
    * Scale shape: each width is the [[cosineTopK]] broadcast-scan shape
    * over `slice(embedding, 1, d)` — the corpus is scanned, never
    * shuffled; the tiny per-width top-k sets broadcast into the hit
    * join. Integer hit counts, one exact division. */
  def matryoshkaRecall(emb: DataFrame, dims: Seq[Int] = Seq(16, 32, 64),
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val exact = cosineTopK(emb, nQueries, k).select(col("q_id"), col("n_id")).persist()
    val out = dims.map { d =>
      val trunc = emb.select(col("vec_id"), slice(col("embedding"), 1, d).as("embedding"))
      val top = cosineTopK(trunc, nQueries, k).select(col("q_id"), col("n_id"))
      exact.join(broadcast(top), Seq("q_id", "n_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(d.toLong).as("dims"), col("n_hits"))
    }.reduce(_ unionByName _)
      .withColumn("recall",
        col("n_hits").cast("double") / lit((nQueries * k).toDouble))
    graft.operators.CacheLifecycle.releaseAfterUse(out, Seq(exact))
  }

  def ivfProbeCurve(emb: DataFrame, nLists: Int = 16,
      probes: Seq[Int] = Seq(1, 2, 4, 8), nQueries: Int = 10, k: Int = 3,
      kmeansIters: Int = 2): DataFrame = {
    val (centroids, assigned0) = ivfIndexBuild(emb, nLists, kmeansIters)
    // persist belongs to THIS path only: the in-memory assignment carries
    // the whole Lloyd lineage, which every probe of the sweep would
    // otherwise re-run
    val assigned = assigned0.persist()
    val out = ivfProbeCurveFrom(emb, centroids, assigned, probes, nQueries, k)
    graft.operators.CacheLifecycle.releaseAfterUse(out, Seq(assigned))
  }

  /** The probe sweep against an ALREADY-BUILT index (in-memory or loaded
    * from an [[ivfIndexWrite]] parquet layout): a tuning curve is read
    * against a standing index in production — re-training Lloyd per sweep
    * would both cost the build each time and tune against an index the
    * serving path doesn't use. Identical output to [[ivfProbeCurve]] by
    * the centroid determinism contract (exact BIGINT sums, fixed seeds),
    * so the two forms share one oracle.
    *
    * Deliberately does NOT persist `assigned`: for a loaded index that
    * would swap the list-partitioned parquet scan for an
    * InMemoryRelation SESSION-WIDE (the cache manager substitutes by
    * plan), destroying the dynamic partition pruning every persisted
    * probe path is built on — each probe's equality join prunes the scan
    * to its probed lists instead. */
  def ivfProbeCurveFrom(emb: DataFrame, centroids: DataFrame,
      assigned: DataFrame, probes: Seq[Int] = Seq(1, 2, 4, 8),
      nQueries: Int = 10, k: Int = 3): DataFrame = {
    val exact = cosineTopK(emb, nQueries, k).select(col("q_id"), col("n_id")).persist()
    val queries = emb.filter(col("vec_id") < nQueries)
    val out = probes.map { p =>
      val ivf = ivfProbe(queries, centroids, assigned, p, k)
        .select(col("q_id"), col("n_id"))
      exact.join(broadcast(ivf), Seq("q_id", "n_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(p.toLong).as("n_probe"), col("n_hits"))
    }.reduce(_ unionByName _)
      .withColumn("recall",
        col("n_hits").cast("double") / lit((nQueries * k).toDouble))
    graft.operators.CacheLifecycle.releaseAfterUse(out, Seq(exact))
  }

  // ──────────────────── Product quantization (Jégou et al. 2011) ──────────

  /** Subvector view: one row per (vector, subspace) carrying that
    * subspace's `subDim` components. `slice` is positional (no per-element
    * lambda); elements stay float — [[graft.functions.ArrayDot]] reads each
    * declared element type natively and widens to double, matching the
    * oracle's `::DOUBLE` casts. */
  private def pqSubvectors(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    emb.select(col("vec_id"), posexplode(array((0 until m).map(s =>
      slice(col("embedding"), s * subDim + 1, subDim)): _*)).as(Seq("s", "sub")))

  /** The codebook folded to ONE sorted-array row (ascending (s, code) —
    * they lead the struct, so `array_sort` orders by them), ready to ride
    * a 1-row broadcast into the per-row [[graft.functions.PqBestCodes]]
    * encode projection. `‖x‖²` is constant per subvector so the argmin
    * ranks by `‖c‖² − 2⟨x,c⟩` only — fewer float ops and one fewer parity
    * surface; ties break on the smaller code id (ascending walk +
    * strict-less replacement). The former per-(vector, subspace) shape —
    * `posexplode → join(broadcast(cb)) → groupBy(vec_id, s).min_by` —
    * paid an ×m explode, an ×kSub join fan-out and a corpus-sized hash
    * Exchange per pass; the projection pays none of them (round-17). */
  private def cbArray(cb: DataFrame): DataFrame =
    cb.agg(array_sort(collect_list(
      struct(col("s"), col("code"), col("c_sub"), col("c_dot")))).as("_cb"))

  /** Per-subspace Lloyd codebooks — product quantization's training step:
    * the 64-dim space splits into `m` independent `64/m`-dim subspaces,
    * each clustered to `kSub` codewords, so a vector encodes to `m` code
    * ids (m bytes at kSub ≤ 256) against 256 float bytes — 32× smaller at
    * the default m=8. Codebook size is m·kSub rows (tiny, broadcasts);
    * training reuses the [[kmeansCentroids]] determinism contract: seeds
    * are the first `kSub` vectors' subvectors, means sum `floor(x·2²⁰)` as
    * exact BIGINTs, so the codebooks are bit-identical across partitionings
    * and reproducible in the DuckDB oracle.
    *
    * Scale shape per iteration: one broadcast of m·kSub codewords, one
    * corpus-subvector pass (m rows per vector, a constant fan-out), one
    * (s, code, pos)-keyed partial agg. No collect, no quadratic term. */
  def pqCodebooks(emb: DataFrame, m: Int = 8, kSub: Int = 32,
      iters: Int = 2): DataFrame = {
    val q = 1048576.0 // 2^20
    val subDim = 64 / m
    val subs = pqSubvectors(emb, m, subDim)
    val seed = subs.filter(col("vec_id") < kSub)
      .select(col("s"), col("vec_id").as("code"),
        transform(col("sub"), v => v.cast("double")).as("c_sub"))
      .withColumn("c_dot", dot(col("c_sub"), col("c_sub")))
    (1 to iters).foldLeft(seed) { (cb, _) =>
      // per-row encode (no assignment shuffle), then re-slice for the sums
      emb.crossJoin(broadcast(cbArray(cb)))
        .withColumn("_bc", graft.functions.GraftFunctions.pqBestCodes(
          col("embedding"), col("_cb"), m))
        .select(col("_bc.codes").as("_codes"),
          posexplode(array((0 until m).map(s =>
            slice(col("embedding"), s * subDim + 1, subDim)): _*)).as(Seq("s", "sub")))
        .select(col("s"), element_at(col("_codes"), col("s") + 1).as("code"),
          posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("s", "code", "pos")
        .agg(sum(floor(col("x").cast("double") * q)).as("ssum"),
          count(lit(1)).as("cnt"))
        .select(col("s"), col("code"), col("pos"),
          (col("ssum").cast("double") / (lit(q) * col("cnt"))).as("comp"))
        .groupBy("s", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("comp")))).as("pc"))
        .select(col("s"), col("code"),
          transform(col("pc"), p => p.getField("comp")).as("c_sub"))
        .withColumn("c_dot", dot(col("c_sub"), col("c_sub")))
    }
  }

  /** Encode every vector as its `m` nearest-codeword ids plus the
    * reconstructed norm `‖x̂‖ = √Σ_s ‖c_{s,code_s}‖²` (the norm of the
    * codeword concatenation — cross-subspace terms are zero by
    * construction). ONE per-row encode projection over the corpus scan —
    * zero Exchange (round-17; was a subvector explode + two vec-keyed
    * aggs); the codes row is the 100-TB artifact: m small ints + one
    * double per vector. */
  def pqEncode(emb: DataFrame, cb: DataFrame, m: Int = 8): DataFrame =
    pqEncodeFolded(emb, cbArray(cb), m)

  /** [[pqEncode]] against an ALREADY-FOLDED 1-row codebook array — the
    * round-18 dedup seam: composites that reference the codebook more than
    * once (encode + LUT build) fold it ONCE per query and pass the same
    * frame here and to [[pqLutsFolded]], instead of each consumer
    * re-deriving its own `cbArray(cb)` aggregate over the cached rows
    * (plan bloat: every reference re-printed the whole training lineage;
    * runtime: one fold + one broadcast instead of one per consumer). */
  private def pqEncodeFolded(emb: DataFrame, cbA: DataFrame, m: Int): DataFrame =
    emb.crossJoin(broadcast(cbA))
      .withColumn("_bc", graft.functions.GraftFunctions.pqBestCodes(
        col("embedding"), col("_cb"), m))
      .select(col("vec_id"), col("_bc.codes").as("codes"),
        greatest(sqrt(col("_bc.dotsum")), lit(1e-300)).as("r_nrm"))

  /** IVF list-balance ledger — the inverted-file twin of [[pqBalance]]:
    * per list, the member count and its load factor vs the uniform
    * expectation. A hot list (balance ≫ 1) is where IVF probe latency
    * hides — probing it costs its whole membership — and a starved list
    * wastes a centroid; the check runs before any probe-count tuning
    * means anything. One distributed training + one assignment pass
    * ([[ivfIndexBuild]]), a list-keyed count over ≤ nLists rows, a
    * 1-row corpus-count broadcast. */
  def ivfBalance(emb: DataFrame, nLists: Int = 16,
      kmeansIters: Int = 2): DataFrame = {
    val (_, assigned) = ivfIndexBuild(emb, nLists, kmeansIters)
    val total = emb.agg(count(lit(1)).as("_n_vec"))
    assigned
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_vecs"))
      .crossJoin(broadcast(total))
      .select(col("list_id"), col("n_vecs"),
        (col("_n_vec").cast("double") / nLists).as("expected_load"),
        (col("n_vecs").cast("double") * nLists / col("_n_vec")).as("balance"))
  }

  /** PQ recall@k curve — recall of the ADC scan against the exact float
    * top-k at several cutoffs in ONE pass: both rankings are computed to
    * `ks.max` once, the (query, neighbor) agreement joins once, and each
    * cutoff is a conditional count unpivoted by `stack`. The curve (not
    * a single recall number) is what picks the serving k: recall@1 tells
    * you whether PQ can answer "the" nearest neighbor, recall@10 whether
    * it can feed a reranker.
    *
    * Shape: two broadcast-scan rankings ([[cosineTopK]], [[pqTopK]] —
    * the corpus is scanned, never shuffled) + one tiny keyed join over
    * ≤ nQueries·kmax rows; the sweep itself is free. */
  def pqRecallCurve(emb: DataFrame, ks: Seq[Int] = Seq(1, 3, 5),
      m: Int = 8, kSub: Int = 32, nQueries: Int = 10,
      iters: Int = 2): DataFrame = {
    require(ks.nonEmpty)
    val kmax = ks.max
    val exact = cosineTopK(emb, nQueries, kmax)
      .select(col("q_id"), col("n_id"), col("rnk").as("rnk_e"))
    val pq = pqTopK(emb, m, kSub, nQueries, kmax, iters)
      .select(col("q_id"), col("n_id"), col("rnk").as("rnk_p"))
    val hits = exact.join(broadcast(pq), Seq("q_id", "n_id"))
    val aggs = ks.map(k =>
      count(when(col("rnk_e") <= k && col("rnk_p") <= k, 1)).as(s"_h$k"))
    val one = hits.agg(aggs.head, aggs.tail: _*)
    one.selectExpr(
      s"stack(${ks.size}, ${ks.map(k => s"CAST($k AS BIGINT), _h$k").mkString(", ")}) AS (k, n_hits)")
      .select(col("k"), col("n_hits"),
        (col("n_hits").cast("double") / (col("k") * nQueries)).as("recall"))
  }

  /** PQ codebook-utilization ledger — the quantizer health check run
    * before trusting any ADC serving index: per subspace, how many of the
    * kSub codes the corpus actually uses, the hottest and coldest used
    * code's load, and `balance` = max load over the uniform expectation
    * (n_vectors / kSub). A subspace with few used codes or balance ≫ 1
    * is under-trained (its centroids collapsed) and caps the recall a PQ
    * scan over it can reach — the production check that catches a bad
    * Lloyd round BEFORE the index ships.
    *
    * Shape: one distributed codebook training ([[pqCodebooks]], fixed
    * Lloyd iterations), one corpus encode pass, then `posexplode` of the
    * m-element code rows into an (s, code)-keyed count — cardinality
    * ≤ m·kSub — and an s-keyed rollup over ≤ m rows with the 1-row
    * corpus count broadcast. */
  def pqBalance(emb: DataFrame, m: Int = 8, kSub: Int = 32,
      iters: Int = 2): DataFrame = {
    // the codebook has exactly ONE consumer here (the encode pass), so no
    // persist: the single broadcast of the folded array runs the training
    // lineage exactly once (round-18 — the former cb.persist() only added
    // an InMemoryRelation between the fold and the same single training run)
    val loads = pqEncodeFolded(emb, cbArray(pqCodebooks(emb, m, kSub, iters)), m)
      .select(posexplode(col("codes")).as(Seq("s", "code")))
      .groupBy("s", "code").agg(count(lit(1)).as("_load"))
    val total = emb.agg(count(lit(1)).as("_n_vec"))
    val out = loads
      .groupBy("s")
      .agg(
        count(lit(1)).as("n_codes_used"),
        max("_load").as("max_load"),
        min("_load").as("min_load"))
      .crossJoin(broadcast(total))
      .select(
        col("s").cast("long").as("s"), col("n_codes_used"),
        col("max_load"), col("min_load"),
        (col("_n_vec").cast("double") / kSub).as("expected_load"),
        (col("max_load").cast("double") * kSub / col("_n_vec")).as("balance"))
    out
  }

  /** PQ top-`k` by asymmetric distance computation (ADC): each query
    * precomputes its m·kSub lookup table of subspace dot products against
    * the codebooks (a few hundred doubles — broadcast with the query), and
    * every corpus candidate scores as `m` TABLE LOOKUPS summed in subspace
    * order — no float vector is ever read on the corpus side. The score is
    * the approximate cosine `Σ_s lut[s][code_s] / (‖q‖·‖x̂‖)`.
    *
    * Scale shape: codebooks and per-query LUTs broadcast; the corpus codes
    * table (m ids + a norm per vector) streams through one projection and
    * a per-query top-k window — the same shape as [[quantizedTopK]] but
    * touching m code bytes instead of 256 float bytes: at 100 TB of
    * float32 embeddings the PQ scan reads ~3% of the bytes. Deterministic: the
    * LUT fold runs in ascending subspace order (left fold, exactly the
    * oracle's `list_reduce` over `ORDER BY s`), ties break on n_id. */
  def pqTopK(emb: DataFrame, m: Int = 8, kSub: Int = 32, nQueries: Int = 10,
      k: Int = 5, iters: Int = 2): DataFrame = {
    // ONE 1-row folded codebook array behind the iterated-aggregation
    // training lineage — persisted so the encode and LUT branches share a
    // single fold (and a single training run) instead of each re-deriving
    // cbArray over a cached raw-codebook frame (round-18 fold dedup)
    val cbA = cbArray(pqCodebooks(emb, m, kSub, iters)).persist()
    graft.operators.CacheLifecycle.releaseAfterUse(
      adcTopK(emb, cbA, pqEncodeFolded(emb, cbA, m), m, nQueries, k), Seq(cbA))
  }

  /** The ADC scoring stage shared by [[pqTopK]] and [[pqPersistedTopK]]:
    * per-query LUTs built from the float queries × the folded codebook
    * array, corpus codes streamed through m lookups + the per-query top-k
    * window. */
  private def adcTopK(emb: DataFrame, cbA: DataFrame, codesIn: DataFrame,
      m: Int, nQueries: Int, k: Int): DataFrame = {
    val codes = codesIn
      .select(col("vec_id").as("n_id"), col("codes"), col("r_nrm"))
    val scored = codes.join(broadcast(pqLutsFolded(emb, cbA, m, nQueries)),
        col("q_id") =!= col("n_id"))
      .withColumn("cos_pq", adcScore(m))
    val w = Window.partitionBy("q_id").orderBy(col("cos_pq").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos_pq"))
  }

  /** Per-query ADC lookup tables: one row per query `(q_id, q_nrm, lut)`
    * where `lut` maps `s·1024 + code` to `⟨q_s, c_{s,code}⟩` — m·kSub
    * doubles per query, the whole frame broadcasts.
    *
    * Round-18 shape: a per-row PROJECTION over the same folded 1-row
    * codebook array the encode pass rides — the former
    * `join(broadcast(cb)) → groupBy(q_id).collect_list` fan-out paid a
    * ×(m·kSub) row blowup plus a query-keyed hash Exchange for what is a
    * deterministic per-query function of (embedding, codebook). Entry
    * VALUES are bit-identical (same ArrayDot over the same slices); only
    * the map's internal entry order changes (sorted by (s, code) instead
    * of collect_list order), which `element_at` lookups cannot observe
    * and the lut never reaches the output schema. */
  private def pqLutsFolded(emb: DataFrame, cbA: DataFrame, m: Int,
      nQueries: Int): DataFrame = {
    val subDim = 64 / m
    emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding"),
        norm(col("embedding")).as("q_nrm"))
      .crossJoin(broadcast(cbA))
      .select(col("q_id"), col("q_nrm"),
        map_from_entries(transform(col("_cb"), e =>
          struct(
            (e.getField("s").cast("long") * 1024L + e.getField("code")).as("key"),
            dot(slice(col("embedding"), e.getField("s") * subDim + lit(1),
              lit(subDim)), e.getField("c_sub")).as("value")))).as("lut"))
  }

  /** The ADC approximate cosine of a row carrying `lut`, `codes`, `q_nrm`,
    * `r_nrm`: m table lookups folded in ascending subspace order (the
    * oracle's `list_reduce` over `ORDER BY s`), one division. */
  private def adcScore(m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(col("lut"),
        s.cast("long") * 1024L + element_at(col("codes"), s + 1))) /
      (col("q_nrm") * col("r_nrm"))

  /** IVF-PQ top-`k` — the composed index web-scale ANN actually deploys
    * (the FAISS `IVFPQ` shape): the IVF coarse quantizer prunes candidate
    * scoring to `nProbe` of `nLists` inverted lists, and within the probed
    * lists every candidate is scored by PQ/ADC table lookups — at 100 TB
    * the probes read nProbe/nLists of the corpus at ~3% of the float
    * bytes, the two reductions multiplying exactly like [[ivfSqTopK]]'s
    * but at PQ's deeper compression.
    *
    * Probe selection stays on the FLOAT centroids (nLists rows); the
    * per-query LUTs ride the probe rows into the list join (both tiny,
    * broadcast); candidate scoring is m lookups per code row. Everything
    * deterministic: both trainings are quantized-integer Lloyd, the ADC
    * fold is subspace-ordered, ties break on n_id. */
  def ivfPqTopK(emb: DataFrame, nLists: Int = 16, nProbe: Int = 4,
      m: Int = 8, kSub: Int = 32, nQueries: Int = 10, k: Int = 5,
      kmeansIters: Int = 2, pqIters: Int = 2): DataFrame = {
    val (centroids, _) = ivfIndexBuild(emb, nLists, kmeansIters)
    // one persisted FOLD of the trained codebooks, shared by the fused
    // list build and the LUT build (round-18 fold dedup)
    val cbA = cbArray(pqCodebooks(emb, m, kSub, pqIters)).persist()
    // FUSED list build (round-17): the coarse assignment and the PQ encode
    // are both per-row projections now, so computing them in ONE pass over
    // the corpus replaces the former assigned ⋈ pqEncode corpus self-join
    // on vec_id (row-identical: both sides were deterministic per-row
    // functions of the same scan)
    val lists = emb
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(centArray(centroids)))
      .crossJoin(broadcast(cbA))
      .withColumn("_best", graft.functions.GraftFunctions.nearestCentroid(
        col("embedding"), col("nrm"), col("_cands")))
      .withColumn("_bc", graft.functions.GraftFunctions.pqBestCodes(
        col("embedding"), col("_cb"), m))
      .select(col("vec_id").as("n_id"), col("_best.c_id").as("list_id"),
        col("_bc.codes").as("codes"),
        greatest(sqrt(col("_bc.dotsum")), lit(1e-300)).as("r_nrm"))
    val qNorm = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val probes = rankCentroids(qNorm, centroids)
      .filter(col("c_rank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c_id").as("list_id"))
      .join(broadcast(pqLutsFolded(emb, cbA, m, nQueries)), "q_id")
    val scored = lists.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_pq", adcScore(m))
    val w = Window.partitionBy("q_id").orderBy(col("cos_pq").desc, col("n_id"))
    val out = scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos_pq"))
    graft.operators.CacheLifecycle.releaseAfterUse(out, Seq(cbA))
  }

  /** Write the PQ index under `path`: `codebooks/` (m·kSub tiny rows) and
    * `codes/` — the 32×-compressed corpus payload (m code ids + one norm
    * per vector), the artifact a 100 TB deployment builds once and serves
    * every query batch from. */
  def pqIndexWrite(emb: DataFrame, path: String, m: Int = 8, kSub: Int = 32,
      iters: Int = 2): Unit = {
    val cb = pqCodebooks(emb, m, kSub, iters).persist()
    cb.write.mode("overwrite").parquet(s"$path/codebooks")
    pqEncode(emb, cb, m).write.mode("overwrite").parquet(s"$path/codes")
    cb.unpersist()
  }

  /** Load a prebuilt PQ index written by [[pqIndexWrite]]. */
  def pqIndexLoad(spark: org.apache.spark.sql.SparkSession,
      path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/codes"))

  /** Top-`k` over the STANDING PQ index — the serving read path: LUTs come
    * from the persisted codebooks, candidates stream off the persisted
    * code parquet (never touching the float corpus), so a query batch
    * costs m·kSub subspace dots per query plus a code-table scan at ~3% of
    * the float bytes. Same codebooks ⇒ row-identical to [[pqTopK]]; the
    * array-form oracle pins this path too. */
  def pqPersistedTopK(emb: DataFrame, cb: DataFrame, codes: DataFrame,
      m: Int = 8, nQueries: Int = 10, k: Int = 5): DataFrame =
    adcTopK(emb, cbArray(cb), codes, m, nQueries, k)

  /** IVF-PQ over the two STANDING indexes — the full serving composition:
    * probe selection on the persisted float centroids, candidate codes
    * read from the persisted PQ table restricted to the probed lists.
    * Nothing trains in-plan; with the list side partitioned by `list_id`
    * the probe join prunes the scan to nProbe/nLists partitions of a
    * table already 32× smaller than the floats. Same indexes ⇒
    * row-identical to [[ivfPqTopK]], pinned by the same oracle. */
  def ivfPqPersistedTopK(emb: DataFrame, centroids: DataFrame,
      lists: DataFrame, cb: DataFrame, codes: DataFrame, m: Int = 8,
      nProbe: Int = 4, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val listCodes = lists.select(col("vec_id"), col("list_id"))
      .join(codes, "vec_id")
      .select(col("vec_id").as("n_id"), col("list_id"), col("codes"), col("r_nrm"))
    val qNorm = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val probes = rankCentroids(qNorm, centroids)
      .filter(col("c_rank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c_id").as("list_id"))
      .join(broadcast(pqLutsFolded(emb, cbArray(cb), m, nQueries)), "q_id")
    val scored = listCodes.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos_pq", adcScore(m))
    val w = Window.partitionBy("q_id").orderBy(col("cos_pq").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos_pq"))
  }

  /** Recall of the PQ/ADC top-`k` against the exact float top-`k` — the
    * accuracy ledger published next to PQ's 32× compression (the
    * [[quantizedRecall]] contract, code-path swapped). */
  def pqRecall(emb: DataFrame, m: Int = 8, kSub: Int = 32, nQueries: Int = 10,
      k: Int = 5, iters: Int = 2): DataFrame = {
    val exact = cosineTopK(emb, nQueries, k).select(col("q_id"), col("n_id"))
    val pq = pqTopK(emb, m, kSub, nQueries, k, iters).select(col("q_id"), col("n_id"))
    val hits = exact
      .join(broadcast(pq), Seq("q_id", "n_id"))
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_hit"))
    exact.select("q_id").distinct()
      .join(broadcast(hits), Seq("q_id"), "left")
      .select(
        col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / k).as("recall"))
  }

  /** Semantic decontamination — the embedding-space twin of the 13-gram
    * text screen (`Dedup.contamination`): the eval/benchmark set is every
    * `mod`-th vector (the `text_decontaminate` convention), and every
    * corpus vector reports its NEAREST eval vector and cosine, flagged
    * when the similarity clears `threshold`. Catches the leakage n-gram
    * overlap misses: paraphrases and translations of eval items that
    * share no 13-gram but sit on top of the eval point in embedding
    * space (the Phi/GPT-4 contamination-report methodology).
    *
    * Shape at 100 TB: the eval side is 1/`mod` of the corpus and
    * broadcasts (at real scale the eval set is a few thousand vectors);
    * the corpus scans ONCE against it — same broadcast-scan contract as
    * [[cosineTopK]] — and the per-vector argmax is a window over the
    * eval-set-sized candidate group, never a global sort.
    *
    * **Scale warning, measured**: with the eval set defined as a FRACTION
    * of the corpus (`evalCap = ∞`, the oracle-parity default) both join
    * sides grow with the data — the 10× rehearsal measured exponent
    * 1.50 (×31.8 wall-clock at ×10 rows), the same super-linear class
    * the LSH candidate blowup showed. A real benchmark set is FIXED;
    * pass a finite `evalCap` (the `ann_decontaminate_capped` form,
    * measured corpus-linear) for any production-scale run. */
  def semanticDecontaminate(emb: DataFrame, mod: Long = 17L,
      threshold: Double = 0.9, evalCap: Long = Long.MaxValue): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val evals = withNorm
      .filter(col("vec_id") % mod === 0L && col("vec_id") < evalCap)
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"),
        col("nrm").as("e_nrm"))
    val corpus = withNorm.filter(col("vec_id") % mod =!= 0L)
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos").desc, col("eval_id"))
    corpus.join(broadcast(evals), col("vec_id") =!= col("eval_id"))
      .withColumn("cos", dot(col("embedding"), col("e_emb")) /
        (col("nrm") * col("e_nrm")))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("eval_id"), col("cos").as("max_cos"),
        (col("cos") >= threshold).as("contaminated"))
  }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009) —
    * the standard serving shape for RAG/retrieval stacks: a SEMANTIC
    * ranking (exact cosine over the paired embedding, `vec_id == doc_id`
    * by the testdata convention) and a LEXICAL ranking (exact trigram
    * Jaccard of the query doc against every doc sharing ≥ 1 shingle)
    * each produce a top-`k`, then fuse by `Σ 1/(rrfK + rank)` — rank
    * arithmetic only, so the fusion never needs score normalization
    * across the two incomparable scales. A doc on one list only gets
    * that one term (the standard RRF convention). The fused score is two
    * IEEE divisions and ONE addition in fixed written order — bit-stable
    * across engines, no re-associated aggregate.
    *
    * Shape at 100 TB: the semantic side is [[cosineTopK]] (query set
    * broadcast over one corpus scan); the lexical side broadcasts the
    * query docs' shingle set against the corpus shingle stream (inverted
    * index as a broadcast hash join — the corpus never shuffles to meet
    * the queries), then one (q, doc)-keyed partial agg; both rankings
    * are per-query window top-k over candidate sets, not global sorts.
    * Fusion joins two ≤ nQueries·k-row sides — droplet-sized. */
  def hybridRrfTopK(docs: DataFrame, emb: DataFrame, nQueries: Int = 10,
      k: Int = 10, rrfK: Int = 60): DataFrame = {
    val sem = cosineTopK(emb, nQueries, k)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rnk").as("sem_rnk"))
    val sh = Dedup.shingles(docs, 3)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val qsh = sh.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("shingle"))
    val qsizes = sizes.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("n_sh").as("q_n_sh"))
    val inter = sh.join(broadcast(qsh), Seq("shingle"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy("q_id", "doc_id").agg(count(lit(1)).as("n_inter"))
    val wl = Window.partitionBy("q_id").orderBy(col("jaccard").desc, col("doc_id"))
    val lex = inter
      .join(sizes, "doc_id")
      .join(broadcast(qsizes), "q_id")
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_sh") + col("q_n_sh") - col("n_inter")))
      .withColumn("lex_rnk", row_number().over(wl))
      .filter(col("lex_rnk") <= k)
      .select(col("q_id"), col("doc_id"), col("lex_rnk").cast("long").as("lex_rnk"))
    val wf = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("doc_id"))
    sem.join(lex, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("sem_rnk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("lex_rnk")), lit(0.0)))
      .withColumn("rnk", row_number().over(wf))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("doc_id"),
        col("rrf"), col("sem_rnk"), col("lex_rnk"))
  }

  /** Fixed-point scale shared by the embedding-health ledgers — the same
    * 2²⁰ quantum the Lloyd trainer sums in, so every cross-row float sum
    * is an exact, associative BIGINT under any partitioning/AQE re-plan. */
  private val HealthQ = 1048576.0

  /** Per-label embedding-norm profile — the first health check run on a
    * new embedding table: a label whose vectors' norms collapse toward 0
    * (dead encoder head) or spread wildly (mixed precision / bad batch)
    * shows up here before any retrieval metric moves. One corpus pass,
    * one label-keyed aggregate; norms quantized to `floor(norm · 2²⁰)`
    * and summed in DECIMAL(38,0) — norms are unbounded (nothing says the
    * table is normalized), so unlike the cosine ledgers a long sum has
    * no a-priori safe bound; the mean is ONE IEEE chain.
    *
    * The DECIMAL accumulation is INTERNAL only: the published checksum
    * column `sum_norm_qm` is the quantized-norm sum reduced modulo
    * [[graft.llm.Sampling.ChecksumPrime]] (the proven `exportManifest`
    * contract — every reduced term stays under 2³⁰, a plain long sum is
    * exact for ~2³³ rows per label, and no DECIMAL type ever crosses the
    * output boundary where canonical-hash renderings diverge between
    * engines). */
  def normProfile(emb: DataFrame): DataFrame = {
    val P = Sampling.ChecksumPrime
    emb
      .select(col("label"),
        floor(norm(col("embedding")) * HealthQ).as("_nq"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("_nq").cast(DecimalType(38, 0))).as("_sum_dec"),
        (sum(col("_nq") % P) % P).as("sum_norm_qm"),
        min("_nq").as("min_norm_q"),
        max("_nq").as("max_norm_q"))
      .select(col("label"), col("n_vecs"), col("sum_norm_qm"),
        col("min_norm_q"), col("max_norm_q"),
        (col("_sum_dec").cast("double") / HealthQ / col("n_vecs"))
          .as("mean_norm"))
  }

  /** Anisotropy ("cone") audit: the mean cosine of every vector to the
    * corpus centroid. Trained-transformer embeddings famously collapse
    * into a narrow cone (Ethayarajh 2019) — mean centroid-cosine near 1
    * means cosine similarity is dominated by the common direction and
    * retrieval contrast is weak; post-processing (centering, whitening)
    * is decided off exactly this number.
    *
    * Scale shape: per-dimension integer sums ((dim)-keyed partial agg —
    * the Lloyd trainer's step with ONE list), the 1-row centroid
    * broadcasts back, the corpus streams once through the codegen'd
    * [[graft.functions.ArrayDot]], and the per-row cosines are quantized
    * to exact longs before the final rollup. No collect, no second pass. */
  def centroidCone(emb: DataFrame): DataFrame = {
    val comps = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(sum(floor(col("x").cast("double") * HealthQ)).as("s"),
        count(lit(1)).as("cnt"))
    // each dimension divides by ITS OWN count (mirrors the oracle; also
    // keeps the mean exact and deterministic if a ragged/short vector
    // ever reaches the table — first(cnt) would pick an arbitrary row)
    val centroid = comps
      .groupBy(lit(1).as("_one"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s"), col("cnt"))))
        .as("pc"))
      .select(
        transform(col("pc"),
          p => p.getField("s").cast("double") /
            (lit(HealthQ) * p.getField("cnt")))
          .as("c_emb"))
      .select(col("c_emb"), norm(col("c_emb")).as("c_nrm"))
    val scored = emb
      .join(broadcast(centroid))
      .select(floor(dot(col("embedding"), col("c_emb")) /
        (norm(col("embedding")) * col("c_nrm")) * HealthQ).as("_cq"),
        col("c_nrm"))
    scored
      .groupBy(col("c_nrm").as("centroid_norm"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum("_cq").as("sum_cos_q"),
        min("_cq").as("min_cos_q"),
        max("_cq").as("max_cos_q"))
      .select(col("n_vecs"), col("centroid_norm"),
        (col("sum_cos_q").cast("double") / HealthQ / col("n_vecs"))
          .as("mean_cos"),
        col("min_cos_q"), col("max_cos_q"))
  }

  /** Per-dimension variance ledger — the dead/dominant-dimension audit
    * (a dimension with ~0 variance wastes index width; one with outsized
    * variance dominates every dot product; both are whitening decisions).
    * One corpus pass, one (dim)-keyed aggregate. Components quantize to
    * `floor(x · 2²⁰)`; squares stay inside a long per row and accumulate
    * in DECIMAL(38,0) so the Σx² sum cannot overflow at any corpus
    * size; the variance is then ONE fixed IEEE chain.
    *
    * As in [[normProfile]], DECIMAL never crosses the output boundary:
    * the published checksum `sumsq_qm` is Σ((xq² mod P) mod P) with
    * P = [[graft.llm.Sampling.ChecksumPrime]] — each reduced term under
    * 2³⁰ so a plain long accumulator is exact — while the overflow-proof
    * DECIMAL sum stays internal, feeding only the derived double. */
  def dimVariance(emb: DataFrame): DataFrame = {
    val P = Sampling.ChecksumPrime
    val sums = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"), floor(col("x").cast("double") * HealthQ).as("_xq"))
      .groupBy("pos")
      .agg(
        count(lit(1)).as("n"),
        sum("_xq").as("sum_q"),
        sum((col("_xq") * col("_xq")).cast(DecimalType(38, 0))).as("_sumsq_dec"),
        (sum(pmod(col("_xq") * col("_xq"), lit(P))) % P).as("sumsq_qm"))
    sums.select(
      col("pos"), col("n"), col("sum_q"), col("sumsq_qm"),
      ((col("_sumsq_dec").cast("double") / col("n")) -
        (col("sum_q").cast("double") / col("n")) *
          (col("sum_q").cast("double") / col("n")))
        .as("var_q2"))
      .select(col("pos"), col("n"), col("sum_q"), col("sumsq_qm"),
        (col("var_q2") / (lit(HealthQ) * lit(HealthQ))).as("variance"))
  }
}
