package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * array fold, identical evaluation order in Spark and the oracle. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

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

  /** Deterministic pseudo-random projection direction component for plane
    * `j`, dim `i`: Knuth multiplicative lattice → uniform in [-0.5, 0.5). */
  private def planeComponent(j: Int, i: Column): Column =
    (((lit(j * 64) + i + 1) * lit(2654435761L)) % 1000L).cast("double") / 1000.0 - 0.5

  /** Signed-random-projection bucket id (one bit per plane). */
  def lshBucket(embCol: Column, nPlanes: Int = 8, dims: Int = 64): Column =
    (0 until nPlanes).map { j =>
      val proj = aggregate(
        zip_with(embCol, sequence(lit(0), lit(dims - 1)),
          (x, i) => x.cast("double") * planeComponent(j, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucket histogram — the partition-shape view of the LSH index. */
  def lshBuckets(emb: DataFrame, nPlanes: Int = 8): DataFrame =
    emb
      .select(col("vec_id"), lshBucket(col("embedding"), nPlanes).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"))

  /** IVF (inverted-file) ANN — the other classic scale path: a coarse
    * quantizer assigns every vector to its nearest centroid ("list"); a
    * query probes only the `nProbe` nearest lists and scores exactly within
    * them. Centroids here are deterministic (the first `nLists` corpus
    * vectors) so the oracle reproduces the index bit-for-bit; a production
    * build would k-means them — the query path is identical.
    *
    * Scale shape: centroids broadcast (tiny); assignment is one codegen'd
    * projection over the corpus; the probe is an equality join on list id.
    * Corpus is never collected; per-list candidate sets shrink the scored
    * set by ~nLists/nProbe versus brute force.
    */
  def ivfTopK(emb: DataFrame, nLists: Int = 16, nProbe: Int = 4, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val centroids = broadcast(
      emb.filter(col("vec_id") < nLists)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
          norm(col("embedding")).as("c_nrm")))
    val withNorm = emb.select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    // rank centroids per vector by cosine; rank 1 = assignment, ranks ≤ nProbe = probe set
    def ranked(df: DataFrame, idCol: String): DataFrame = {
      val scored = df.join(centroids,
          col(idCol).isNotNull) // cross vs broadcast centroid table
        .withColumn("c_cos", dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      val w = Window.partitionBy(idCol).orderBy(col("c_cos").desc, col("c_id"))
      scored.withColumn("c_rank", row_number().over(w))
    }
    val assigned = ranked(withNorm, "vec_id")
      .filter(col("c_rank") === 1)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("c_id").as("list_id"))
    val probes = ranked(withNorm.filter(col("vec_id") < nQueries), "vec_id")
      .filter(col("c_rank") <= nProbe)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("c_id").as("list_id"))
    val scored = probes.join(assigned, "list_id")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("long").as("rnk"), col("n_id"), col("cos").as("cos_sim"))
  }

  /** Near-duplicate pairs by embedding cosine ≥ `threshold`: LSH-bucketed
    * candidate generation (equality self-join on bucket) + exact re-check.
    * At 100 TB the bucket join replaces the quadratic scan; recall is tuned
    * by `nPlanes` (fewer planes → bigger buckets → higher recall). */
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
}
