package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate candidate graph — the
  * clustering stage of a fuzzy-dedup pipeline. LSH candidates (e.g.
  * [[Dedup.minhashCandidates]]) are PAIRS; retention policies need
  * CLUSTERS, and near-duplication is transitive in practice (A~B, B~C ⇒
  * keep one of {A,B,C} even when the A–C pair was never emitted).
  *
  * Algorithm: alternating Large-Star / Small-Star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * shape that holds at 100 TB: every round is two partial-aggregating
  * shuffles plus an equality join (no all-pairs, no driver-side graph,
  * nothing proportional to component diameter), and the round count is
  * O(log n) regardless of chain length, where plain min-label propagation
  * pays one round per hop of graph diameter. The driver only runs the
  * convergence test (a count + checksum action per round) — the data
  * never leaves the executors.
  */
object Clusters {

  /** Both orientations of an undirected edge list with columns (u, v). */
  private def symmetric(e: DataFrame): DataFrame =
    e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))

  /** Large-Star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). Emitted edges are
    * canonical (u > v). */
  private def largeStar(e: DataFrame): DataFrame = {
    val s = symmetric(e)
    val m = s.groupBy("u").agg(min("v").as("_mn"))
      .select(col("u"), least(col("_mn"), col("u")).as("m"))
    s.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-Star: every node connects its smaller-or-equal neighbors (and
    * itself) to the minimum among them. Each undirected edge is processed
    * at exactly its larger endpoint, so the union over nodes covers the
    * whole edge set. Emitted edges are canonical (u > v). */
  private def smallStar(e: DataFrame): DataFrame = {
    val s = symmetric(e).where(col("v") < col("u"))
    val m = s.groupBy("u").agg(min("v").as("m"))
    s.join(m, "u").select(col("v").as("u"), col("m").as("v"))
      .union(m.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Star edges (node → component root) for the graph given as candidate
    * pairs (a_id, b_id). Iterates Large-Star∘Small-Star to a fixed point,
    * detected STRUCTURALLY: a canonical (u > v) distinct edge set is a
    * fixed point of the alternation iff it is a star forest — every child
    * appears in exactly one edge and no child is also a root (the
    * canonical orientation then forces each root to be its component's
    * minimum, which is exactly the converged state). Testing that is one
    * cheap aggregate over the already-checkpointed edges, where the
    * previous checksum scheme had to run ONE MORE full contraction round
    * (four shuffles) just to observe an unchanged edge set — on the
    * common near-dup graph (tiny components, one round to converge) the
    * structural test halves the loop's round count.
    *
    * Each round is checkpointed: without lineage truncation the logical
    * plan grows by a constant factor PER ROUND (each star references its
    * input several times) and planning itself blows up long before the
    * data does.
    *
    * @param checkpointDir when set, rounds use RELIABLE `checkpoint()`
    *        into this directory (setCheckpointDir once per context) —
    *        the right durability on a multi-executor cluster, where
    *        `localCheckpoint` blocks die with a decommissioned executor
    *        and a 100-round-hour job would restart from zero. When
    *        absent, `localCheckpoint` (lazy) — cheapest on a single
    *        node, and the checksum action right after is the job that
    *        materializes each round (eager would pay a second,
    *        redundant job; reliable checkpoint() is always eager, its
    *        write IS the materializing job). Dropped generations are
    *        reclaimed by the ContextCleaner once unreferenced. */
  def starEdges(
      pairs: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame =
    starEdgesWithRounds(pairs, maxIter, checkpointDir)._1

  /** [[starEdges]] plus the number of Large∘Small contraction rounds it
    * ran before the structural fixed-point test passed — the observable
    * the O(log n) claim is tested against. */
  def starEdgesWithRounds(
      pairs: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val persist: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        val sc = pairs.sparkSession.sparkContext
        // setCheckpointDir is JVM-global: honor the caller's dir rather
        // than silently writing rounds somewhere else when a different
        // dir is already set.
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        df => df.checkpoint()
      case None => df => df.localCheckpoint(false)
    }
    // canonical orientation (u > v) from the start: the structural test
    // below relies on it, and both star operators preserve it
    var e = persist(pairs
      .select(
        greatest(col("a_id"), col("b_id")).as("u"),
        least(col("a_id"), col("b_id")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct())
    var it = 0
    while (!isStarForest(e) && it < maxIter) {
      e = persist(smallStar(largeStar(e)))
      it += 1
    }
    (e, it)
  }

  /** Fixed-point test: a canonical, distinct edge set is stable under
    * Large∘Small iff every child `u` has exactly one edge and no child is
    * also a root (then each root is its component's minimum by the u > v
    * invariant). One aggregate + one equality join over checkpointed
    * edges; `isEmpty` stops at the first violation. */
  private def isStarForest(e: DataFrame): Boolean = {
    val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
    val roots = e.select(col("v").as("u")).distinct()
    deg.filter(col("d") > 1).select("u")
      .unionAll(deg.join(roots, "u").select("u"))
      .isEmpty
  }

  /** Per-document cluster assignment over `docs` using the near-dup
    * candidate pairs: (doc_id, cluster_id = min doc_id of the component,
    * cluster_size). Documents with no candidate pair are singleton
    * clusters of themselves. The final graph is a star per component, so
    * the root is just the minimum of each node's closed neighborhood —
    * one aggregation, no more iteration. */
  def assign(
      docs: DataFrame,
      pairs: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val stars = symmetric(starEdges(pairs, maxIter, checkpointDir))
    val roots = stars.groupBy("u").agg(min("v").as("_mn"))
      .select(col("u").as("doc_id"), least(col("_mn"), col("u")).as("cluster_id"))
    val all = docs.select(col("doc_id"))
      .join(roots, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val sizes = all.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    all.join(sizes, "cluster_id").select("doc_id", "cluster_id", "cluster_size")
  }

  /** Build the near-dup cluster assignment once and persist it under
    * `path` as a (doc_id, cluster_id, cluster_size) parquet — the
    * pipeline shape real curation uses: the expensive star contraction
    * runs ONCE per corpus snapshot, and every downstream gate (funnel,
    * keep-best, incremental checks) reads the assignment instead of
    * re-contracting. Mirrors `Similarity.ivfIndexWrite`. */
  def indexWrite(docs: DataFrame, pairs: DataFrame, path: String): Unit =
    assign(docs, pairs).write.mode("overwrite").parquet(path)

  /** Load a persisted cluster assignment written by [[indexWrite]]. */
  def indexLoad(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Cluster-size distribution — the ledger read before choosing a dedup
    * retention policy: how many near-dup clusters exist at each size and
    * how many documents they hold (size 1 = unique docs; a heavy tail of
    * large clusters means keep-one dedup reclaims the corpus, a flat head
    * means it buys little). One keyed agg over the (already size-annotated)
    * assignment — at scale this reads the persisted cluster index, so the
    * histogram never re-runs the contraction. */
  def sizeHistogram(assignment: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    assignment
      .groupBy("cluster_size")
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
  }
}
