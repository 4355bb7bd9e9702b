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
    * detected by an order-insensitive (count, xor-of-hashes) checksum —
    * both star outputs are canonical-orientation and distinct, so equal
    * edge SETS have equal checksums.
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

  /** [[starEdges]] plus the number of Large∘Small rounds it took to
    * converge (the +1 confirming round included) — the observable the
    * O(log n) claim is tested against. */
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
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("x")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var e = persist(pairs.select(col("a_id").as("u"), col("b_id").as("v")).distinct())
    var sum = checksum(e)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val next = persist(smallStar(largeStar(e)))
      val nextSum = checksum(next)
      converged = nextSum == sum
      e = next
      sum = nextSum
      it += 1
    }
    (e, it)
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
}
