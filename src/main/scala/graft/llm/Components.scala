package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over a pair list — the dedup-cluster
  * resolution step: near-dup PAIRS (MinHash/SimHash/Jaccard output) are
  * not transitive, so "keep one copy per group" needs the transitive
  * closure. Reference curation analogue: the dedup keep-policy applied
  * after pairwise similarity (cf. gordo's row-filter keep-first
  * semantics); the algorithm itself is the alternating min-label
  * propagation with pointer jumping (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14 — the large/small-star
  * family).
  *
  * Scale design: each round is two hash-shuffles on node ids — a
  * neighbor-min aggregation (map-side combinable) and a label-of-label
  * pointer jump that halves chain depth, giving O(log diameter)
  * convergence instead of O(diameter) for plain propagation. State per
  * round is one (node, label) frame, persisted and lineage-cut with a
  * localCheckpoint so 40-round worst cases don't replay 40 joins deep.
  * The driver sees only the per-round changed-count (one long), never
  * row data.
  */
object Components {

  /** Connected components of the undirected graph given by `edges`
    * (columns `a`, `b`, any orderable type). Returns (node, component)
    * where component = min node id reachable — one row per node that
    * appears in at least one edge (isolated nodes carry no dedup
    * information and are not materialized).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 40): DataFrame =
    connectedComponentsWithRounds(edges, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds the loop ran —
    * the observable the scale probe records (pointer jumping converges
    * in O(log diameter) rounds; plain propagation would need O(diameter)
    * and blow the maxIter budget on deep chains). */
  def connectedComponentsWithRounds(edges: DataFrame,
                                    maxIter: Int = 40): (DataFrame, Int) = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var jumped: DataFrame = null
    var next: DataFrame = null
    var it = 0
    var converged = false
    try {
      while (!converged && it < maxIter) {
        // 1. neighbor-min: every node pulls the smallest label among its
        //    neighbors (partial-aggregated map-side before the shuffle)
        val nbrMin = sym
          .join(labels.withColumnRenamed("node", "dst"), "dst")
          .groupBy(col("src").as("node"))
          .agg(min(col("label")).as("nbr_min"))
        val stepped = labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label"))
        // 2. pointer jump: label := label(label) — halves chain depth, the
        //    O(log d) ingredient (plain propagation walks one hop per round)
        jumped = stepped.as("l")
          .join(stepped.select(col("node").as("label"),
            col("label").as("parent")).as("p"), Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("parent"), col("label")))
              .as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // localCheckpoint TRUNCATES lineage: after it materializes (at the
        // `changed` count below, while `jumped` is still persisted), the
        // per-round plan can't grow unboundedly — but a lost executor can
        // no longer recompute dropped blocks either; the JOB fails (loudly)
        // and must rerun. That is the accepted trade for bounded plans;
        // reliable `checkpoint()` to a cluster FS is the HA upgrade path.
        next = jumped.localCheckpoint(false)
        // the count below is what materializes the lazy checkpoint — if
        // that job dies partway, `next`'s already-checkpointed blocks
        // are released by the finally (it never became `labels`)
        val changed = next.as("n")
          .join(labels.as("o"), Seq("node"))
          .filter(col("n.label") =!= col("o.label"))
          .limit(1).count()
        labels.unpersist(false)
        jumped.unpersist(false)
        jumped = null
        labels = next
        next = null
        converged = changed == 0
        it += 1
      }
      require(converged,
        s"connectedComponents did not converge in $maxIter rounds")
    } finally {
      // on the non-convergence throw (or any job failure) release every
      // block this call pinned — including a mid-materialization `next`;
      // on success the returned frame's own checkpoint blocks live until
      // the caller drops it / session ends — callers should
      // materialize-and-drop promptly (q87 writes parquet)
      sym.unpersist(false)
      if (jumped != null) jumped.unpersist(false)
      if (next != null) next.unpersist(false)
      if (!converged) labels.unpersist(false)
    }
    (labels.withColumnRenamed("label", "component"), it)
  }

  /** Dedup-cluster table from near-dup pairs: component id (= smallest
    * doc id in the cluster, the kept representative), per-doc keep flag,
    * and cluster size. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
                  idB: String = "id_b"): DataFrame = {
    val cc = connectedComponents(
      pairs.select(col(idA).as("a"), col(idB).as("b")))
    val sizes = cc.groupBy(col("component")).agg(count(lit(1)).as("n_docs"))
    cc.join(sizes, "component")
      .select(col("node").as("doc_id"), col("component"),
        (col("node") === col("component")).as("keep"), col("n_docs"))
  }
}
