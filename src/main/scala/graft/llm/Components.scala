package graft.llm

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
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
  * checkpoint so 40-round worst cases don't replay 40 joins deep. The
  * driver sees only the per-round changed-count (one long), never row
  * data.
  *
  * Storage lifecycle (hardening round 10): checkpointed frames hold
  * RDD-level blocks that `Dataset.unpersist` (the CacheManager path)
  * never touches — each superseded round's blocks are released
  * in-loop via the underlying RDD, so a run holds at most TWO rounds
  * of state regardless of iteration count, and [[release]] frees the
  * RETURNED frame's blocks (and reliable-checkpoint files) once the
  * caller has materialized what it needs. Repeated calls in one
  * session return storage to baseline — ComponentsSpec pins this.
  */
object Components {

  /** The checkpoint-backed RDDs at a frame's leaves (the LogicalRDD a
    * local/reliable checkpoint wraps) — derived frames (dupClusters
    * output) still expose ours as their scan leaf. */
  private def ckptRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Checkpoints THIS module created — [[release]] only ever frees
    * these, so calling it on a frame whose lineage contains some
    * caller-owned RDD (an upstream localCheckpoint, say) can never
    * unpersist storage it doesn't own. Keyed (applicationId, rddId),
    * NOT the bare RDD id: ids are SparkContext-scoped and restart from
    * 0 in a new context, so a stale id from an unreleased prior-context
    * frame would alias a new context's caller-owned RDD and let
    * release() destroy storage it never created. */
  private val ourCkpts = scala.collection.mutable.Set.empty[(String, Int)]

  private def ckptKey(r: RDD[_]): (String, Int) =
    (r.context.applicationId, r.id)

  private def registerCkpt(df: DataFrame): Unit =
    ckptRdds(df).foreach(r => ourCkpts.synchronized(ourCkpts.add(ckptKey(r))): Unit)

  /** Release one module-created checkpoint RDD: blocks, and (reliable
    * mode) the checkpoint files. Registry-guarded — a caller-owned RDD
    * id is never touched. */
  private def releaseRdd(r: RDD[_],
                         hconf: org.apache.hadoop.conf.Configuration): Unit =
    if (ourCkpts.synchronized(ourCkpts.remove(ckptKey(r)))) {
      r.unpersist(false)
      r.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).delete(p, true): Unit
      }
    }

  /** Release the storage backing a frame returned by
    * [[connectedComponents]] / [[dupClusters]]: the localCheckpoint
    * blocks (RDD-level — unreachable through `Dataset.unpersist`) and,
    * in reliable-checkpoint mode, the checkpoint files. Call once the
    * result is materialized (written/collected); the frame must not be
    * evaluated again afterwards. No-op on frames this module didn't
    * checkpoint (enforced by the ownership registry). A returned
    * frame's lineage contains exactly its OWN checkpoint (the cut
    * truncated everything upstream); on a frame that composes several
    * returned results, this releases each of them. */
  def release(components: DataFrame): Unit = {
    val hconf = components.sparkSession.sessionState.newHadoopConf()
    ckptRdds(components).foreach(releaseRdd(_, hconf))
  }

  /** [[release]] for harness callers (Verify/Bench): never throws.
    * Returns the failure rendered as `"release: <detail>"` so the
    * harness can surface it in its machine-readable record — a silent
    * release failure would reintroduce the exact per-rep leak release()
    * exists to prevent, invisibly. Fatal JVM errors still propagate. */
  def releaseQuietly(components: DataFrame): Option[String] =
    try { release(components); None }
    catch { case scala.util.control.NonFatal(e) =>
      Some("release: " +
        Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
    }

  /** Connected components of the undirected graph given by `edges`
    * (columns `a`, `b`, any orderable type). Returns (node, component)
    * where component = min node id reachable — one row per node that
    * appears in at least one edge (isolated nodes carry no dedup
    * information and are not materialized).
    *
    * @param reliableCheckpoint when set, per-round lineage cuts use a
    *   reliable `checkpoint()` into this directory (a cluster FS path in
    *   production) instead of `localCheckpoint()`: a lost executor
    *   recomputes from the checkpoint files and the job SURVIVES — the
    *   HA configuration for long dedup runs. Default (None) keeps
    *   localCheckpoint: bounded plans, but an executor loss mid-run
    *   fails the job loudly and it must rerun — the accepted trade for
    *   zero-infrastructure runs. Sets the SparkContext checkpoint dir
    *   (a context-global knob) if unset or different. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 40,
                          reliableCheckpoint: Option[String] = None): DataFrame =
    connectedComponentsWithRounds(edges, maxIter, reliableCheckpoint)._1

  /** [[connectedComponents]] plus the number of rounds the loop ran —
    * the observable the scale probe records (pointer jumping converges
    * in O(log diameter) rounds; plain propagation would need O(diameter)
    * and blow the maxIter budget on deep chains). */
  def connectedComponentsWithRounds(edges: DataFrame,
                                    maxIter: Int = 40,
                                    reliableCheckpoint: Option[String] = None)
      : (DataFrame, Int) = {
    val sc = edges.sparkSession.sparkContext
    val hconf = edges.sparkSession.sessionState.newHadoopConf()
    reliableCheckpoint.foreach { dir =>
      // setCheckpointDir stores an FS-QUALIFIED, uuid-suffixed SUBPATH
      // (e.g. file:/dir/<uuid>) — comparing it to the raw dir is always
      // false, which would re-set (and clobber) the context-global
      // checkpoint dir on every call; compare the stored path's PARENT.
      // Compare FULLY-QUALIFIED URIs (scheme + authority + path), not
      // the bare path component: hdfs://nn/ckpt and a later local
      // /ckpt request share a path but are different filesystems, and
      // a path-only match would silently keep checkpointing to the
      // wrong durability domain. Qualify with the CONTEXT's Hadoop conf
      // — the one setCheckpointDir itself qualifies the stored path
      // with; qualifying with the session conf would make the equality
      // permanently false whenever the two diverge on fs.defaultFS,
      // re-setting (and clobbering) the context-global dir every call
      val wantPath = new org.apache.hadoop.fs.Path(dir)
      val want = wantPath.getFileSystem(sc.hadoopConfiguration)
        .makeQualified(wantPath).toUri
      val already = sc.getCheckpointDir.exists { cur =>
        val p = new org.apache.hadoop.fs.Path(cur)
        Option(p.getParent).exists(_.toUri == want)
      }
      if (!already) sc.setCheckpointDir(dir)
    }
    // Partition-once loop keying (r14, guide §2.4 "two operations keyed
    // the same way share one exchange"): the EDGE list — the big frame —
    // is hash-partitioned by dst ONCE up front and the dedup aggregates
    // in place (hash(dst) already clusters equal (src,dst) rows, so
    // dropDuplicates plans no exchange of its own), then every round's
    // neighbor-min join reads the cached partitioning instead of
    // re-shuffling the edges per round; the within-partition sort lets
    // the per-round sort-merge join skip the edge-side sort too. The
    // partition count is pinned (REPARTITION_BY_NUM) so AQE's
    // byte-oriented coalescing cannot shrink the cached side out of
    // co-partitioning with the label-side scans it must zip with.
    // Per-round shuffled bytes drop from O(edges) to O(nodes).
    val nPart = edges.sparkSession.sessionState.conf.numShufflePartitions
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .repartition(nPart, col("dst"))
      .dropDuplicates()
      .sortWithinPartitions("dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // label frames stay hash(node)-partitioned round to round: the init
    // distinct establishes it, and each round's checkpoint re-establishes
    // it (the repartition below), so the stepped join, the pointer-jump
    // p-side (node aliased to label), and the convergence-count join all
    // plan ZERO exchanges — only the neighbor-min aggregation and the
    // jump's l-side re-key per round.
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var jumped: DataFrame = null
    var next: DataFrame = null
    // the checkpoint RDD backing `labels` / `next` THIS call created —
    // superseded rounds release through these tracked handles, never by
    // scanning the frame's lineage: round-0 `labels` derives from the
    // CALLER's edges plan, and a lineage scan there would free a
    // still-live checkpoint frame the caller passed as input (e.g. a
    // prior connectedComponents result used as edges)
    var labelsRdd: Option[RDD[_]] = None
    var nextRdd: Option[RDD[_]] = None
    var it = 0
    var converged = false
    try {
      while (!converged && it < maxIter) {
        // 1. neighbor-min FUSED with the keep-own-label step (r14): the
        //    old shape aggregated neighbor labels and then LEFT-joined
        //    labels back to apply least(own, nbr_min) — a second join
        //    (and its broadcast/exchange) per round for what is just
        //    "min over (own label ∪ neighbors' labels)". Union the
        //    node's own label row into the aggregation instead: same
        //    values exactly (min is order-insensitive over the same
        //    set), one aggregation, one exchange. Every node appears in
        //    `labels`, so no node is lost by dropping the left join.
        val stepped = sym
          .join(labels.withColumnRenamed("node", "dst"), "dst")
          .select(col("src"), col("label"))
          .union(labels.select(col("node").as("src"), col("label")))
          .groupBy(col("src").as("node"))
          .agg(min(col("label")).as("label"))
        // 2. pointer jump: label := label(label) — halves chain depth, the
        //    O(log d) ingredient (plain propagation walks one hop per round)
        jumped = stepped.as("l")
          .join(stepped.select(col("node").as("label"),
            col("label").as("parent")).as("p"), Seq("label"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("parent"), col("label")))
              .as("label"))
          // re-key the round's output by node BEFORE the checkpoint:
          // Dataset.checkpoint records the executed plan's output
          // partitioning on its LogicalRDD, so next round's labels scan
          // arrives hash(node)-partitioned and the stepped /
          // convergence-count joins skip their exchanges (the jump join
          // left the frame keyed by label — useless downstream)
          .repartition(nPart, col("node"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // checkpoint TRUNCATES lineage: after it materializes (at the
        // `changed` count below, while `jumped` is still persisted), the
        // per-round plan can't grow unboundedly. localCheckpoint blocks
        // die with their executor (job fails loudly, rerun); the
        // reliableCheckpoint knob writes files a lost executor recovers
        // from. The recompute-to-write pass a reliable checkpoint runs
        // reads `jumped`'s persisted blocks, not the full lineage.
        // partitioning-preserving checkpoint (CheckpointBridge): plain
        // Dataset.localCheckpoint records UnknownPartitioning under AQE,
        // which would throw away the repartition above and put the
        // exchanges back into every downstream join
        next = org.apache.spark.sql.graftx.CheckpointBridge
          .checkpointKeyed(jumped, Seq("node"),
            reliable = reliableCheckpoint.isDefined)
        registerCkpt(next)
        nextRdd = ckptRdds(next).headOption // next IS the bare LogicalRDD
        // the count below is what materializes the lazy checkpoint — if
        // that job dies partway, `next`'s already-stored blocks are
        // released by the finally (it never became `labels`)
        val changedDf = next.as("n")
          .join(labels.as("o"), Seq("node"))
          .filter(col("n.label") =!= col("o.label"))
          .limit(1)
        // dev knob: dump the round's physical plans (the loop's real
        // shape — the RETURNED frame's plan is checkpoint-truncated)
        if (sys.env.get("GRAFT_CC_EXPLAIN").contains("1") && it == 1) {
          println(s"=== CC round ${it + 1}: jumped (pre-checkpoint) ===")
          println(jumped.queryExecution.executedPlan.toString)
          println(s"=== CC round ${it + 1}: convergence count ===")
          println(changedDf.queryExecution.executedPlan.toString)
        }
        val changed = changedDf.count()
        // `next` is now self-contained: release the SUPERSEDED round —
        // round 0's CacheManager cache via unpersist, later rounds'
        // RDD-level checkpoint blocks/files via the TRACKED rdd handle
        // (Dataset.unpersist can't see those; leaking one per round held
        // every round's node-set in storage for the session)
        labels.unpersist(false)
        labelsRdd.foreach(releaseRdd(_, hconf))
        jumped.unpersist(false)
        jumped = null
        labels = next
        labelsRdd = nextRdd
        next = null
        nextRdd = None
        converged = changed == 0
        it += 1
      }
      require(converged,
        s"connectedComponents did not converge in $maxIter rounds")
    } finally {
      // on the non-convergence throw (or any job failure) drop every
      // block this call pinned — including a mid-materialization `next`;
      // on success only the RETURNED frame's checkpoint survives, and
      // [[release]] frees it once the caller has materialized results
      sym.unpersist(false)
      if (jumped != null) jumped.unpersist(false)
      if (next != null) {
        next.unpersist(false); nextRdd.foreach(releaseRdd(_, hconf))
      }
      if (!converged) {
        labels.unpersist(false); labelsRdd.foreach(releaseRdd(_, hconf))
      }
    }
    (labels.withColumnRenamed("label", "component"), it)
  }

  /** Dedup-cluster table from near-dup pairs: component id (= smallest
    * doc id in the cluster, the kept representative), per-doc keep flag,
    * and cluster size. The result's scan leaf is the components
    * checkpoint — materialize it (write/collect), then free the blocks
    * with [[release]] on this frame. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
                  idB: String = "id_b", maxIter: Int = 40,
                  reliableCheckpoint: Option[String] = None): DataFrame = {
    // thread the closure knobs through: dupClusters is THE dedup write
    // side, and without these a production run could not reach the
    // executor-loss-resilient (reliable checkpoint) configuration the
    // closure documents without reimplementing the keep/size logic
    val cc = connectedComponents(
      pairs.select(col(idA).as("a"), col(idB).as("b")),
      maxIter, reliableCheckpoint)
    // cluster size as a window count instead of a groupBy + self-join
    // (r14): same values, one exchange on `component` instead of two
    // plus a second scan of the labels frame (guide §2.4)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    cc.select(col("node").as("doc_id"), col("component"),
      (col("node") === col("component")).as("keep"),
      count(lit(1)).over(w).as("n_docs"))
  }
}
