package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard: NO registered query may plan a
  * `CartesianProduct` or `BroadcastNestedLoopJoin` — the two shapes that
  * turn a correct small-SF query into an N² scale-killer. Every join in
  * the engine is designed equi-keyed (banded, bucketed, broadcast-hash,
  * or window-based), so any appearance of these operators is a
  * regression, not a choice; a legitimate future exception must be
  * allow-listed here explicitly with a scale justification.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val forbidden = Seq("CartesianProduct", "BroadcastNestedLoopJoin")

  /** Deliberate bounded-broadcast × linear-scan shapes: the broadcast
    * side is a CONSTANT-bounded frame (10 query vectors / 16 seed
    * centroids / a config-sized dims table), so the nested-loop join is
    * O(constant · N) by design — the ANN scoring plan, not an N². Any
    * query NOT in this map that plans one of the forbidden shapes is a
    * regression. */
  private val allowlist: Map[String, String] = Map(
    "q35_ann_topk" -> "brute-force baseline: 10 broadcast queries x corpus scan",
    "q47_ann_ivf_topk" -> "10 broadcast queries x 16 centroids, probed lists equi-joined",
    "q83_ann_sq8_topk" -> "10 broadcast queries x quantized corpus scan",
    "q85_ann_pq_topk" -> "10 broadcast queries x PQ-reconstructed scan",
    "q86_ann_ivfpq_topk" -> "10 broadcast queries x 16 centroids, probed lists equi-joined",
    "q60_hourglass_dims" -> "config-sized dims frame, both sides driver-bounded")

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allowlist.contains(name) => None
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        forbidden.filter(plan.contains) match {
          case Nil => None
          case hits => Some(s"$name: ${hits.mkString(", ")}")
        }
    }
    assert(offenders.isEmpty,
      s"scale-killer join shapes planned by:\n${offenders.mkString("\n")}")
  }

  /** Shuffle budgets, measured on the tree where each plan was reviewed:
    * every `Exchange` is a full network rewrite of the data at scale, so
    * a query silently growing one (a lost broadcast hint, an accidental
    * `repartition`, a window re-partitioned on new keys) is a performance
    * regression even while results stay correct. Budgets are the
    * reviewed plan's count — raising one must come with a reason, like
    * the allowlist above. Counted on the pre-execution adaptive plan
    * (deterministic given the fixed sf0.001 inputs). */
  test("headline queries stay within their reviewed shuffle budgets") {
    val budgets = Map(
      "q01_pricing_summary" -> 2, // partial+final agg, output sort
      "q02_select_where" -> 1, // output sort only (scan-side filter)
      "q04_join_revenue_by_nation" -> 2, // agg + sort; all joins hash/broadcast
      "q05_orders_no_lineitems" -> 2, // anti-join bcast; agg + sort
      "q07_topk_per_group" -> 3, // window partition, agg, sort
      "q13_resample_mean" -> 2, // bucket agg + sort
      "q21_getdata_composed" -> 4, // resample, grid join, pivot agg, sort
      "q29_anomaly_frame" -> 3, // resample, pivot agg, sort (fit is driver-side)
      "q33_fingerprints" -> 1, // pure map + output sort
      "q34_minhash_dup_pairs" -> 3, // band explode agg, pair dedup, sort
      "q35_ann_topk" -> 2, // per-query top-k agg + sort (queries broadcast)
      "q45_simhash_neardup" -> 2, // band bucket join (bcast), dedup, sort
      "q50_winnowing" -> 1, // pure map + output sort
      "q57_asof_join" -> 8, // union window + chunk-carry frame (ids/finals/prefix scan)
      "q68_partitioned_source" -> 4) // pruned scan then the q21 pipeline
    val over = budgets.toSeq.sortBy(_._1).flatMap { case (name, budget) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val n = "Exchange (hash|range)partitioning".r.findAllMatchIn(plan).size
      if (n > budget) Some(s"$name: $n shuffles (budget $budget)") else None
    }
    assert(over.isEmpty,
      s"shuffle budget exceeded:\n${over.mkString("\n")}")
  }

  test("q04 keeps the explicit broadcast hint on the nation dim") {
    // at sf0.001 every join auto-broadcasts, so the executed plan can't
    // distinguish the hint from stats luck — assert the hint itself on
    // the analyzed plan: at 100 TB the nation dim must never shuffle
    val analyzed = SparkEntry.queries("q04_join_revenue_by_nation")(spark, sf)
      .queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.exists(_.hints.strategy.exists(
      _.toString.contains("broadcast"))),
      "q04 lost its broadcast(nation) hint")
  }

  test("q02's filter and projection push down to the parquet scan") {
    // inspect the scan NODE, not the rendered plan — toString truncates
    // the PushedFilters/ReadSchema lists past ~100 chars
    val scan = SparkEntry.queries("q02_select_where")(spark, sf)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_discount,0.05"),
      s"l_discount range not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity,24.0)"),
      s"l_quantity bound not pushed: $pushed")
    // the scan schema must be pruned to the 5 referenced columns
    // (a 16-column lineitem read for a 4-column projection is wrong)
    assert(scan.requiredSchema.fieldNames.toSeq ==
      Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount"),
      s"scan not pruned: ${scan.requiredSchema.fieldNames.mkString(",")}")
  }
}
