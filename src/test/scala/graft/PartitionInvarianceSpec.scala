package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: a registered query's RESULT must not
  * depend on `spark.sql.shuffle.partitions` — the property a
  * 1000-executor run silently rests on (the cluster picks a different
  * partition count than local[32], and AQE coalesces differently run to
  * run). Each pinned query runs under 3 and then 17 shuffle partitions
  * (both co-prime to the 4-thread test session's defaults, odd on
  * purpose so hash ranges shift) and the collected row multisets must
  * match exactly. Kernels chosen for partition-sensitive internals:
  * chunk+carry windows, banded joins, exact-quantile medians, streaming
  * ewm recursions, fold aggregates. The oracle gate already pins the
  * 32-partition result to DuckDB; this pins the result ACROSS partition
  * counts, which the oracle alone cannot see. */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def runAt(name: String, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val df = SparkEntry.queries(name)(spark, sf)
      val out = canon(df)
      graft.llm.Components.releaseQuietly(df)
      out
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // one test per query so a failure names its kernel directly
  for (name <- Seq(
      "q13_resample_mean", // bucket agg
      "q19_filter_median", // exact interpolated quantiles per window
      "q28_ewma", // chunk+carry sequential recursion
      "q34_minhash_dup_pairs", // banded LSH self-join
      "q45_simhash_neardup", // hamming-band buckets
      "q57_asof_join", // chunk+carry as-of merge
      "q88_repetition_stats")) // aggregate-fold expressions
    test(s"$name is invariant to the shuffle partition count (3 vs 17)") {
      val a = runAt(name, "3")
      val b = runAt(name, "17")
      assert(a.size == b.size,
        s"row count moved with partitioning: ${a.size} vs ${b.size}")
      assert(a == b, {
        val diff = (a.toSet -- b.toSet).take(3) ++ (b.toSet -- a.toSet).take(3)
        s"rows moved with partitioning, e.g.: ${diff.mkString("; ")}"
      })
    }
}
