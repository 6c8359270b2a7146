package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Bucketing

/** Proves the co-located-join property: two tables bucketed on the join
  * key sort-merge-join with NO shuffle exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed fact-fact join plans without exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(
        Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = Bucketing.table(spark, "orders_b")
        .join(Bucketing.table(spark, "lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      val expected = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
