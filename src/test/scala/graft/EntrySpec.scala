package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  test("flagship entry produces a non-empty anomaly frame at sf0.001") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    assert(df.count() > 0)
    assert(df.columns.contains("total-anomaly-confidence"))
  }

  test("every query has a unique q-number and an oracle") {
    val names = SparkEntry.queries.keys.toSeq
    val nums = names.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == nums.size, "duplicate query numbers")
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
