package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.data.AsOfJoin

/** AsOfJoin.backward — exactness against a brute-force per-row scan,
  * chunk-boundary carry correctness, and the tolerance / null contracts. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(left: Seq[(String, Long, Long)],
                    right: Seq[(String, Long, Double)],
                    tol: Long): Map[Long, Option[(Long, Double)]] =
    left.map { case (k, ts, id) =>
      id -> right
        .filter(r => r._1 == k && r._2 <= ts && (tol < 0 || ts - r._2 <= tol))
        .sortBy(_._2).lastOption.map(r => (r._2, r._3))
    }.toMap

  private def run(left: Seq[(String, Long, Long)],
                  right: Seq[(String, Long, Double)],
                  tol: Long, chunkSpan: Long): Map[Long, Option[(Long, Double)]] = {
    val l = left.toDF("k", "ts", "id")
    val r = right.toDF("k", "rts", "v")
    AsOfJoin.backward(l, r, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = tol, chunkSpan = chunkSpan)
      .collect().map { row =>
        val id = row.getAs[Long]("id")
        val m =
          if (row.isNullAt(row.fieldIndex("asof_ts"))) None
          else Some((row.getAs[Long]("asof_ts"), row.getAs[Double]("v")))
        id -> m
      }.toMap
  }

  // right rows every 10 ticks per key; left probes on and between them
  private val right = for {
    k <- Seq("a", "b"); i <- 0 until 20
  } yield (k, i * 10L, i * 1.0 + (if (k == "a") 0.0 else 100.0))
  private val left = for {
    (k, i) <- Seq("a", "b").zipWithIndex; j <- 0 until 40
  } yield (k, j * 7L + i, (i * 40 + j).toLong)

  test("matches brute force exactly (chunked across many chunk sizes)") {
    val expected = brute(left, right, tol = -1L)
    for (span <- Seq(7L, 16L, 1000L)) {
      assert(run(left, right, -1L, span) == expected, s"chunkSpan=$span")
    }
    // bounded fast path (no chunking) agrees too
    assert(run(left, right, -1L, -1L) == expected)
  }

  test("equal timestamps match (inclusive backward) and keys isolate") {
    val got = run(Seq(("a", 50L, 1L), ("b", 50L, 2L), ("c", 50L, 3L)),
      right, -1L, 16L)
    assert(got(1L) == Some((50L, 5.0)))    // a: right at exactly 50
    assert(got(2L) == Some((50L, 105.0)))  // b: its OWN series value
    assert(got(3L) == None)                // c: no right rows at all
  }

  test("carry crosses empty chunks: match far in a previous chunk") {
    val r = Seq(("a", 5L, 42.0))
    val l = Seq(("a", 1000L, 1L))
    assert(run(l, r, -1L, 10L) == Map(1L -> Some((5L, 42.0))))
  }

  test("tolerance nulls ts and payload together") {
    val expected = brute(left, right, tol = 5L)
    assert(run(left, right, 5L, 16L) == expected)
    assert(expected.values.exists(_.isEmpty) &&
      expected.values.exists(_.nonEmpty), "tolerance case must gate both ways")
  }

  test("null left ts yields no match; null right ts rows are dropped") {
    val l = Seq(("a", Some(100L), 1L), ("a", None, 2L))
      .toDF("k", "ts", "id")
    val r = Seq(("a", Some(50L), 1.0), ("a", None, 99.0))
      .toDF("k", "rts", "v")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts", Seq("v"),
      chunkSpan = 10L).collect()
      .map(row => row.getAs[Long]("id") ->
        (if (row.isNullAt(row.fieldIndex("v"))) None
         else Some(row.getAs[Double]("v")))).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> None))
  }

  test("contract violations fail fast") {
    val l = Seq(("a", 1L, 2.0)).toDF("k", "ts", "v")
    val r = Seq(("a", 1L, 2.0)).toDF("k", "rts", "v")
    intercept[IllegalArgumentException] { // payload collides with left col
      AsOfJoin.backward(l, r, Seq("k"), "ts", "rts", Seq("v"))
    }
    val ls = Seq(("a", "x", 1L)).toDF("k", "ts", "id")
    intercept[IllegalArgumentException] { // non-numeric ts
      AsOfJoin.backward(ls, r, Seq("k"), "ts", "rts", Seq("v"))
    }
    val lRes = Seq(("a", 1L, 2.0)).toDF("k", "ts", "__ord")
    intercept[IllegalArgumentException] { // left column named like an internal
      AsOfJoin.backward(lRes, r, Seq("k"), "ts", "rts", Seq("v"))
    }
    val rRes = Seq(("a", 1L, 2.0, 0L)).toDF("k", "rts", "v", "__chunk")
    intercept[IllegalArgumentException] { // right column named like an internal
      AsOfJoin.backward(l.drop("v"), rRes, Seq("k"), "ts", "rts", Seq("v"))
    }
    val rTs = Seq(("a", 1L, 2.0)).toDF("k", "rts", "__ts")
    intercept[IllegalArgumentException] { // payload named like the struct ts field
      AsOfJoin.backward(l.drop("v"), rTs, Seq("k"), "ts", "rts", Seq("__ts"))
    }
  }

  test("dotted tag-style column names resolve as literal names, not struct paths") {
    // the reference's tag names contain dots (e.g. "GRA-YE.PV"); a bare
    // col() would parse them as struct-field access and fail resolution
    val l = Seq(("a", 10L, 1L), ("a", 25L, 2L))
      .toDF("sys.key", "t.s", "row.id")
    val r = Seq(("a", 5L, 7.5), ("a", 20L, 9.5))
      .toDF("sys.key", "r.ts", "cal.value")
    val got = AsOfJoin.backward(l, r, Seq("sys.key"), "t.s", "r.ts",
      Seq("cal.value"))
      .orderBy(graft.Cols.q("row.id")).collect()
      .map(row => (row.getAs[Long]("row.id"), row.getAs[Long]("asof_ts"),
        row.getAs[Double]("cal.value")))
    assert(got.toSeq == Seq((1L, 5L, 7.5), (2L, 20L, 9.5)))
  }
}
