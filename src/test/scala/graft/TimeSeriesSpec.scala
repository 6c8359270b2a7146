package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.TimeSeries
import graft.data.TimeSeries.DatasetConfig

/** Known-answer fixtures for the TimeSeries engine semantics (the SURVEY
  * §7.4 "hard parts": left-closed buckets, time-bounded interpolation,
  * buffer drop, predicate translation). */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def longFrame(rows: Seq[(String, Long, java.lang.Double)]) =
    rows.toDF("tag", "epoch", "value")
      .select($"tag", timestamp_seconds($"epoch").as("ts"), $"value")

  test("parseResolutionSeconds understands pandas frequency strings") {
    assert(TimeSeries.parseResolutionSeconds("10T") == 600L)
    assert(TimeSeries.parseResolutionSeconds("1H") == 3600L)
    assert(TimeSeries.parseResolutionSeconds("48H") == 172800L)
    assert(TimeSeries.parseResolutionSeconds("min") == 60L)
    assert(TimeSeries.parseResolutionSeconds("2D") == 172800L)
    intercept[IllegalArgumentException](TimeSeries.parseResolutionSeconds("5X"))
  }

  test("resample buckets are left-closed, left-labeled (pandas default)") {
    // 09:59:59 lands in the 09:50 bucket; 10:00:00 opens the 10:00 bucket.
    val df = longFrame(Seq(("a", 35999L, 1.0), ("a", 36000L, 3.0)))
    val r = TimeSeries.resample(df, Seq("tag"), "ts", "value", 600L)
      .orderBy($"bucket_ts").collect()
    assert(r.map(x => (x.getAs[Long]("bucket_ts"), x.getAs[Double]("value"))).toSeq
      == Seq((35400L, 1.0), (36000L, 3.0)))
  }

  test("weekly resample buckets match pandas W (W-SUN, right-labeled)") {
    // pandas-replayed fixture: resample("W").sum() over
    // [Thu 01-01 23:00, Fri 01-02 01:00, Sun 01-04 12:00, Mon 01-05
    // 00:00, Sun 01-11 00:00] → {1970-01-04: 6, 1970-01-11: 9} — a
    // Sunday's intraday times bucket to that Sunday, Monday 00:00 opens
    // the next week; an epoch floor would produce Thursday anchors
    val df = longFrame(Seq(("a", 82800L, 1.0), ("a", 90000L, 2.0),
      ("a", 302400L, 3.0), ("a", 345600L, 4.0), ("a", 864000L, 5.0)))
    val anchor = TimeSeries.resolutionAnchorSec("W")
    assert(anchor == 259200L &&
      TimeSeries.resolutionAnchorSec("10T") == 0L)
    val r = TimeSeries.resample(df, Seq("tag"), "ts", "value",
      TimeSeries.parseResolutionSeconds("W"), "sum", anchor)
      .orderBy($"bucket_ts").collect()
      .map(x => (x.getAs[Long]("bucket_ts"), x.getAs[Double]("value")))
    assert(r.toSeq == Seq((259200L, 6.0), (864000L, 9.0)))
    intercept[IllegalArgumentException](TimeSeries.parseResolutionSeconds("2W"))
  }

  test("resample first/last break timestamp ties deterministically, skip nulls") {
    // two events share the max ts: bare max_by picks an arbitrary one
    // (partitioning-dependent flake); (ts, value) lexicographic order
    // pins the winner, and a null value never wins
    val df = Seq(("a", 100L, Some(5.0)), ("a", 100L, Some(9.0)),
      ("a", 100L, Option.empty[Double]), ("a", 50L, Some(1.0)))
      .toDF("tag", "epoch", "value")
      .select($"tag", timestamp_seconds($"epoch").as("ts"), $"value")
    val r = TimeSeries.resampleMulti(df, Seq("tag"), "ts", "value", 600L,
      Seq("first", "last")).head()
    assert(r.getAs[Double]("value__first") == 1.0)
    assert(r.getAs[Double]("value__last") == 9.0)
  }

  test("ffill fills only within the time limit") {
    // buckets 0, 600 (null), 1200 (null), 1800 (null), 2400 (value):
    // with limit 1200s the 600/1200 gaps fill from bucket 0, 1800 does not.
    val df = longFrame(Seq(("a", 0L, 5.0), ("a", 2400L, 9.0)))
    val r = TimeSeries.resample(df, Seq("tag"), "ts", "value", 600L)
    val g = TimeSeries.fullGrid(r, Seq("tag"), 600L)
    val f = TimeSeries.ffill(g, Seq("tag"), limitSec = 1200L)
      .orderBy($"bucket_ts").collect()
    assert(f.map(x => Option(x.getAs[java.lang.Double]("value")).map(_.toDouble)).toSeq
      == Seq(Some(5.0), Some(5.0), Some(5.0), None, Some(9.0)))
  }

  test("linear interpolation bridges gaps only when anchors are within limit") {
    val df = longFrame(Seq(("a", 0L, 0.0), ("a", 1800L, 6.0), ("a", 6000L, 1.0)))
    val r = TimeSeries.resample(df, Seq("tag"), "ts", "value", 600L)
    val g = TimeSeries.fullGrid(r, Seq("tag"), 600L)
    val f = TimeSeries.interpolateLinear(g, Seq("tag"), limitSec = 1800L)
      .orderBy($"bucket_ts").collect()
      .map(x => Option(x.getAs[java.lang.Double]("value")).map(_.toDouble))
    // 0..1800: anchors 1800s apart → filled linearly 0,2,4,6
    assert(f.take(4).toSeq == Seq(Some(0.0), Some(2.0), Some(4.0), Some(6.0)))
    // 1800..6000: anchors 4200s apart > limit → nulls between
    assert(f.slice(4, 10).forall(_.isEmpty))
    assert(f.last == Some(1.0))
  }

  test("fullGrid chunks arrays but still emits every bucket") {
    // span of 10000 buckets with GridChunk=4096 → 3 chunks, no gaps/dupes
    val df = longFrame(Seq(("a", 0L, 1.0), ("a", 9999L * 60L, 2.0)))
    val r = TimeSeries.resample(df, Seq("tag"), "ts", "value", 60L)
    val g = TimeSeries.fullGrid(r, Seq("tag"), 60L)
    assert(g.count() == 10000L)
    assert(g.select($"bucket_ts").distinct().count() == 10000L)
  }

  test("translateRowFilter leaves quoted literals and backticks intact") {
    assert(TimeSeries.translateRowFilter("`tag a` > 1 & ~(`x` == 2)")
      == "`tag a` > 1  AND   NOT (`x`  =  2)")
    assert(TimeSeries.translateRowFilter("name == 'a~b&c'")
      == "name  =  'a~b&c'")
    assert(TimeSeries.translateRowFilter("""s == "p|q" | t == 'r'""")
      == """s  =  "p|q"  OR  t  =  'r'""")
  }

  test("rowFilterWithBuffer drops neighbors on each side") {
    val df = longFrame((0L to 9L).map(i => ("a", i * 600L, i.toDouble: java.lang.Double)))
    val kept = TimeSeries.rowFilterWithBuffer(df, Seq("tag"), Seq("ts"),
      predicate = $"value" =!= 5.0, buffer = 1)
      .select($"value").as[Double].collect().sorted
    assert(kept.toSeq == Seq(0.0, 1.0, 2.0, 3.0, 7.0, 8.0, 9.0))
  }

  test("getData returns an aligned wide frame with no nulls") {
    val rows = for {
      tag <- Seq("x", "y"); i <- 0 to 50 if !(tag == "y" && i % 7 == 3)
    } yield (tag, i * 600L, (i * 2).toDouble: java.lang.Double)
    val wide = TimeSeries.getData(longFrame(rows), "tag", "ts", "value",
      DatasetConfig(tags = Seq("x", "y"), resolution = "10T",
        interpolationLimit = "30T"))
    assert(wide.columns.toSeq == Seq("bucket_ts", "x", "y"))
    assert(wide.count() == 51)
    assert(wide.filter($"x".isNull || $"y".isNull).count() == 0)
  }

  test("getData honors n_samples_threshold") {
    val df = longFrame(Seq(("x", 0L, 1.0), ("x", 600L, 2.0)))
    intercept[TimeSeries.InsufficientDataError] {
      TimeSeries.getData(df, "tag", "ts", "value",
        DatasetConfig(tags = Seq("x"), nSamplesThreshold = 10))
    }
  }

  test("translateRowFilter does not end a literal at an escaped quote") {
    // the escaped quote must stay INSIDE the literal — the old scanner
    // ended the literal there and rewrote the remainder as code
    assert(TimeSeries.translateRowFilter("""x == 'a\'&b'""")
      == """x  =  'a\'&b'""")
    assert(TimeSeries.translateRowFilter("""x == "p\"|q" & y == 1""")
      == """x  =  "p\"|q"  AND  y  =  1""")
    // a literal backslash before the closing quote still closes
    assert(TimeSeries.translateRowFilter("""x == 'a\\' & y == 2""")
      == """x  =  'a\\'  AND  y  =  2""")
  }

  test("getData rejects uncastable train bounds instead of dropping all rows") {
    val df = longFrame(Seq(("x", 0L, 1.0), ("x", 600L, 2.0)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.getData(df, "tag", "ts", "value",
        DatasetConfig(tags = Seq("x"), trainStart = Some("07/01/2020")))
    }
    assert(e.getMessage.contains("07/01/2020"))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.dropKnownPeriods(df, "ts", Seq(("not-a-time", "also-not")))
        .count()
    }
    assert(e2.getMessage.contains("not-a-time"))
  }

  test("getData names tags that have no data instead of emptying the frame") {
    // "viw" (typo) pivots to an all-null column; the any-null inner-join
    // filter would then drop EVERY bucket with no diagnostic
    val rows = (0 to 20).map(i => ("view", i * 600L, 1.0: java.lang.Double))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.getData(longFrame(rows), "tag", "ts", "value",
        DatasetConfig(tags = Seq("view", "viw")))
    }
    assert(e.getMessage.contains("viw") && !e.getMessage.contains("view,"))
    // fully-empty input keeps the documented empty-frame/threshold path
    val empty = TimeSeries.getData(longFrame(Nil), "tag", "ts", "value",
      DatasetConfig(tags = Seq("x")))
    assert(empty.count() == 0)
  }

  test("unkeyed buffer filter (chunk+carry) matches the brute-force window") {
    // > one 4096-row chunk so base, prevCarry, and nextCarry all engage;
    // bad rows placed away from AND exactly on chunk boundaries
    val n = 10000
    val bad = Set(0, 1, 4094, 4095, 4096, 4097, 5000, 8191, 8192, n - 1)
    val df = (0 until n).map(i => (i.toLong, if (bad(i)) 0.0 else 1.0))
      .toDF("bucket_ts", "v")
    val buffer = 3
    val kept = TimeSeries.rowFilterWithBuffer(df, keys = Nil,
      orderCols = Seq("bucket_ts"), predicate = $"v" =!= 0.0, buffer = buffer)
      .select($"bucket_ts").as[Long].collect().toSet
    val expected = (0 until n).filter { i =>
      (math.max(0, i - buffer) to math.min(n - 1, i + buffer))
        .forall(j => !bad(j))
    }.map(_.toLong).toSet
    assert(kept == expected)
  }

  test("every time-series query key has a matching oracle") {
    import graft.operators.TimeSeriesQueries
    assert(TimeSeriesQueries.oracleSql.keySet == TimeSeriesQueries.queries.keySet)
  }
}
