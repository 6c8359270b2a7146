package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.TimeSeries
import graft.llm.{Similarity, TextDedup}
import graft.ml.InfImputer

/** Second degenerate-input batch (r13): the surfaces DegenerateInputSpec
  * left uncovered — the banded near-dup family, every ANN variant beyond
  * the brute baseline, the grid/interpolate/filter kernels, and the
  * fits whose statistics aggregate over rows. Same contract: an empty
  * (schema-correct) input comes back empty, or — where emptiness makes
  * the operation meaningless (a quantizer/codebook/imputer fit) — fails
  * loudly with the established contract exception. Never NPE, never
  * fabricate rows. */
class DegenerateInputSpec2 extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyEmb =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private def emb2 =
    Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
  private def emptyLong =
    Seq.empty[(String, Long, Double)].toDF("tag", "bucket_ts", "value")

  test("simhash / winnowing / dupGroups / jaccard router run empty on an empty corpus") {
    assert(TextDedup.simhashNearDups(emptyDocs, "doc_id", "text")
      .count() == 0)
    assert(TextDedup.winnowingFingerprints(emptyDocs, "doc_id", "text")
      .count() == 0)
    assert(TextDedup.dupGroups(emptyDocs, "doc_id",
      TextDedup.exactKey(col("text")), "key").count() == 0)
    val sh = TextDedup.withShingles(emptyDocs, "doc_id", "text")
    // both router paths: prefix+verify (t >= 0.5) and direct join (t < 0.5)
    assert(TextDedup.jaccardPairs(sh, threshold = 0.6).count() == 0)
    assert(TextDedup.jaccardPairs(sh, threshold = 0.3).count() == 0)
  }

  test("every ANN variant beyond brute is empty-safe or fails its fit loudly") {
    // scan variants: empty corpus and empty query side both yield empty
    assert(Similarity.sq8TopK(emptyEmb, emb2, "vec_id", "embedding",
      k = 3).count() == 0)
    assert(Similarity.sq8TopK(emb2, emptyEmb, "vec_id", "embedding",
      k = 3).count() == 0)
    assert(Similarity.lshTopK(emptyEmb, "vec_id", "embedding",
      planes = 2, k = 3).count() == 0)
    // auto-planes on an empty corpus: planesFor(0) clamps to 1 plane
    assert(Similarity.lshNearDupPairsAuto(emptyEmb, "vec_id", "embedding",
      tables = 2, threshold = 0.5).count() == 0)
    assert(Similarity.ivfTopK(emptyEmb, "vec_id", "embedding",
      nCentroids = 2, nprobe = 1, k = 3, queryPred = lit(true))
      .count() == 0)
    // trained quantizer on an empty corpus: no vectors -> no centroids,
    // and serving with an empty quantizer probes nothing
    val cents = Similarity.trainIvfCentroids(emptyEmb, "vec_id",
      "embedding", nCentroids = 2, iters = 2)
    assert(cents.isEmpty)
    assert(Similarity.ivfTopKWith(emb2, "vec_id", "embedding", cents,
      nprobe = 1, k = 3, queryPred = lit(true)).count() == 0)
    // codebook fits NEED seeds: loud contract, never a phantom codebook
    val e = intercept[IllegalArgumentException] {
      Similarity.pqCodebookFromIds(emptyEmb, "vec_id", "embedding",
        mSub = 2, nCentroids = 2)
    }
    assert(e.getMessage.contains("no codebook seeds"))
    intercept[IllegalArgumentException] {
      Similarity.trainPqCodebook(emptyEmb, "vec_id", "embedding",
        mSub = 2, nCentroids = 2, iters = 1)
    }
  }

  test("grid / ffill / interpolate / pivot of an empty resampled frame are empty") {
    // auto-bounds (an agg over nothing) and explicit bounds both: the
    // grid derives rows per KEY, and an empty frame has no keys
    assert(TimeSeries.fullGrid(emptyLong, Seq("tag"), widthSec = 600L)
      .count() == 0)
    assert(TimeSeries.fullGrid(emptyLong, Seq("tag"), widthSec = 600L,
      bounds = Some((0L, 6000L))).count() == 0)
    assert(TimeSeries.ffill(emptyLong, Seq("tag"), limitSec = 600L)
      .count() == 0)
    assert(TimeSeries.interpolateLinear(emptyLong, Seq("tag"),
      limitSec = 600L).count() == 0)
    val wide = TimeSeries.pivotWide(emptyLong, "tag", Seq("t1", "t2"))
    assert(wide.count() == 0)
    assert(wide.columns.toSeq == Seq("bucket_ts", "t1", "t2"),
      "pivot schema comes from the tag list, not from observed rows")
  }

  test("filter-period kernels and the buffered row filter pass an empty frame through") {
    assert(TimeSeries.filterPeriodsIqr(emptyLong, Seq("tag"), "value",
      nIqr = 1.5).count() == 0)
    assert(TimeSeries.filterPeriodsMedian(emptyLong, Seq("tag"),
      Seq("bucket_ts"), "value", window = 4, nIqr = 1.5).count() == 0)
    assert(TimeSeries.rowFilterWithBuffer(emptyLong, Seq("tag"),
      Seq("bucket_ts"), col("value") > 0, buffer = 2).count() == 0)
    // the keys = Nil chunked path too (the single-series kernel)
    assert(TimeSeries.rowFilterWithBuffer(emptyLong, Nil,
      Seq("bucket_ts"), col("value") > 0, buffer = 2).count() == 0)
  }

  // ---- singleton/constant inputs: where range math and window
  // arithmetic degenerate (one row, zero variance, short series) ----

  test("constant and single-row columns scale with sklearn's zero-range fallback and invert exactly") {
    import graft.ml.Scalers
    val wide = Seq((0L, 5.0, 0.0), (600L, 5.0, 1.0), (1200L, 5.0, 2.0))
      .toDF("bucket_ts", "t1", "t2")
    val mm = Scalers.fitMinMax(wide, Seq("t1", "t2"))
    val scaled = mm.transform(wide, Seq("t1", "t2"))
    // constant column: range 0 -> scale 1 (never 0/0 NaN), values all 0
    assert(scaled.agg(sum(abs(col("t1")))).head().getDouble(0) == 0.0)
    assert(scaled.agg(max(col("t2"))).head().getDouble(0) == 1.0)
    // inverse o transform is the identity (exact on these dyadic values)
    val back = mm.inverse(scaled, Seq("t1", "t2"))
      .orderBy("bucket_ts").collect()
    assert(back.map(_.getDouble(1)).toSeq == Seq(5.0, 5.0, 5.0))
    assert(back.map(_.getDouble(2)).toSeq == Seq(0.0, 1.0, 2.0))
    // robust fit on ONE row: iqr 0 -> scale 1, centered to 0
    val one = Seq((0L, 7.5)).toDF("bucket_ts", "t1")
    val rb = Scalers.fitRobust(one, Seq("t1"))
    assert(rb.transform(one, Seq("t1")).head().getDouble(1) == 0.0)
  }

  test("interpolate bridges only within the limit and never from a single anchor") {
    val gap = Seq(("t1", 0L, Some(1.0)), ("t1", 600L, None),
      ("t1", 1200L, Some(3.0))).toDF("tag", "bucket_ts", "value")
    val filled = TimeSeries.interpolateLinear(gap, Seq("tag"),
      limitSec = 1200L).filter(col("bucket_ts") === 600L).head()
    assert(filled.getDouble(2) == 2.0, "midpoint of a bridgeable gap")
    val tooFar = TimeSeries.interpolateLinear(gap, Seq("tag"),
      limitSec = 600L).filter(col("bucket_ts") === 600L).head()
    assert(tooFar.isNullAt(2), "anchor distance 1200 > limit 600 stays null")
    val oneAnchor = Seq(("t1", 0L, Some(1.0)), ("t1", 600L, None))
      .toDF("tag", "bucket_ts", "value")
    assert(TimeSeries.interpolateLinear(oneAnchor, Seq("tag"),
      limitSec = 600L).filter(col("bucket_ts") === 600L).head().isNullAt(2),
      "no next anchor -> no extrapolation")
  }

  test("ffill fills up to the gap limit from the LAST observation, then stops") {
    val s = Seq(("t1", 0L, Some(1.0)), ("t1", 600L, None),
      ("t1", 1800L, None)).toDF("tag", "bucket_ts", "value")
    val out = TimeSeries.ffill(s, Seq("tag"), limitSec = 600L)
      .orderBy("bucket_ts").collect()
    assert(out(1).getDouble(2) == 1.0, "gap 600 <= limit fills")
    assert(out(2).isNullAt(2), "gap 1800 > limit stays null")
  }

  test("windowing a series shorter than the lookback yields zero full windows") {
    import graft.ml.Windows
    val series = Seq(("m1", 0L, 1.0), ("m1", 600L, 2.0), ("m1", 1200L, 3.0))
      .toDF("tag", "bucket_ts", "value")
    assert(Windows.slidingWindows(series, Seq("tag"),
      Seq(col("bucket_ts")), "value", lookback = 5).count() == 0)
    val wide = Seq((0L, 1.0), (600L, 2.0), (1200L, 3.0))
      .toDF("bucket_ts", "t1")
    val (lagged, lagTags) = Windows.withLookback(wide, Seq("t1"),
      "bucket_ts", lookback = 5, lookahead = 0)
    assert(lagTags.size == 5, "lag names derive from the spec, not rows")
    assert(lagged.count() == 0, "no row has a full 5-deep lag window")
  }

  test("ewma of a single row is that row; constant-median filter keeps a short constant series") {
    import graft.ml.Ewma
    val one = Seq(("t1", 0L, 4.2)).toDF("tag", "bucket_ts", "value")
    assert(Ewma.ewma(one, Seq("tag"), "bucket_ts", "value", span = 10.0)
      .head().getAs[Double]("ewma") == 4.2)
    val const = Seq(("t1", 0L, 5.0), ("t1", 600L, 5.0), ("t1", 1200L, 5.0))
      .toDF("tag", "bucket_ts", "value")
    // window wider than the series: residual 0, IQR 0, |0| <= 0 keeps all
    assert(TimeSeries.filterPeriodsMedian(const, Seq("tag"),
      Seq("bucket_ts"), "value", window = 10, nIqr = 1.5).count() == 3)
  }

  test("bruteTopK with k beyond the corpus and single-doc/self-edge closures stay exact") {
    import graft.llm.Components
    assert(Similarity.bruteTopK(emb2, emb2, "vec_id", "embedding", k = 5)
      .count() == 2, "each query finds the one other row, never itself")
    assert(TextDedup.simhashNearDups(
      Seq((1L, "only one document here")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 0)
    val cc = Components.connectedComponents(
      Seq((5L, 5L)).toDF("a", "b")).collect()
    assert(cc.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((5L, 5L)), "a self-edge is one node in its own component")
  }

  test("InfImputer minmax fit on an empty frame fails loudly; extremes strategy stays total") {
    val wide = Seq.empty[(Long, Double)].toDF("bucket_ts", "t1")
    val e = intercept[IllegalArgumentException] {
      InfImputer.fit(wide, Seq("t1"), strategy = "minmax")
    }
    assert(e.getMessage.contains("no finite values"))
    // extremes derives nothing from the rows: fit + transform stay total
    val f = InfImputer.fit(wide, Seq("t1"), strategy = "extremes")
    assert(f.transform(wide, Seq("t1")).count() == 0)
  }
}
