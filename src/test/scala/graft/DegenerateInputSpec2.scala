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
