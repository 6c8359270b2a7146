package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.{AsOfJoin, TimeSeries}
import graft.llm.{Components, Similarity, TextDedup}
import graft.ml.{Ewma, Scalers, Windows}

/** Degenerate-input contracts across the core library entry points: an
  * EMPTY (but schema-correct) input must come back empty — or, where an
  * empty input makes the operation meaningless (a scaler fit), fail
  * loudly with the established contract exception — never NPE, hang, or
  * fabricate rows. At 100 TB empty slices are routine (a partition with
  * no rows in the window, a benchmark with no overlap, a corpus filter
  * that matched nothing), so the empty path is a production path. */
class DegenerateInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyEmb =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("connectedComponents of an empty edge set is empty (and releasable)") {
    val cc = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(cc.count() == 0)
    assert(cc.columns.toSeq == Seq("node", "component"))
    Components.release(cc) // must not throw on an empty closure result
  }

  test("dupClusters of an empty pair set is empty with the keep contract intact") {
    val dc = Components.dupClusters(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(dc.count() == 0)
    assert(dc.columns.contains("keep"))
    Components.release(dc)
  }

  test("the minhash pipeline runs end-to-end on an empty corpus") {
    val sh = TextDedup.withShingles(emptyDocs, "doc_id", "text")
    assert(sh.count() == 0)
    val cands = TextDedup.candidatePairs(sh)
    assert(cands.count() == 0)
    assert(TextDedup.verifiedPairs(sh, cands, threshold = 0.3).count() == 0)
  }

  test("contamination against an empty benchmark is empty; contaminationFull keeps the corpus") {
    // no row is a benchmark doc — the gram set to scan against is empty
    val corpus = Seq((1L, "the quick brown fox jumps over it", false),
      (2L, "a completely different document body here", false))
      .toDF("doc_id", "text", "bm")
    assert(TextDedup.contamination(corpus, "doc_id", "text",
      col("bm"), n = 3).count() == 0)
    // the left-join variant's whole point: every corpus doc appears,
    // n_shared coalesced to 0, so clean-selection by == 0 keeps both
    val full = TextDedup.contaminationFull(corpus, "doc_id", "text",
      col("bm"), n = 3)
    assert(full.count() == 2)
    assert(full.filter(col("n_shared") === 0).count() == 2)
    // and an empty CORPUS (every row is benchmark-side) reports nothing
    val allBm = corpus.withColumn("bm", lit(true))
    assert(TextDedup.contamination(allBm, "doc_id", "text",
      col("bm"), n = 3).count() == 0)
    assert(TextDedup.contaminationFull(allBm, "doc_id", "text",
      col("bm"), n = 3).count() == 0)
  }

  test("bruteTopK with an empty corpus or empty query set is empty") {
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.bruteTopK(emptyEmb, emb, "vec_id", "embedding",
      k = 3).count() == 0)
    assert(Similarity.bruteTopK(emb, emptyEmb, "vec_id", "embedding",
      k = 3).count() == 0)
  }

  test("as-of join with an empty right side keeps every left row unmatched") {
    val left = Seq(("m1", 100L), ("m1", 200L), ("m2", 150L))
      .toDF("key", "ts")
    val right = Seq.empty[(String, Long, Double)].toDF("key", "rts", "v")
    val out = AsOfJoin.backward(left, right, Seq("key"), "ts", "rts",
      payload = Seq("v"))
    assert(out.count() == 3, "backward as-of is left-preserving")
    assert(out.filter(col("v").isNull).count() == 3)
    assert(out.filter(col("asof_ts").isNull).count() == 3)
  }

  test("resample / ewma / withLookback of an empty series are empty") {
    val long = Seq.empty[(String, String, Double)].toDF("tag", "ts", "value")
    assert(TimeSeries.resample(long, Seq("tag"), "ts", "value",
      widthSec = 600L).count() == 0)
    assert(Ewma.ewma(long, Seq("tag"), "ts", "value", span = 10.0)
      .count() == 0)
    val wide = Seq.empty[(Long, Double, Double)].toDF("bucket_ts", "t1", "t2")
    val (lagged, lagTags) = Windows.withLookback(wide, Seq("t1", "t2"),
      "bucket_ts", lookback = 2, lookahead = 1)
    assert(lagTags.nonEmpty, "lag column names derive from tags, not rows")
    assert(lagged.count() == 0)
  }

  test("scaler fits on an empty frame fail loudly, never emit zero stats") {
    val wide = Seq.empty[(Long, Double)].toDF("bucket_ts", "t1")
    val e = intercept[IllegalArgumentException] {
      Scalers.fitMinMax(wide, Seq("t1"))
    }
    assert(e.getMessage.contains("no non-null values"),
      s"want the aggCell contract message, got: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      Scalers.fitRobust(wide, Seq("t1"))
    }
  }
}
