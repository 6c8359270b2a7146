package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Multimodal, Similarity, TextAnalysis, TextDedup}

/** Regression coverage for the round-10 llm-layer review findings:
  * empty/multilingual text edges, degenerate embeddings in the ANN
  * paths, untrusted multimodal metadata bounds, and the simhash
  * banding contract. */
class LlmReviewFixesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("empty text scores punctRatio 0 and a finite quality, never NaN") {
    val row = Seq("", "!!!", "hello world").toDF("text")
      .select(TextAnalysis.punctRatio($"text").as("p"),
        TextAnalysis.qualityScore($"text").as("q"))
      .collect()
    assert(row(0).getDouble(0) == 0.0 && row(0).getDouble(1) == 0.0)
    assert(row(1).getDouble(0) == 1.0 && row(1).getDouble(1) == 0.0)
    assert(row.forall(r => !r.getDouble(0).isNaN && !r.getDouble(1).isNaN))
  }

  test("subwordCount treats non-Latin letters as letters, not punctuation") {
    val got = Seq("привет мир", "Größe", "abc 42!").toDF("text")
      .select(TextAnalysis.subwordCount($"text")).as[Int].collect()
    assert(got.toSeq == Seq(2, 1, 3))
  }

  test("simhashNearDups recall is total for thresholds beyond 3 (derived bands)") {
    // the fixed 4x8 banding guaranteed a clean shared band only up to
    // hamming 3; with bands = maxHamming + 1 the banded candidates must
    // reproduce the all-pairs hamming filter EXACTLY at any threshold
    val docs = (0 until 24).map(i =>
      (i.toLong, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 31}").mkString(" ")))
      .toDF("id", "text")
    val sh = docs.select($"id", TextDedup.simhash32($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    for (h <- Seq(4, 6)) {
      val brute = (for {
        a <- sh.keys; b <- sh.keys if a < b
        if java.lang.Long.bitCount(sh(a) ^ sh(b)) <= h
      } yield (a, b, java.lang.Long.bitCount(sh(a) ^ sh(b)).toLong)).toSet
      val got = TextDedup.simhashNearDups(docs, "id", "text", h)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == brute, s"maxHamming=$h")
    }
    intercept[IllegalArgumentException](
      TextDedup.simhashNearDups(docs, "id", "text", 32))
  }

  test("sq8TopK survives a NaN embedding: training ignores it, it never ranks") {
    // ids 1 and 2 are near-identical; id 3 carries a NaN element — an
    // unfiltered min/max would make step NaN and every reconstruction
    // NaN, so every query would 'find' the lowest ids instead
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.2f)),
      (2L, Array(0.9f, 0.1f, 0.2f)),
      (3L, Array(Float.NaN, 5.0f, 0.1f)),
      (4L, Array(-1.0f, 0.5f, 0.9f))).toDF("id", "emb")
    val queries = corpus.filter($"id" === 1L)
    val got = Similarity.sq8TopK(corpus, queries, "id", "emb", k = 1)
      .select($"cid").as[Long].collect()
    assert(got.toSeq == Seq(2L), "nearest must be the near-identical row")
  }

  test("lshTopK completes with a zero-norm vector present and floors it") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.05f)),
      (3L, Array(0.0f, 0.0f))).toDF("id", "emb")
    // planes=1 → few buckets, all rows collide with high probability;
    // the zero vector gets a valid all-ones bucket and reaches scoring
    val got = Similarity.lshTopK(corpus, "id", "emb", planes = 1, k = 1)
      .filter($"qid" === 1L).select($"cid").as[Long].collect()
    assert(!got.contains(3L), "the zero vector must never outrank a real cosine")
  }

  test("frame samplers cap hostile duration claims; resize rejects overflow") {
    // a 4-byte payload claiming a 10^12 ms duration must cap at
    // MaxFramesPerClip rows, not OOM the task with a billion frames
    val media = Seq((7L, "wxyz")).toDF("id", "payload")
    val huge = Multimodal.asMedia(media, "id", "payload", "video/mp4")
      .withColumn("meta", struct(lit("video/mp4").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(1000L * 1000 * 1000 * 1000).as("duration_ms")))
    val capped = Multimodal.sampleFrames(huge, intervalMs = 1)
    assert(capped.count() == Multimodal.MaxFramesPerClip.toLong)
    // ADVICE r10: the cap must not be silent — every frame row of a
    // capped clip is flagged, a fully-sampled clip's rows are not
    assert(capped.filter(!$"truncated").count() == 0L)
    val full = Multimodal.sampleFrames(
      Multimodal.asMedia(media, "id", "payload", "video/mp4"), intervalMs = 1)
    assert(full.count() == 4L && full.filter($"truncated").count() == 0L)
    intercept[IllegalArgumentException](Multimodal.resizeStub(Array[Byte](1), 46341, 46341))
    intercept[IllegalArgumentException](Multimodal.resizeStub(Array[Byte](1), 0, 5))
  }
}
