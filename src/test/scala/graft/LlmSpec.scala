package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Multimodal, Similarity, TextAnalysis, TextDedup}

class LlmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("minhash banding finds the planted near-dups without a crossJoin") {
    val docs = Tables(spark, sf, "documents")
    val shDf = TextDedup.withShingles(docs, "doc_id", "text").persist()
    val cands = TextDedup.candidatePairs(shDf)
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"LSH candidate plan must not contain a cross join:\n$plan")
    val verified = TextDedup.verifiedPairs(shDf, cands)
    val pairs = verified.collect()
    assert(pairs.nonEmpty, "expected planted near-dup pairs in documents")
    pairs.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.3))
  }

  test("shingles of short documents are empty, not a crash") {
    val df = Seq((1L, "one"), (2L, "two words"), (3L, "three whole words here"))
      .toDF("id", "text")
    val got = df.select($"id", TextDedup.shingles($"text").as("sh"))
      .orderBy($"id").collect()
    assert(got(0).getSeq[String](1).isEmpty)
    assert(got(1).getSeq[String](1).isEmpty)
    assert(got(2).getSeq[String](1).size == 2)
    // and the full dedup pipeline tolerates them
    val shDf = TextDedup.withShingles(df, "id", "text")
      .repartition(org.apache.spark.sql.functions.col("id"))
    assert(TextDedup.candidatePairs(shDf).count() == 0)
  }

  test("simhash of near-identical docs has small hamming distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different words about spark catalyst tungsten plans")
    ).toDF("id", "text").withColumn("sh", TextDedup.simhash($"text"))
    val m = df.select($"id", $"sh").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val far = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(near < far, s"near=$near should be < far=$far")
    val viaCol = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select(TextDedup.hamming($"a.sh", $"b.sh").as("h")).as[Long].collect()
    assert(viaCol.forall(h => h >= 0 && h <= 64))
  }

  test("langId picks marker languages and falls back to unknown") {
    val df = Seq(
      "der hund und die katze ist von hier",
      "the cat of the house and a dog",
      "xyzzy plugh quux").toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect()
    assert(got.toSeq == Seq("de", "en", "unknown"))
  }

  test("quality score is in [0,1] and penalizes repetition") {
    val df = Seq(
      ("rep", (1 to 100).map(_ => "spam").mkString(" ")),
      ("div", (1 to 100).map(i => s"word$i").mkString(" "))).toDF("id", "text")
    val m = df.select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(m("div") > m("rep"))
  }

  test("quality score does not zero clean non-English text (unicode punct)") {
    // the old ASCII class counted every accented/CJK char as punctuation
    // and the 10x penalty zeroed the score of exactly the multilingual
    // data the langId markers claim to support
    val de = (1 to 60).map(i => s"über$i schön$i").mkString(" ")
    val zh = (1 to 120).map(i => s"的是了在和有$i").mkString(" ")
    val junk = (1 to 200).map(_ => "@#%&!").mkString(" ")
    val m = Seq(("de", de), ("zh", zh), ("junk", junk)).toDF("id", "text")
      .select($"id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("de") > 0.5, s"de=${m("de")}")
    assert(m("zh") > 0.5, s"zh=${m("zh")}")
    assert(m("junk") == 0.0, s"junk=${m("junk")}")
  }

  test("topBigramFrac propagates null for null text like its siblings") {
    val row = Seq(Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(TextAnalysis.topBigramFrac($"text").as("tb"),
        TextAnalysis.dupWordFrac($"text").as("dw")).head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("ANN seed selection works on sparse/offset id spaces") {
    // ids start at 1000: filter(id < n) found nothing and returned an
    // EMPTY result with no error; smallest-n selection must serve
    val emb = Tables(spark, sf, "embeddings")
      .select(($"vec_id" + 1000L).as("vec_id"), $"embedding")
    val got = Similarity.ivfTopK(emb, "vec_id", "embedding",
      nCentroids = 4, nprobe = 2, k = 3, queryPred = $"id" < 1005)
    assert(got.count() > 0)
    val cb = Similarity.pqCodebookFromIds(emb, "vec_id", "embedding",
      mSub = 8, nCentroids = 4)
    assert(cb.head.size == 4, "codebook must carry all requested seeds")
  }

  test("a zero-norm query floors its cosines instead of fabricating neighbors") {
    val emb = Tables(spark, sf, "embeddings")
    val dim = emb.select(size($"embedding")).head().getInt(0)
    val zeroQ = Seq((9999L, Seq.fill(dim)(0.0))).toDF("vec_id", "embedding")
    val got = Similarity.bruteTopK(emb, zeroQ, "vec_id", "embedding", k = 3)
      .select($"cos").as[Double].collect()
    // neighbors still rank (floor score −2), but none carries a null or
    // fabricated real cosine
    assert(got.nonEmpty && got.forall(_ == -2.0))
  }

  test("brute top-k is exact and bucketed LSH candidates agree with it where buckets match") {
    val emb = Tables(spark, sf, "embeddings")
    val topk = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 5), "vec_id",
      "embedding", k = 3).collect()
    assert(topk.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 3))
    // LSH pairs are a subset of all pairs with correct cosines
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", planes = 4, k = 3)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(lsh.count() > 0)
  }

  test("multimodal feature kernel matches the reference implementation") {
    val media = Multimodal.asMedia(
      Seq((7L, "abc")).toDF("id", "payload"), "id", "payload", "text/plain")
    val row = Multimodal.extractFeatures(media)
      .select($"features.n_bytes", $"features.checksum", $"features.histogram")
      .head()
    assert(row.getLong(0) == 3L)
    val expChecksum = (((('a'.toLong * 31) + 'b') * 31) + 'c') & 0xffffffffL
    assert(row.getLong(1) == expChecksum)
    val hist = row.getSeq[Long](2)
    assert(hist.length == 16 && hist(6) == 3L) // 'a'..'c' = 0x61..0x63
    // nulls decode to empty payloads, not failures
    val withNull = Multimodal.extractFeatures(Multimodal.asMedia(
      Seq((8L, null.asInstanceOf[String])).toDF("id", "payload"),
      "id", "payload", "text/plain"))
    assert(withNull.select($"features.n_bytes").head().getLong(0) == 0L)
  }

  test("every LLM query key has a matching oracle") {
    import graft.operators.LlmQueries
    assert(LlmQueries.oracleSql.keySet == LlmQueries.queries.keySet)
  }

  test("banded simhash32 finds near-identical docs, no crossJoin") {
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val df = Seq(
      (1L, base + "ending one"),
      (2L, base + "ending two"),
      (3L, (1 to 40).map(i => s"unrelated$i").mkString(" "))).toDF("id", "text")
    val pairs = TextDedup.simhashNearDups(df, "id", "text", maxHamming = 6)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    val got = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"expected (1,2) in $got")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
  }

  test("inverted-index candidates respect the stop-shingle cap") {
    // "common common common" trigram appears in ALL docs → df cap excludes
    // it; docs 1/2 still share a rare shingle, doc 3 shares only the hub
    val common = "common common common"
    val df = Seq(
      (1L, s"alpha beta gamma $common"),
      (2L, s"alpha beta gamma delta $common"),
      (3L, s"zeta eta theta $common")).toDF("id", "text")
    val shDf = TextDedup.withShingles(df, "id", "text")
    val capped = TextDedup.invertedIndexCandidates(shDf, maxDf = 2)
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)))
    assert(!capped.exists(p => p._1 == 3L || p._2 == 3L),
      s"hub shingle must not generate candidates: $capped")
    val uncapped = TextDedup.invertedIndexCandidates(shDf, maxDf = 100)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 3) // all pairs share the hub when uncapped
  }

  test("IVF top-k recall vs brute force is high and the plan has no crossJoin") {
    val emb = Tables(spark, sf, "embeddings")
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
      nCentroids = 16, nprobe = 4, k = 3, queryPred = col("id") < 5)
    // the corpus x centroids assignment is a BROADCAST nested loop with a
    // constant-size (16-row) build side — linear in the corpus, the
    // canonical IVF shape; only a non-broadcast cartesian would be O(N²)
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val brute = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val got = ivf.select($"qid", $"cand").as[(Long, Long)].collect().toSet
    // IVF searches only probed lists: expect most of the exact top-3
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall $recall too low (got=$got brute=$brute)")
  }

  test("SQ8 quantization bounds per-element error by step/2 and keeps top-k recall high") {
    val emb = Tables(spark, sf, "embeddings")
    val sq8 = Similarity.sq8TopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3)
    // |Q|·N broadcast scan, never an N² cartesian
    val plan = sq8.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"))
    assert(!plan.contains("CartesianProduct"))
    // uniform-quantizer guarantee: reconstructed value within step/2 of
    // the original, per element, for EVERY corpus vector
    val stats = emb.select(posexplode($"embedding").as(Seq("d", "x")))
      .groupBy($"d").agg(min($"x").as("lo"), max($"x").as("hi"))
      .orderBy($"d")
      .as[(Int, Float, Float)].collect()
    val step = stats.map { case (_, lo, hi) =>
      if (hi == lo) 0.0 else (hi.toDouble - lo.toDouble) / 255.0 }
    val rows = emb.select($"embedding").as[Seq[Float]].collect()
    rows.foreach { v =>
      v.zipWithIndex.foreach { case (x, d) =>
        val (_, lo, _) = stats(d)
        val code = math.max(0.0, math.min(255.0,
          math.floor((x - lo.toDouble) / (if (step(d) == 0) 1 else step(d)) + 0.5)))
        val recon = if (step(d) == 0) lo.toDouble else lo.toDouble + code * step(d)
        assert(math.abs(recon - x) <= step(d) / 2 + 1e-12,
          s"dim $d: |$recon - $x| > ${step(d) / 2}")
      }
    }
    // quantized top-3 retains most of the exact top-3
    val brute = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val got = sq8.select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    assert(recall >= 0.8, s"SQ8 recall $recall too low (got=$got brute=$brute)")
  }

  test("PQ reconstructs codebook seed rows exactly, so on a seed-only corpus it equals brute force") {
    val emb = Tables(spark, sf, "embeddings")
    val seeds = emb.filter($"vec_id" < 16)
    // every seed row's sub-vectors ARE centroids: d2 = 0 in each
    // subspace, argmin unique (random floats), reconstruction exact —
    // PQ top-k over a seed-only corpus must equal the exact scan
    val cb = Similarity.pqCodebookFromIds(seeds, "vec_id", "embedding",
      mSub = 8, nCentroids = 16)
    val recon = seeds
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
      .select($"vec_id", $"e",
        Similarity.pqReconstruct($"e", cb).as("re"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    recon.foreach { case (id, e, re) =>
      assert(e == re, s"seed row $id must reconstruct exactly") }
    val pq = Similarity.pqTopKWith(seeds, seeds.filter($"vec_id" < 4),
        "vec_id", "embedding", cb, k = 3)
      .select($"qid", $"rank", $"cid").as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteTopK(seeds, seeds.filter($"vec_id" < 4),
        "vec_id", "embedding", k = 3)
      .select($"qid", $"rank", $"cid").as[(Long, Int, Long)].collect().toSet
    assert(pq == brute)
  }

  test("PQ top-k is a broadcast scan and 32x compression keeps usable recall") {
    val emb = Tables(spark, sf, "embeddings")
    val pq = Similarity.pqTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", mSub = 8, nCentroids = 16, k = 3)
    // encode is a stateless per-row map; scoring a |Q|·N broadcast
    // scan — never an N² cartesian
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("Broadcast"))
    assert(!plan.contains("CartesianProduct"))
    val brute = Similarity.bruteTopK(emb, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3)
      .select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val got = pq.select($"qid", $"cid").as[(Long, Long)].collect().toSet
    val recall = brute.count(got.contains).toDouble / brute.size
    // 8 codes for 64 dims is a far harsher trade than SQ8's 4x, and
    // near-uniform synthetic embeddings are PQ's worst case (no cluster
    // structure for the codebook to exploit — measured 0.27 here, same
    // caveat as the IVF rows in COVERAGE's ANN table); the deterministic
    // floor just pins that the ranking carries real signal
    assert(recall >= 0.2, s"PQ recall $recall too low (got=$got brute=$brute)")
  }

  test("IVF-PQ with a lossless codebook equals plain IVF (composition is exact where PQ is)") {
    val emb = Tables(spark, sf, "embeddings")
    val seeds = emb.filter($"vec_id" < 16)
    // seed-only corpus: every vector reconstructs exactly, so the PQ
    // leg of the composition is the identity and IVF-PQ must return
    // byte-for-byte what ivfTopKWith returns
    val cents = Similarity.trainIvfCentroids(seeds, "vec_id", "embedding",
      nCentroids = 4, iters = 0)
    val cb = Similarity.pqCodebookFromIds(seeds, "vec_id", "embedding",
      mSub = 8, nCentroids = 16)
    val qp = col("id") < 4
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"rank", $"cand").as[(Long, Int, Long)].collect().toSet
    val ivfPq = rows(Similarity.ivfPqTopK(seeds, "vec_id", "embedding",
      cents, cb, nprobe = 2, k = 3, queryPred = qp))
    val ivf = rows(Similarity.ivfTopKWith(seeds, "vec_id", "embedding",
      cents, nprobe = 2, k = 3, queryPred = qp))
    assert(ivfPq == ivf)
    assert(ivfPq.nonEmpty)
  }

  test("trained PQ codebook does not increase reconstruction MSE over the seed codebook") {
    val emb = Tables(spark, sf, "embeddings")
    def mse(cb: Similarity.PqCodebook): Double =
      emb.select($"embedding".cast("array<double>").as("e"))
        .select(Similarity.pqReconstruct($"e", cb).as("re"), $"e")
        .select(aggregate(zip_with($"e", $"re", (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("se"))
        .agg(avg($"se")).as[Double].head()
    val idCb = Similarity.pqCodebookFromIds(emb, "vec_id", "embedding",
      mSub = 8, nCentroids = 16)
    val trained = Similarity.trainPqCodebook(emb, "vec_id", "embedding",
      mSub = 8, nCentroids = 16, iters = 3)
    val (e0, e1) = (mse(idCb), mse(trained))
    // Lloyd's objective is non-increasing per round (assignment and
    // arithmetic-mean update both only decrease L2 error)
    assert(e1 <= e0 + 1e-9, s"trained MSE $e1 > seed MSE $e0")
    assert(e1 > 0.0) // and lossy, as 32x compression must be
  }

  test("multimodal resize and frame-sample keep the media plumbing shape") {
    val media = Multimodal.asMedia(
      Seq((1L, "0123456789abcdef"), (2L, "xy")).toDF("id", "payload"),
      "id", "payload", "image/png")
    val resized = Multimodal.resize(media, 4, 2)
    assert(resized.schema == Multimodal.mediaSchema)
    val r1 = resized.filter($"media_id" === 1L).head()
    assert(r1.getAs[Array[Byte]]("content").length == 8)
    assert(r1.getAs[org.apache.spark.sql.Row]("meta").getInt(1) == 4)
    // deterministic stride subsample: byte 0 stays first
    assert(r1.getAs[Array[Byte]]("content")(0) == '0'.toByte)

    val frames = Multimodal.sampleFrames(media, intervalMs = 5, frameBytes = 4)
    assert(frames.schema == Multimodal.frameSchema)
    val f1 = frames.filter($"media_id" === 1L).orderBy($"frame_idx").collect()
    // 16-byte payload → 16 "ms" → frames at 0, 5, 10, 15
    assert(f1.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(f1.head.getAs[Array[Byte]]("frame").toSeq == "0123".getBytes.toSeq)
    // an exactly-divisible duration must NOT emit a phantom frame at
    // ts == duration (10 "ms" / 5 → frames at 0 and 5 only)
    val even = Multimodal.sampleFrames(Multimodal.asMedia(
      Seq((9L, "0123456789")).toDF("id", "payload"), "id", "payload",
      "video/mp4"), intervalMs = 5, frameBytes = 4)
    assert(even.select($"frame_ts_ms").as[Long].collect().toSeq == Seq(0L, 5L))
  }

  test("prefix-filtered candidates are lossless vs direct jaccard pairs") {
    val docs = Tables(spark, sf, "documents")
    val shDf = TextDedup.withShingles(docs, "doc_id", "text").persist()
    // the unguarded Σ df² join is the ground truth — reachable only via
    // the explicit opt-out (round-3 verdict: no query path may default
    // into an uncapped posting self-join)
    val direct = TextDedup.jaccardPairs(shDf, 0.3, unboundedOk = true)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(direct.nonEmpty)
    val cands = TextDedup.prefixFilterCandidates(shDf, 0.3)
      .as[(Long, Long)].collect().toSet
    assert(direct.subsetOf(cands),
      s"prefix filter lost pairs: ${direct -- cands}")
    // the DEFAULT path equals the direct exact join, values included,
    // on BOTH sides of the threshold router: at 0.3 it IS the direct
    // join (loose-t routing, round 9); at 0.6 it composes the prefix
    // filter + verification, which must still match the direct answer
    for (t <- Seq(0.3, 0.6)) {
      val guarded = TextDedup.jaccardPairs(shDf, t)
        .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
        .collect().toSet
      val directFull = TextDedup.jaccardPairs(shDf, t, unboundedOk = true)
        .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
        .collect().toSet
      assert(guarded == directFull, s"router path diverged at t=$t")
    }
  }

  test("image decode is real: PNG/BMP fixtures decode bit-exactly") {
    import java.awt.image.BufferedImage
    // deterministic 2x2 fixture: black, white, red, green — integer
    // BT.601 lumas 0, 255, 76, 149 → histogram bins 0, 15, 4, 9
    def fixture(): BufferedImage = {
      val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
      img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x00ff00)
      img
    }
    def encode(format: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(fixture(), format, out),
        s"JRE cannot encode $format")
      out.toByteArray
    }
    val expectedHist =
      Seq(0, 4, 9, 15).foldLeft(Vector.fill(16)(0L))((h, b) => h.updated(b, h(b) + 1))
    for (fmt <- Seq("png", "bmp")) {
      val bytes = encode(fmt)
      val (w, h, hist) = Multimodal.decodeImage(bytes).get
      assert((w, h) == ((2, 2)), fmt)
      assert(hist.toVector == expectedHist, s"$fmt: ${hist.toVector}")
    }
    // and through the partition-local kernel over a DataFrame
    val media = Multimodal.asMedia(
      Seq((1L, encode("png")), (2L, "not an image".getBytes),
        (3L, encode("bmp"))).toDF("id", "payload"),
      "id", "payload", "image/png")
    val feats = Multimodal.extractImageFeatures(media)
      .select($"media_id", $"image_features")
      .orderBy($"media_id").collect()
    val f1 = feats(0).getStruct(1)
    assert(f1.getInt(0) == 2 && f1.getInt(1) == 2)
    assert(f1.getSeq[Long](2).toVector == expectedHist)
    assert(f1.getLong(3) == encode("png").length.toLong)
    // undecodable payload → null struct, not a task failure
    assert(feats(1).isNullAt(1))
    assert(feats(2).getStruct(1).getInt(0) == 2)
  }

  test("image decode rejects decompression bombs before allocating the raster") {
    // a VALID tiny BMP whose header is patched to declare gigapixel
    // dimensions: ImageIO.read would allocate the full raster from the
    // header alone (OutOfMemoryError, past any catch Exception) — the
    // guard must return None from the header check instead
    val out = new java.io.ByteArrayOutputStream()
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    val bomb = out.toByteArray.clone()
    def putIntLE(off: Int, v: Int): Unit = {
      bomb(off) = (v & 0xff).toByte; bomb(off + 1) = ((v >> 8) & 0xff).toByte
      bomb(off + 2) = ((v >> 16) & 0xff).toByte
      bomb(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putIntLE(18, 1 << 30) // BITMAPINFOHEADER width
    putIntLE(22, 1 << 30) // BITMAPINFOHEADER height
    assert(Multimodal.decodeImage(bomb).isEmpty)
    // the unpatched original still decodes
    assert(Multimodal.decodeImage(out.toByteArray).isDefined)
  }

  test("image decode leaks no ImageIO cache temp files") {
    // with the default disk cache enabled, createImageInputStream backs
    // the stream with an executor temp FILE (ImageIO*.tmp in tmpdir);
    // decodeImage must close the stream on every path — decoded,
    // unreadable, and bomb-rejected — or ingest leaks a file per blob
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    def cacheFiles(): Set[String] = tmp.listFiles()
      .filter(f => f.getName.startsWith("imageio") ||
        f.getName.startsWith("ImageIO"))
      .map(_.getName).toSet
    val out = new java.io.ByteArrayOutputStream()
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(javax.imageio.ImageIO.write(img, "bmp", out))
    val good = out.toByteArray
    val bomb = good.clone()
    bomb(18) = 0; bomb(19) = 0; bomb(20) = 0; bomb(21) = 64 // width 2^30
    val before = cacheFiles()
    val wasCaching = javax.imageio.ImageIO.getUseCache
    javax.imageio.ImageIO.setUseCache(true)
    try {
      (1 to 50).foreach { _ =>
        assert(Multimodal.decodeImage(good).isDefined)
        assert(Multimodal.decodeImage("junk".getBytes).isEmpty)
        assert(Multimodal.decodeImage(bomb).isEmpty)
      }
    } finally javax.imageio.ImageIO.setUseCache(wasCaching)
    assert(cacheFiles() == before,
      s"leaked ImageIO cache files: ${cacheFiles() -- before}")
  }

  test("audio decode is real: generated WAV fixtures decode bit-exactly") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(fmt: AudioFormat, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val ain = new AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt,
        data.length / fmt.getFrameSize)
      AudioSystem.write(ain, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    // 16-bit signed mono, 8 kHz, 800-sample ramp across the full range
    val samples16 = Array.tabulate(800)(i => (-32768 + i * 81).toShort)
    val bytes16 = new Array[Byte](1600)
    samples16.zipWithIndex.foreach { case (s, i) =>
      bytes16(2 * i) = (s & 0xff).toByte          // little-endian
      bytes16(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val expected16 = samples16.foldLeft(Vector.fill(16)(0L))((h, s) =>
      h.updated((s + 32768) >> 12, h((s + 32768) >> 12) + 1))
    val (r16, c16, n16, d16, h16) = Multimodal.decodeAudio(
      wav(new AudioFormat(8000f, 16, 1, true, false), bytes16)).get
    assert((r16, c16, n16, d16) == ((8000, 1, 800L, 100L)))
    assert(h16.toVector == expected16)

    // 8-bit unsigned mono, 8 kHz: full 0..255 ramp → 16 samples per bin
    val bytes8 = Array.tabulate(256)(i => i.toByte)
    val (r8, c8, n8, d8, h8) = Multimodal.decodeAudio(
      wav(new AudioFormat(8000f, 8, 1, false, false), bytes8)).get
    assert((r8, c8, n8, d8) == ((8000, 1, 256L, 32L)))
    assert(h8.toVector == Vector.fill(16)(16L))

    // stereo interleaves both channels into one histogram
    val stereo = Array[Byte](0, 0, -1, 127, 0, -128, 1, 0) // L,R,L,R 16-bit LE
    val (_, cs, ns, _, hs) = Multimodal.decodeAudio(
      wav(new AudioFormat(8000f, 16, 2, true, false), stereo)).get
    assert(cs == 2 && ns == 2L && hs.sum == 4L)

    // and through the partition-local kernel over a DataFrame
    val media = Multimodal.asMedia(
      Seq((1L, wav(new AudioFormat(8000f, 16, 1, true, false), bytes16)),
        (2L, "not audio".getBytes),
        (3L, wav(new AudioFormat(8000f, 8, 1, false, false), bytes8)))
        .toDF("id", "payload"),
      "id", "payload", "audio/wav")
    val feats = Multimodal.extractAudioFeatures(media)
      .select($"media_id", $"audio_features")
      .orderBy($"media_id").collect()
    val f1 = feats(0).getStruct(1)
    assert(f1.getInt(0) == 8000 && f1.getInt(1) == 1 && f1.getLong(2) == 800L)
    assert(f1.getSeq[Long](4).toVector == expected16)
    assert(feats(1).isNullAt(1)) // undecodable → null struct, no failure
    assert(feats(2).getStruct(1).getSeq[Long](4).toVector == Vector.fill(16)(16L))
  }

  test("winnowing guarantees a shared fingerprint for long shared substrings") {
    val shared = "the common stretch of text both documents contain"
    val df = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"another beginning $shared and another ending"),
      (3L, "totally unrelated content with no overlap whatsoever")).toDF("id", "text")
    val fps = TextDedup.winnowingFingerprints(df, "id", "text", k = 5, w = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // shared substring length >= w + k - 1 = 12 → guaranteed overlap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
  }

  test("fingerprint dup groups collapse word-order copies") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),       // permutation of 1
      (3L, "alpha beta delta")).toDF("id", "text")
    val groups = TextDedup.dupGroups(df, "id",
      TextDedup.contentFingerprint($"text"), "fingerprint").collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keeper") == 1L)
    assert(groups(0).getAs[Long]("n_docs") == 2L)
  }

  test("video decode is real: generated MJPEG-in-AVI fixture decodes bit-exactly") {
    import java.awt.image.BufferedImage
    def jpegFrame(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, rgb)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out), "JRE cannot encode jpg")
      out.toByteArray
    }
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, payload: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ payload)
    // 3 solid-color frames at 25 fps (40 000 µs/frame), 4×2
    val frames = Seq(jpegFrame(0x000000), jpegFrame(0xffffff), jpegFrame(0x808080))
    val avih = new Array[Byte](56)
    le32(40000L).copyToArray(avih, 0)            // dwMicroSecPerFrame
    le32(frames.size.toLong).copyToArray(avih, 16) // dwTotalFrames
    le32(1L).copyToArray(avih, 24)               // dwStreams
    le32(4L).copyToArray(avih, 32)               // dwWidth
    le32(2L).copyToArray(avih, 36)               // dwHeight
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body

    // container round-trip is BIT-EXACT: stored frames come back verbatim
    val parsed = Multimodal.parseAvi(avi).get
    assert((parsed.width, parsed.height, parsed.usPerFrame) == ((4, 2, 40000L)))
    assert(parsed.frames.map(_.toSeq) == frames.map(_.toSeq))

    // features: dims + duration from the header, luma hist = sum of the
    // per-frame ImageIO decodes (JPEG is lossy; decoding our own
    // encoding is deterministic)
    val (w, h, n, durMs, hist) = Multimodal.decodeVideo(avi).get
    assert((w, h, n, durMs) == ((4, 2, 3, 120L)))
    val expected = frames.map(f => Multimodal.decodeImage(f).get._3)
      .foldLeft(Vector.fill(16)(0L))((acc, hh) =>
        acc.indices.map(i => acc(i) + hh(i)).toVector)
    assert(hist.toVector == expected)

    // real sampling: frame picked by the header interval, bytes verbatim
    val media = Multimodal.asMedia(
      Seq((7L, avi)).toDF("id", "payload"), "id", "payload", "video/avi")
    val rows = Multimodal.sampleFramesAvi(media, 50L)
      .orderBy($"frame_idx").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
      == Seq((7L, 0, 0L), (7L, 1, 50L), (7L, 2, 100L)))
    assert(rows(1).getAs[Array[Byte]](3).toSeq == frames(1).toSeq) // 50 ms → frame 1
    assert(rows(2).getAs[Array[Byte]](3).toSeq == frames(2).toSeq) // 100 ms → frame 2

    // undecodable payloads: no frame rows, null feature struct
    assert(Multimodal.parseAvi("not an avi container".getBytes).isEmpty)
    val feats = Multimodal.extractVideoFeatures(Multimodal.asMedia(
      Seq((1L, avi), (2L, "zz".getBytes)).toDF("id", "payload"),
      "id", "payload", "video/avi"))
      .select($"media_id", $"video_features").orderBy($"media_id").collect()
    assert(feats(0).getStruct(1).getInt(2) == 3)
    assert(feats(0).getStruct(1).getLong(3) == 120L)
    assert(feats(1).isNullAt(1))
  }

  /** MPEG-1 Layer III 128 kbps 44.1 kHz stereo frames, header fields
    * hand-packed from the spec layout: frame length = 144·128000/44100
    * = 417 bytes, 1152 samples per frame. */
  private def mp3Bytes(nFrames: Int, id3Junk: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Junk > 0) {
      out.write(Array[Byte]('I', 'D', '3', 3, 0, 0))
      // 4-byte syncsafe size (7 bits per byte)
      out.write(Array[Byte](0, 0, (id3Junk >> 7).toByte, (id3Junk & 0x7f).toByte))
      out.write(new Array[Byte](id3Junk))
    }
    (0 until nFrames).foreach { _ =>
      val frame = new Array[Byte](417)
      frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte // sync, V1, L3, no CRC
      frame(2) = 0x90.toByte // bitrate idx 9 (128), rate idx 0 (44100)
      frame(3) = 0x00        // stereo
      out.write(frame)
    }
    out.toByteArray
  }

  /** Minimal big-endian bit/exp-Golomb writer — the SPS fixtures are
    * built from known field values so the parser is checked against
    * construction, not against a magic byte string. */
  private final class BitWriter {
    private val bits = scala.collection.mutable.ArrayBuffer[Int]()
    def u(v: Int, n: Int): this.type = {
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1)); this
    }
    def ue(v: Int): this.type = {
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      u(0, len - 1); u(code, len); this
    }
    def bytes: Array[Byte] = {
      while (bits.size % 8 != 0) bits += 0
      bits.grouped(8).map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte)
        .toArray
    }
  }

  private def spsAnnexB(profile: Int, level: Int, widthMbs: Int,
                        heightUnits: Int, cropBottom: Int): Array[Byte] = {
    val w = new BitWriter()
    w.u(profile, 8).u(0, 8).u(level, 8)
    w.ue(0)            // sps_id
    w.ue(0)            // log2_max_frame_num_minus4
    w.ue(0); w.ue(0)   // poc type 0 + log2_max_poc
    w.ue(1)            // max_num_ref_frames
    w.u(0, 1)          // gaps_in_frame_num
    w.ue(widthMbs - 1); w.ue(heightUnits - 1)
    w.u(1, 1)          // frame_mbs_only
    w.u(0, 1)          // direct_8x8
    if (cropBottom > 0) { w.u(1, 1); w.ue(0); w.ue(0); w.ue(0); w.ue(cropBottom) }
    else w.u(0, 1)
    w.u(0, 1)          // vui absent
    Array[Byte](0, 0, 0, 1, 0x67) ++ w.bytes
  }

  test("codec metadata parsers are real: MP3 frame walk + H.264 SPS") {
    // MP3: 3 frames, with and without a leading ID3v2 tag
    for (junk <- Seq(0, 100)) {
      val m = Multimodal.parseMp3(mp3Bytes(3, junk)).get
      assert(m.sampleRate == 44100 && m.channels == 2 && m.frames == 3)
      assert(m.bitrateKbps == 128)
      assert(m.durationMs == 3L * 1152 * 1000 / 44100) // 78 ms
    }
    assert(Multimodal.parseMp3("garbage".getBytes).isEmpty)
    assert(Multimodal.parseMp3(Array.emptyByteArray).isEmpty)

    // H.264 SPS: 320x240 uncropped, and 1920x1088-coded cropped to 1080
    // (crop_bottom 4 units x 2 px in 4:2:0 frame coding)
    val sps240 = Multimodal.parseH264Sps(spsAnnexB(66, 30, 20, 15, 0)).get
    assert(sps240 == Multimodal.H264Meta(66, 30, 320, 240))
    val sps1080 = Multimodal.parseH264Sps(spsAnnexB(66, 40, 120, 68, 4)).get
    assert(sps1080.width == 1920 && sps1080.height == 1080)
    assert(Multimodal.parseH264Sps("not a nal".getBytes).isEmpty)

    // forbidden_zero_bit set (0xE7 = 0x80 | type 7): a chance start-code
    // decoy inside entropy-coded payload must NOT be typed as an SPS
    val valid = spsAnnexB(66, 30, 20, 15, 0)
    val decoy = Array[Byte](0, 0, 1, 0xE7.toByte) ++ valid.drop(5)
    assert(Multimodal.parseH264Sps(decoy).isEmpty)

    // a malformed SPS candidate (truncated payload → bit-reader overrun)
    // must not abort the scan: the real SPS after it still parses
    val malformedThenValid =
      Array[Byte](0, 0, 1, 0x67, 0, 0) ++ valid
    assert(Multimodal.parseH264Sps(malformedThenValid)
      .contains(Multimodal.H264Meta(66, 30, 320, 240)))
  }

  /** ADTS AAC fixture: `nFrames` chained 100-byte frames — AAC-LC,
    * 44100 Hz (srIdx 4), stereo (chanCfg 2), one raw data block. */
  private def aacBytes(nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until nFrames).foreach { _ =>
      val frame = new Array[Byte](100)
      frame(0) = 0xff.toByte; frame(1) = 0xf1.toByte // sync, MPEG-4, layer 00
      frame(2) = 0x50                 // AAC-LC, srIdx 4, chanCfg high bit 0
      frame(3) = 0x80.toByte          // chanCfg 2; frameLen bits 12-11 = 0
      frame(4) = 12                   // frameLen 100, bits 10-3
      frame(5) = 0x80.toByte          // frameLen bits 2-0 = 4, fullness hi
      frame(6) = 0x00                 // fullness lo + rdb 0 (= 1 block)
      out.write(frame)
    }
    out.toByteArray
  }

  /** FLAC fixture: magic + the mandatory 34-byte STREAMINFO built from
    * field values (packed 20/3/5/36-bit layout). */
  private def flacBytes(rate: Int, channels: Int, bps: Int,
                        samples: Long): Array[Byte] = {
    val out = new Array[Byte](8 + 34)
    out(0) = 'f'; out(1) = 'L'; out(2) = 'a'; out(3) = 'C'
    out(4) = 0x80.toByte // last-metadata-block flag set, type 0
    out(7) = 34
    def si(i: Int, v: Int): Unit = out(8 + i) = v.toByte
    si(10, rate >> 12); si(11, (rate >> 4) & 0xff)
    si(12, ((rate & 0xf) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4))
    si(13, (((bps - 1) & 0xf) << 4) | ((samples >> 32) & 0xf).toInt)
    si(14, ((samples >> 24) & 0xff).toInt)
    si(15, ((samples >> 16) & 0xff).toInt)
    si(16, ((samples >> 8) & 0xff).toInt)
    si(17, (samples & 0xff).toInt)
    out
  }

  test("codec metadata parsers are real: ADTS AAC frame walk + FLAC STREAMINFO") {
    val a = Multimodal.parseAdtsAac(aacBytes(3)).get
    assert(a.sampleRate == 44100 && a.channels == 2 && a.frames == 3)
    assert(a.durationMs == 3L * 1024 * 1000 / 44100) // 69 ms
    assert(a.bitrateKbps == 3L * 100 * 8 / a.durationMs)
    // one plausible header without a chained successor is a decoy
    assert(Multimodal.parseAdtsAac(aacBytes(1)).isEmpty)
    assert(Multimodal.parseAdtsAac("garbage".getBytes).isEmpty)
    // an MP3 header (layer bits nonzero) must not be typed as AAC,
    // and vice versa — the layer field keeps the sniffs disjoint
    assert(Multimodal.parseAdtsAac(mp3Bytes(3, 0)).isEmpty)
    assert(Multimodal.parseMp3(aacBytes(3)).isEmpty)

    val fl = Multimodal.parseFlac(flacBytes(44100, 2, 16, 441000L)).get
    assert(fl == Multimodal.FlacMeta(44100, 2, 16, 441000L, 10000L))
    val hi = Multimodal.parseFlac(flacBytes(96000, 6, 24, 960000L)).get
    assert(hi.sampleRate == 96000 && hi.channels == 6 &&
      hi.bitsPerSample == 24 && hi.durationMs == 10000L)
    assert(Multimodal.parseFlac("fLaX not flac".getBytes).isEmpty)
    // STREAMINFO must be the first block with the spec length
    val wrongType = flacBytes(44100, 2, 16, 441000L)
    wrongType(4) = 0x04 // VORBIS_COMMENT first — invalid per spec
    assert(Multimodal.parseFlac(wrongType).isEmpty)
  }

  test("container-meta kernel types aac/flac rows correctly") {
    val rows = Seq((1L, aacBytes(2)), (2L, flacBytes(48000, 2, 16, 480000L)))
    val media = Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "application/octet-stream")
    val got = Multimodal.extractContainerMeta(media)
      .select($"media_id", $"container_meta")
      .orderBy($"media_id").collect()
    val aac = got(0).getStruct(1)
    assert(aac.getString(0) == "aac" && aac.getInt(3) == 44100 &&
      aac.getInt(4) == 2)
    val flac = got(1).getStruct(1)
    assert(flac.getString(0) == "flac" && flac.getInt(3) == 48000 &&
      flac.getInt(4) == 2 && flac.getLong(6) == 10000L)
  }

  test("container-meta kernel types mp3/h264/garbage rows correctly") {
    val rows = Seq(
      (1L, mp3Bytes(2)),
      (2L, spsAnnexB(66, 30, 20, 15, 0)),
      (3L, "plain text".getBytes))
    val media = Multimodal.asMedia(
      rows.toDF("id", "payload"), "id", "payload", "application/octet-stream")
    val got = Multimodal.extractContainerMeta(media)
      .select($"media_id", $"container_meta")
      .orderBy($"media_id").collect()
    val mp3 = got(0).getStruct(1)
    assert(mp3.getString(0) == "mp3" && mp3.getInt(3) == 44100 &&
      mp3.getInt(4) == 2 && mp3.getInt(5) == 128)
    val h264 = got(1).getStruct(1)
    assert(h264.getString(0) == "h264" && h264.getInt(1) == 320 &&
      h264.getInt(2) == 240)
    assert(got(2).isNullAt(1))
  }

  test("a lone plausible MP3 header never hijacks the sniff (review fix)") {
    // a single valid-looking Layer-III header (0xFF 0xFB 0x90 0x00 =
    // MPEG-1 L3 128kbps 44100Hz) not followed by a chained second frame
    val loneHeader = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00)
    // ...buried in an H.264 stream's entropy-coded payload: must still
    // type as h264 (sniff order + the two-chained-frames rule)
    val h264WithDecoy = spsAnnexB(66, 30, 20, 15, 0) ++
      Array.fill(64)(0x5a.toByte) ++ loneHeader ++ Array.fill(64)(0x3c.toByte)
    // ...and buried in arbitrary bytes: must type as nothing at all
    val junkWithDecoy = Array.fill(64)(0x11.toByte) ++ loneHeader ++
      Array.fill(200)(0x22.toByte)
    val media = Multimodal.asMedia(
      Seq((1L, h264WithDecoy), (2L, junkWithDecoy)).toDF("id", "payload"),
      "id", "payload", "application/octet-stream")
    val got = Multimodal.extractContainerMeta(media)
      .select($"media_id", $"container_meta")
      .orderBy($"media_id").collect()
    assert(got(0).getStruct(1).getString(0) == "h264")
    assert(got(1).isNullAt(1), "a lone header in junk must not type as mp3")
  }

  test("repetition stats: hand-computed fractions incl. empty/one-word docs") {
    val docs = Seq(
      (1L, "a b a"),            // dup 1-2/3; bigrams [a b, b a] distinct → 1/2
      (2L, "a b a b a"),        // dup 1-2/5; bigrams [a b, b a, a b, b a] → 2/4
      (3L, "x"),                // one word: dup 0, no bigrams → 0.0
      (4L, ""),                 // empty: split→[""], dup 0, no bigrams → 0.0
      (5L, "w w w w"))          // dup 1-1/4; bigrams [w w]×3 → 3/3
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        TextAnalysis.dupWordFrac($"text").as("dw"),
        TextAnalysis.topBigramFrac($"text").as("tb"))
      .orderBy($"doc_id")
      .as[(Long, Double, Double)].collect()
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(close(got(0)._2, 1.0 - 2.0 / 3) && close(got(0)._3, 0.5))
    assert(close(got(1)._2, 1.0 - 2.0 / 5) && close(got(1)._3, 0.5))
    assert(got(2)._2 == 0.0 && got(2)._3 == 0.0)
    assert(got(3)._2 == 0.0 && got(3)._3 == 0.0)
    assert(close(got(4)._2, 0.75) && close(got(4)._3, 1.0))
  }

  test("wordBigrams builds adjacent pairs; empty for one-word docs") {
    val got = Seq((1L, "a b c d"), (2L, "solo"))
      .toDF("id", "text")
      .select($"id", TextAnalysis.wordBigrams($"text").as("bg"))
      .orderBy($"id").collect()
    assert(got(0).getSeq[String](1) == Seq("a b", "b c", "c d"))
    assert(got(1).getSeq[String](1).isEmpty)
  }

  test("contamination: overlap counts; clean/short/null-flag docs absent") {
    // benchmark doc shares its full 3-gram span with doc 10 (2 distinct
    // shared 3-grams) and one 3-gram with doc 11; doc 12 has zero
    // overlap, doc 13 is shorter than n, doc 14 has a null flag — all
    // three must be ABSENT (absence means clean), never n_shared=0 rows
    val docs = Seq(
      (1L, "q w e r", Some(true)),    // benchmark
      (10L, "q w e r", Some(false)),  // shares "q w e" and "w e r"
      (11L, "z q w e", Some(false)),  // shares "q w e"
      (12L, "m n o p", Some(false)),  // zero overlap
      (13L, "q w", Some(false)),      // < n tokens: no shingles
      (14L, "q w e r", None))         // null flag: dropped both sides
      .toDF("doc_id", "text", "bm")
    val got = TextDedup.contamination(docs, "doc_id", "text",
        isBenchmark = $"bm", n = 3)
      .orderBy($"id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((10L, 2L), (11L, 1L)))
  }

  test("contamination plan broadcasts the benchmark gram set") {
    val docs = Tables(spark, sf, "documents")
    val plan = TextDedup.contamination(docs, "doc_id", "text",
        isBenchmark = $"source" === "src0", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast-join, got:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"))
  }
}
