package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Dev-only ANN scale/recall probe (test scope — not part of the
  * shipped library): runs the exact brute-force baseline, the SQ8
  * scalar-quantized scan, and both IVF variants (gated id-centroid
  * quantizer vs seeded-k-means-trained quantizer) over a given
  * embeddings dir, and reports wall seconds AND recall@k against the
  * exact result for each. The claims under test:
  *
  *  - SQ8's 4× compression costs bounded recall (the FAISS trade) and
  *    its scan stays ~linear in corpus size;
  *  - a trained coarse quantizer recovers the recall the deterministic
  *    id-centroid quantizer gives up at real data distributions, at
  *    identical search cost.
  *
  * Run: `sbt "Test/runMain graft.AnnProbe <dir> [k] [nq]"` over
  * /root/testdata/sf0.1, /tmp/scale10, /tmp/scale100.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val nq = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables(spark, dir, "embeddings")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nq)

    // (wall, result pairs) for a top-k frame with (qid, <cand col>) rows
    def run(df: => DataFrame, candCol: String): (Double, Set[(Long, Long)]) = {
      val t0 = System.nanoTime()
      val pairs = df.select(col("qid").cast("long"),
          col(candCol).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ((System.nanoTime() - t0) / 1e9, pairs)
    }

    val (exactSec, exact) = run(
      Similarity.bruteTopK(emb, queries, "vec_id", "embedding", k), "cid")
    def recall(got: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else got.count(exact).toDouble / exact.size

    val (sq8Sec, sq8) = run(
      Similarity.sq8TopK(emb, queries, "vec_id", "embedding", k), "cid")

    val (ivfIdSec, ivfId) = run(
      Similarity.ivfTopK(emb, "vec_id", "embedding", nCentroids = 16,
        nprobe = 2, k = k, queryPred = col("id") < nq), "cand")

    val tTrain0 = System.nanoTime()
    val trained = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 5)
    val trainSec = (System.nanoTime() - tTrain0) / 1e9
    val (ivfKmSec, ivfKm) = run(
      Similarity.ivfTopKWith(emb, "vec_id", "embedding", trained,
        nprobe = 2, k = k, queryPred = col("id") < nq), "cand")

    println(f"""{"probe":"ann","dir":"$dir","n":$n,"k":$k,"nq":$nq,""" +
      f""""exact_sec":$exactSec%.2f,""" +
      f""""sq8_sec":$sq8Sec%.2f,"sq8_recall":${recall(sq8)}%.3f,""" +
      f""""ivf_id_sec":$ivfIdSec%.2f,"ivf_id_recall":${recall(ivfId)}%.3f,""" +
      f""""ivf_kmeans_train_sec":$trainSec%.2f,""" +
      f""""ivf_kmeans_sec":$ivfKmSec%.2f,"ivf_kmeans_recall":${recall(ivfKm)}%.3f}""")
    spark.stop()
  }
}
