package graft.llm

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import graft.build.Persistence.toJson
import graft.config.Config

/** Persisted ANN index artifacts — the serving-side counterpart of the
  * model dump (K1; ref: `gordo/serializer/serializer.py:150-196` for the
  * dir-layout contract): a trained IVF coarse quantizer
  * ([[Similarity.trainIvfCentroids]]) and/or PQ codebook
  * ([[Similarity.trainPqCodebook]]) save to a directory as `index.json`
  * + `info.json` (sha-256 checksum), the same layout discipline as
  * `Persistence.save`, so an ANN deployment round-trips the way models
  * already do: train once on the cluster, persist the (tiny —
  * centroids × D doubles) artifact, serve many sessions from it without
  * retraining. Everything is plain numbers in canonical JSON — no
  * opaque binary blobs — and `Double.toString`/`toDouble` round-trips
  * IEEE doubles exactly, so a loaded index scores bit-identically. */
object AnnIndex {

  /** A serveable ANN index: IVF centroids (possibly empty for PQ-only
    * scans), an optional PQ codebook (None → exact-vector scoring
    * within probed lists, the plain-IVF configuration), and the nprobe
    * the index was tuned for. */
  case class Index(centroids: Seq[(Int, Seq[Double])],
                   codebook: Option[Similarity.PqCodebook],
                   nprobe: Int)

  def save(dir: String, index: Index): Unit = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    val json = toJson(Map(
      "centroids" -> index.centroids.map { case (cid, ce) =>
        Map("cid" -> cid, "ce" -> ce)
      },
      "codebook" -> index.codebook.map(_.asInstanceOf[Any]).getOrElse(null),
      "nprobe" -> index.nprobe))
    Files.writeString(p.resolve("index.json"), json)
    Files.writeString(p.resolve("info.json"),
      toJson(Map("checksum" -> sha256(json))))
  }

  def load(dir: String): Index = {
    val json = Files.readString(Paths.get(dir, "index.json"))
    // missing/null checksum field rejects as loudly as a mismatch (the
    // r13 null-hole class, artifact-side — same fix as Persistence.loadFull)
    val expected = Config.parseYaml(
        Files.readString(Paths.get(dir, "info.json")))
      .get("checksum").filter(_ != null).map(_.toString)
      .getOrElse(throw new IllegalArgumentException(
        s"info.json in $dir has no checksum — corrupt or tampered artifact"))
    require(sha256(json) == expected,
      s"index.json checksum mismatch in $dir — corrupt or tampered artifact")
    val m = Config.parseYaml(json)
    def dbl(v: Any): Double = v.toString.toDouble
    val cents = m("centroids").asInstanceOf[List[Any]].map { c =>
      val cm = c.asInstanceOf[Map[String, Any]]
      (cm("cid").toString.toInt,
        cm("ce").asInstanceOf[List[Any]].map(dbl))
    }
    val cb = Option(m.getOrElse("codebook", null)).map { raw =>
      raw.asInstanceOf[List[Any]].map(_.asInstanceOf[List[Any]]
        .map(_.asInstanceOf[List[Any]].map(dbl)))
    }
    Index(cents, cb, m("nprobe").toString.toInt)
  }

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
