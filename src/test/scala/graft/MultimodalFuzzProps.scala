package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.llm.Multimodal

/** Totality fuzz for the multimodal byte parsers: at ingest scale,
  * malformed payloads are a certainty, and the operator contract
  * ([[Multimodal.decodeImage]] doc) is "corrupt blobs are data, not task
  * failures" — every parser must return (Some or None), NEVER throw, on
  *
  *  1. arbitrary random bytes,
  *  2. random bytes behind each format's OWN magic prefix (the sniff
  *     succeeds, the body is garbage — the nastiest ingestion case), and
  *  3. random TRUNCATIONS of magic-prefixed payloads (the classic
  *     IndexOutOfBounds mine in header parsers).
  *
  * Pure-JVM properties — no Spark session, so the fuzz runs hot.
  */
object MultimodalFuzzProps extends Properties("graft.multimodal") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(PropDraws(200))

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 192)
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  /** Each format's magic prefix, so the fuzz reaches past the sniff. */
  private val magics: Seq[(String, Array[Byte])] = Seq(
    "mp3" -> Array(0xff.toByte, 0xfb.toByte),
    "aac" -> Array(0xff.toByte, 0xf1.toByte),
    "flac" -> "fLaC".getBytes,
    "avi" -> ("RIFF".getBytes ++ Array[Byte](0x10, 0, 0, 0) ++ "AVI ".getBytes),
    "h264" -> Array[Byte](0, 0, 0, 1, 0x67),
    "png" -> Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0d, 0x0a, 0x1a, 0x0a),
    "bmp" -> "BM".getBytes,
    "gif" -> "GIF89a".getBytes,
    "jpeg" -> Array(0xff.toByte, 0xd8.toByte, 0xff.toByte),
    "wav" -> ("RIFF".getBytes ++ Array[Byte](0x10, 0, 0, 0) ++ "WAVE".getBytes))

  private val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    "parseMp3" -> Multimodal.parseMp3 _,
    "parseAdtsAac" -> Multimodal.parseAdtsAac _,
    "parseFlac" -> Multimodal.parseFlac _,
    "parseAvi" -> Multimodal.parseAvi _,
    "parseH264Sps" -> Multimodal.parseH264Sps _,
    "decodeImage" -> Multimodal.decodeImage _,
    "decodeAudio" -> Multimodal.decodeAudio _,
    "decodeVideo" -> Multimodal.decodeVideo _,
    "decodeStub" -> Multimodal.decodeStub _)

  private def total(bytes: Array[Byte]): Prop = {
    val failures = parsers.flatMap { case (name, p) =>
      scala.util.Try(p(bytes)).failed.toOption.map(e =>
        s"$name threw ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
    Prop(failures.isEmpty) :|
      s"${failures.mkString("; ")} on ${bytes.take(24).mkString("[", ",", "..]")}"
  }

  property("every parser is total on arbitrary bytes") =
    forAll(bytesGen)(total)

  property("every parser is total on magic-prefixed garbage") =
    forAll(Gen.oneOf(magics), bytesGen) { case ((_, magic), body) =>
      total(magic ++ body)
    }

  property("every parser is total on truncated magic-prefixed payloads") =
    forAll(Gen.oneOf(magics), bytesGen, Gen.choose(0, 64)) {
      case ((_, magic), body, cut) =>
        val full = magic ++ body
        total(full.take(math.min(cut, full.length)))
    }
}
