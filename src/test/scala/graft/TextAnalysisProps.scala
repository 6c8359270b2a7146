package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.llm.TextAnalysis

/** Exact-value theorems for the text-analysis expressions vs plain-Scala
  * ground truths (the same tokenization contract on both sides:
  * trim + split-on-single-space keeping interior empties). Covers the
  * documented tiebreak/edge semantics: langId breaks hit ties by the
  * lexicographically GREATEST language code (array_max struct order),
  * topBigramFrac's sorted-run fold equals a plain frequency count, and
  * the quality-score composite equals its closed formula.
  */
object TextAnalysisProps extends Properties("graft.textanalysis") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(PropDraws(20))

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vocab: Seq[String] =
    TextAnalysis.langMarkers.values.flatten.toSeq ++
      Seq("foo", "bar", "x1", "42", ".", "!!", "a,b", "über", "café")

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 25)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    sep <- Gen.frequency(4 -> Gen.const(" "), 1 -> Gen.const("  "))
    pad <- Gen.oneOf("", " ", "  ")
  } yield pad + toks.mkString(sep) + pad

  private def toks(s: String): Array[String] = s.trim.split(" ", -1)

  private def approxEq(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def evalCols(text: String, cols: (String, org.apache.spark.sql.Column)*) =
    Seq(Tuple1(text)).toDF("text")
      .select(cols.map { case (n, c) => c.as(n) }: _*).head()

  property("token/subword counts and mean token length match plain Scala") =
    forAll(textGen) { text =>
      val row = evalCols(text,
        "tc" -> TextAnalysis.tokenCount($"text"),
        "sc" -> TextAnalysis.subwordCount($"text"),
        "mtl" -> TextAnalysis.meanTokenLength($"text"))
      val t = toks(text)
      // Unicode classes, like the expression: "über" is ONE subword,
      // not u + "punctuation" + ber
      val subRe = "\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]".r
      val expMtl = t.map(_.length).sum.toDouble / t.length
      Prop(row.getInt(0) == t.length) :| s"tokenCount on '$text'" &&
        Prop(row.getInt(1) == subRe.findAllIn(text).length) :|
        s"subwordCount on '$text'" &&
        Prop(approxEq(row.getDouble(2), expMtl)) :| s"meanTokenLength on '$text'"
    }

  property("quality score equals its closed formula and stays in [0, 1]") =
    forAll(textGen.suchThat(_.trim.nonEmpty)) { text =>
      val row = evalCols(text, "q" -> TextAnalysis.qualityScore($"text"))
      val t = toks(text)
      // Unicode classes, like the expression: accents/CJK are letters,
      // not punctuation (the penalty must not zero non-English docs)
      val punct = "[^\\p{L}\\p{N}\\s]".r.findAllIn(text).length.toDouble / text.length
      val exp = math.min(text.length / 500.0, 1.0) *
        (t.distinct.length.toDouble / t.length) *
        math.max(1.0 - punct * 10.0, 0.0)
      val q = row.getDouble(0)
      Prop(approxEq(q, exp)) :| s"q=$q exp=$exp on '$text'" &&
        Prop(q >= 0.0 && q <= 1.0) :| s"range: $q"
    }

  property("topBigramFrac's sorted-run fold equals the plain frequency count") =
    forAll(textGen) { text =>
      val row = evalCols(text, "tb" -> TextAnalysis.topBigramFrac($"text"))
      val t = toks(text)
      val bigrams = if (t.length < 2) Seq.empty[String]
        else t.sliding(2).map(_.mkString(" ")).toSeq
      val exp = if (bigrams.isEmpty) 0.0
        else bigrams.groupBy(identity).values.map(_.size).max.toDouble /
          bigrams.size
      Prop(approxEq(row.getDouble(0), exp)) :|
        s"got=${row.getDouble(0)} exp=$exp on '$text'"
    }

  property("langId is the argmax with the greatest-code tiebreak") =
    forAll(textGen) { text =>
      val row = evalCols(text, "l" -> TextAnalysis.langId($"text"))
      val t = toks(text)
      val best = TextAnalysis.langMarkers.toSeq
        .map { case (l, ms) => (t.count(ms.contains), l) }.max
      val exp = if (best._1 > 0) best._2 else "unknown"
      Prop(row.getString(0) == exp) :|
        s"got=${row.getString(0)} exp=$exp on '$text'"
    }

  property("stopword ratios: set form dedups, multiset form counts repeats") =
    forAll(textGen.suchThat(_.trim.nonEmpty),
      Gen.someOf(vocab).map(_.toList)) { (text, stops0) =>
      val stops = stops0.distinct
      stops.nonEmpty ==> {
        val row = evalCols(text,
          "s" -> TextAnalysis.stopwordRatio($"text", stops),
          "m" -> TextAnalysis.stopwordRatioMultiset($"text", stops))
        val t = toks(text)
        val expSet = t.distinct.count(stops.contains).toDouble / t.length
        val expMulti = t.count(stops.contains).toDouble / t.length
        Prop(approxEq(row.getDouble(0), expSet)) :|
          s"set form on '$text' stops=$stops" &&
          Prop(approxEq(row.getDouble(1), expMulti)) :|
          s"multiset form on '$text' stops=$stops"
      }
    }
}
