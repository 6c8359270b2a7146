package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity of the native Catalyst kernels against the declarative HOF
  * forms they replaced (the oracle replays the HOF arithmetic, so the
  * kernels must match it EXACTLY, not just approximately). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("DotProduct matches the HOF left fold bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200) { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      graft.functions.ArrayOps.dot($"a", $"b").as("native"),
      hofDot($"a", $"b").as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("DotProduct null semantics mirror zip_with padding") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f)),          // unequal length → null
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f))     // equal → 11.0
    ).toDF("a", "b")
    val got = df.select(graft.functions.ArrayOps.dot($"a", $"b")).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getDouble(0) == 11.0)
    // explicit null element → null (HOF: null product poisons the fold)
    val withNull = spark.sql(
      "SELECT cast(array(1.0, NULL) AS array<float>) a, cast(array(2.0, 3.0) AS array<float>) b")
    assert(withNull.select(graft.functions.ArrayOps.dot($"a", $"b"))
      .collect()(0).isNullAt(0))
  }

  /** The HOF construction PqReconstructExpr replaced — kept here as the
    * independent reference the kernel must match bit-for-bit. */
  private def hofPqReconstruct(e: Column,
      codebook: Seq[Seq[Seq[Double]]]): Column = {
    val parts = codebook.zipWithIndex.map { case (cents, m) =>
      val ds = cents.head.length
      val sub = slice(e, m * ds + 1, ds)
      val scored = array(cents.zipWithIndex.map { case (cvec, j) =>
        val d2 = aggregate(
          zip_with(sub, lit(cvec.toArray), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
        struct(d2.as("d2"), lit(j).as("j"))
      }: _*)
      val codeJ = array_sort(scored).getItem(0).getField("j")
      element_at(array(cents.map(cvec => lit(cvec.toArray)): _*), codeJ + 1)
    }
    concat(parts: _*)
  }

  test("PqReconstructExpr matches the HOF slice/fold/argmin form bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val cb: Seq[Seq[Seq[Double]]] = Seq.tabulate(4)(_ =>
      Seq.tabulate(8)(_ => Seq.fill(4)(rnd.nextDouble() * 2 - 1)))
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "e")
    val out = df.select(
      graft.functions.ArrayOps.pqReconstruct($"e", cb).as("native"),
      hofPqReconstruct($"e".cast("array<double>"), cb).as("hof")).collect()
    out.foreach { r =>
      val nat = r.getSeq[Double](0)
      val hof = r.getSeq[Double](1)
      assert(nat.length == hof.length)
      nat.zip(hof).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b))
      }
    }
  }

  test("PqReconstructExpr null semantics: null element or wrong length yields NULL") {
    val cb: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(0.5, 0.5), Seq(2.0, 2.0)))
    val short = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f))).toDF("e") // length 3 != 4
    assert(short.select(graft.functions.ArrayOps.pqReconstruct($"e", cb))
      .collect()(0).isNullAt(0))
    val withNull = spark.sql(
      "SELECT cast(array(1.0, NULL, 0.5, 0.5) AS array<float>) e")
    assert(withNull.select(graft.functions.ArrayOps.pqReconstruct($"e", cb))
      .collect()(0).isNullAt(0))
    // and the happy path picks the nearest centroid per subspace
    val ok = Seq(Tuple1(Array(0.9f, 0.9f, 0.6f, 0.6f))).toDF("e")
    val got = ok.select(graft.functions.ArrayOps.pqReconstruct($"e", cb))
      .collect()(0).getSeq[Double](0)
    assert(got == Seq(1.0, 1.0, 0.5, 0.5))
  }

  test("MinHashSignature matches the HOF md5-min form exactly") {
    def hofSig(sh: Column, k: Int): Column =
      transform(sequence(lit(0), lit(k - 1)), i =>
        array_min(transform(sh,
          s => md5(concat(i.cast("string"), lit("|"), s).cast("binary")))))
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "a b",       // fewer tokens than the 3-gram → empty shingles
      "x y z x y z x y z").toDF("text")
    val sh = graft.llm.TextDedup.shingles($"text", 3)
    val out = docs.select(
      graft.functions.MinHash.signature(sh, 12).as("native"),
      hofSig(sh, 12).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("SimHash32 kernel matches the declarative md5-hex-parity fold") {
    def hofSimhash(text: Column): Column = {
      val hexes = transform(split(trim(text), " "), t => md5(t))
      val odd = Seq("1", "3", "5", "7", "9", "b", "d", "f")
      (0 until 32).map { b =>
        val bitSum = aggregate(hexes, lit(0L), (acc, h) =>
          acc + when(substring(h, b + 1, 1).isin(odd: _*), lit(1L))
            .otherwise(lit(-1L)))
        when(bitSum > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }.reduce((a, c) => a.bitwiseOR(c))
    }
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "a",
      "some words repeat words repeat words here").toDF("text")
    val out = docs.select(
      graft.llm.TextDedup.simhash32($"text").as("native"),
      hofSimhash($"text").as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
