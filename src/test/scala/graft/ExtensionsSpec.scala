package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ArrayOps, GraftExtensions, GraftFunctions, MinHash, SimHash, Winnow}

/** SQL-callable parity for the native kernels: `GraftFunctions.register`
  * on an existing session, and the `GraftExtensions` session-build path,
  * both resolve the same expressions the Column API constructs. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = {
    val rnd = new scala.util.Random(11)
    Seq.tabulate(50) { i =>
      val words = Seq.tabulate(8 + rnd.nextInt(8))(j => s"w${(i * 31 + j * 7) % 23}")
      (i.toLong, words.mkString(" "), words.toArray,
        Array.fill(16)(rnd.nextFloat() * 2 - 1),
        Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "text", "tk", "ea", "eb")
  }

  test("registered SQL functions match the Column API on every kernel") {
    GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("ext_fixture")
    val sql = spark.sql(
      """SELECT id,
        |  dot_product(ea, eb) AS dp,
        |  minhash_signature(tk, 6) AS mh,
        |  simhash32(tk) AS sh,
        |  lsh_band_keys(ea, 8, 3) AS bk,
        |  winnow_fingerprints(text, 5, 8) AS fp
        |FROM ext_fixture""".stripMargin)
    val api = fixture.select($"id",
      ArrayOps.dot($"ea", $"eb").as("dp"),
      MinHash.signature($"tk", 6).as("mh"),
      SimHash.simhash32($"tk").as("sh"),
      ArrayOps.lshBandKeys($"ea", 8, 3).as("bk"),
      Winnow.fingerprints($"text", 5, 8).as("fp"))
    assert(sql.exceptAll(api).isEmpty && api.exceptAll(sql).isEmpty)
  }

  test("static parameters must be integer literals") {
    GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("ext_fixture")
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(tk, id) FROM ext_fixture").collect()
    }
    // Spark wraps function-builder exceptions at varying depths across
    // versions — walk the whole cause chain for the marker
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
    assert(chain.exists(t => Option(t.getMessage).exists(_.contains("integer literal"))))
  }

  test("static parameters below 1 are rejected at registration time") {
    GraftFunctions.register(spark)
    fixture.createOrReplaceTempView("ext_fixture")
    for (bad <- Seq("0", "-3")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT minhash_signature(tk, $bad) FROM ext_fixture").collect()
      }
      val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      assert(chain.exists(t => Option(t.getMessage).exists(_.contains(">= 1"))))
    }
  }

  test("GraftExtensions injects at session build (spark.sql.extensions path)") {
    val base = SparkTestSession.spark // ensure the shared context exists
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // getOrCreate with cleared sessions builds a NEW SparkSession over
      // the same SparkContext, applying extensions — the library's
      // documented `--conf spark.sql.extensions=graft.functions.GraftExtensions`
      // path without touching the shared test session
      val fresh = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(fresh ne base)
      val got = fresh.sql(
        "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp")
        .head().getDouble(0)
      assert(got == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(prev.getOrElse(base))
    }
  }
}
