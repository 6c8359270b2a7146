package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftx.FunctionBridge

/** SQL registration for graft's native Catalyst kernels — the brief's
  * "registered via `SparkSessionExtensions`" extension path. Every kernel
  * the Column API exposes ([[ArrayOps.dot]], [[MinHash.signature]],
  * [[SimHash.simhash32]], [[ArrayOps.lshBandKeys]],
  * [[Winnow.fingerprints]]) becomes a SQL function with identical
  * semantics, so `spark.sql("...")` pipelines compose with the engine
  * without touching the Scala API:
  *
  *   - at session build: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     or `SparkSession.builder.withExtensions(new GraftExtensions()(_))`
  *   - on an existing session (the driver hands graft a ready session):
  *     `GraftFunctions.register(spark)` (idempotent).
  *
  * Static parameters (permutation count, planes, k-gram width, ...) must
  * be integer LITERALS — they size per-instance buffers
  * (`MinHashSignature.prefixes`) and are part of the expression's
  * identity, exactly like Spark's own `array_repeat` count argument.
  */
object GraftFunctions {

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def intLit(fn: String, arg: String, e: Expression): Int = {
    val v = if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an integer literal, got $other")
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable integer literal, got ${e.sql}")
    // static params size per-instance buffers; 0 would silently produce
    // empty output and negatives would NPE deep inside eval — reject here
    if (v < 1) throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal >= 1, got $v")
    v
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def desc(name: String, clazz: Class[_], usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("dot_product"),
      desc("dot_product", classOf[DotProduct],
        "dot_product(a, b) - left-fold double dot product of two float/double arrays"),
      { args => arity("dot_product", 2, args); DotProduct(args(0), args(1)) }),
    (FunctionIdentifier("minhash_signature"),
      desc("minhash_signature", classOf[MinHashSignature],
        "minhash_signature(shingles, k) - k md5 minima over a shingle array"),
      { args => arity("minhash_signature", 2, args)
        MinHashSignature(args(0), intLit("minhash_signature", "k", args(1))) }),
    (FunctionIdentifier("simhash32"),
      desc("simhash32", classOf[SimHash32],
        "simhash32(tokens) - 32-bit simhash of a token array (md5 hex-digit parity bits)"),
      { args => arity("simhash32", 1, args); SimHash32(args(0)) }),
    (FunctionIdentifier("lsh_band_keys"),
      desc("lsh_band_keys", classOf[LshBandKeys],
        "lsh_band_keys(embedding, planes, tables) - hyperplane-LSH band keys 't#bits' per table"),
      { args => arity("lsh_band_keys", 3, args)
        LshBandKeys(args(0), intLit("lsh_band_keys", "planes", args(1)),
          intLit("lsh_band_keys", "tables", args(2))) }),
    (FunctionIdentifier("winnow_fingerprints"),
      desc("winnow_fingerprints", classOf[WinnowFingerprints],
        "winnow_fingerprints(text, k, w) - distinct winnowing fingerprints (k-gram md5, window w)"),
      { args => arity("winnow_fingerprints", 3, args)
        WinnowFingerprints(args(0), intLit("winnow_fingerprints", "k", args(1)),
          intLit("winnow_fingerprints", "w", args(2))) }))

  /** Idempotent post-hoc registration on an existing session
    * (`registerFunction` replaces any previous entry for the name). */
  def register(spark: SparkSession): Unit =
    all.foreach(FunctionBridge.register(spark, _))
}

/** `spark.sql.extensions` entry point: injects every graft kernel into the
  * session's FunctionRegistry at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
