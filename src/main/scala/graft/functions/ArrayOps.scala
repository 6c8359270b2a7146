package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernels for embedding arithmetic (SURVEY brief:
  * "a native Catalyst `Expression` (with `doGenCode`) beats a Scala UDF").
  *
  * The higher-order-function formulation
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, x) => acc + x)`
  * is NOT whole-stage-codegen'd — each per-pair evaluation walks an
  * interpreted lambda tree, which dominated the LSH similarity joins
  * (125 s for 2000×64-dim vectors at sf0.1 in BENCH_r02). This expression
  * emits a tight primitive loop inside whole-stage codegen.
  *
  * Bit-parity contract (the DuckDB oracle replays the same arithmetic):
  * elements are cast to double, multiplied, and accumulated LEFT TO RIGHT
  * starting from 0.0 — identical rounding to both the HOF left fold and
  * DuckDB's `list_reduce(list_transform(...))`. Null semantics mirror the
  * HOF form: any null element, or a length mismatch (zip_with pads with
  * null), yields NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @inline private def get(a: ArrayData, dt: DataType, i: Int): Double =
    dt match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, lt, i) * get(b, rt, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(dt: DataType, arr: String, i: String): String = dt match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (${getter(elemType(left), a, i)}) * (${getter(elemType(right), b, i)});
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Native multi-table hyperplane-LSH signature kernel: all `tables` band
  * keys (`"t#<sign bits>"`) in ONE JVM pass per row — the same LCG
  * arithmetic as the declarative
  * `concat_ws("#", t, lshBucket(emb, planes, t))` construction it
  * replaces (`Similarity.hyperplane`: h(j,d) = ((d + 64j)·1103515245 +
  * 12345 mod 2³¹)/2³⁰ − 1; per-plane left-fold Σ xᵢ·h in index order,
  * bit ≥ 0 → '1'), but the tables × planes × dims multiply-adds run in
  * one tight compiled loop instead of an interpreted per-element lambda
  * tree — the fold tree dominated the signature stage once `planesFor`
  * scaled planes up with N (measured 4× on the 10× scale probe).
  * Null elements yield a null signature array (embeddings with null
  * dims have no geometric meaning).
  */
case class LshBandKeys(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(planes >= 1 && planes <= 62, s"planes out of range: $planes")
  require(tables >= 1, s"tables must be >= 1: $tables")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys expects array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    // one pass: null scan + primitive copy (getters in the hot loop are
    // the expensive part for UnsafeArrayData)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[AnyRef](tables)
    var t = 0
    while (t < tables) {
      val bits = new java.lang.StringBuilder(planes + 4)
      bits.append(t).append('#')
      var j = 0
      while (j < planes) {
        val jg = (t * planes + j).toLong
        var s = 0.0
        i = 0
        while (i < n) {
          val h = ((i + 64L * jg) * 1103515245L + 12345L) % 2147483648L
          s += x(i) * (h.toDouble / 1073741824.0 - 1.0)
          i += 1
        }
        bits.append(if (s >= 0) '1' else '0')
        j += 1
      }
      out(t) = UTF8String.fromString(bits.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)

  override def prettyName: String = "lsh_band_keys"
}

/** Native PQ encode→reconstruct kernel: per subspace m, find the L2
  * argmin centroid (squared sub-distance accumulated LEFT TO RIGHT in
  * index order — bit-identical to the HOF `aggregate(zip_with(...))`
  * fold and the DuckDB oracle's `list_reduce`; ties break to the
  * smaller centroid id, the `array_sort` on (d2, j) structs order) and
  * emit the concatenation of the chosen centroids. One tight JVM loop
  * per row replaces M × K interpreted lambda folds — the encode cost
  * that dominated the PQ probe wall. Null semantics: a null element or
  * a length ≠ M × D/M input yields NULL (embeddings with null dims
  * have no geometric meaning).
  */
case class PqReconstructExpr(child: Expression,
                             codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(codebook.nonEmpty && codebook.head.nonEmpty &&
    codebook.head.head.nonEmpty, "empty PQ codebook")
  require(codebook.forall(_.length == codebook.head.length) &&
    codebook.forall(_.forall(_.length == codebook.head.head.length)),
    "ragged PQ codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_reconstruct expects array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val mSub = cb.length
    val nCent = cb(0).length
    val ds = cb(0)(0).length
    val n = a.numElements()
    if (n != mSub * ds) return null
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Double](n)
    var m = 0
    while (m < mSub) {
      val off = m * ds
      var bestJ = 0
      var bestD2 = Double.PositiveInfinity
      var j = 0
      while (j < nCent) {
        val c = cb(m)(j)
        var s = 0.0
        i = 0
        while (i < ds) {
          val d = x(off + i) - c(i)
          s += d * d
          i += 1
        }
        // strictly-less + ascending j == array_sort's (d2, j) tie-break
        if (s < bestD2) { bestD2 = s; bestJ = j }
        j += 1
      }
      System.arraycopy(cb(m)(bestJ), 0, out, off, ds)
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstructExpr =
    copy(child = newChild)

  override def prettyName: String = "pq_reconstruct"
}

object ArrayOps {
  /** Dot product of two float/double array columns (left-fold double sum
    * in index order — bit-identical to the HOF `aggregate(zip_with(...))`
    * form and to the DuckDB oracle's `list_reduce`). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All `tables` LSH band keys ("t#bits") for an embedding column in one
    * native pass — bit-identical to the per-table
    * `concat_ws("#", t, Similarity.lshBucket(emb, planes, t))` chain. */
  def lshBandKeys(emb: Column, planes: Int, tables: Int): Column =
    ColumnBridge.column(
      LshBandKeys(ColumnBridge.expression(emb), planes, tables))

  /** PQ encode→reconstruct under a fixed codebook in one native pass —
    * bit-identical to the HOF slice/zip_with/aggregate/array_sort
    * construction it replaces (see [[PqReconstructExpr]]). */
  def pqReconstruct(emb: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(
      PqReconstructExpr(ColumnBridge.expression(emb), codebook))
}
