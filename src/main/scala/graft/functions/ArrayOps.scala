package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object ArrayOps {
  /** Dot product of two float/double array columns (left-fold double sum
    * in index order — bit-identical to the HOF `aggregate(zip_with(...))`
    * form and to the DuckDB oracle's `list_reduce`). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
