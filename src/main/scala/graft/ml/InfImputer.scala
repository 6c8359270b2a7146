package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Cols.{q => qc}

/** ±Infinity imputer (SURVEY P6/A2; ref:
  * `gordo/machine/model/transformers/imputer.py:12-127`).
  *
  * strategy="minmax" (the reference default): fit records each column's
  * finite min/max (non-finite masked, like numpy `masked_invalid`);
  * transform fills +inf with max+delta and −inf with min−delta, capped at
  * the dtype extremes. strategy="extremes" fills with the dtype extremes
  * directly. Explicit `infFillValue`/`negInfFillValue` override both.
  *
  * Fit is one agg pass (single collected row); transform is per-row
  * conditional arithmetic — codegen-friendly, shuffle-free.
  */
object InfImputer {

  case class Fitted(fills: Map[String, (Double, Double)]) {
    def transformCol(c: String): Column = {
      val (posFill, negFill) = fills(c)
      when(qc(c) === lit(Double.PositiveInfinity), lit(posFill))
        .when(qc(c) === lit(Double.NegativeInfinity), lit(negFill))
        .otherwise(qc(c))
    }
    def transform(df: DataFrame, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, transformCol(c)))
  }

  def fit(df: DataFrame, cols: Seq[String], strategy: String = "minmax",
          delta: Double = 2.0,
          infFillValue: Option[Double] = None,
          negInfFillValue: Option[Double] = None): Fitted = strategy match {
    case "extremes" =>
      Fitted(cols.map(c => c -> (
        infFillValue.getOrElse(Double.MaxValue),
        negInfFillValue.getOrElse(Double.MinValue))).toMap)
    case "minmax" =>
      val finite: String => Column = c =>
        when(!isnan(qc(c)) && qc(c) =!= lit(Double.PositiveInfinity) &&
          qc(c) =!= lit(Double.NegativeInfinity), qc(c))
      val aggs = cols.flatMap(c => Seq(
        max(finite(c)).as(s"__max_$c"), min(finite(c)).as(s"__min_$c")))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      Fitted(cols.map { c =>
        // boxed read: max/min over a column with NO finite values is null,
        // and getAs[Double] would silently unbox that to 0.0 — deriving
        // fills from a phantom range. Fail loudly instead (callers can
        // pass explicit fill values or strategy="extremes").
        val hiB = row.getAs[java.lang.Double](s"__max_$c")
        val loB = row.getAs[java.lang.Double](s"__min_$c")
        require((hiB != null && loB != null) ||
          (infFillValue.isDefined && negInfFillValue.isDefined),
          s"InfImputer(minmax): column $c has no finite values to derive " +
            "fills from; pass explicit fill values or strategy=extremes")
        val hi = if (hiB == null) 0.0 else hiB.doubleValue
        val lo = if (loB == null) 0.0 else loB.doubleValue
        val pos = infFillValue.getOrElse(
          if (Double.MaxValue - delta > hi) hi + delta else Double.MaxValue)
        val neg = negInfFillValue.getOrElse(
          if (Double.MinValue + delta < lo) lo - delta else Double.MinValue)
        c -> (pos, neg)
      }.toMap)
    case s => throw new IllegalArgumentException(s"unknown strategy: $s")
  }
}
