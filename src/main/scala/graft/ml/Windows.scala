package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Cols.{q => qc}

/** Sequence-model windowing (SURVEY W5/J3; ref: LSTM sliding windows
  * `gordo/machine/model/models.py:713-793`, trailing alignment
  * `gordo/builder/build_model.py:448-471`).
  */
object Windows {

  /** W5: per-series trailing window arrays of the last `lookback` values
    * (only full windows survive — the model drops the first lookback−1
    * rows) plus the `lookahead`-shifted target. lookahead=0 is the
    * autoencoder shape (y = current window), ≥1 the forecast shape. */
  def slidingWindows(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                     valueCol: String, lookback: Int,
                     lookahead: Int = 1): DataFrame = {
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val frame = ord.rowsBetween(-(lookback - 1), 0)
    val out = df
      .withColumn("window", collect_list(qc(valueCol)).over(frame))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") >= lookback)
    val withY =
      if (lookahead == 0) out.withColumn("y", qc(valueCol))
      else out.withColumn("y", lead(qc(valueCol), lookahead).over(ord))
    withY.drop("__rn")
  }

  /** J3: keep only the trailing `n` rows per series (the positional
    * `y[-len(out):]` alignment made explicit as reverse row_number). */
  def trailingAlign(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                    n: Long): DataFrame = {
    val rev = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rrn", row_number().over(rev))
      .filter(col("__rrn") <= n)
      .drop("__rrn")
  }

  /** M9: hourglass layer-dimension calculus, ported exactly from
    * `gordo/machine/model/factories/utils.py:7-41` (including Python's
    * round-half-to-even via rint). */
  def hourglassDims(compressionFactor: Double, encodingLayers: Int,
                    nFeatures: Int): Seq[Int] = {
    require(compressionFactor >= 0 && compressionFactor <= 1,
      "compression_factor must be 0 <= compression_factor <= 1")
    require(encodingLayers >= 1, "encoding_layers must be >= 1")
    val smallest = math.max(
      math.min(math.ceil(compressionFactor * nFeatures).toInt, nFeatures), 1)
    val slope = (nFeatures - smallest).toDouble / encodingLayers
    (1 to encodingLayers).map(i => math.rint(nFeatures - i * slope).toInt)
  }
}
