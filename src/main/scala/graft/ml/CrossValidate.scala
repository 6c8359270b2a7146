package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-validation fold logic (SURVEY J4/A8; ref: default
  * `TimeSeriesSplit(n_splits=3)` at `gordo/builder/build_model.py:257-261`,
  * fold metadata at `:347-375`).
  *
  * Folds are expressed as row-number boundaries over the time-ordered
  * frame: [0, testStart) is train, [testStart, testEnd) is test — half-
  * open, 0-based, exactly sklearn's expanding-window split. The
  * boundaries are pure arithmetic on the row count (one `count()` job);
  * fold membership is then a filter on a row_number column, so each fold
  * is a DataFrame view, not a materialized copy.
  */
object CrossValidate {

  /** Half-open row ranges, 0-based. */
  case class Fold(index: Int, trainStart: Long, trainEnd: Long,
                  testStart: Long, testEnd: Long) {
    def nTrain: Long = trainEnd - trainStart
    def nTest: Long = testEnd - testStart
  }

  /** sklearn `TimeSeriesSplit(n_splits)`: test_size = n // (n_splits+1);
    * fold i tests [n − (n_splits−i)·test_size, n − (n_splits−i−1)·test_size)
    * and trains on everything before it. */
  def timeSeriesSplit(n: Long, nSplits: Int = 3): Seq[Fold] = {
    require(nSplits >= 2, s"nSplits must be >= 2, got $nSplits")
    val testSize = n / (nSplits + 1)
    require(testSize > 0, s"not enough rows ($n) for $nSplits splits")
    (0 until nSplits).map { i =>
      val testStart = n - (nSplits - i) * testSize
      Fold(i, 0, testStart, testStart, testStart + testSize)
    }
  }

  /** sklearn `KFold(shuffle=False)`: the first n % n_splits folds get one
    * extra row; test folds tile the range in order. */
  def kFold(n: Long, nSplits: Int = 5): Seq[Fold] = {
    require(nSplits >= 2, s"nSplits must be >= 2, got $nSplits")
    val base = n / nSplits
    val extra = n % nSplits
    var start = 0L
    (0 until nSplits).map { i =>
      val size = base + (if (i < extra) 1 else 0)
      val f = Fold(i, 0, 0, start, start + size) // train = complement, see below
      start += size
      f
    }
  }

  /** Attach a 0-based `__row` ordered by `orderCols` (deterministic total
    * order — callers must include a unique tiebreak column). The window
    * is unpartitioned by design: CV operates on ONE machine's series,
    * whose length is bounded (months × 144/day); multi-machine builds
    * parallelize across machines, not within this window. */
  def withRowIndex(df: DataFrame, orderCols: Seq[Column]): DataFrame =
    df.withColumn("__row",
      row_number().over(Window.orderBy(orderCols: _*)) - lit(1))

  def testFold(indexed: DataFrame, fold: Fold): DataFrame =
    indexed.filter(col("__row") >= fold.testStart && col("__row") < fold.testEnd)

  def trainFold(indexed: DataFrame, fold: Fold): DataFrame =
    indexed.filter(col("__row") >= fold.trainStart && col("__row") < fold.trainEnd)

  /** A8: per-metric fold aggregation exactly as
    * `gordo/builder/build_model.py:274-289` — mean/std/max/min across
    * folds plus the raw per-fold values. std is population (numpy
    * default ddof=0). */
  def aggregateScores(perFold: Seq[Double]): Map[String, Double] = {
    val n = perFold.size.toDouble
    val mean = perFold.sum / n
    val varp = perFold.map(v => (v - mean) * (v - mean)).sum / n
    Map("fold-mean" -> mean, "fold-std" -> math.sqrt(varp),
      "fold-max" -> perFold.max, "fold-min" -> perFold.min) ++
      perFold.zipWithIndex.map { case (v, i) => s"fold-${i + 1}" -> v }
  }
}
