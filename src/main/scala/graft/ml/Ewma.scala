package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exponentially weighted moving average with pandas `ewm(span).mean()`
  * semantics, `adjust=True`, `ignore_na=False` (SURVEY W4; ref:
  * `gordo/machine/model/anomaly/diff.py:307-308`).
  *
  * adjust=True means each output is a weighted average over the ENTIRE
  * history with weights (1−α)^age — not the plain recursion. Computed
  * streaming via the equivalent pair of recursions
  *   num_t = (1−α)·num_{t−1} + x_t,   den_t = (1−α)·den_{t−1} + 1
  *   ewma_t = num_t / den_t
  * (for missing x_t both decay but nothing is added — absolute-position
  * weights, i.e. ignore_na=False).
  *
  * Spark has no built-in infinite-memory window recursion, so this is the
  * one genuinely custom kernel: `repartition(series keys)` +
  * `sortWithinPartitions(keys, order)` + a streaming `mapPartitions` scan
  * that resets accumulators on series-key change. One shuffle, O(1) state
  * per series, arbitrarily many series per partition — the layout that
  * scales to millions of series on a real cluster.
  */
object Ewma {

  def ewma(df: DataFrame, keys: Seq[String], orderCol: String,
           valueCol: String, span: Double, out: String = "ewma"): DataFrame = {
    require(span >= 1.0, s"span must be >= 1, got $span")
    val alpha = 2.0 / (span + 1.0)
    val decay = 1.0 - alpha
    val schema = df.schema.add(out, DoubleType, nullable = true)
    val keyIdx = keys.map(df.schema.fieldIndex).toArray
    val vIdx = df.schema.fieldIndex(valueCol)
    val sorted = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions((keys :+ orderCol).map(col): _*)
    sorted.mapPartitions { it =>
      var curKey: List[Any] = null
      var num = 0.0
      var den = 0.0
      it.map { r =>
        val k = keyIdx.foldRight(List.empty[Any])((i, acc) => r.get(i) :: acc)
        if (k != curKey) { curKey = k; num = 0.0; den = 0.0 }
        num *= decay
        den *= decay
        if (!r.isNullAt(vIdx)) {
          num += r.getDouble(vIdx)
          den += 1.0
        }
        val v: Any = if (den == 0.0) null else num / den
        Row.fromSeq(r.toSeq :+ v)
      }
    }(Encoders.row(schema))
  }
}
