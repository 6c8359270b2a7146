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
           valueCol: String, span: Double, out: String = "ewma"): DataFrame =
    ewmaMulti(df, keys, orderCol, Map(valueCol -> out), span)

  /** Multi-column variant: one streaming pass maintains accumulators for
    * every (input → output) pair in `cols`. Used by the smooth-* anomaly
    * columns where several series share the same scan.
    *
    * `keys` may be empty for a single global series — that path coalesces
    * to ONE partition, which is only safe for bounded per-machine frames
    * (months × 144/day). The guard throws once `maxUnkeyedRows` stream
    * through the partition, so an unkeyed unbounded series fails loudly
    * instead of silently single-threading the cluster; key the series (or
    * raise the bound deliberately) to process more. Counted in-stream —
    * no extra job. */
  def ewmaMulti(df: DataFrame, keys: Seq[String], orderCol: String,
                cols: Map[String, String], span: Double,
                maxUnkeyedRows: Long = 10_000_000L): DataFrame = {
    require(span >= 1.0, s"span must be >= 1, got $span")
    require(cols.nonEmpty, "need at least one column")
    val alpha = 2.0 / (span + 1.0)
    val decay = 1.0 - alpha
    val pairs = cols.toSeq
    val schema = pairs.foldLeft(df.schema)((s, p) =>
      s.add(p._2, DoubleType, nullable = true))
    val keyIdx = keys.map(df.schema.fieldIndex).toArray
    val vIdx = pairs.map(p => df.schema.fieldIndex(p._1)).toArray
    val sorted =
      if (keys.isEmpty) df.coalesce(1).sortWithinPartitions(col(orderCol))
      else df.repartition(keys.map(col): _*)
        .sortWithinPartitions((keys :+ orderCol).map(col): _*)
    val unkeyed = keys.isEmpty
    sorted.mapPartitions { it =>
      val n = vIdx.length
      var curKey: List[Any] = null
      var seen = 0L
      val num = new Array[Double](n)
      val den = new Array[Double](n)
      it.map { r =>
        if (unkeyed) {
          seen += 1
          if (seen > maxUnkeyedRows) throw new IllegalStateException(
            s"ewmaMulti with empty keys coalesces to one partition; the " +
              s"series exceeded maxUnkeyedRows=$maxUnkeyedRows rows — key " +
              s"the series or raise the bound deliberately")
        }
        val k = keyIdx.foldRight(List.empty[Any])((i, acc) => r.get(i) :: acc)
        if (k != curKey) {
          curKey = k
          java.util.Arrays.fill(num, 0.0)
          java.util.Arrays.fill(den, 0.0)
        }
        val outs = new Array[Any](n)
        var c = 0
        while (c < n) {
          num(c) *= decay
          den(c) *= decay
          if (!r.isNullAt(vIdx(c))) {
            val v = r.getDouble(vIdx(c))
            // NaN is a missing observation exactly like null (pandas ewm
            // skips NaN); accumulating it would poison num forever —
            // every later output for the series would be NaN
            if (!java.lang.Double.isNaN(v)) {
              num(c) += v
              den(c) += 1.0
            }
          }
          outs(c) = if (den(c) == 0.0) null else num(c) / den(c)
          c += 1
        }
        Row.fromSeq(r.toSeq ++ outs)
      }
    }(Encoders.row(schema))
  }
}
