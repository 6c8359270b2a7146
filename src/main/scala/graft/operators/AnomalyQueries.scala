package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.data.TimeSeries
import graft.ml.DiffAnomaly

/** End-to-end DiffBasedAnomalyDetector slice (SURVEY M11 + §7.2), oracle-
  * checked: events → aligned 2-tag wide frame → deterministic linear
  * reconstruction → TimeSeriesSplit(3) CV thresholds → full anomaly frame.
  * The DuckDB oracle independently recomputes the whole derivation
  * (`gordo/machine/model/anomaly/diff.py:226-264,341-456` oracle pattern of
  * `tests/gordo/machine/model/anomaly/test_anomaly_detectors.py:95-110`).
  */
object AnomalyQueries {

  private def r4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  private val epoch0 = 1704067200L // 2024-01-01, the events table start

  private def wideClickView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .filter($"event_type".isin("click", "view"))
    val r = TimeSeries.resample(ev, Seq("event_type"), "ts", "value", 3600L)
    TimeSeries.pivotWide(r, "event_type", Seq("click", "view")).na.drop()
  }

  /** The full §1.2 column set: start/end, model-input/output, tag and
    * total anomaly (scaled + unscaled), per-tag and total confidence. */
  def anomalyFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tags = Seq("click", "view")
    val wide = wideClickView(spark, dir)
    val fitted = DiffAnomaly.fit(wide, tags, "bucket_ts",
      new DiffAnomaly.TrendReconstructor("bucket_ts", epoch0),
      scalerKind = "minmax", nSplits = 3)
    val frame = DiffAnomaly.anomaly(fitted, wide, resolutionSec = 3600L)
    val doubles = frame.columns.filterNot(c => c == "start" || c == "end")
    frame.select(
      (col("start") +: col("end") +:
        doubles.toSeq.map(c => r4(col(s"`$c`")).as(c))): _*)
      .orderBy($"start")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q29_anomaly_frame" -> (anomalyFrame _),
  )

  val oracleSql: Map[String, String] = Map(
    "q29_anomaly_frame" ->
      """WITH w AS (
        |  SELECT bucket_ts,
        |    max(CASE WHEN event_type = 'click' THEN value END) AS click,
        |    max(CASE WHEN event_type = 'view' THEN value END) AS view
        |  FROM (SELECT event_type, (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts,
        |               avg(value) AS value
        |        FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2)
        |  GROUP BY bucket_ts),
        |idx AS (
        |  SELECT bucket_ts, click, view,
        |         CAST(bucket_ts - 1704067200 AS DOUBLE) AS x,
        |         row_number() OVER (ORDER BY bucket_ts) - 1 AS rn
        |  FROM w WHERE click IS NOT NULL AND view IS NOT NULL),
        |nn AS (SELECT count(*) AS n FROM idx),
        |lastfold AS (SELECT n - (n//4) AS test_start FROM nn),
        |tr AS (SELECT i.* FROM idx i, lastfold WHERE rn < test_start),
        |fm AS (SELECT regr_slope(click, x) AS b_c, regr_intercept(click, x) AS a_c,
        |              regr_slope(view, x) AS b_v, regr_intercept(view, x) AS a_v,
        |              max(click) - min(click) AS s_c,
        |              max(view) - min(view) AS s_v
        |       FROM tr),
        |te AS (SELECT i.rn, i.click, i.view,
        |              a_c + b_c * i.x AS p_c, a_v + b_v * i.x AS p_v, s_c, s_v,
        |              row_number() OVER (ORDER BY i.rn) AS trn
        |       FROM idx i, lastfold, fm WHERE i.rn >= test_start),
        |sc AS (SELECT trn,
        |        (pow((p_c - click) / s_c, 2) + pow((p_v - view) / s_v, 2)) / 2.0 AS mse,
        |        abs(click - p_c) AS mae_c, abs(view - p_v) AS mae_v
        |       FROM te),
        |roll AS (SELECT trn,
        |        min(mse) OVER f AS rmin_mse,
        |        min(mae_c) OVER f AS rmin_c,
        |        min(mae_v) OVER f AS rmin_v
        |       FROM sc
        |       WINDOW f AS (ORDER BY trn ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
        |th AS (SELECT max(rmin_mse) AS agg_th, max(rmin_c) AS th_c,
        |              max(rmin_v) AS th_v
        |       FROM roll WHERE trn >= 6),
        |fin AS (SELECT regr_slope(click, x) AS b_c, regr_intercept(click, x) AS a_c,
        |               regr_slope(view, x) AS b_v, regr_intercept(view, x) AS a_v,
        |               min(click) AS mn_c,
        |               CASE WHEN max(click) = min(click) THEN 1.0
        |                    ELSE max(click) - min(click) END AS s_c,
        |               min(view) AS mn_v,
        |               CASE WHEN max(view) = min(view) THEN 1.0
        |                    ELSE max(view) - min(view) END AS s_v
        |        FROM idx),
        |frame AS (SELECT i.bucket_ts AS start, i.bucket_ts + 3600 AS "end",
        |    i.click AS mic, i.view AS miv,
        |    a_c + b_c * i.x AS moc, a_v + b_v * i.x AS mov,
        |    abs((a_c + b_c * i.x - i.click) / s_c) AS tasc,
        |    abs((a_v + b_v * i.x - i.view) / s_v) AS tasv,
        |    abs(a_c + b_c * i.x - i.click) AS tauc,
        |    abs(a_v + b_v * i.x - i.view) AS tauv
        |  FROM idx i, fin)
        |SELECT start, "end",
        |  floor(mic*10000 + 0.5)/10000 AS "model-input.click",
        |  floor(miv*10000 + 0.5)/10000 AS "model-input.view",
        |  floor(moc*10000 + 0.5)/10000 AS "model-output.click",
        |  floor(mov*10000 + 0.5)/10000 AS "model-output.view",
        |  floor(tasc*10000 + 0.5)/10000 AS "tag-anomaly-scaled.click",
        |  floor(tasv*10000 + 0.5)/10000 AS "tag-anomaly-scaled.view",
        |  floor(tauc*10000 + 0.5)/10000 AS "tag-anomaly-unscaled.click",
        |  floor(tauv*10000 + 0.5)/10000 AS "tag-anomaly-unscaled.view",
        |  floor(((tasc*tasc + tasv*tasv)/2.0)*10000 + 0.5)/10000 AS "total-anomaly-scaled",
        |  floor(((tauc*tauc + tauv*tauv)/2.0)*10000 + 0.5)/10000 AS "total-anomaly-unscaled",
        |  floor((tauc/th_c)*10000 + 0.5)/10000 AS "anomaly-confidence.click",
        |  floor((tauv/th_v)*10000 + 0.5)/10000 AS "anomaly-confidence.view",
        |  floor((((tasc*tasc + tasv*tasv)/2.0)/agg_th)*10000 + 0.5)/10000 AS "total-anomaly-confidence"
        |FROM frame, th
        |ORDER BY start""".stripMargin,
  )
}
