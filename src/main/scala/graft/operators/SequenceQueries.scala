package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.data.TimeSeries
import graft.ml.{DiffAnomaly, Windows}

/** Oracle-checked coverage for sequence windowing (W5), trailing
  * alignment (J3), and the KFCV percentile-threshold detector (M12/A7).
  */
object SequenceQueries {

  import Parity.r4

  private def clickHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events").filter($"event_type" === "click")
    TimeSeries.resample(ev, Seq("event_type"), "ts", "value", 3600L)
  }

  /** W5: lookback-5 sliding windows with a 1-step forecast target over
    * the hourly click series. Window contents are emitted as a
    * comma-joined list of r4-scaled longs — identical string in both
    * engines (raw double formatting is not portable). */
  def slidingWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Windows.slidingWindows(clickHourly(spark, dir), Seq("event_type"),
      Seq($"bucket_ts"), "value", lookback = 5, lookahead = 1)
      .select($"bucket_ts",
        concat_ws(",", transform($"window",
          x => floor(x * 10000.0 + 0.5).cast("long").cast("string")))
          .as("window_q"),
        r4($"y").as("y"))
      .orderBy($"bucket_ts")
  }

  /** J3: trailing-120-row alignment of the hourly click series (the
    * explicit form of the reference's positional `y[-len(out):]`). */
  def trailingAlign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Windows.trailingAlign(clickHourly(spark, dir), Seq("event_type"),
      Seq($"bucket_ts"), n = 120)
      .select($"bucket_ts", r4($"value").as("value"))
      .orderBy($"bucket_ts")
  }

  /** M12/A7: KFCV detector thresholds — unshuffled KFold(5), per-fold
    * predictions scattered to the full index, smm(12) smoothing,
    * 0.99-quantile thresholds (window 12 instead of the reference's 144
    * so the sf0.01 series keeps enough post-prefix rows). */
  def kfcvThresholds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tags = Seq("click", "view")
    val ev = Tables(spark, dir, "events")
      .filter($"event_type".isin("click", "view"))
    val r = TimeSeries.resample(ev, Seq("event_type"), "ts", "value", 3600L)
    val wide = TimeSeries.pivotWide(r, "event_type", tags).na.drop()
    val fitted = DiffAnomaly.fitKfcv(wide, tags, "bucket_ts",
      new DiffAnomaly.TrendReconstructor("bucket_ts", 1704067200L),
      scalerKind = "minmax", nSplits = 5, window = 12,
      smoothingMethod = "smm", thresholdPercentile = 0.99)
    val th = fitted.thresholds
    Seq((th.featureThresholds("click"), th.featureThresholds("view"),
      th.aggregateThreshold))
      .toDF("raw_c", "raw_v", "raw_a")
      .select(r4($"raw_c").as("th_click"), r4($"raw_v").as("th_view"),
        r4($"raw_a").as("agg_th"))
  }

  /** S2 oracle gate: the seeded random provider's draws are pure
    * md5-counter arithmetic, so DuckDB replays every row — count draw,
    * timestamps, and uniform values — from the same (tag, seed). */
  def randomProvider(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.data.Providers.random(spark, Seq("alpha", "beta", "gamma"),
      seed = 42L)
      .select($"tag", unix_timestamp($"ts").as("epoch"),
        r4($"value").as("value"))
      .orderBy($"tag", $"epoch")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_random_provider" -> (randomProvider _),
    "q38_sliding_windows" -> (slidingWindows _),
    "q39_trailing_align" -> (trailingAlign _),
    "q40_kfcv_thresholds" -> (kfcvThresholds _),
  )

  val oracleSql: Map[String, String] = Map(
    "q71_random_provider" ->
      """WITH t(tag) AS (VALUES ('alpha'), ('beta'), ('gamma')),
        |counts AS (SELECT tag,
        |    100 + ('0x' || substr(md5(tag || '#' || 42), 1, 8))::UBIGINT % 201 AS n
        |  FROM t),
        |rws AS (SELECT tag, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS id
        |  FROM counts)
        |SELECT tag, 1704067200 + id * 600 AS epoch,
        |  floor((('0x' || substr(md5(tag || ':' || id || ':' || 42), 1, 12))::UBIGINT
        |         / 281474976710656.0) * 10000 + 0.5) / 10000 AS value
        |FROM rws ORDER BY tag, epoch""".stripMargin,
    "q38_sliding_windows" ->
      """WITH r AS (
        |  SELECT (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts, avg(value) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |w AS (SELECT bucket_ts, value,
        |    list(value) OVER (ORDER BY bucket_ts ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win,
        |    lead(value, 1) OVER (ORDER BY bucket_ts) AS y,
        |    row_number() OVER (ORDER BY bucket_ts) AS rn
        |  FROM r)
        |SELECT bucket_ts,
        |  array_to_string(list_transform(win, x -> CAST(CAST(floor(x*10000 + 0.5) AS BIGINT) AS VARCHAR)), ',') AS window_q,
        |  floor(y*10000 + 0.5)/10000 AS y
        |FROM w WHERE rn >= 5
        |ORDER BY bucket_ts""".stripMargin,
    "q39_trailing_align" ->
      """WITH r AS (
        |  SELECT (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts, avg(value) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |t AS (SELECT bucket_ts, value,
        |    row_number() OVER (ORDER BY bucket_ts DESC) AS rrn FROM r)
        |SELECT bucket_ts, floor(value*10000 + 0.5)/10000 AS value
        |FROM t WHERE rrn <= 120
        |ORDER BY bucket_ts""".stripMargin,
    "q40_kfcv_thresholds" ->
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
        |folds AS (SELECT t.i AS fold,
        |    (n//5)*t.i + least(t.i, n%5) AS test_start,
        |    (n//5)*(t.i+1) + least(t.i+1, n%5) AS test_end
        |  FROM nn CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS t(i)),
        |fm AS (SELECT f.fold, f.test_start, f.test_end,
        |    regr_slope(i.click, i.x) AS b_c, regr_intercept(i.click, i.x) AS a_c,
        |    regr_slope(i.view, i.x) AS b_v, regr_intercept(i.view, i.x) AS a_v,
        |    CASE WHEN max(i.click) = min(i.click) THEN 1.0 ELSE max(i.click) - min(i.click) END AS s_c,
        |    CASE WHEN max(i.view) = min(i.view) THEN 1.0 ELSE max(i.view) - min(i.view) END AS s_v
        |  FROM folds f JOIN idx i ON i.rn < f.test_start OR i.rn >= f.test_end
        |  GROUP BY f.fold, f.test_start, f.test_end),
        |scat AS (SELECT i.rn,
        |    (pow((a_c + b_c*i.x - i.click)/s_c, 2)
        |     + pow((a_v + b_v*i.x - i.view)/s_v, 2))/2.0 AS mse,
        |    abs(i.click - (a_c + b_c*i.x)) AS e_c,
        |    abs(i.view - (a_v + b_v*i.x)) AS e_v
        |  FROM idx i JOIN fm ON i.rn >= fm.test_start AND i.rn < fm.test_end),
        |sm AS (SELECT row_number() OVER (ORDER BY rn) AS srn,
        |    median(mse) OVER wf AS sm_mse,
        |    median(e_c) OVER wf AS sm_c,
        |    median(e_v) OVER wf AS sm_v
        |  FROM scat
        |  WINDOW wf AS (ORDER BY rn ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        |SELECT
        |  floor(quantile_cont(CASE WHEN srn >= 12 THEN sm_c END, 0.99)*10000 + 0.5)/10000 AS th_click,
        |  floor(quantile_cont(CASE WHEN srn >= 12 THEN sm_v END, 0.99)*10000 + 0.5)/10000 AS th_view,
        |  floor(quantile_cont(CASE WHEN srn >= 12 THEN sm_mse END, 0.99)*10000 + 0.5)/10000 AS agg_th
        |FROM sm""".stripMargin,
  )
}
