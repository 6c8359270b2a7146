package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator coverage (SURVEY.md §2.3–§2.8) exercised as
  * oracle-checked queries over the driver's TPC-H-ish tables.
  *
  * Every query here has a DuckDB-equivalent in [[oracleSql]] with
  * IDENTICAL output column names. Conventions for oracle parity:
  *   - aggregates over many doubles are `round(x, 4)` in both engines
  *     (summation order differs between engines; per-row arithmetic is
  *     IEEE-identical and needs no rounding);
  *   - time buckets are emitted as epoch-second BIGINTs
  *     (`floor(epoch/width)*width`) so timestamp type-system differences
  *     can't break the hash compare;
  *   - every query has a deterministic total ORDER BY.
  *
  * Scale notes (100 TB design): filters/projections are expressed on the
  * scan so Catalyst pushes them into parquet (`PushedFilters`/`ReadSchema`);
  * dimension joins broadcast the small side; fact-fact joins shuffle on the
  * join key and rely on AQE for skew; window queries partition by a
  * bounded-cardinality key (event_type/machine) and sort within partitions
  * only.
  */
object RelationalQueries {

  /** TPC-H Q1-style pricing summary — resample-style global aggregation
    * (SURVEY A1/A9 analog; ref: gordo aggregates per-bucket via pandas
    * resample, `tests/gordo/workflow/test_config_elements.py:139`). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1999-12-31").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(sum($"l_extendedprice"), 4).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 4).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_extendedprice"), 4).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Scan + predicate + projection with per-row scalar math (SURVEY P1/P2,
    * F1/F6; ref: row_filter predicate `gordo/reporters/mlflow.py:222-224`).
    * Filter and 4-column projection must push to the parquet scan. */
  def selectWhere(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("net_price"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** TPC-H Q6-style single-scalar revenue aggregate over a pushed-down
    * time-range + numeric-range predicate. */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_discount".between(0.03, 0.09) && $"l_quantity" < 25.0)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 4).as("revenue"))
  }

  /** Multi-way join: fact-fact shuffle join (orders⋈lineitem) + broadcast
    * dimension joins (customer⋈nation⋈region); revenue per nation.
    * At 100 TB the orders⋈lineitem join shuffles on orderkey; nation and
    * region (25/5 rows at any SF) broadcast; customer is broadcast here at
    * test SF but would shuffle at full scale — AQE picks per-size. */
  def joinRevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  /** Anti join: orders with no lineitems, counted per status (left_anti =
    * NOT EXISTS). */
  def ordersNoLineitems(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem").select($"l_orderkey")
    o.join(li, $"o_orderkey" === $"l_orderkey", "left_anti")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")
  }

  /** Semi join: customers that have at least one order above a threshold
    * (left_semi = EXISTS), counted per market segment. */
  def activeCustomersBySegment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter($"o_totalprice" > 100000.0).select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** Top-k per group, two-phase (SURVEY §2.7: trailing-N selection is the
    * same reverse-row_number pattern, `gordo/builder/build_model.py:448-471`).
    *
    * o_orderpriority has cardinality 5, so a single
    * `Window.partitionBy(priority)` would funnel ~20% of the table into
    * each of five tasks at scale. Instead: phase 1 ranks within
    * (priority, salt) — 5×64 partitions spread across the cluster, each
    * sorting ~1/320 of the rows — keeping only 3 rows per salt bucket;
    * phase 2 re-ranks the ≤ 5×64×3 survivors. The global top-3 per
    * priority is always contained in the union of per-salt top-3s, so the
    * result is identical to the one-window plan. At larger cluster sizes
    * raise the salt bucket count to ~2× the executor-core count. */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val saltBuckets = 64
    val w1 = Window.partitionBy($"o_orderpriority", $"salt")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val w2 = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables(spark, dir, "orders")
      .withColumn("salt", pmod(hash($"o_orderkey"), lit(saltBuckets)))
      .withColumn("r1", row_number().over(w1))
      .filter($"r1" <= 3)
      .withColumn("rnk", row_number().over(w2))
      .filter($"rnk" <= 3)
      .select($"o_orderpriority", $"rnk", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_orderpriority", $"rnk")
  }

  /** Rolling min/avg over a 6-row frame per series (SURVEY W1/W3;
    * ref: `gordo/machine/model/anomaly/diff.py:229,305`). The window
    * partitions by the composite series key (event_type, user_id) — the
    * gordo shape where the key is the machine/tag: unbounded cardinality,
    * bounded rows per series, so per-partition sorts stay flat as data
    * grows. Frame order is made total with the unique event_id tiebreak. */
  def rollingStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type", $"user_id")
      .orderBy($"ts", $"event_id").rowsBetween(-5, 0)
    Tables(spark, dir, "events")
      .select($"event_id", $"event_type", $"user_id", $"value",
        min($"value").over(w).as("rmin6"),
        round(avg($"value").over(w), 4).as("ravg6"))
      .orderBy($"event_id")
  }

  /** Anomaly threshold = rolling(6).min() then max, per series (SURVEY
    * A5; ref: `gordo/machine/model/anomaly/diff.py:226-264`). Series key
    * is the composite (event_type, user_id) — high cardinality, bounded
    * per-series rows, the partitioning that survives a 100× scale-up.
    * pandas' rolling(6) yields NaN for the first 5 rows and max() skips
    * them — mirrored here by requiring a full frame (rn >= 6). */
  def rollingMinMaxThreshold(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ord = Window.partitionBy($"event_type", $"user_id")
      .orderBy($"ts", $"event_id")
    Tables(spark, dir, "events")
      .select($"event_type", $"user_id", $"ts", $"event_id", $"value")
      .withColumn("rmin6", min($"value").over(ord.rowsBetween(-5, 0)))
      .withColumn("rn", row_number().over(ord))
      .filter($"rn" >= 6)
      .groupBy($"event_type", $"user_id")
      .agg(max($"rmin6").as("threshold"))
      .orderBy($"event_type", $"user_id")
  }

  /** A6 smoothed threshold at the reference's real width: resample each
    * series to 10-min buckets (bounding per-series rows exactly like
    * gordo's months × 144/day), then rolling(144).min() → max — the
    * smoothed-threshold window of `gordo/machine/model/anomaly/diff.py:
    * 239-254` with its default window=144. The pre-aggregation is what
    * makes the per-series sort safe at scale: series length grows with
    * calendar time, not with event volume. */
  def smoothThreshold144(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = (floor(unix_timestamp($"ts") / 600L) * 600L).cast("long")
    val resampled = Tables(spark, dir, "events")
      .groupBy($"event_type", bucket.as("bucket_ts"))
      .agg(avg($"value").as("value"))
    val ord = Window.partitionBy($"event_type").orderBy($"bucket_ts")
    resampled
      .withColumn("rmin", min($"value").over(ord.rowsBetween(-143, 0)))
      .withColumn("rn", row_number().over(ord))
      .filter($"rn" >= 144)
      .groupBy($"event_type")
      .agg((floor(max($"rmin") * 10000 + 0.5) / 10000).as("threshold"))
      .orderBy($"event_type")
  }

  /** Exact percentiles with linear interpolation (SURVEY A7; ref:
    * `gordo/machine/model/anomaly/diff.py:617-635` uses pandas
    * quantile(interpolation='linear') — Spark `percentile` and DuckDB
    * `quantile_cont` both implement that). */
  def percentilesByType(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .groupBy($"event_type")
      .agg(
        round(percentile($"value", lit(0.25)), 6).as("p25"),
        round(percentile($"value", lit(0.5)), 6).as("p50"),
        round(percentile($"value", lit(0.75)), 6).as("p75"),
        round(percentile($"value", lit(0.99)), 6).as("p99"))
      .orderBy($"event_type")
  }

  /** Set ops (harness coverage; the reference composes columns, not rows —
    * SURVEY §2.8): users who clicked but had not purchased in the first
    * two days (time bound keeps the difference non-empty). */
  def clickersNotPurchasers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .filter($"ts" < lit("2024-01-03").cast("timestamp"))
    val clickers = ev.filter($"event_type" === "click").select($"user_id").distinct()
    val purchasers = ev.filter($"event_type" === "purchase").select($"user_id").distinct()
    clickers.except(purchasers).orderBy($"user_id")
  }

  /** Set ops: users who both signed up and purchased. */
  def signupAndPurchase(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
    val signups = ev.filter($"event_type" === "signup").select($"user_id").distinct()
    val purchasers = ev.filter($"event_type" === "purchase").select($"user_id").distinct()
    signups.intersect(purchasers).orderBy($"user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_select_where" -> (selectWhere _),
    "q03_revenue_filter" -> (revenueFilter _),
    "q04_join_revenue_by_nation" -> (joinRevenueByNation _),
    "q05_orders_no_lineitems" -> (ordersNoLineitems _),
    "q06_active_customers_semi" -> (activeCustomersBySegment _),
    "q07_topk_per_group" -> (topOrdersPerPriority _),
    "q08_rolling_stats" -> (rollingStats _),
    "q09_rolling_min_max_threshold" -> (rollingMinMaxThreshold _),
    "q10_percentiles_by_type" -> (percentilesByType _),
    "q11_except_users" -> (clickersNotPurchasers _),
    "q12_intersect_users" -> (signupAndPurchase _),
    "q22_smooth_threshold_144" -> (smoothThreshold144 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_select_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | round(l_extendedprice*(1.0-l_discount),4) AS net_price
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_revenue_filter" ->
      """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.09 AND l_quantity < 25.0""".stripMargin,
    "q04_join_revenue_by_nation" ->
      """SELECT n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q05_orders_no_lineitems" ->
      """SELECT o_orderstatus, count(*) AS n_orders
        |FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q06_active_customers_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q07_topk_per_group" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,
    "q08_rolling_stats" ->
      """SELECT event_id, event_type, user_id, value,
        |  min(value) OVER w AS rmin6,
        |  round(avg(value) OVER w, 4) AS ravg6
        |FROM events
        |WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q09_rolling_min_max_threshold" ->
      """SELECT event_type, user_id, max(rmin6) AS threshold FROM (
        |  SELECT event_type, user_id,
        |    min(value) OVER w AS rmin6,
        |    row_number() OVER (PARTITION BY event_type, user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |WHERE rn >= 6
        |GROUP BY event_type, user_id
        |ORDER BY event_type, user_id""".stripMargin,
    "q22_smooth_threshold_144" ->
      """WITH r AS (
        |  SELECT event_type, (epoch_us(ts)//1000000//600)*600 AS bucket_ts,
        |         avg(value) AS value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, floor(max(rmin)*10000 + 0.5)/10000 AS threshold FROM (
        |  SELECT event_type,
        |    min(value) OVER w AS rmin,
        |    row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn
        |  FROM r
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
        |               ROWS BETWEEN 143 PRECEDING AND CURRENT ROW))
        |WHERE rn >= 144
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q10_percentiles_by_type" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.25), 6) AS p25,
        | round(quantile_cont(value, 0.50), 6) AS p50,
        | round(quantile_cont(value, 0.75), 6) AS p75,
        | round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q11_except_users" ->
      """SELECT DISTINCT user_id FROM events
        | WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-03'
        |EXCEPT
        |SELECT DISTINCT user_id FROM events
        | WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-03'
        |ORDER BY user_id""".stripMargin,
    "q12_intersect_users" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
  )
}
