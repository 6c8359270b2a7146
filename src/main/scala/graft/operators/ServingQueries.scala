package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.build.{Persistence, Reporters, Responses, Serving}
import graft.config.Config
import graft.data.TimeSeries
import graft.ml.CrossValidate

/** Oracle gates for the serving/build components that were previously
  * ScalaTest-only (round-3 verdict item 4): K2 nested JSON responses,
  * A8 CV score aggregation, P1 serve-time column verification, F8 tag
  * normalization. Each query drives the REAL component over the test
  * tables and re-expresses its observable output as rows DuckDB can
  * recompute independently.
  */
object ServingQueries {

  import Parity.r4

  private def hourlyWide(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events")
      .filter($"event_type".isin("click", "view"))
    val r = TimeSeries.resample(ev, Seq("event_type"), "ts", "value", 3600L)
    TimeSeries.pivotWide(r, "event_type", Seq("click", "view")).na.drop()
  }

  /** K2: the nested `{group: {tag: {ts: value}}}` JSON response
    * (`gordo/server/utils.py:86-142`) — a serving-shaped frame runs
    * through [[Responses.toNestedJson]], and the query emits the PARSED
    * JSON back as rows. The oracle recomputes the same (group, tag, ts,
    * value) triples directly, so a dropped column, a mis-split
    * group/tag, a collapsed single-level column, or a corrupted value
    * all hash-mismatch. The round trip is driver-side by design —
    * serving responses are bounded request windows. */
  def nestedJsonResponse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wide = hourlyWide(spark, dir)
    val frame = wide.select(
      $"bucket_ts".as("start"),
      r4($"click").as("model-input.click"),
      r4($"view").as("model-input.view"),
      // single-level column: splitName must map it to tag "value"
      r4($"click" + $"view").as("total-mean"))
    val json = Responses.toNestedJson(frame)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    val rows = for {
      grp <- scala.jdk.CollectionConverters.IteratorHasAsScala(
        root.fieldNames()).asScala.toSeq
      tag <- scala.jdk.CollectionConverters.IteratorHasAsScala(
        root.get(grp).fieldNames()).asScala.toSeq
      ts <- scala.jdk.CollectionConverters.IteratorHasAsScala(
        root.get(grp).get(tag).fieldNames()).asScala.toSeq
    } yield (grp, tag, ts.toLong, root.get(grp).get(tag).get(ts).asDouble())
    rows.toDF("grp", "tag", "bucket_ts", "value")
      .orderBy($"grp", $"tag", $"bucket_ts")
  }

  /** A8: `aggregateScores` (`gordo/builder/build_model.py:274-289`) over
    * real per-fold values — TimeSeriesSplit(3) on the hourly click
    * series, per-fold test-span mean as the metric, then the reference's
    * mean/std(population)/max/min + raw per-fold map. */
  def cvScoreAggregation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir, "events").filter($"event_type" === "click")
    val series = TimeSeries.resample(ev, Seq("event_type"), "ts", "value", 3600L)
      .select($"bucket_ts", $"value")
    // the indexing's bounds aggregation already counts the rows (was a
    // second full pass), and ALL fold scores come from ONE grouped agg
    // over the fold id instead of one driver job per fold — 4 jobs → 2
    // (guide §1.2: fewer passes; §2.3: aggregate before you shuffle).
    // Values unchanged: each fold's avg aggregates exactly its test span.
    val (indexed0, nOpt) =
      CrossValidate.withRowIndexCounted(series, Seq($"bucket_ts"))
    val indexed = graft.Caching.ensureCached(indexed0)
    val n = nOpt.getOrElse(indexed.count())
    val folds = CrossValidate.timeSeriesSplit(n, 3)
    val foldOf = folds.tail.foldLeft(
      when($"__row" < folds.head.testEnd, lit(folds.head.index))) {
      (acc, f) => acc.when($"__row" < f.testEnd, lit(f.index))
    }
    val scores = indexed.filter($"__row" >= folds.head.testStart)
      .groupBy(foldOf.as("__fold"))
      .agg(avg($"value").as("__avg"))
      .collect().map(r => r.getAs[Int]("__fold") -> r.getAs[Double]("__avg"))
      .toMap
    val perFold = folds.map(f => scores(f.index))
    CrossValidate.aggregateScores(perFold).toSeq
      .toDF("stat", "raw")
      .select($"stat", r4($"raw").as("value"))
      .orderBy($"stat")
  }

  /** P1: serve-time column verification (`gordo/server/utils.py:208-253`)
    * — the labeled path reorders by name and drops extras; the unlabeled
    * path (`_c0`-style wire columns) renames positionally. Both run over
    * the same lineitem slice and must land on identical bytes. */
  def verifyColumnsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val expected = Seq("l_orderkey", "l_linenumber", "l_quantity")
    // wrong order + an extra column the model never saw
    val base = Tables(spark, dir, "lineitem").filter($"l_orderkey" < 1000)
      .select($"l_quantity", $"l_extendedprice", $"l_orderkey", $"l_linenumber")
    val labeled = Serving.verifyColumns(base, expected)
      .withColumn("mode", lit("labeled"))
    val unlabeledIn = base.select($"l_orderkey".as("_c0"),
      $"l_linenumber".as("_c1"), $"l_quantity".as("_c2"))
    val unlabeled = Serving.verifyColumns(unlabeledIn, expected)
      .withColumn("mode", lit("unlabeled"))
    labeled.unionByName(unlabeled)
      .orderBy($"mode", $"l_orderkey", $"l_linenumber")
  }

  /** F8: tag normalization (`gordo/utils.py:15-51`) — trim + first-seen-
    * order dedup over a tag list with planted whitespace variants. The
    * input is assembled from the events table in event_id order (a
    * bounded config-surface list; the function is driver-side like the
    * reference's). */
  def normalizeTagsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val raw = Tables(spark, dir, "events").filter($"event_id" < 2000)
      .orderBy($"event_id")
      .select(when($"event_id" % 2 === 1,
        concat(lit("  "), $"event_type", lit(" ")))
        .otherwise($"event_type").as("t"))
      .as[String].collect().toSeq
    Config.normalizeTags(raw).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("pos", "tag")
      .orderBy($"pos")
  }

  /** S5: the model-cache LRU discipline (`gordo/server/utils.py:334-401`
    * — the reference caches loaded models per worker process). A
    * deterministic 500-access key trace (multiplicative-hash keys 0..6
    * over sampled event ids, so repeats arrive at varying stride) drives
    * the EXTRACTED cache class ([[Serving.LruCache]] — the exact object
    * `ModelCache` serves from) at capacity 3, probing containment before
    * each get. The oracle replays the access-order invariant in SQL: an
    * access hits iff fewer than `capacity` distinct keys intervened
    * since that key's previous access. A cache that reloads on hit
    * breaks the loader-count require; one that never evicts, evicts the
    * wrong victim, or fails to MRU-bump on hit hash-mismatches. */
  def lruCacheTrace(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keys = Tables(spark, dir, "events")
      .filter($"event_id" % 13 === 0)
      .orderBy($"event_id")
      .limit(500)
      .select((($"event_id" * 2654435761L) % 97 % 7).cast("int").as("k"))
      .as[Int].collect() // bounded access trace — driver-side state like
                         // the reference's per-worker cache
    var loads = 0
    val cache = new Serving.LruCache[Int, String](3)(k => { loads += 1; s"loaded-$k" })
    val rows = keys.zipWithIndex.map { case (k, i) =>
      val hit = cache.contains(k)
      require(cache.get(k) == s"loaded-$k", "wrong value served")
      ((i + 1).toLong, k, if (hit) 1 else 0)
    }
    require(loads == rows.count(_._3 == 0), "loader calls must equal misses")
    rows.toSeq.toDF("pos", "cache_key", "hit").orderBy($"pos")
  }

  /** F9: the sha3-512 cache key (`gordo/builder/build_model.py:571-631`
    * hashes the build-relevant config). DuckDB ships no sha3, so the
    * oracle pins literals computed with an INDEPENDENT implementation
    * (CPython hashlib.sha3_512) — the JVM digest must agree. Cases:
    * the two public FIPS-202 answers ("" and "abc"), then full
    * cache-key payloads (canonical JSON) and their keys for a machine
    * spec in both default and closed-form flavors — so canonicalization
    * drift and digest drift each mismatch on their own row. */
  def sha3CacheKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val yaml =
      """
        |name: graft-q82-machine
        |dataset:
        |  tag_list: [click, view]
        |  resolution: 1H
        |model:
        |  gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector:
        |    base_estimator:
        |      gordo.machine.model.models.KerasAutoEncoder:
        |        kind: feedforward_hourglass
        |""".stripMargin
    val spec = Config.machineFromConfig(Config.parseYaml(yaml),
      Some("graft-q82"), Config.defaultGlobals)
    val rows = Seq(
      ("fips_empty", "", Persistence.sha3hex("")),
      ("fips_abc", "abc", Persistence.sha3hex("abc")),
      ("spec_default", Persistence.cacheKeyPayload(spec),
        Persistence.cacheKey(spec)),
      ("spec_closed_form", Persistence.cacheKeyPayload(spec, closedForm = true),
        Persistence.cacheKey(spec, closedForm = true)))
    rows.toDF("case_id", "payload", "sha3_hex").orderBy($"case_id")
  }

  /** S4: the request-body scan (`gordo/server/utils.py:256-331`) — a
    * dict-of-dicts JSON body `{tag: {iso_ts: value}}` assembled from the
    * January hourly click/view series (a bounded request window, like the
    * reference's POST bodies), parsed by [[graft.data.Providers.fromJsonBody]]
    * (distributed `from_json` + double explode), emitted as the long
    * frame. The oracle recomputes the same (tag, bucket, value) triples
    * straight from events — a dropped tag, a mis-parsed ISO key, or a
    * corrupted double all hash-mismatch. */
  def jsonBodyScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables(spark, dir, "events")
      .filter($"event_type".isin("click", "view") &&
        $"ts" >= lit("2024-01-01").cast("timestamp") &&
        $"ts" < lit("2024-02-01").cast("timestamp"))
      .groupBy($"event_type",
        (floor(unix_timestamp($"ts") / 3600) * 3600).cast("long").as("bucket"))
      .agg(avg($"value").as("value"))
      .collect()
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    rows.sortBy(r => (r.getString(0), r.getLong(1))).foreach { r =>
      val tagNode =
        if (root.has(r.getString(0)))
          root.get(r.getString(0))
            .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        else root.putObject(r.getString(0))
      tagNode.put(java.time.Instant.ofEpochSecond(r.getLong(1)).toString,
        r.getDouble(2))
    }
    graft.data.Providers.fromJsonBody(spark, om.writeValueAsString(root))
      .select($"tag", unix_timestamp($"ts").as("bucket_ts"),
        r4($"value").as("value"))
      .orderBy($"tag", $"bucket_ts")
  }

  /** Influx dialect round-trip: the reference's integration environment
    * serves sensor series from InfluxDB (measurement rows tagged
    * `{tag: name}` with a `Value` field, `tests/utils.py:80-144`).
    * [[graft.data.Influx.queryFor]] builds the per-tag range-scan
    * InfluxQL; a standard `/query` wire response carrying the January
    * hourly click/view series (columns deliberately ordered
    * `[Value, time]` — the parser must locate cells by NAME, not
    * position) is assembled driver-side, then parsed DISTRIBUTED by
    * [[graft.data.Influx.fromQueryResponse]]. The oracle recomputes the
    * same triples straight from events — a dropped series, a swapped
    * column, a mis-parsed RFC3339 time, or a corrupted double all
    * hash-mismatch. */
  def influxSource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables(spark, dir, "events")
      .filter($"event_type".isin("click", "view") &&
        $"ts" >= lit("2024-01-01").cast("timestamp") &&
        $"ts" < lit("2024-02-01").cast("timestamp"))
      .groupBy($"event_type",
        (floor(unix_timestamp($"ts") / 3600) * 3600).cast("long").as("bucket"))
      .agg(avg($"value").as("value"))
      .collect()
    // the request side: one range scan per tag (shape-checked here so
    // drift in the query builder fails the gate too)
    val qs = graft.data.Influx.queriesFor("sensors", Seq("click", "view"),
      "2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z")
    require(qs == Seq(
      """SELECT "Value" FROM "sensors" WHERE "tag" = 'click' """ +
        """AND time >= '2024-01-01T00:00:00Z' AND time < '2024-02-01T00:00:00Z'""",
      """SELECT "Value" FROM "sensors" WHERE "tag" = 'view' """ +
        """AND time >= '2024-01-01T00:00:00Z' AND time < '2024-02-01T00:00:00Z'"""),
      "per-tag InfluxQL drifted")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    val series = root.putArray("results").addObject().putArray("series")
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).foreach { case (tag, rs) =>
      val s = series.addObject()
      s.put("name", "sensors")
      s.putObject("tags").put("tag", tag)
      val cols = s.putArray("columns"); cols.add("Value"); cols.add("time")
      val vals = s.putArray("values")
      rs.sortBy(_.getLong(1)).foreach { r =>
        val cells = vals.addArray()
        cells.add(r.getDouble(2))
        cells.add(java.time.Instant.ofEpochSecond(r.getLong(1)).toString)
      }
    }
    graft.data.Influx.fromQueryResponse(spark, om.writeValueAsString(root))
      .select($"tag", unix_timestamp($"ts").as("bucket_ts"),
        r4($"value").as("value"))
      .orderBy($"tag", $"bucket_ts")
  }

  /** K4: JDBC reporter round-trip (`gordo/reporters/postgres.py:62-109`)
    * — per-event-type build stats reported into the embedded-Derby
    * `machine` table via [[Reporters.JdbcReporter]] (INSERT path), then
    * click/view re-reported with doubled metrics (UPDATE path of the
    * upsert), then every row read back through the same JDBC connection
    * and emitted. The oracle recomputes the stats from events and replays
    * the upsert as a CASE — a failed update, a duplicated row, or JSON
    * corruption in the CLOB round trip all mismatch. */
  def jdbcReadback(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def r4d(v: Double): Double = math.floor(v * 10000.0 + 0.5) / 10000.0
    val stats = Tables(spark, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), avg($"value").as("a"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r4d(r.getDouble(2))))
      .sortBy(_._1)
    val rep = new graft.build.Reporters.JdbcReporter(
      "jdbc:derby:memory:graftq67;create=true")
    try {
      def machine(tag: String, n: Long): Map[String, Any] = Map(
        "dataset" -> Map("tag_list" -> List(tag), "n_rows" -> n),
        "model" -> Map("kind" -> "stats"))
      for ((tag, n, a) <- stats)
        rep.report(s"machine-$tag", machine(tag, n),
          Map("avg_value" -> a, "version" -> 1))
      for ((tag, n, a) <- stats if tag == "click" || tag == "view")
        rep.report(s"machine-$tag", machine(tag, n),
          Map("avg_value" -> a * 2, "version" -> 2))
      stats.map { case (tag, _, _) =>
        val row = rep.read(s"machine-$tag")
        val ds = row("dataset").asInstanceOf[Map[String, Any]]
        val md = row("metadata").asInstanceOf[Map[String, Any]]
        (s"machine-$tag",
          ds("tag_list").asInstanceOf[List[_]].head.toString,
          ds("n_rows").toString.toLong,
          md("avg_value").toString.toDouble,
          md("version").toString.toInt)
      }.toSeq.toDF("name", "tag", "n_rows", "avg_value", "version")
        .orderBy($"name")
    } finally rep.close()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_nested_json" -> (nestedJsonResponse _),
    "q54_cv_score_agg" -> (cvScoreAggregation _),
    "q55_verify_columns" -> (verifyColumnsQuery _),
    "q56_normalize_tags" -> (normalizeTagsQuery _),
    "q63_json_body" -> (jsonBodyScan _),
    "q84_influx_source" -> (influxSource _),
    "q67_jdbc_readback" -> (jdbcReadback _),
    "q79_lru_cache" -> (lruCacheTrace _),
    "q82_sha3_cache_key" -> (sha3CacheKey _),
  )

  private val hourlyWideSql =
    """SELECT bucket_ts,
      | max(CASE WHEN event_type = 'click' THEN value END) AS click,
      | max(CASE WHEN event_type = 'view' THEN value END) AS view
      |FROM (SELECT event_type, (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts,
      |             avg(value) AS value
      |      FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2)
      |GROUP BY bucket_ts""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q53_nested_json" ->
      s"""WITH w AS ($hourlyWideSql),
        |base AS (SELECT bucket_ts, click, view FROM w
        |         WHERE click IS NOT NULL AND view IS NOT NULL)
        |SELECT grp, tag, bucket_ts, value FROM (
        |  SELECT 'model-input' AS grp, 'click' AS tag, bucket_ts,
        |         floor(click*10000 + 0.5)/10000 AS value FROM base
        |  UNION ALL
        |  SELECT 'model-input', 'view', bucket_ts,
        |         floor(view*10000 + 0.5)/10000 FROM base
        |  UNION ALL
        |  SELECT 'total-mean', 'value', bucket_ts,
        |         floor((click + view)*10000 + 0.5)/10000 FROM base)
        |ORDER BY grp, tag, bucket_ts""".stripMargin,
    "q54_cv_score_agg" ->
      """WITH r AS (
        |  SELECT (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts, avg(value) AS value
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |idx AS (SELECT value, row_number() OVER (ORDER BY bucket_ts) - 1 AS rn FROM r),
        |nn AS (SELECT count(*) AS n FROM idx),
        |folds AS (SELECT t.i AS fold,
        |            n - (3 - t.i)*(n//4) AS test_start,
        |            n - (2 - t.i)*(n//4) AS test_end
        |          FROM nn CROSS JOIN (VALUES (0), (1), (2)) AS t(i)),
        |fm AS (SELECT f.fold, avg(i.value) AS v
        |       FROM folds f JOIN idx i ON i.rn >= f.test_start AND i.rn < f.test_end
        |       GROUP BY 1)
        |SELECT stat, floor(raw*10000 + 0.5)/10000 AS value FROM (
        |  SELECT 'fold-' || CAST(fold + 1 AS VARCHAR) AS stat, v AS raw FROM fm
        |  UNION ALL SELECT 'fold-mean', avg(v) FROM fm
        |  UNION ALL SELECT 'fold-std', stddev_pop(v) FROM fm
        |  UNION ALL SELECT 'fold-max', max(v) FROM fm
        |  UNION ALL SELECT 'fold-min', min(v) FROM fm)
        |ORDER BY stat""".stripMargin,
    "q55_verify_columns" ->
      """SELECT mode, l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT 'labeled' AS mode, l_orderkey, l_linenumber, l_quantity
        |  FROM lineitem WHERE l_orderkey < 1000
        |  UNION ALL
        |  SELECT 'unlabeled', l_orderkey, l_linenumber, l_quantity
        |  FROM lineitem WHERE l_orderkey < 1000)
        |ORDER BY mode, l_orderkey, l_linenumber""".stripMargin,
    "q56_normalize_tags" ->
      """WITH e AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 2 = 1 THEN '  ' || event_type || ' '
        |              ELSE event_type END AS t
        |  FROM events WHERE event_id < 2000),
        |f AS (SELECT trim(t) AS tag, min(event_id) AS fid FROM e GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY fid) - 1 AS BIGINT) AS pos, tag
        |FROM f ORDER BY pos""".stripMargin,
    "q63_json_body" ->
      """SELECT event_type AS tag,
        |  (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts,
        |  floor(avg(value)*10000 + 0.5)/10000 AS value
        |FROM events
        |WHERE event_type IN ('click', 'view')
        |  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-01 00:00:00'
        |GROUP BY tag, bucket_ts
        |ORDER BY tag, bucket_ts""".stripMargin,
    // same ground truth as q63 — the round-trip under test is the
    // influx /query response encode→parse, which must be lossless
    "q84_influx_source" ->
      """SELECT event_type AS tag,
        |  (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts,
        |  floor(avg(value)*10000 + 0.5)/10000 AS value
        |FROM events
        |WHERE event_type IN ('click', 'view')
        |  AND ts >= TIMESTAMP '2024-01-01 00:00:00'
        |  AND ts <  TIMESTAMP '2024-02-01 00:00:00'
        |GROUP BY tag, bucket_ts
        |ORDER BY tag, bucket_ts""".stripMargin,
    "q67_jdbc_readback" ->
      """SELECT 'machine-' || event_type AS name, event_type AS tag,
        |  count(*) AS n_rows,
        |  CASE WHEN event_type IN ('click', 'view')
        |       THEN (floor(avg(value)*10000 + 0.5)/10000) * 2
        |       ELSE floor(avg(value)*10000 + 0.5)/10000 END AS avg_value,
        |  CAST(CASE WHEN event_type IN ('click', 'view') THEN 2 ELSE 1 END
        |       AS INTEGER) AS version
        |FROM events GROUP BY event_type ORDER BY name""".stripMargin,
    // LRU replay: a cache of capacity c holds exactly the c most
    // recently accessed distinct keys, so access i of key k hits iff
    // fewer than c distinct keys appeared strictly between k's previous
    // access and i. The correlated distinct-count is O(n²) but n = 500.
    "q79_lru_cache" ->
      """WITH sel AS (
        |  SELECT event_id FROM events WHERE event_id % 13 = 0
        |  ORDER BY event_id LIMIT 500),
        |acc AS (SELECT row_number() OVER (ORDER BY event_id) AS pos,
        |    CAST((event_id * 2654435761) % 97 % 7 AS INTEGER) AS cache_key
        |  FROM sel),
        |p AS (SELECT pos, cache_key,
        |    max(pos) OVER (PARTITION BY cache_key ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM acc)
        |SELECT p.pos, p.cache_key,
        |  CASE WHEN p.prev IS NOT NULL AND
        |    (SELECT count(DISTINCT a.cache_key) FROM acc a
        |      WHERE a.pos > p.prev AND a.pos < p.pos) < 3
        |  THEN 1 ELSE 0 END AS hit
        |FROM p ORDER BY p.pos""".stripMargin,
    // sha3 hexes computed with CPython hashlib.sha3_512 over the exact
    // payload strings (independent of the JVM implementation under
    // test); the first two are the public FIPS-202 known answers.
    "q82_sha3_cache_key" -> {
      val specJson =
        """{"data_config":{"resolution":"1H","tag_list":["click","view"]},""" +
          """"evaluation_config":{"cv_mode":"full_build","metrics":""" +
          """["explained_variance_score","r2_score","mean_squared_error",""" +
          """"mean_absolute_error"],"scoring_scaler":""" +
          """"sklearn.preprocessing.MinMaxScaler"},"model_config":""" +
          """{"gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector":""" +
          """{"base_estimator":{"gordo.machine.model.models.KerasAutoEncoder":""" +
          """{"kind":"feedforward_hourglass"}}}},"name":"graft-q82-machine"}"""
      val closedJson = """{"closed_form":true,""" + specJson.stripPrefix("{")
      val rows = Seq(
        ("fips_abc", "abc",
          "b751850b1a57168a5693cd924b6b096e08f621827444f70d884f5d0240d2712e" +
            "10e116e9192af3c91a7ec57647e3934057340b4cf408d5a56592f8274eec53f0"),
        ("fips_empty", "",
          "a69f73cca23a9ac5c8b567dc185a756e97c982164fe25859e0d1dcc1475c80a6" +
            "15b2123af1f5f94c11e3e9402c3ac558f500199d95b6d3e301758586281dcd26"),
        ("spec_closed_form", closedJson,
          "3c9d9dc0b0cd744ca6fd159948b3f53a4aae11654f512596c66ff89d39a3a52f" +
            "902f635d63dd95a10604ac48b6625763d406d37e8e3efc74c4a702bebe10c9d0"),
        ("spec_default", specJson,
          "d412b8f92582244bea8099b275624d5daa370f3e9ac4e3a25f5f0a6f9bb8ef2c" +
            "649ed5d050e539e96cb93894f02d406dfbb12620b47fe7693e962f4cd64c5754"))
      val values = rows.map { case (c, p, h) => s"('$c', '$p', '$h')" }
        .mkString(",\n  ")
      s"""SELECT case_id, payload, sha3_hex FROM (VALUES
        |  $values) t(case_id, payload, sha3_hex)
        |ORDER BY case_id""".stripMargin
    },
  )
}
