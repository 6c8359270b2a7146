package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.config.{Config, ModelRegistry}
import graft.ml.Windows

/** Oracle gates for the config-layer machinery (SURVEY §2 F5/F7/P7+F6/M9)
  * — the pure functions the build path runs on every machine definition,
  * each executed DISTRIBUTED (typed `Dataset.map` over table-derived
  * rows) so the gate covers both the arithmetic and its serialization
  * across executors, with DuckDB recomputing the expectation from the
  * same parquet inputs.
  */
object ConfigQueries {

  /** P7+F6: a config-COMPILED `FunctionTransformer(multiply_by)` pipeline
    * (`gordo/machine/model/transformer_funcs/general.py:4-28`) applied via
    * `ModelRegistry.fitTransform` over lineitem measure columns. */
  def multiplyTransform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stage = ModelRegistry.compile(Map(
      "sklearn.pipeline.Pipeline" -> Map("steps" -> List(
        Map("sklearn.preprocessing.FunctionTransformer" -> Map(
          "func" -> "gordo.machine.model.transformer_funcs.general.multiply_by",
          "kw_args" -> Map("factor" -> 2.5)))))))
    val li = Tables(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    ModelRegistry.fitTransform(li, Seq("l_quantity", "l_extendedprice"), stage)
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** M9: hourglass layer-dim calculus (exact port incl. Python's
    * round-half-to-even, `factories/utils.py:7-41`) over a grid of
    * (n_features, compression_factor, encoding_layers) derived from the
    * nation table; DuckDB replays ceil/slope/rint arithmetic. */
  def hourglassDims(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val combos = Tables(spark, dir, "nation")
      .select($"n_nationkey".cast("int").as("nfeat"))
      .filter($"nfeat" >= 1)
      .crossJoin(Seq(0.25, 0.5, 0.75).toDF("cf"))
      .crossJoin(Seq(1, 2, 3).toDF("layers"))
    combos.as[(Int, Double, Int)]
      .map { case (nf, cf, ly) =>
        (nf, cf, ly, Windows.hourglassDims(cf, ly, nf).map(_.toLong))
      }
      .toDF("nfeat", "cf", "layers", "dims")
      .select($"nfeat", $"cf", $"layers",
        posexplode($"dims").as(Seq("pos", "dim")))
      .orderBy($"nfeat", $"cf", $"layers", $"pos")
  }

  /** F5: tz-aware ISO-8601 parse (`gordo/server/utils.py:198-205`) —
    * offset-suffixed strings built from event timestamps, parsed by
    * `Config.parseTzAware` to epoch micros; DuckDB parses the same
    * strings as TIMESTAMPTZ. Offsets rotate through half-hour and
    * 45-minute zones (the hard cases). */
  def isoParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val offsets = Array("+00:00", "+02:00", "-05:30", "+09:45")
    val iso = Tables(spark, dir, "events")
      .filter($"event_id" % 20 === 0)
      .select($"event_id",
        concat(date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
          element_at(lit(offsets), (pmod($"event_id", lit(4)) + 1).cast("int")))
          .as("iso"))
    iso.as[(Long, String)]
      .map { case (id, s) =>
        val odt = Config.parseTzAware(s)
        val inst = odt.toInstant
        (id, s, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      }
      .toDF("event_id", "iso", "epoch_us")
      .orderBy($"event_id")
  }

  /** F7: `{{ var }}` template expansion (`gordo/cli/cli.py:187-216`
    * surface) with params drawn from the nation⋈region tables; the
    * template mixes whitespace styles inside the braces. */
  def templateExpand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tpl = "{{ region }}.{{nation}}.sensor-{{ idx }}"
    val n = Tables(spark, dir, "nation")
      .join(Tables(spark, dir, "region"), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey".cast("int").as("n_nationkey"), $"n_name", $"r_name")
    n.as[(Int, String, String)]
      .map { case (k, nn, rn) =>
        (k, Config.expandTemplate(tpl,
          Map("region" -> rn, "nation" -> nn, "idx" -> k.toString)))
      }
      .toDF("n_nationkey", "tag")
      .orderBy($"n_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_multiply_transform" -> (multiplyTransform _),
    "q60_hourglass_dims" -> (hourglassDims _),
    "q61_iso_parse" -> (isoParse _),
    "q62_template_expand" -> (templateExpand _),
  )

  /** Half-even rounding of a positive double expression (Python `rint` /
    * Java `Math.rint`): DuckDB's round() is half-away-from-zero, so exact
    * .5 fractions route to the even neighbor explicitly. The slope
    * arithmetic below is plain IEEE double in both engines, so exact .5
    * occurs only for exactly-representable halves — the equality test is
    * bit-reliable. */
  private def rintSql(x: String): String =
    s"""CASE WHEN ($x) - floor($x) = 0.5
       | THEN CASE WHEN CAST(floor($x) AS BIGINT) % 2 = 0
       |           THEN floor($x) ELSE floor($x) + 1 END
       | ELSE round($x) END""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q59_multiply_transform" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity * 2.5 AS l_quantity,
        |  l_extendedprice * 2.5 AS l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q60_hourglass_dims" -> {
      val x = "CAST(nfeat AS DOUBLE) - pos1 * slope"
      s"""WITH combos AS (
        |  SELECT CAST(n_nationkey AS INTEGER) AS nfeat, cf, layers
        |  FROM nation, (VALUES (0.25), (0.5), (0.75)) v(cf),
        |       (VALUES (1), (2), (3)) w(layers)
        |  WHERE n_nationkey >= 1),
        |s AS (SELECT nfeat, cf, layers,
        |    greatest(least(CAST(ceil(cf * nfeat) AS INTEGER), nfeat), 1) AS smallest
        |  FROM combos),
        |sl AS (SELECT nfeat, cf, layers,
        |    CAST(nfeat - smallest AS DOUBLE) / layers AS slope
        |  FROM s),
        |e AS (SELECT nfeat, cf, layers, slope,
        |    unnest(generate_series(1, layers)) AS pos1
        |  FROM sl)
        |SELECT nfeat, cf, layers, CAST(pos1 - 1 AS INTEGER) AS pos,
        |  CAST(${rintSql(x)} AS BIGINT) AS dim
        |FROM e
        |ORDER BY nfeat, cf, layers, pos""".stripMargin
    },
    "q61_iso_parse" ->
      """WITH e AS (
        |  SELECT event_id,
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') ||
        |      (['+00:00', '+02:00', '-05:30', '+09:45'])[CAST(event_id % 4 AS INTEGER) + 1]
        |      AS iso
        |  FROM events WHERE event_id % 20 = 0)
        |SELECT event_id, iso, epoch_us(CAST(iso AS TIMESTAMPTZ)) AS epoch_us
        |FROM e
        |ORDER BY event_id""".stripMargin,
    "q62_template_expand" ->
      """SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey,
        |  r_name || '.' || n_name || '.sensor-' || CAST(n_nationkey AS VARCHAR) AS tag
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
  )
}
