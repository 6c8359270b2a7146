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
          // index by id/20, NOT id: every selected id is ≡ 0 (mod 4), so
          // a bare pmod(id, 4) picked '+00:00' for all 500 rows and the
          // half-hour/45-minute offsets — the query's whole point —
          // were never exercised
          element_at(lit(offsets),
            (pmod(($"event_id" / 20).cast("long"), lit(4)) + 1).cast("int")))
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

  /** F10: resource-limit fixup (`gordo/machine/validators.py:160-230`) —
    * every limit is raised to at least its request, and a requested
    * resource with no limit gets one. The (request, limit) grid derives
    * from the nation table (q60 pattern): request code k%5 (0 = absent),
    * limit code (k/5)%5 (0 = absent, else value code-1, so code-1 < k%5
    * combos exercise the raise). Absent encodes as -1 in the output. */
  def fixupResourcesGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val combos = Tables(spark, dir, "nation")
      .select($"n_nationkey".cast("int").as("combo"))
    combos.as[Int]
      .map { k =>
        val rc = k % 5
        val lc = (k / 5) % 5
        val requests: Map[String, Any] =
          if (rc == 0) Map.empty else Map("cpu" -> rc)
        val limits: Map[String, Any] =
          if (lc == 0) Map.empty else Map("cpu" -> (lc - 1))
        val fixed = Config.fixupResources(
          Map("requests" -> requests, "limits" -> limits))
        val out = fixed("limits").asInstanceOf[Map[String, Any]]
          .get("cpu").map(_.toString.toInt).getOrElse(-1)
        (k, if (rc == 0) -1 else rc, if (lc == 0) -1 else lc - 1, out)
      }
      .toDF("combo", "req_in", "lim_in", "lim_out")
      .orderBy($"combo")
  }

  /** M2: `into_definition` with defaults materialized
    * (`gordo/serializer/into_definition.py:12-190`; config freeze
    * `gordo/cli/cli.py:140-145`). Each YAML definition is compiled,
    * frozen, then compiled AGAIN and re-frozen — the emitted rows come
    * from the second pass, so any non-fixpoint drift hash-mismatches the
    * oracle's literal expectation. The frozen tree flattens to
    * (model_id, path, value) rows with `/`-joined path segments. */
  def intoDefinitionRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val defs: Seq[(String, String)] = Seq(
      "detector_default" ->
        "gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector:",
      "pipeline_ae" ->
        """sklearn.pipeline.Pipeline:
          |  steps:
          |    - sklearn.preprocessing.MinMaxScaler
          |    - gordo.machine.model.models.KerasAutoEncoder:
          |        kind: feedforward_simple""".stripMargin,
      "union" ->
        """sklearn.pipeline.FeatureUnion:
          |  transformer_list:
          |    - sklearn.decomposition.PCA:
          |        n_components: 2
          |    - sklearn.pipeline.Pipeline:
          |        steps:
          |          - sklearn.preprocessing.RobustScaler""".stripMargin,
      "pca_frac" ->
        """sklearn.decomposition.PCA:
          |  n_components: 0.95""".stripMargin,
      "pca_all" ->
        """sklearn.decomposition.PCA:
          |  n_components: null""".stripMargin,
      "lstm_forecast" ->
        """gordo.machine.model.models.KerasLSTMForecast:
          |  lookback_window: 12
          |  kind: lstm_symmetric""".stripMargin,
      "detector_full" ->
        """gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector:
          |  base_estimator:
          |    gordo.machine.model.models.KerasLSTMAutoEncoder:
          |      lookback_window: 6
          |  scaler: sklearn.preprocessing.RobustScaler
          |  window: 144
          |  smoothing_method: smm
          |  shuffle: true""".stripMargin,
      "canonical_linear" ->
        """sklearn.pipeline.Pipeline:
          |  steps:
          |    - gordo.machine.model.transformers.imputer.InfImputer
          |    - sklearn.preprocessing.FunctionTransformer:
          |        func: gordo.machine.model.transformer_funcs.general.multiply_by
          |        kw_args:
          |          factor: 2.5
          |    - sklearn.linear_model.LinearRegression""".stripMargin,
      "raw_spec" ->
        """gordo.machine.model.models.KerasRawModelRegressor:
          |  kind:
          |    spec:
          |      tensorflow.keras.models.Sequential:
          |        layers:
          |          - tensorflow.keras.layers.Dense:
          |              units: 4
          |              activation: tanh
          |          - tensorflow.keras.layers.Dense:
          |              units: 2
          |    compile:
          |      loss: mse
          |      optimizer: adam""".stripMargin)
    def flatten(path: String, v: Any): Seq[(String, String)] = v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq
        .flatMap { case (k, vv) => flatten(s"$path/$k", vv) }
      case l: List[_] => l.zipWithIndex
        .flatMap { case (vv, i) => flatten(s"$path/$i", vv) }
      case null => Seq(path -> "null")
      case other => Seq(path -> other.toString)
    }
    defs.toDF("model_id", "yaml").as[(String, String)]
      .flatMap { case (id, yaml) =>
        val defn = Config.parseYaml(yaml)
        val frozen = ModelRegistry.intoDefinition( // 2nd pass: fixpoint
          ModelRegistry.compile(ModelRegistry.intoDefinition(
            ModelRegistry.compile(defn))))
        flatten("", frozen).map { case (p, v) => (id, p.stripPrefix("/"), v) }
      }
      .toDF("model_id", "path", "value")
      .orderBy($"model_id", $"path", $"value")
  }

  /** The q78 grid: every allowlist entry plus paths outside it. Shared
    * with the oracle so both sides enumerate the identical surface. */
  private val registryPaths: Seq[String] = Seq(
    "sklearn.pipeline.Pipeline",
    "sklearn.pipeline.FeatureUnion",
    "sklearn.preprocessing.MinMaxScaler",
    "sklearn.preprocessing.RobustScaler",
    "sklearn.preprocessing.FunctionTransformer",
    "gordo.machine.model.transformers.imputer.InfImputer",
    "gordo.machine.model.models.KerasAutoEncoder",
    "gordo.machine.model.models.KerasLSTMAutoEncoder",
    "gordo.machine.model.models.KerasLSTMForecast",
    "gordo.machine.model.models.KerasRawModelRegressor",
    "sklearn.linear_model.LinearRegression",
    "sklearn.decomposition.PCA",
    "sklearn.model_selection.TimeSeriesSplit",
    "sklearn.model_selection.KFold",
    "gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector",
    "sklearn.svm.SVC",
    "sklearn.ensemble.RandomForestRegressor",
    "gordo.machine.model.models.KerasUnknownModel",
    "builtins.eval",
    "not.a.known.Class")

  /** Canonical one-line shape of a compiled stage, defaults
    * materialized — the q78 observable. */
  private def describeStage(s: ModelRegistry.Stage): String = s match {
    case ModelRegistry.Scaler(k) => s"scaler:$k"
    case ModelRegistry.Imputer(st, d) => s"imputer:$st:$d"
    case ModelRegistry.Multiply(f) => s"multiply:$f"
    case ModelRegistry.RawSpec(layers, _) =>
      "rawspec:" + layers.map { case (u, a) => s"$u-$a" }.mkString(",")
    case ModelRegistry.Reconstruction(i, k) => s"recon:$i:$k"
    case w: ModelRegistry.Windowed =>
      s"windowed:lb=${w.lookback}:la=${w.lookahead}:off=${w.offset}:" +
        describeStage(w.inner)
    case ModelRegistry.PipelineOf(steps) =>
      steps.map(describeStage).mkString("pipeline[", ",", "]")
    case ModelRegistry.UnionOf(bs) =>
      bs.map(describeStage).mkString("union[", ",", "]")
    case ModelRegistry.Detector(b, sc, w, sm, sh) =>
      s"detector:base=${describeStage(b)}:scaler=${describeStage(sc)}" +
        s":window=${w.getOrElse(-1)}:smoothing=${sm.getOrElse("none")}" +
        s":shuffle=$sh"
    case ModelRegistry.CvSplit(m, n) => s"cv:$m:$n"
  }

  /** M8: the factory-registry allowlist (the reference resolves config
    * class paths by dynamic import, `gordo/serializer/from_definition.py`;
    * this engine resolves them against a FIXED allowlist — no
    * reflection, ever). Each bare class path compiles DISTRIBUTED into
    * its default-kwargs stage shape or a rejection message; the oracle
    * pins the entire surface literally, so a silently added, removed, or
    * re-defaulted factory hash-mismatches. */
  def factoryRegistryGrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    registryPaths.zipWithIndex.map { case (p, i) => (i, p) }
      .toDF("idx", "class_path").as[(Int, String)]
      .map { case (i, p) =>
        val outcome =
          try describeStage(ModelRegistry.compile(p))
          catch {
            case e: ModelRegistry.CompileException => s"rejected:${e.getMessage}"
          }
        (i, p, outcome)
      }
      .toDF("idx", "class_path", "outcome")
      .orderBy($"idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_multiply_transform" -> (multiplyTransform _),
    "q60_hourglass_dims" -> (hourglassDims _),
    "q61_iso_parse" -> (isoParse _),
    "q62_template_expand" -> (templateExpand _),
    "q65_fixup_resources" -> (fixupResourcesGrid _),
    "q66_into_definition" -> (intoDefinitionRows _),
    "q78_factory_registry" -> (factoryRegistryGrid _),
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
        |      (['+00:00', '+02:00', '-05:30', '+09:45'])[CAST((event_id // 20) % 4 AS INTEGER) + 1]
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
    "q65_fixup_resources" ->
      """WITH g AS (
        |  SELECT CAST(n_nationkey AS INTEGER) AS combo,
        |    CAST(n_nationkey % 5 AS INTEGER) AS rc,
        |    CAST((n_nationkey // 5) % 5 AS INTEGER) AS lc
        |  FROM nation)
        |SELECT combo,
        |  CASE WHEN rc = 0 THEN -1 ELSE rc END AS req_in,
        |  CASE WHEN lc = 0 THEN -1 ELSE lc - 1 END AS lim_in,
        |  CASE WHEN lc = 0 AND rc = 0 THEN -1
        |       WHEN lc = 0 THEN rc
        |       WHEN rc = 0 THEN lc - 1
        |       WHEN lc - 1 < rc THEN rc
        |       ELSE lc - 1 END AS lim_out
        |FROM g ORDER BY combo""".stripMargin,
    "q66_into_definition" -> {
      val D = "gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector"
      val AE = "gordo.machine.model.models.KerasAutoEncoder"
      val LAE = "gordo.machine.model.models.KerasLSTMAutoEncoder"
      val R = "gordo.machine.model.models.KerasRawModelRegressor"
      val DNS = "tensorflow.keras.models.Sequential"
      val DNL = "tensorflow.keras.layers.Dense"
      val P = "sklearn.pipeline.Pipeline"
      val rows = Seq(
        ("detector_default", s"$D/base_estimator/$AE/kind", "feedforward_hourglass"),
        ("detector_default", s"$D/scaler", "sklearn.preprocessing.MinMaxScaler"),
        ("detector_default", s"$D/shuffle", "false"),
        ("pipeline_ae", s"$P/steps/0", "sklearn.preprocessing.MinMaxScaler"),
        ("pipeline_ae", s"$P/steps/1/$AE/kind", "feedforward_simple"),
        ("union", "sklearn.pipeline.FeatureUnion/transformer_list/0/sklearn.decomposition.PCA/n_components", "2"),
        ("union", s"sklearn.pipeline.FeatureUnion/transformer_list/1/$P/steps/0", "sklearn.preprocessing.RobustScaler"),
        ("pca_frac", "sklearn.decomposition.PCA/n_components", "0.95"),
        ("pca_all", "sklearn.decomposition.PCA/n_components", "null"),
        ("lstm_forecast", "gordo.machine.model.models.KerasLSTMForecast/kind", "lstm_symmetric"),
        ("lstm_forecast", "gordo.machine.model.models.KerasLSTMForecast/lookback_window", "12"),
        ("detector_full", s"$D/base_estimator/$LAE/kind", "lstm_hourglass"),
        ("detector_full", s"$D/base_estimator/$LAE/lookback_window", "6"),
        ("detector_full", s"$D/scaler", "sklearn.preprocessing.RobustScaler"),
        ("detector_full", s"$D/shuffle", "true"),
        ("detector_full", s"$D/smoothing_method", "smm"),
        ("detector_full", s"$D/window", "144"),
        ("canonical_linear", s"$P/steps/0/gordo.machine.model.transformers.imputer.InfImputer/delta", "2.0"),
        ("canonical_linear", s"$P/steps/0/gordo.machine.model.transformers.imputer.InfImputer/strategy", "minmax"),
        ("canonical_linear", s"$P/steps/1/sklearn.preprocessing.FunctionTransformer/func", "gordo.machine.model.transformer_funcs.general.multiply_by"),
        ("canonical_linear", s"$P/steps/1/sklearn.preprocessing.FunctionTransformer/kw_args/factor", "2.5"),
        ("canonical_linear", s"$P/steps/2/$AE/kind", "linear"),
        ("raw_spec", s"$R/kind/compile/loss", "mse"),
        ("raw_spec", s"$R/kind/compile/optimizer", "adam"),
        ("raw_spec", s"$R/kind/spec/$DNS/layers/0/$DNL/activation", "tanh"),
        ("raw_spec", s"$R/kind/spec/$DNS/layers/0/$DNL/units", "4"),
        ("raw_spec", s"$R/kind/spec/$DNS/layers/1/$DNL/units", "2"))
      val values = rows.map { case (m, p, v) => s"('$m', '$p', '$v')" }
        .mkString(",\n  ")
      s"""SELECT model_id, path, value FROM (VALUES
        |  $values) t(model_id, path, value)
        |ORDER BY model_id, path, value""".stripMargin
    },
    "q78_factory_registry" -> {
      // expected outcomes hand-derived from the allowlist semantics (the
      // reference's factory surface + this engine's documented defaults)
      // — NOT computed by the code under test, so the gate is external
      val MLP = "recon:mlp:feedforward_hourglass"
      val expected: Seq[String] = Seq(
        "rejected:Pipeline needs steps",
        "rejected:FeatureUnion needs transformer_list",
        "scaler:minmax",
        "scaler:robust",
        "rejected:unsupported FunctionTransformer func: None",
        "imputer:minmax:2.0",
        MLP,
        "windowed:lb=1:la=0:off=0:recon:lstm:lstm_hourglass",
        "windowed:lb=1:la=1:off=1:recon:lstm:lstm_hourglass",
        "rejected:KerasRawModelRegressor needs a kind map",
        "recon:ridge:linear",
        "recon:pca:1",
        "cv:timeseries:3",
        "cv:kfold:5",
        s"detector:base=$MLP:scaler=scaler:minmax" +
          ":window=-1:smoothing=none:shuffle=false",
        "rejected:unsupported class path: sklearn.svm.SVC",
        "rejected:unsupported class path: sklearn.ensemble.RandomForestRegressor",
        "rejected:unsupported class path: gordo.machine.model.models.KerasUnknownModel",
        "rejected:unsupported class path: builtins.eval",
        "rejected:unsupported class path: not.a.known.Class")
      require(expected.length == registryPaths.length)
      val values = registryPaths.zip(expected).zipWithIndex
        .map { case ((p, o), i) => s"($i, '$p', '$o')" }
        .mkString(",\n  ")
      s"""SELECT CAST(idx AS INTEGER) AS idx, class_path, outcome
        |FROM (VALUES
        |  $values) t(idx, class_path, outcome)
        |ORDER BY idx""".stripMargin
    },
  )
}
