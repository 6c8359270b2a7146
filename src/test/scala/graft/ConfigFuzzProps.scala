package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.config.{Config, ModelRegistry}

/** Config-bridge fuzz: arbitrary YAML-shaped input must either produce a
  * spec or reject with one of the CONTRACT exception types
  * (ConfigException / CompileException / IllegalArgumentException, or a
  * snakeyaml parse error for raw text) — never NPE, MatchError, or
  * ClassCastException. The config layer is the engine's outermost
  * user-facing surface; an anonymous crash there is a support ticket, a
  * contract reject is an actionable error message. */
object ConfigFuzzProps extends Properties("graft.configfuzz") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(PropDraws(100))

  private def accepted(t: Throwable): Boolean = t match {
    case _: Config.ConfigException => true
    case _: ModelRegistry.CompileException => true
    case _: IllegalArgumentException => true
    case _: org.yaml.snakeyaml.error.YAMLException => true
    case _ => false
  }

  // keys biased toward REAL field names so draws reach deep parse paths
  // instead of dying at the "no name" gate
  private val keyGen: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("name", "dataset", "model", "evaluation", "runtime",
      "metadata", "project_name", "tags", "target_tag_list", "resolution",
      "row_filter", "train_start_date", "train_end_date",
      "aggregation_methods", "cv", "metrics", "scoring_scaler",
      "n_samples_threshold", "row_filter_buffer_size", "type",
      "requests", "limits", "memory", "cpu",
      "sklearn.pipeline.Pipeline",
      "sklearn.preprocessing.MinMaxScaler",
      "gordo.machine.model.models.KerasAutoEncoder"),
    2 -> Gen.alphaNumStr.map(s => if (s.isEmpty) "k" else s.take(12)))

  private val scalarGen: Gen[Any] = Gen.oneOf[Any](
    Gen.const(null),
    Gen.oneOf[Any]("10T", "1H", "mean", "not a date",
      "2020-01-01T00:00:00Z", "", "machine-1", "tag with space",
      "List(mean, max)", "steps: [1, 2", "~", "1Gi", "512Mi", "100m"),
    Gen.alphaNumStr.map(_.take(16): Any),
    Gen.choose(-1000, 1000).map(x => x: Any),
    Gen.choose(-1e6, 1e6).map(x => x: Any),
    Gen.oneOf[Any](true, false))

  private def anyGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, anyGen(depth - 1)).map(_.toList: Any)),
      3 -> mapGen(depth - 1).map(m => m: Any))

  private def mapGen(depth: Int): Gen[Map[String, Any]] =
    Gen.choose(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(keyGen, anyGen(depth))).map(_.toMap))

  property("machineFromConfig builds a spec or rejects with a contract exception") =
    forAll(mapGen(3), Gen.oneOf(true, false)) { (cfg0, named) =>
      // half the draws carry valid name/project so the deep parse paths
      // (dataset bridge, model compile) actually run
      val cfg = if (named)
        cfg0 + ("name" -> "m1") + ("project_name" -> "p") +
          ("model" -> cfg0.getOrElse("model",
            Map("sklearn.pipeline.Pipeline" -> Map(
              "steps" -> List("sklearn.preprocessing.MinMaxScaler")))))
      else cfg0
      try {
        val spec = Config.machineFromConfig(cfg, None, Map.empty)
        val deep = Seq[() => Any](
          () => Config.datasetConfig(spec),
          () => ModelRegistry.compile(spec.model))
        // each deep call carries its OWN labeled verdict — a bare
        // forall-of-boolean (and the previous discarded `:|` label)
        // reported only the shrunk input, never which call escaped
        // with what exception (r14 review finding, fixed class-wide)
        Prop.all(deep.map { f =>
          try { f(); Prop.passed }
          catch { case t: Throwable =>
            Prop.propBoolean(accepted(t)) :| s"non-contract deep escape: $t" }
        }: _*)
      } catch { case t: Throwable =>
        Prop.propBoolean(accepted(t)) :| s"non-contract escape: $t"
      }
    }

  property("fixupResources fixes or rejects with a contract exception") =
    forAll(mapGen(2)) { res =>
      // the r13 follow-up sweep: `requests:` (explicit null) and scalar
      // blocks crashed with anonymous NPE/ClassCastException; now every
      // draw either returns a completed map or rejects on contract
      try { Config.fixupResources(res); true }
      catch { case t: Throwable => accepted(t) }
    }

  // ---- definition-tree fuzz (r13): compileClass's deep branches ----
  // machineFromConfig's model slot only ever reaches the Pipeline/
  // MinMaxScaler/KerasAutoEncoder heads of the allowlist; this generator
  // targets the WHOLE class-path allowlist with each branch's own kwarg
  // vocabulary (nulls, wrong types, nested definitions) so the LSTM /
  // raw-spec / PCA / Detector parse paths fuzz too.

  private val classPathGen: Gen[String] = Gen.frequency(
    9 -> Gen.oneOf(
      "sklearn.pipeline.Pipeline", "sklearn.pipeline.FeatureUnion",
      "sklearn.preprocessing.MinMaxScaler",
      "sklearn.preprocessing.RobustScaler",
      "sklearn.preprocessing.FunctionTransformer",
      "gordo.machine.model.transformers.imputer.InfImputer",
      "gordo.machine.model.models.KerasAutoEncoder",
      "gordo.machine.model.models.KerasLSTMAutoEncoder",
      "gordo.machine.model.models.KerasLSTMForecast",
      "sklearn.linear_model.LinearRegression",
      "gordo.machine.model.models.KerasRawModelRegressor",
      "sklearn.decomposition.PCA",
      "sklearn.model_selection.TimeSeriesSplit",
      "sklearn.model_selection.KFold",
      "gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector"),
    1 -> Gen.alphaNumStr.map(s => if (s.isEmpty) "x" else s.take(20)))

  private val kwKeyGen: Gen[String] = Gen.frequency(
    8 -> Gen.oneOf("steps", "transformer_list", "kind", "lookback_window",
      "lookahead", "n_splits", "base_estimator", "scaler", "window",
      "smoothing_method", "shuffle", "func", "kw_args", "factor",
      "strategy", "delta", "n_components", "spec", "compile", "layers",
      "units", "activation", "loss", "optimizer",
      "tensorflow.keras.models.Sequential",
      "tensorflow.keras.layers.Dense"),
    2 -> Gen.alphaNumStr.map(s => if (s.isEmpty) "k" else s.take(12)))

  // NaN deliberately absent: a Double.NaN kwarg compiles but breaks
  // case-class == on the round-trip compare (primitive NaN != NaN) — a
  // compare artifact, not an engine contract
  private val kwScalarGen: Gen[Any] = Gen.oneOf[Any](
    Gen.const(null),
    Gen.oneOf[Any]("feedforward_hourglass", "lstm_hourglass",
      "feedforward_model", "minmax", "robust", "tanh", "relu", "linear",
      "mse", "adam", "timeseries",
      "gordo.machine.model.transformer_funcs.general.multiply_by",
      "multiply_by", "not_a_kind", "0.5", "5e-1", "abc", ""),
    Gen.choose(-5, 12).map(x => x: Any),
    Gen.oneOf[Any](0.5, 1.0, 2.0, -1.5, 1e300),
    Gen.oneOf[Any](true, false))

  private def kwValGen(depth: Int): Gen[Any] =
    if (depth <= 0) kwScalarGen
    else Gen.frequency(
      5 -> kwScalarGen,
      2 -> defGen(depth - 1),
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, kwValGen(depth - 1)).map(_.toList: Any)),
      2 -> kwMapGen(depth - 1).map(m => m: Any))

  private def kwMapGen(depth: Int): Gen[Map[String, Any]] =
    Gen.choose(0, 4).flatMap(n =>
      Gen.listOfN(n, Gen.zip(kwKeyGen, kwValGen(depth))).map(_.toMap))

  private def defGen(depth: Int): Gen[Any] = Gen.frequency(
    2 -> classPathGen.map(s => s: Any),
    5 -> Gen.zip(classPathGen,
      if (depth <= 0) kwScalarGen else Gen.frequency[Any](
        6 -> kwMapGen(depth - 1),
        1 -> kwScalarGen)).map { case (c, kw) => Map(c -> kw): Any },
    1 -> kwScalarGen)

  property("compile on arbitrary definition trees compiles+round-trips or rejects on contract") =
    forAll(defGen(3)) { d =>
      try {
        val s = ModelRegistry.compile(d)
        // M2 inverse contract: the canonical re-emission of a stage that
        // COMPILED must itself compile, back to the SAME stage
        val rt = ModelRegistry.compile(ModelRegistry.intoDefinition(s))
        // traversals over any compiled tree must never crash anonymously
        ModelRegistry.substituteClosedForm(s)
        ModelRegistry.windowOf(s)
        ModelRegistry.detectorOf(s)
        try ModelRegistry.basePreprocess(s)
        catch { case t: Throwable if accepted(t) => () }
        Prop.propBoolean(rt == s) :| s"round-trip mismatch: $s vs $rt"
      } catch { case t: Throwable =>
        Prop.propBoolean(accepted(t)) :| s"non-contract escape: $t"
      }
    }

  // ---- YAML-TEXT fuzz (r14): shapes the map-level generators cannot
  // draw. snakeyaml resolves anchors/aliases/merge keys and YAML-1.1
  // scalar spellings BEFORE toScala sees the document, so the config
  // bridge receives object graphs (shared references across sections,
  // merged mappings, Integer/Boolean/Date scalars in string-typed
  // slots, sexagesimal ints) that no Scala-value generator produces —
  // exactly the aperture the r13 null-hole class hid behind for 12
  // rounds. Each template below is a shape the r13 verdict named as
  // undrawable: merge keys (`<<: *base`, incl. the multi-merge list
  // form), anchor/alias REUSE across sections, duplicate mapping keys
  // (snakeyaml last-wins), nested nulls inside model-definition kwarg
  // MAPS, numeric-string edge forms (`1_000`, `.5`, `0x10`, `00:05`),
  // and empty-string / non-string keys.

  private val yamlEdgeScalar: Gen[String] = Gen.oneOf(
    "1_000", ".5", "0x10", "0o17", "010", "1e3", "00:05", "1:00:05",
    ".inf", "-.Inf", ".NaN", "y", "n", "on", "Off", "yes", "NO",
    "~", "null", "NULL", "", "!!str 1_000", "!!int 12", "!!float 2",
    "'10T'", "10T", "mean", "2020-01-01", "2020-01-01 00:00:00",
    "2020-01-01T00:00:00Z", "'2020-01-01T00:00:00Z'", "[]", "{}")

  private val yamlEdgeKey: Gen[String] = Gen.oneOf(
    "resolution", "row_filter_buffer_size", "n_samples_threshold",
    "aggregation_methods", "train_start_date", "interpolation_limit",
    "type", "\"\"", "''", "1", "no", "extra_key")

  private val yamlDocGen: Gen[String] = for {
    s1 <- yamlEdgeScalar
    s2 <- yamlEdgeScalar
    k <- yamlEdgeKey
    kw <- yamlEdgeScalar
    variant <- Gen.choose(0, 7)
  } yield variant match {
    case 0 => // merge key from an anchored base + machine-side override
      s"""base: &base
         |  tags: [TAG-1, TAG-2]
         |  resolution: $s1
         |name: m1
         |project_name: p
         |dataset:
         |  <<: *base
         |  type: RandomDataset
         |  $k: $s2
         |model:
         |  sklearn.pipeline.Pipeline:
         |    steps:
         |      - sklearn.preprocessing.MinMaxScaler""".stripMargin
    case 1 => // multi-merge precedence (<<: [*a, *b]) + DUPLICATE keys
      // the multi-merge dataset comes LAST so the duplicate-key
      // last-wins resolution hands the BRIDGE the multi-merge shape —
      // the first draft had them the other way around, so the form the
      // r13 verdict named as undrawable never actually reached the
      // bridge (r14 review finding)
      s"""a: &a {resolution: $s1, tags: [x]}
         |b: &b {resolution: 10T, $k: $s2}
         |name: m1
         |name: m2
         |project_name: p
         |dataset:
         |  <<: *a
         |  tags: [TAG-1]
         |dataset:
         |  <<: [*a, *b]
         |  type: RandomDataset
         |model: {sklearn.preprocessing.MinMaxScaler: {}}""".stripMargin
    case 2 => // one anchored LIST aliased into two slots (shared object)
      s"""name: m1
         |project_name: p
         |dataset:
         |  tags: &t [TAG-1, $s1, TAG-2]
         |  target_tag_list: *t
         |  resolution: $s2
         |model: {sklearn.preprocessing.MinMaxScaler: {}}""".stripMargin
    case 3 => // nested nulls inside model kwarg MAPS (not just scalars)
      s"""name: m1
         |project_name: p
         |dataset: {tags: [TAG-1], type: RandomDataset}
         |model:
         |  gordo.machine.model.models.KerasAutoEncoder:
         |    kind: feedforward_hourglass
         |    compile: {loss: ~, optimizer: null}
         |    kw_args: {factor: $kw, "": $s1}""".stripMargin
    case 4 => // YAML-1.1 numeric edge forms in numeric-typed slots
      s"""name: m1
         |project_name: p
         |dataset:
         |  tags: [TAG-1]
         |  row_filter_buffer_size: $s1
         |  n_samples_threshold: $s2
         |model:
         |  sklearn.decomposition.PCA: {n_components: $kw}""".stripMargin
    case 5 => // YAML-in-YAML dataset STRING carrying its own merge key
      s"""name: m1
         |project_name: p
         |dataset: |
         |  base: &x
         |    tags: [TAG-1]
         |  <<: *x
         |  resolution: $s1
         |  type: RandomDataset
         |model: {sklearn.preprocessing.MinMaxScaler: {}}""".stripMargin
    case 6 => // empty-string / integer / boolean-word KEYS
      s"""1: junk
         |no: junk2
         |name: m1
         |project_name: p
         |dataset: {tags: [TAG-1], 1: $s1, no: $s2, "": $kw,
         |  type: RandomDataset}
         |model: {sklearn.preprocessing.MinMaxScaler: {}}""".stripMargin
    case _ => // anchored MODEL aliased into metadata + edge train dates
      s"""model: &m
         |  gordo.machine.model.models.KerasLSTMForecast:
         |    kind: lstm_hourglass
         |    lookback_window: $s1
         |metadata:
         |  again: *m
         |name: m1
         |project_name: p
         |dataset:
         |  tags: [TAG-1]
         |  train_start_date: 2020-01-01
         |  train_end_date: $s2""".stripMargin
  }

  property("YAML-text configs (anchors, merges, duplicates, 1.1 scalars) build or reject on contract") =
    forAll(yamlDocGen) { doc =>
      try {
        val spec = Config.machineFromConfig(Config.parseYaml(doc),
          None, Map.empty)
        val deep = Seq[() => Any](
          () => Config.datasetConfig(spec),
          () => ModelRegistry.compile(spec.model))
        Prop.all(deep.map { f =>
          try { f(); Prop.passed }
          catch { case t: Throwable =>
            Prop.propBoolean(accepted(t)) :|
              s"non-contract deep escape on:\n$doc\n$t" }
        }: _*)
      } catch { case t: Throwable =>
        Prop.propBoolean(accepted(t)) :| s"non-contract escape on:\n$doc\n$t"
      }
    }

  property("parseYaml on raw text parses or rejects loudly, never crashes anonymously") =
    forAll(Gen.frequency(
      3 -> Gen.asciiPrintableStr.map(_.take(200)),
      1 -> Gen.oneOf("a: [1, 2", "{{{{", "a:\n  - b\n c: d", "!!java.io.File x",
        "&a [*a]", "a: |\n  b\n\tc"))) { s =>
      try { Config.parseYaml(s); true }
      catch { case t: Throwable => accepted(t) }
    }
}
