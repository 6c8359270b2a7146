package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{Config, ModelRegistry}

/** Regression coverage for the round-10 config-layer review findings:
  * FeatureUnion output threading, evaluation-default layering, k8s
  * quantity strings, numeric-string PCA specs, and loud ConfigException
  * contracts on malformed documents. */
class ConfigReviewFixesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("a pipeline stage after a FeatureUnion transforms the union's outputs") {
    val df = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("a", "b")
    val st = ModelRegistry.compile(Config.parseYaml(
      """
        |sklearn.pipeline.Pipeline:
        |  steps:
        |    - sklearn.pipeline.FeatureUnion:
        |        transformer_list:
        |          - sklearn.preprocessing.MinMaxScaler
        |    - sklearn.preprocessing.FunctionTransformer:
        |        func: gordo.machine.model.transformer_funcs.general.multiply_by
        |        kw_args: {factor: 2.0}
        |""".stripMargin))
    val out = ModelRegistry.fitTransform(df, Seq("a", "b"), st)
      .orderBy($"a").collect()
    // sklearn semantics: the multiplier consumes the union's OUTPUT
    // (the minmax-scaled branch columns), never the raw tags
    assert(out.map(_.getAs[Double]("a")).toSeq == Seq(1.0, 2.0, 3.0),
      "raw tags must ride through untouched")
    assert(out.map(_.getAs[Double]("a__b0")).toSeq == Seq(0.0, 1.0, 2.0),
      "the post-union stage must double the SCALED branch output")
  }

  test("evaluation defaults layer beneath user globals, machine on top") {
    val globals = Map[String, Any](
      "evaluation" -> Map[String, Any]("cv_mode" -> "cross_val_only"))
    val machine = Config.parseYaml(
      """name: m1
        |dataset: {tag_list: [t1]}
        |model:
        |  gordo.machine.model.anomaly.diff.DiffBasedAnomalyDetector:
        |    base_estimator:
        |      gordo.machine.model.models.KerasAutoEncoder:
        |        kind: feedforward_hourglass
        |""".stripMargin)
    val spec = Config.machineFromConfig(machine, Some("p"), globals)
    // the old machine-side {cv_mode: full_build} injection clobbered a
    // globals-configured cv_mode whenever the machine omitted its
    // evaluation section
    assert(spec.evaluation("cv_mode") == "cross_val_only")
    // engine defaults still fill what neither layer sets
    assert(spec.evaluation.contains("metrics"))
    // no globals at all → the documented full_build default
    val spec2 = Config.machineFromConfig(machine, Some("p"), Map.empty)
    assert(spec2.evaluation("cv_mode") == "full_build")
  }

  test("fixupResources raises k8s quantity-string limits to their requests") {
    val fixed = Config.fixupResources(Map(
      "requests" -> Map[String, Any]("memory" -> "1Gi", "cpu" -> "500m"),
      "limits" -> Map[String, Any]("memory" -> "512Mi", "cpu" -> 1)))
    val limits = fixed("limits").asInstanceOf[Map[String, Any]]
    assert(limits("memory") == "1Gi", "512Mi < 1Gi must raise to the request")
    assert(limits("cpu") == 1, "1 cpu >= 500m stays")
  }

  test("PCA n_components from a dot-less numeric string canonicalizes") {
    val st = ModelRegistry.compile(Map(
      "sklearn.decomposition.PCA" -> Map("n_components" -> "5e-1")))
    // reconstructorOf/intoDefinition dispatch on contains('.'): the raw
    // "5e-1" took the int branch and NumberFormatException'd mid-build
    ModelRegistry.reconstructorOf(st, "bucket_ts", 0L)
    assert(ModelRegistry.intoDefinition(st) != null)
  }

  test("malformed documents raise ConfigException, never CCE/NPE") {
    intercept[Config.ConfigException](
      Config.parseYaml("sklearn.preprocessing.MinMaxScaler"))
    intercept[Config.ConfigException](Config.parseTzAware(null))
    intercept[Config.ConfigException](Config.machineFromConfig(
      Map("name" -> null), Some("p"), Map.empty))
  }

  test("bad windowing shapes are CompileException (catchable config rejections)") {
    intercept[ModelRegistry.CompileException](
      ModelRegistry.compile(Config.parseYaml(
        """gordo.machine.model.models.KerasLSTMAutoEncoder:
          |  lookback_window: 0
          |""".stripMargin)))
    intercept[ModelRegistry.CompileException](
      ModelRegistry.reconstructorOf(ModelRegistry.PipelineOf(Nil), "t", 0L))
  }
}
