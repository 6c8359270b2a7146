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
        deep.forall { f =>
          try { f(); true }
          catch { case t: Throwable => accepted(t) }
        }
      } catch { case t: Throwable =>
        Prop.propBoolean(accepted(t)) :| s"non-contract escape: $t"
        accepted(t)
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

  property("parseYaml on raw text parses or rejects loudly, never crashes anonymously") =
    forAll(Gen.frequency(
      3 -> Gen.asciiPrintableStr.map(_.take(200)),
      1 -> Gen.oneOf("a: [1, 2", "{{{{", "a:\n  - b\n c: d", "!!java.io.File x",
        "&a [*a]", "a: |\n  b\n\tc"))) { s =>
      try { Config.parseYaml(s); true }
      catch { case t: Throwable => accepted(t) }
    }
}
