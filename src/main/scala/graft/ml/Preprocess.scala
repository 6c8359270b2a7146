package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.Cols.{q => qc}

/** Fitted preprocessing stages of a base-estimator pipeline (SURVEY
  * M1/P6/P7/A3 composition; ref: the reference's default model is
  * `Pipeline[MinMaxScaler, KerasAutoEncoder]` inside the detector —
  * `gordo/machine/machine.py` model defaults — so the transform prefix
  * must run before the reconstruction model, not be dropped).
  *
  * Semantics mirror sklearn `Pipeline.fit(X, y)`: transforms apply to the
  * FEATURES only; targets stay raw. Every supported stage is a per-tag
  * affine map (scaler, multiply) or an idempotent non-finite fill
  * (InfImputer), so the whole chain is `pre(x) = affine(clip(x))` with an
  * exact affine inverse `post`. Reconstructors fit in the transformed
  * space and predictions are mapped back through `post` — for linear
  * models this is algebraically the reference's "transformed X → raw y"
  * shape; for PCA it is the standard whiten-reconstruct-unwhiten.
  *
  * All state is plain per-tag doubles — serializable into model.json (K1)
  * and rebuilt on load (S5), so a persisted model scores identically.
  */
object Preprocess {

  sealed trait Stage {
    /** Forward transform of one tag's value expression. */
    def pre(tag: String, c: Column): Column
    /** Inverse transform (identity for the imputer — fills are not
      * invertible and never need to be: they only replace ±inf). */
    def post(tag: String, c: Column): Column
    /** Serializable spec for model persistence. */
    def spec: Map[String, Any]
  }

  /** Fitted scaler stage wrapping [[Scalers.FittedScaler]] stats
    * ((center, scale) per tag; zero scale → 1 like sklearn). */
  case class ScalerStage(kind: String, stats: Map[String, (Double, Double)])
      extends Stage {
    private def cs(tag: String): (Double, Double) = {
      val (ctr, s) = stats(tag)
      (ctr, if (s == 0.0) 1.0 else s)
    }
    def pre(tag: String, c: Column): Column = {
      val (ctr, s) = cs(tag); (c - lit(ctr)) / lit(s)
    }
    def post(tag: String, c: Column): Column = {
      val (ctr, s) = cs(tag); c * lit(s) + lit(ctr)
    }
    def spec: Map[String, Any] = Map("stage" -> "scaler", "kind" -> kind,
      "stats" -> stats.map { case (t, (a, b)) => t -> List(a, b) })
  }

  /** Fitted InfImputer stage ((posFill, negFill) per tag). */
  case class ImputerStage(fills: Map[String, (Double, Double)]) extends Stage {
    def pre(tag: String, c: Column): Column = {
      val (pos, neg) = fills(tag)
      when(c === lit(Double.PositiveInfinity), lit(pos))
        .when(c === lit(Double.NegativeInfinity), lit(neg))
        .otherwise(c)
    }
    def post(tag: String, c: Column): Column = c
    def spec: Map[String, Any] = Map("stage" -> "imputer",
      "fills" -> fills.map { case (t, (p, n)) => t -> List(p, n) })
  }

  /** `FunctionTransformer(multiply_by)` stage. */
  case class MultiplyStage(factor: Double) extends Stage {
    def pre(tag: String, c: Column): Column = c * lit(factor)
    def post(tag: String, c: Column): Column =
      if (factor == 0.0) c else c / lit(factor)
    def spec: Map[String, Any] = Map("stage" -> "multiply", "factor" -> factor)
  }

  /** The fitted chain. `pre` applies stages in order from the raw column;
    * `post` inverts the affine stages in reverse order. */
  case class Fitted(stages: List[Stage]) {
    def isEmpty: Boolean = stages.isEmpty
    def pre(tag: String): Column = preFrom(tag, qc(tag).cast("double"))
    def preFrom(tag: String, c: Column): Column =
      stages.foldLeft(c)((acc, s) => s.pre(tag, acc))
    def post(tag: String, c: Column): Column =
      stages.foldRight(c)((s, acc) => s.post(tag, acc))
    def specs: List[Map[String, Any]] = stages.map(_.spec)
  }

  val empty: Fitted = Fitted(Nil)

  /** Rebuild a fitted chain from persisted specs (the load path). */
  def fromSpecs(specs: List[Map[String, Any]]): Fitted = Fitted(specs.map { m =>
    def pairs(key: String): Map[String, (Double, Double)] =
      m(key).asInstanceOf[Map[String, Any]].map {
        case (t, l: List[_]) =>
          t -> (l.head.toString.toDouble, l(1).toString.toDouble)
        case (t, v) =>
          throw new IllegalStateException(s"bad preprocess stats $t: $v")
      }
    m("stage").toString match {
      case "scaler"   => ScalerStage(m("kind").toString, pairs("stats"))
      case "imputer"  => ImputerStage(pairs("fills"))
      case "multiply" => MultiplyStage(m("factor").toString.toDouble)
      case other => throw new IllegalStateException(s"unknown preprocess stage: $other")
    }
  })

  /** Wrap a reconstructor so it fits on preprocessed features and emits
    * raw-space predictions (the compiled form of
    * `Pipeline[transforms..., model]` as a base estimator). */
  class Reconstructor(inner: DiffAnomaly.Reconstructor, prep: Fitted)
      extends DiffAnomaly.Reconstructor {
    private def wrap(f: DiffAnomaly.Fitted): DiffAnomaly.Fitted =
      new DiffAnomaly.Fitted {
        def predictCol(tag: String): Column = prep.post(tag, f.predictCol(tag))
        def params: Map[String, Double] = f.params
      }
    override def aggPlan(tags: Seq[String], feature: String => Column)
        : Option[(Seq[Column], org.apache.spark.sql.Row => DiffAnomaly.Fitted)] =
      inner.aggPlan(tags, t => prep.preFrom(t, feature(t)))
        .map { case (aggs, dec) => (aggs, (row: org.apache.spark.sql.Row) => wrap(dec(row))) }
    def fit(train: org.apache.spark.sql.DataFrame, tags: Seq[String],
            feature: String => Column): DiffAnomaly.Fitted =
      wrap(inner.fit(train, tags, t => prep.preFrom(t, feature(t))))
  }
}
