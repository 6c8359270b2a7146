package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Regression metrics as aggregate expressions (SURVEY A9/M13/M14; ref:
  * metric list `gordo/workflow/config_elements/normalized_config.py:97-107`,
  * scoring wiring `gordo/builder/build_model.py:377-446`).
  *
  * Each is a single Column so a whole metric matrix (metrics × tags)
  * evaluates in ONE aggregation pass — the Spark shape of the reference's
  * `build_metrics_dict` per-tag scorer loop. sklearn semantics: r2 uses
  * Σ(y−ȳ)² (population) in the denominator; explained_variance uses
  * np.var (ddof=0).
  */
object Metrics {

  def mse(y: Column, yhat: Column): Column = avg(pow(y - yhat, 2))

  def mae(y: Column, yhat: Column): Column = avg(abs(y - yhat))

  /** sklearn r2_score: 1 − Σ(y−ŷ)² / Σ(y−ȳ)². */
  def r2(y: Column, yhat: Column): Column =
    lit(1.0) - sum(pow(y - yhat, 2)) / (var_pop(y) * count(y))

  /** sklearn explained_variance_score: 1 − Var(y−ŷ) / Var(y). */
  def explainedVariance(y: Column, yhat: Column): Column =
    lit(1.0) - var_pop(y - yhat) / var_pop(y)

  /** The reference's default metric set keyed by its sklearn name
    * (dashes like the `{metric}-{tag}` convention). */
  def all(y: Column, yhat: Column): Seq[(String, Column)] = Seq(
    "explained-variance-score" -> explainedVariance(y, yhat),
    "r2-score" -> r2(y, yhat),
    "mean-squared-error" -> mse(y, yhat),
    "mean-absolute-error" -> mae(y, yhat))
}
