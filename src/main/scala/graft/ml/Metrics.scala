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

  /** y restricted to rows where the (y, ŷ) PAIR is present: numerator
    * terms like Σ(y−ŷ)² naturally skip rows with a null prediction (the
    * expression is null there), so the y-side statistics must skip the
    * same rows — mixing populations (pairwise numerator over an all-rows
    * denominator) silently inflates the score whenever a model emits
    * null predictions (e.g. a sequence model on a null-bearing span).
    * sklearn computes every term over the same sample set. */
  private def paired(y: Column, yhat: Column): Column =
    when(y.isNotNull && yhat.isNotNull, y)

  /** sklearn r2_score: 1 − Σ(y−ŷ)² / Σ(y−ȳ)². A constant-y span follows
    * sklearn's degenerate convention — zero denominator scores 1.0 for a
    * perfect fit and 0.0 otherwise (a plain division would go null, or
    * throw under ANSI, and poison the fold aggregation with NaN). */
  def r2(y: Column, yhat: Column): Column = {
    val yp = paired(y, yhat)
    val num = sum(pow(yp - yhat, 2))
    val den = var_pop(yp) * count(yp)
    when(den === 0.0, when(num === 0.0, 1.0).otherwise(0.0))
      .otherwise(lit(1.0) - num / den)
  }

  /** sklearn explained_variance_score: 1 − Var(y−ŷ) / Var(y), same
    * constant-y convention as [[r2]]. */
  def explainedVariance(y: Column, yhat: Column): Column = {
    val yp = paired(y, yhat)
    val num = var_pop(yp - yhat)
    val den = var_pop(yp)
    when(den === 0.0, when(num === 0.0, 1.0).otherwise(0.0))
      .otherwise(lit(1.0) - num / den)
  }

  /** The reference's default metric set keyed by its sklearn name
    * (dashes like the `{metric}-{tag}` convention). */
  def all(y: Column, yhat: Column): Seq[(String, Column)] = Seq(
    "explained-variance-score" -> explainedVariance(y, yhat),
    "r2-score" -> r2(y, yhat),
    "mean-squared-error" -> mse(y, yhat),
    "mean-absolute-error" -> mae(y, yhat))
}
