package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnomalyQueries, ConfigQueries, LlmQueries, MlQueries, RelationalQueries, SequenceQueries, ServingQueries, TimeSeriesQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to functions of
  * (session, sf-dir) → result DataFrame; `oracleSql` holds the equivalent
  * DuckDB SQL with IDENTICAL output column names (the driver sorts columns
  * by name before hashing values). Query modules live under
  * `graft.operators` / `graft.data` / `graft.ml` and are aggregated here.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The centerpiece: the full DiffBasedAnomalyDetector slice —
    * dataset assembly → CV thresholds → anomaly frame. */
  def entry(spark: SparkSession): DataFrame =
    AnomalyQueries.anomalyFrame(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ TimeSeriesQueries.queries ++
      MlQueries.queries ++ AnomalyQueries.queries ++ LlmQueries.queries ++
      SequenceQueries.queries ++ ServingQueries.queries ++
      ConfigQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ TimeSeriesQueries.oracleSql ++
      MlQueries.oracleSql ++ AnomalyQueries.oracleSql ++ LlmQueries.oracleSql ++
      SequenceQueries.oracleSql ++ ServingQueries.oracleSql ++
      ConfigQueries.oracleSql
}
