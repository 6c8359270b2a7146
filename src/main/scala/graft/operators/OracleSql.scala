package graft.operators

/** Shared DuckDB oracle fragments.
  *
  * The resample → grid → interpolate dataset-assembly chain is the
  * engine's most load-bearing replay (the 6H/21600-second interpolation
  * limit, the IGNORE NULLS prev/next windows, the shared bucket grid —
  * `graft.data.TimeSeries.getData` semantics) and appears at the head of
  * every build-class oracle (q21, q41/q77 via the ridge template, q68,
  * q73, q75). One template keeps that arithmetic in exactly one place,
  * so a future change cannot silently diverge the oracles from each
  * other.
  */
object OracleSql {

  /** CTE chain `src, r, bounds, grid, g, i` — hourly 2-tag dataset
    * assembly over `[start, end)`. `i` is the long interpolated frame
    * `(tag, bucket_ts, v)`. Compose as `WITH ${assemblyCtes(...)}, ...`
    * or `WITH ${assemblyCtes(...)}\n<final SELECT over i>`. */
  def assemblyCtes(tagA: String, tagB: String,
                   start: String, end: String): String =
    s"""src AS (
      |  SELECT event_type AS tag, (epoch_us(ts)//1000000//3600)*3600 AS bucket_ts, value
      |  FROM events
      |  WHERE event_type IN ('$tagA', '$tagB')
      |    AND ts >= TIMESTAMP '$start'
      |    AND ts <  TIMESTAMP '$end'),
      |r AS (SELECT tag, bucket_ts, avg(value) AS value FROM src GROUP BY 1, 2),
      |bounds AS (SELECT min(bucket_ts) AS b0, max(bucket_ts) AS b1 FROM r),
      |grid AS (SELECT tag, unnest(generate_series(b0, b1, 3600)) AS bucket_ts
      |         FROM bounds CROSS JOIN (SELECT DISTINCT tag FROM r) t),
      |g AS (SELECT grid.tag, grid.bucket_ts, r.value
      |      FROM grid LEFT JOIN r USING (tag, bucket_ts)),
      |i AS (SELECT tag, bucket_ts,
      |   CASE WHEN value IS NOT NULL THEN value
      |        WHEN prevb IS NOT NULL AND nextb IS NOT NULL AND nextb - prevb <= 21600
      |        THEN prevv + (nextv - prevv)
      |             * (CAST(bucket_ts - prevb AS DOUBLE) / CAST(nextb - prevb AS DOUBLE))
      |   END AS v
      | FROM (SELECT *,
      |   last_value(value IGNORE NULLS) OVER wb AS prevv,
      |   last_value(CASE WHEN value IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wb AS prevb,
      |   first_value(value IGNORE NULLS) OVER wa AS nextv,
      |   first_value(CASE WHEN value IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER wa AS nextb
      |  FROM g
      |  WINDOW wb AS (PARTITION BY tag ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |         wa AS (PARTITION BY tag ORDER BY bucket_ts ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)))""".stripMargin

  /** Complete-rows wide pivot of `i` with r4 rounding — the final SELECT
    * of the q21/q68/q73 family. Column names are the tag names. */
  def widePivotTail(tagA: String, tagB: String): String =
    s"""SELECT bucket_ts, floor(($tagA)*10000 + 0.5)/10000 AS $tagA, floor(($tagB)*10000 + 0.5)/10000 AS $tagB FROM (
      |  SELECT bucket_ts,
      |    max(CASE WHEN tag = '$tagA' THEN v END) AS $tagA,
      |    max(CASE WHEN tag = '$tagB' THEN v END) AS $tagB
      |  FROM i GROUP BY bucket_ts)
      |WHERE $tagA IS NOT NULL AND $tagB IS NOT NULL
      |ORDER BY bucket_ts""".stripMargin
}
