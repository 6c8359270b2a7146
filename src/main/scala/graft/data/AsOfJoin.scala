package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.Cols.{q => qc}

/** Backward as-of join — for each left row, the single right row with the
  * greatest `rightTs <= leftTs` in the same key group (optionally within
  * `tolerance`). The alignment primitive of every training-data
  * pipeline that joins sensor readings to the most recent label/config/
  * calibration row (pandas `merge_asof`, DuckDB `ASOF JOIN`); the
  * reference's nearest-previous-value semantics appear in its ffill
  * alignment (`gordo/machine/dataset/pandas -> ffill` shape,
  * `data/TimeSeries.ffill`), generalized here to two tables.
  *
  * Spark-first plan (no range cross-join, no per-key single-task sort):
  * tag both sides and union, then ONE running `last(right_payload,
  * ignoreNulls)` window ordered by (ts, side) — right rows sort before
  * left rows at equal ts, so equal timestamps match (inclusive backward
  * semantics). At scale a key's whole history must not fund one task, so
  * the window partitions by (keys, floor(ts/chunkSec)) and the value
  * carried across chunk boundaries comes from a per-(key, chunk)
  * "latest payload" frame — |chunks| rows, ~chunkSec·rate× smaller than
  * the data — prefix-scanned per key and joined back (AQE broadcasts it).
  * Exact: a left row's match is either inside its own chunk (running
  * last) or the latest right row of an earlier chunk (the carry).
  *
  * Contracts: `leftTs`/`rightTs` are NUMERIC epochs in caller-chosen
  * units; `tolerance` and `chunkSpan` are in the SAME units (callers
  * convert timestamps; the tolerance test is plain subtraction). The
  * default chunkSpan (86400) is one day of epoch-SECONDS — with
  * epoch-millis/micros timestamps pass a span in those units (e.g.
  * 86_400_000_000L for a day of micros), or each chunk covers
  * milliseconds of data and the "small" ids/finals/carry frames grow by
  * the unit factor into a scale problem of their own. Right
  * rows tying on (keys, rightTs) make the winner
  * unspecified — pre-aggregate for determinism. A null left ts yields a
  * null match; null right ts rows are dropped. `payload` names must not
  * collide with left columns.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               matchedTsName: String = "asof_ts",
               tolerance: Long = -1L, chunkSpan: Long = 86400L): DataFrame = {
    require(payload.nonEmpty, "need at least one right payload column")
    val collide = payload.toSet intersect left.columns.toSet
    require(collide.isEmpty, s"payload collides with left columns: $collide")
    require(!left.columns.contains(matchedTsName),
      s"matchedTsName collides with a left column: $matchedTsName")
    // internal working names — a user column with one of these would be
    // silently overwritten by withColumn; fail fast instead
    val reserved = Set("__chunk", "__ord", "__side", "__rp", "__rpf",
      "__rts", "__m", "__match", "__carry")
    val resHit = (left.columns ++ right.columns).toSet intersect reserved
    require(resHit.isEmpty, s"columns collide with AsOfJoin internals: $resHit")
    require(!payload.contains("__ts"),
      "payload column __ts collides with the match-struct timestamp field")
    def numeric(df: DataFrame, c: String, side: String): Unit =
      require(df.schema(c).dataType.isInstanceOf[NumericType],
        s"$side ts column $c must be numeric (epoch), got ${df.schema(c).dataType}")
    numeric(left, leftTs, "left"); numeric(right, rightTs, "right")

    val kc = keys.map(qc)
    val chunked = chunkSpan > 0
    def chunkOf(ts: Column): Column =
      if (chunked) floor(ts / chunkSpan).cast("long") else lit(0L)

    val rp = struct((qc(rightTs).as("__ts") +: payload.map(qc)): _*)
    val r2 = right.filter(qc(rightTs).isNotNull)
      .select((kc :+ qc(rightTs).as("__rts") :+ rp.as("__rp")): _*)
      .withColumn("__chunk", chunkOf(col("__rts")))
    val rpType = r2.schema("__rp").dataType

    val l2 = left
      .withColumn("__chunk", chunkOf(qc(leftTs)))
      .withColumn("__ord", qc(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(rpType))
    val r3 = r2.withColumn("__ord", col("__rts")).withColumn("__side", lit(0))
      .drop("__rts")

    val win = Window
      .partitionBy((kc :+ col("__chunk")): _*)
      .orderBy(col("__ord").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inChunk = l2.unionByName(r3, allowMissingColumns = true)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(win))
      .filter(col("__side") === 1)

    val withMatch =
      if (!chunked) inChunk.withColumn("__match", col("__m"))
      else {
        // latest right payload of every STRICTLY EARLIER chunk, per
        // (key, chunk) — one row per key-chunk, prefix-scanned per key
        val ids = l2.select((kc :+ col("__chunk")): _*)
          .unionByName(r2.select((kc :+ col("__chunk")): _*)).distinct()
        val finals = r2.groupBy((kc :+ col("__chunk")): _*)
          .agg(max_by(col("__rp"), col("__rts")).as("__rpf"))
        val cwin = Window.partitionBy(kc: _*).orderBy(col("__chunk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val carry = ids.join(finals, (keys :+ "__chunk").toSeq, "left")
          .withColumn("__carry", last(col("__rpf"), ignoreNulls = true).over(cwin))
          .select((kc :+ col("__chunk") :+ col("__carry")): _*)
        inChunk.join(carry, (keys :+ "__chunk").toSeq, "left")
          .withColumn("__match", coalesce(col("__m"), col("__carry")))
      }

    // tolerance gates the WHOLE match (ts + payload null together, the
    // merge_asof contract); backward guarantees __ord - __ts >= 0
    val gated =
      if (tolerance < 0) withMatch
      else withMatch.withColumn("__match",
        when(col("__ord") - col("__match").getField("__ts") <= tolerance,
          col("__match")))

    val matchedCols = col("__match").getField("__ts").as(matchedTsName) +:
      payload.map(p => col("__match").getField(p).as(p))
    gated.select(left.columns.toIndexedSeq.map(qc) ++ matchedCols: _*)
  }
}
