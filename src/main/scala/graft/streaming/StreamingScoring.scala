package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.DiffAnomaly
import graft.ml.DiffAnomaly.FittedDetector

/** Streaming scoring (SURVEY §2.11): the reference is batch-train +
  * request/response-score; the streaming-native equivalent scores
  * arriving sensor windows incrementally.
  *
  * Two pieces:
  *  - [[resampleStream]]: A1 as a watermarked tumbling-window aggregation
  *    (`readStream → withWatermark → groupBy(window(ts, resolution))`),
  *    late data bounded by the watermark (the reference has no late-data
  *    story at all — values are fetched after the fact);
  *  - [[scoreStream]]: the anomaly frame's row-local derivations applied
  *    to a (micro-batch) stream. Everything except smooth-* is stateless
  *    per row, so the same fitted detector scores batch and stream
  *    identically; smoothing needs `window` rows of history, which the
  *    reference's own docs tell clients to supply
  *    (`docs/ml/model_output.rst:77-103`) — batch path covers it.
  */
object StreamingScoring {

  /** Streaming resample: one output row per (key, bucket) once the
    * watermark passes the bucket end. */
  def resampleStream(stream: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, resolutionSec: Long,
                     watermarkDelay: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol),
        window(col(tsCol), s"$resolutionSec seconds").as("w"))
      .agg(avg(col(valueCol)).as(valueCol))
      .select(col(keyCol),
        unix_timestamp(col("w.start")).as("bucket_ts"), col(valueCol))

  /** Score a wide stream with a fitted detector: identical column set to
    * the batch `DiffAnomaly.anomaly` minus smooth-* (stateless). */
  def scoreStream(fd: FittedDetector, wide: DataFrame,
                  resolutionSec: Long): DataFrame = {
    val stateless = fd.copy(window = None)
    DiffAnomaly.anomaly(stateless, wide, resolutionSec)
  }

  /** Streaming exact dedup for an arriving document stream: the first
    * occurrence of each content key passes, later copies are dropped.
    * State is bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark` evicts keys once the watermark
    * passes — a plain `dropDuplicates` would keep key state forever) —
    * the streaming side of the LLM-pipeline dedup family; near-dup
    * (MinHash/SimHash) stays a periodic batch job over the deduped sink,
    * as signatures need the full corpus index. */
  def dedupStream(docs: DataFrame, idCol: String, textCol: String,
                  tsCol: String,
                  watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("exact_key", graft.llm.TextDedup.exactKey(col(textCol)))
      .dropDuplicatesWithinWatermark("exact_key")
}
