package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ml.DiffAnomaly
import graft.ml.DiffAnomaly.FittedDetector

/** Streaming scoring (SURVEY §2.11): the reference is batch-train +
  * request/response-score; the streaming-native equivalent scores
  * arriving sensor windows incrementally.
  *
  * Three pieces:
  *  - [[resampleStream]]: A1 as a watermarked tumbling-window aggregation
  *    (`readStream → withWatermark → groupBy(window(ts, resolution))`),
  *    late data bounded by the watermark (the reference has no late-data
  *    story at all — values are fetched after the fact);
  *  - [[scoreStream]]: the anomaly frame's row-local derivations applied
  *    to a (micro-batch) stream. Everything except smooth-* is stateless
  *    per row, so the same fitted detector scores batch and stream
  *    identically;
  *  - [[smoothStream]]: the smooth-* columns as a
  *    `flatMapGroupsWithState` stateful operator — each machine key
  *    keeps the trailing `width` values (bounded state), emitting
  *    batch-identical rolling smm/sma.
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

  /** Bounded per-key state for [[smoothStream]]: the last `width` values
    * of each smoothed column (ring kept by truncation; None = a null
    * score, which the aggregates skip exactly like the batch window
    * functions) — state size is width × columns per machine, constant
    * in stream length. */
  case class SmoothState(hist: Seq[Seq[Option[Double]]])

  /** Stateful streaming smoothing (the smooth-* trailing windows of
    * W1–W3 applied to an arriving per-machine score stream) via
    * `flatMapGroupsWithState` — the custom-state streaming shape the
    * batch path expresses as window frames. Each machine key carries the
    * last `width−1` values per column; a row emits null until its key
    * has seen a full window (the pandas rolling NaN prefix), then the
    * rolling mean (`sma`) or linearly-interpolated median (`smm`) of the
    * trailing `width` values — identical numbers to the batch
    * `Windows.chunkedTrailing`.
    *
    * Rows are sorted by `orderCol` within each micro-batch; across
    * batches, per-key in-order delivery is assumed — the shape
    * [[resampleStream]] produces, where a bucket is emitted once the
    * watermark finalizes it (and the same contract the reference's docs
    * put on clients, `docs/ml/model_output.rst:77-103`: supply `window`
    * rows of ordered history). Returns (key, order, smooth…) rows. */
  def smoothStream(scored: DataFrame, keyCol: String, orderCol: String,
                   cols: Seq[(String, String)], width: Int,
                   method: String = "smm"): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    require(method == "smm" || method == "sma",
      s"unsupported streaming smoothing: $method")
    require(cols.nonEmpty, "need at least one column")
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = scored.sparkSession
    import spark.implicits._
    // boxed score values: a null score rides as None and is SKIPPED by
    // the aggregates, exactly like the batch window functions — a plain
    // Seq[Double] encoder would kill the streaming query on the first
    // null (NOT_NULL_ASSERT_VIOLATION at deserialization)
    val packed = scored.select(
      graft.Cols.q(keyCol).cast("string"),
      graft.Cols.q(orderCol).cast("long"),
      array(cols.map { case (in, _) => graft.Cols.q(in).cast("double") }: _*))
      .as[(String, Long, Seq[Option[Double]])]
    val smoothed = packed.groupByKey(_._1)
      .flatMapGroupsWithState[SmoothState, (String, Long, Seq[Option[Double]])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, rows, state) =>
          val hist: Array[Vector[Option[Double]]] =
            if (state.exists) state.get.hist.map(_.toVector).toArray
            else Array.fill(cols.size)(Vector.empty[Option[Double]])
          val out = rows.toSeq.sortBy(_._2).map { case (_, t, vals) =>
            val sm = vals.zipWithIndex.map { case (v, i) =>
              hist(i) = (hist(i) :+ v).takeRight(width)
              val defined = hist(i).flatten
              // pandas NaN prefix: null until the key has seen `width`
              // ROWS; within a full frame, nulls are skipped like the
              // batch min/avg/percentile
              if (hist(i).size < width || defined.isEmpty) None
              else Some(method match {
                case "sma" => defined.sum / defined.size
                case "smm" =>
                  // exact percentile(0.5) with linear interpolation
                  // over the non-null frame values, matching the batch
                  // window's `percentile`
                  val s = defined.sorted
                  val pos = (s.size - 1) * 0.5
                  val lo = s(pos.toInt)
                  val hi = s(math.ceil(pos).toInt)
                  lo + (hi - lo) * (pos - pos.toInt)
              })
            }
            (key, t, sm)
          }
          state.update(SmoothState(hist.toSeq.map(_.toSeq)))
          out.iterator
      }
    smoothed.toDF("__k", "__t", "__sm").select(
      (col("__k").as(keyCol) +: col("__t").as(orderCol) +:
        cols.zipWithIndex.map { case ((_, out), i) =>
          col("__sm")(i).as(out) }): _*)
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
