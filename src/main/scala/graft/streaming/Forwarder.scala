package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** K6 forwarder analog: the reference's client forwards resampled
  * sensors + predictions into InfluxDB measurements
  * (`tests/gordo/client/test_client.py:304-338`). The streaming-native
  * form is a `foreachBatch` sink — each micro-batch lands as an
  * idempotent append keyed by the batch id, and swapping the parquet
  * write for a JDBC/line-protocol call changes only the lambda body.
  */
object Forwarder {

  /** Forward a (possibly scored) stream to a parquet measurement
    * directory. Each micro-batch lands in its own `batch_id=N`
    * subdirectory with OVERWRITE mode, so a replay after a crash between
    * write and checkpoint commit rewrites the same directory instead of
    * appending duplicates — that is what makes restarts exactly-once.
    * Readers use `spark.read.parquet(outDir)` (partition discovery).
    *
    * The sink is FENCED to its checkpoint: the query id is recorded in
    * `_graft_query_id` at the sink root (underscore-prefixed — partition
    * discovery ignores it, like `_SUCCESS`). Restarting with the SAME
    * checkpoint resumes cleanly; pointing a FRESH checkpoint (or a
    * different query's) at a sink that already holds batch dirs is
    * rejected at start — batch ids would restart at 0 and overwrite only
    * the low-numbered dirs, silently interleaving new data with stale
    * high-numbered dirs from the old run. Clear the sink (or pick a new
    * one) when reprocessing from scratch. */
  def toParquet(stream: DataFrame, outDir: String,
                checkpointDir: String): StreamingQuery = {
    val marker = Paths.get(outDir, "_graft_query_id")
    val existingBatches = {
      val fs = new File(outDir).listFiles()
      fs != null && fs.exists(f => f.isDirectory && f.getName.startsWith("batch_id="))
    }
    // the query id is stable across restarts of one checkpoint and
    // recorded in <checkpoint>/metadata as {"id":"<uuid>"}
    val ckptMeta = Paths.get(checkpointDir, "metadata")
    val ckptId: Option[String] =
      if (!Files.exists(ckptMeta)) None
      else """"id"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(Files.readString(ckptMeta)).map(_.group(1))
    if (existingBatches) {
      val recorded =
        if (Files.exists(marker)) Some(Files.readString(marker).trim) else None
      require(ckptId.isDefined && recorded == ckptId,
        s"sink $outDir already holds batch_id dirs from " +
          s"${recorded.fold("an unknown query")(id => s"query $id")} but " +
          s"checkpoint $checkpointDir is ${ckptId.fold("fresh")(id => s"query $id")} — " +
          "a restarted batch counter would interleave new dirs with stale " +
          "ones; clear the sink directory (or use a new one) to reprocess")
    }
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId"): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .start()
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(marker, q.id.toString)
    q
  }
}
