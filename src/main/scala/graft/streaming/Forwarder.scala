package graft.streaming

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
    * Readers use `spark.read.parquet(outDir)` (partition discovery). */
  def toParquet(stream: DataFrame, outDir: String,
                checkpointDir: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId"): Unit
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
