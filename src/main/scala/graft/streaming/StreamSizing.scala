package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition sizing for streaming jobs (r14 verdict item 4 /
  * "Not yet optimized" #1).
  *
  * A stateful streaming query's state-store count is pinned from
  * `spark.sql.shuffle.partitions` at the FIRST micro-batch and recorded
  * in the checkpoint (Spark recovers it on every restart — a later conf
  * change does not move state). That makes the partition count a
  * deployment SIZING decision, not a tuning knob: per micro-batch the
  * job pays one state-store commit (and its WAL/maintenance work) per
  * partition per stateful operator, so an oversized count multiplies
  * fixed costs on small streams, while an undersized one caps the
  * key-space parallelism forever (the checkpoint pins it).
  *
  * [[sessionFor]] reads `graft.streaming.statePartitions` from the
  * session conf (env `SPARK_GRAFT_STREAM_STATE_PARTITIONS` as fallback
  * for harness runs) and, when set, returns a NEW session (shared
  * SparkContext, shared cache, its own conf) whose
  * `spark.sql.shuffle.partitions` is the requested count — streams
  * built through it pin that state-store count into fresh checkpoints.
  * DEFAULT (unset): returns the caller's session unchanged — exactly
  * today's behavior, so the driver's bench rows stay comparable and no
  * local-only tuning is smuggled in.
  *
  * Production sizing guidance (documented, not defaulted): size state
  * partitions to peak keyspace — roughly
  * `max(total executor cores, expected state bytes / 100-200 MB)` —
  * at FIRST deployment of a checkpoint, because the count is
  * unchangeable for the checkpoint's lifetime; resizing means a new
  * checkpoint and (for the exactly-once parquet forwarder) a cleared
  * sink, reprocessing from the source's retained offsets. At 100 TB
  * scale that is sizing UP from the local default; shrinking the count
  * to a local core count is exactly the local-only win the bench
  * contract excludes, which is why the knob has no default.
  */
object StreamSizing {
  val confKey = "graft.streaming.statePartitions"

  def sessionFor(spark: SparkSession): SparkSession = {
    val knob = spark.conf.getOption(confKey)
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS"))
    knob match {
      case None => spark
      case Some(v) =>
        val n = v.trim.toIntOption.getOrElse(
          throw new IllegalArgumentException(
            s"$confKey must be a positive int, got '$v'"))
        require(n >= 1, s"$confKey must be >= 1, got $n")
        val s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", n.toString)
        s
    }
  }
}
