package org.apache.spark.graftx

import org.apache.spark.scheduler.StageInfo

/** Test-only bridge to `StageInfo.shuffleDepId` (private[spark]): the
  * scheduler's own record of which shuffle dependency a map stage wrote
  * — the ground truth RuntimeShuffleSpec counts. Same public-Spark
  * internals bridge pattern as [[org.apache.spark.sql.graftx.CheckpointBridge]]. */
object StageInfoAccess {
  def shuffleDepId(si: StageInfo): Option[Int] = si.shuffleDepId
}
