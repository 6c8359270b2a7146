package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.data.{Providers, TimeSeries}
import graft.data.TimeSeries.DatasetConfig

/** Evidence behind the Tables 100 TB-layout claim: the partitioned
  * directory-per-table layout reads through the SAME loader, a
  * date-bounded getData puts a PARTITION predicate in the scan (not a
  * post-scan filter), pruning actually skips files on disk, and the
  * answer is identical to the single-file layout's.
  */
class PartitionedSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // both spec lakes cache under witness-keyed Scratch.cachedDir — the
  // same discipline as Verify's lake (r11 ADVICE): a fixed unkeyed dir
  // guarded only by _SUCCESS would keep comparing against a stale lake
  // after the sf dataset regenerates, and the failure would read as
  // layout drift instead of a stale cache
  private def lakeDir: String =
    Scratch.ensureBuilt(
      Scratch.cachedDir("graft-lake-spec", Tables.witness(sf, "events")),
      marker = "events/_SUCCESS") { stage =>
      Tables.writePartitionedEvents(spark, sf, s"$stage/events")
    } + "/events"

  test("Tables reads the directory layout with the canonical schema") {
    val lake = lakeDir
    val viaTables = Tables(spark, new java.io.File(lake).getParent, "events")
    val single = Tables(spark, sf, "events")
    // the derived event_date partition column is storage metadata, not
    // table schema: Tables drops it on directory reads (r11), so both
    // layouts serve the identical frame — names, types, AND order
    assert(viaTables.dtypes.toSeq == single.dtypes.toSeq)
    assert(viaTables.count() == single.count())
  }

  test("the hybrid lake serves every table bit-identical to single-file") {
    val root = new java.io.File(Scratch.ensureBuilt(
      Scratch.cachedDir("graft-hybrid-spec", sf)) { stage =>
      Tables.writeHybridLake(spark, sf, stage)
    })
    // the partitioned tables really are partitioned directories
    assert(new java.io.File(root, "events").listFiles()
      .exists(_.getName.startsWith("event_date=")))
    assert(new java.io.File(root, "documents").listFiles()
      .exists(_.getName.startsWith("part_lang=")))
    for (t <- Tables.all) {
      val lake = Tables(spark, root.getPath, t)
      val single = Tables(spark, sf, t)
      assert(lake.dtypes.toSeq == single.dtypes.toSeq, s"schema drift: $t")
      // row-level parity, order-insensitive (collect is bounded: sf0.001)
      assert(lake.exceptAll(single).isEmpty &&
        single.exceptAll(lake).isEmpty, s"row drift: $t")
    }
  }

  test("date-bounded getData prunes partitions at the scan") {
    val lake = lakeDir
    val (start, end) = ("2024-01-10 00:00:00", "2024-01-12 00:00:00")
    val long = Providers.partitionedParquet(
      spark, lake, "event_type", "ts", "value", start, end)
    val wide = TimeSeries.getData(long, "tag", "ts", "value", DatasetConfig(
      tags = Seq("click", "view"), resolution = "1H",
      interpolationLimit = "6H",
      trainStart = Some(start), trainEnd = Some(end)))

    // descend AQE wrappers — executedPlan is an AdaptiveSparkPlanExec
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scansOf)
    }
    wide.collect() // finalize the adaptive plan + populate metrics
    val scans = scansOf(wide.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a file scan in the plan")
    val scan = scans.head
    // the event_date bounds must be PARTITION filters (pruned before
    // reading), not data filters evaluated per row
    assert(scan.partitionFilters.map(_.sql).mkString(" ")
      .contains("event_date"),
      s"expected event_date in PartitionFilters:\n${scan.metadata}")

    // pruning must actually skip files: 3 day-partitions touched
    // (end-day inclusive) out of the whole January+ layout
    val filesRead = scan.metrics("numFiles").value
    val filesOnDisk = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(lake)).count(_.getName.endsWith(".parquet"))
    }
    assert(filesRead < filesOnDisk,
      s"pruning read $filesRead of $filesOnDisk files")
    assert(filesRead <= 3, s"expected <= 3 day partitions, read $filesRead")
  }

  test("partitioned and single-file layouts agree on getData output") {
    val lake = lakeDir
    val (start, end) = ("2024-01-10 00:00:00", "2024-01-20 00:00:00")
    val cfg = DatasetConfig(
      tags = Seq("click", "view"), resolution = "1H",
      interpolationLimit = "6H",
      trainStart = Some(start), trainEnd = Some(end))
    val fromLake = TimeSeries.getData(
      Providers.partitionedParquet(
        spark, lake, "event_type", "ts", "value", start, end),
      "tag", "ts", "value", cfg)
    val fromFile = TimeSeries.getData(
      Tables(spark, sf, "events"), "event_type", "ts", "value", cfg)
    assert(fromLake.exceptAll(fromFile).isEmpty &&
      fromFile.exceptAll(fromLake).isEmpty)
  }
}
