package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * One parquet file per table under each scale-factor dir. All queries in
  * this library read through here so that a future move to a partitioned
  * 100 TB layout (directory-per-table, many files, partition columns) only
  * touches this object.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimensions that should be broadcast in joins at any scale. */
  val broadcastable: Set[String] = Set("region", "nation")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark has no native
    * type for. Read it as raw nanos and truncate to microseconds —
    * exactly what DuckDB (µs-precision timestamps) does, so the oracle
    * compare sees identical instants. The conf is set unconditionally
    * before every read: it is idempotent, and a guarded once-only set
    * would leave a window where a concurrent first reader sees it unset
    * and fails on the nanos footer. The Long→timestamp rewrite applies
    * only to `events` — any future table with an epoch-seconds Long `ts`
    * column must opt in explicitly.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == TimestampNTZType)) {
      // µs-precision rewrites of the table (the 10x scale probe) come out
      // as TIMESTAMP_NTZ; the NTZ→TZ cast is instant-preserving ONLY under
      // a UTC session, so a mis-pinned session must fail loudly here
      // rather than silently shift every timestamp
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC", s"events NTZ->TIMESTAMP cast requires " +
        s"spark.sql.session.timeZone=UTC, got $tz")
      df.withColumn("ts", col("ts").cast(TimestampType))
    }
    else df
  }

  /** Register every table as a temp view (for spark.sql users/tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
