package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-layout helpers: the co-located-join lever for 100 TB
  * fact-fact joins (orders ⋈ lineitem on orderkey). Writing both sides
  * bucketed by the join key lets Spark plan a SortMergeJoin with NO
  * Exchange on either side — the shuffle happens once at layout time
  * instead of on every query.
  *
  * On a real deployment this is the table-format layer (warehouse dir +
  * catalog); the helper uses `saveAsTable` with the session catalog so
  * the bucketing metadata survives to the read path — plain
  * `write.parquet` would lose it.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata intact). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
