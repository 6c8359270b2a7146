package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Ownership-aware persist: Spark's CacheManager matches CANONICALIZED
  * plans session-wide, so two independent queries that persist the same
  * derivation (e.g. the q34/q46/q52 shingle frame) trigger `WARN
  * CacheManager: Asked to cache already cached data` on the second call
  * and double-book the ownership of the cache. `ensureCached` persists
  * only when the plan isn't already cached — the existing cache entry is
  * reused either way (`df.storageLevel` consults the CacheManager by
  * canonical plan, not object identity). */
object Caching {
  def ensureCached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}
