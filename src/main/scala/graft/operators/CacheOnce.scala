package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent cache for operator-internal reused frames.
  *
  * Operators that materialize a frame feeding multiple plan branches
  * (minhash bands, the containment token frame, TotalOrder's range
  * partitioning) call `.cache()` on it. When two queries in one session
  * build canonically identical plans (e.g. smp_token_budget and
  * smp_token_shards share the same range-partitioned frame), the second
  * `cache()` hits the CacheManager's plan-keyed table and logs an
  * "Asked to cache already cached data" WARN per call. Checking
  * `storageLevel` first (a CacheManager lookup by canonicalized plan)
  * keeps the call idempotent AND silent; the hit is correct reuse, not an
  * error. Lifecycle is unchanged: entries are bounded by the harness's
  * per-query `spark.catalog.clearCache()`.
  */
private[graft] object CacheOnce {
  def apply(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
