package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

package object ops {

  /** Idempotent `.cache()`: marks the frame for caching only when its
    * plan is not already marked. Operators that cache a shared
    * intermediate at CONSTRUCTION time (shingle sketches, signature
    * frames) get re-built whenever a query is planned twice in one
    * session — plan-audit passes, the AQE-off codegen count, a user
    * composing two ops over the same input — and a bare `.cache()` on
    * the second build makes CacheManager WARN "Asked to cache already
    * cached data" while changing nothing. The storageLevel guard keeps
    * the call a true no-op.
    */
  private[graft] def cacheOnce(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df else df.cache()
}
