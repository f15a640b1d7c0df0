package graft.store

import java.time.LocalDateTime
import java.time.ZoneOffset

import org.apache.spark.sql.{SaveMode, SparkSession}

/** S11 — KV cache with TTL, stale-acceptable fallback and hit counting
  * (reference `cache/duckdb_store.py:129-251`). Cache metadata is
  * driver-scale by construction (one entry per dataset×params, not per
  * row), so entries live in memory and persist to a parquet table;
  * at deployment scale this sits behind a Delta table or a real KV
  * store — the semantics (expiry, staleness window, hit accounting,
  * legacy-key migration) are what the engine contracts on.
  */
final case class CacheEntry(key: String, value: String,
    createdAtEpochSec: Long, ttlSeconds: Long, staleMaxSeconds: Long,
    hitCount: Long)

final case class CacheHit(value: String, expired: Boolean, staleAcceptable: Boolean)

final class KvCache(spark: SparkSession, path: String) {

  private val entries = scala.collection.concurrent.TrieMap.empty[String, CacheEntry]

  private def epoch(t: LocalDateTime): Long = t.toEpochSecond(ZoneOffset.UTC)

  def put(key: String, value: String, ttlSeconds: Long,
      staleMaxSeconds: Long, now: LocalDateTime): Unit =
    entries.put(key, CacheEntry(key, value, epoch(now), ttlSeconds,
      staleMaxSeconds, 0L))

  /** A hit may be fresh, expired-but-stale-acceptable, or gone (past
    * the stale window → None). Hits bump the counter.
    */
  def get(key: String, now: LocalDateTime): Option[CacheHit] =
    entries.get(key).flatMap { e =>
      val age = epoch(now) - e.createdAtEpochSec
      if (age > e.staleMaxSeconds) { entries.remove(key); None }
      else {
        entries.put(key, e.copy(hitCount = e.hitCount + 1))
        Some(CacheHit(e.value, expired = age > e.ttlSeconds,
          staleAcceptable = age > e.ttlSeconds))
      }
    }

  def hitCount(key: String): Long = entries.get(key).map(_.hitCount).getOrElse(0L)

  /** Drop pre-versioning keys (reference legacy-key migration,
    * `cache/duckdb_store.py:216-251`).
    */
  def purgeLegacyKeys(): Int = {
    val legacy = entries.keys.filter(Policies.isLegacyKey).toSeq
    legacy.foreach(entries.remove)
    legacy.size
  }

  def persist(): Unit = {
    import spark.implicits._
    entries.values.toSeq.toDS().write.mode(SaveMode.Overwrite).parquet(path)
  }

  def load(): Unit = {
    import spark.implicits._
    entries.clear()
    spark.read.parquet(path).as[CacheEntry].collect()
      .foreach(e => entries.put(e.key, e))
  }
}
