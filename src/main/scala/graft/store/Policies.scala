package graft.store

import java.time.{Duration, LocalDate, LocalDateTime, LocalTime, ZoneId}

/** Cache TTL policies (D4, reference `cache/policies.py:32-207`) and
  * versioned cache keys (D5, `cache/keys.py:9-43`). Pure functions —
  * `now` is always a parameter, never sampled inside, so everything is
  * deterministic and testable.
  */
final case class CachePolicy(ttlSeconds: Long, staleMaxSeconds: Long,
    smartExpiry: Boolean = false)

object Policies {

  val saoPaulo: ZoneId = ZoneId.of("America/Sao_Paulo")
  private val H24 = 24L * 3600
  private val D7 = 7 * H24
  private val D30 = 30 * H24
  private val D90 = 90 * H24

  /** Per-source policies (reference values). */
  val policies: Map[String, CachePolicy] = Map(
    "cepea_diario" -> CachePolicy(H24, H24 * 2, smartExpiry = true),
    "cepea_semanal" -> CachePolicy(H24, D7),
    "conab_safras" -> CachePolicy(H24, D30),
    "conab_balanco" -> CachePolicy(H24, D30),
    "ibge_pam" -> CachePolicy(D7, D90),
    "ibge_lspa" -> CachePolicy(H24, D30))

  val default: CachePolicy = CachePolicy(H24, D7)

  def policy(source: String): CachePolicy = policies.getOrElse(source, default)

  /** CEPEA publishes at 18:00 America/Sao_Paulo: the next expiry is
    * today 18:00 if still ahead, else tomorrow 18:00.
    */
  def smartExpiryTime(now: LocalDateTime): LocalDateTime = {
    val today = LocalDateTime.of(LocalDate.from(now), LocalTime.of(18, 0))
    if (now.isBefore(today)) today else today.plusDays(1)
  }

  /** Expired = created before the last publication boundary (smart) or
    * past the TTL (plain).
    */
  def isExpired(createdAt: LocalDateTime, now: LocalDateTime, source: String): Boolean = {
    val p = policy(source)
    if (p.smartExpiry) createdAt.isBefore(smartExpiryTime(now).minusDays(1))
    else now.isAfter(createdAt.plus(Duration.ofSeconds(p.ttlSeconds)))
  }

  /** Stale-but-acceptable window for fallback serving. */
  def isStaleAcceptable(createdAt: LocalDateTime, now: LocalDateTime,
      source: String): Boolean =
    !now.isAfter(createdAt.plus(Duration.ofSeconds(policy(source).staleMaxSeconds)))

  /** D5 — versioned cache key `dataset|paramsHash12|vLIB|svSCHEMA`. */
  def cacheKey(dataset: String, params: Map[String, Any],
      libVersion: String = "0.1.0", schemaVersion: String = "1.0"): String = {
    val raw = params.toSeq
      .map { case (k, v) => k -> Option(v).map(_.toString).getOrElse("") }
      .sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(raw.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"$dataset|$digest|v$libVersion|sv$schemaVersion"
  }

  def parseCacheKey(key: String): Option[Map[String, String]] =
    key.split('|') match {
      case Array(ds, h, v, sv) => Some(Map(
        "dataset" -> ds, "params_hash" -> h,
        "lib_version" -> v.stripPrefix("v"),
        "schema_version" -> sv.stripPrefix("sv")))
      case _ => None
    }

  def isLegacyKey(key: String): Boolean = key.split('|').length != 4
}
