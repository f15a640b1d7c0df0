package graft.ingest

import scala.util.{Failure, Success, Try}

/** D7 — retry with exponential backoff honoring Retry-After, and a
  * per-source minimum-delay rate limiter (reference `http/retry.py:33-70`,
  * `http/rate_limiter.py:15-60`). Delay computation is pure (tested);
  * the sleeper is injectable so tests run instantly.
  */
object Resilience {

  /** Backoff for attempt `i` (0-based): base·expBase^i capped at max;
    * an explicit Retry-After (seconds) wins but is still capped.
    */
  def backoffDelay(attempt: Int, baseDelay: Double = 1.0,
      expBase: Double = 2.0, maxDelay: Double = 30.0,
      retryAfter: Option[Double] = None): Double =
    retryAfter match {
      case Some(ra) => math.min(ra, maxDelay)
      case None => math.min(baseDelay * math.pow(expBase, attempt), maxDelay)
    }

  /** Retry `op` up to `maxAttempts`, classifying which failures are
    * retriable; non-retriable failures propagate immediately.
    */
  def retry[T](op: () => T, maxAttempts: Int = 3,
      retriable: Throwable => Boolean = _.isInstanceOf[java.io.IOException],
      retryAfterOf: Throwable => Option[Double] = _ => None,
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      baseDelay: Double = 1.0, maxDelay: Double = 30.0): Try[T] = {
    var last: Throwable = null
    var attempt = 0
    while (attempt < maxAttempts) {
      Try(op()) match {
        case Success(v) => return Success(v)
        case Failure(e) if retriable(e) =>
          last = e
          if (attempt < maxAttempts - 1)
            sleeper(backoffDelay(attempt, baseDelay, maxDelay = maxDelay,
              retryAfter = retryAfterOf(e)))
        case Failure(e) => return Failure(e)
      }
      attempt += 1
    }
    Failure(last)
  }

  /** Per-source serialized min-delay rate limiter: returns how long a
    * call at `nowMs` must wait given the previous call time.
    */
  final class RateLimiter(minDelayMs: Long) {
    private val lastCall = scala.collection.concurrent.TrieMap.empty[String, Long]
    def waitTimeMs(source: String, nowMs: Long): Long = {
      val w = lastCall.get(source) match {
        case Some(prev) => math.max(0L, prev + minDelayMs - nowMs)
        case None => 0L
      }
      lastCall.put(source, nowMs + w)
      w
    }
  }
}

/** D8 — telemetry event collector (reference `telemetry/collector.py:19-116`):
  * counts fetch/parse/cache events per source with durations; pure
  * in-memory accounting surfaced as a summary.
  */
final class Telemetry {
  final case class Summary(events: Long, errors: Long, totalDurationMs: Long)
  private val counters =
    scala.collection.concurrent.TrieMap.empty[(String, String), Summary]

  def record(source: String, kind: String, durationMs: Long,
      error: Boolean = false): Unit = {
    val key = (source, kind)
    val cur = counters.getOrElse(key, Summary(0, 0, 0))
    counters.put(key, Summary(cur.events + 1,
      cur.errors + (if (error) 1 else 0), cur.totalDurationMs + durationMs))
  }

  def summary(source: String, kind: String): Option[Summary] =
    counters.get((source, kind))
  def all: Map[(String, String), Summary] = counters.toMap
}

/** Distributed-side telemetry: dataset metrics that RIDE the job
  * instead of costing a second scan. `Dataset.observe` attaches
  * aggregate expressions to the plan (CollectMetrics node); executors
  * fold them alongside the real work and the driver reads the result
  * after the action — at 100 TB the difference between "row counts and
  * null rates for free" and "double the I/O". The JVM-side [[Telemetry]]
  * above counts driver events (fetch/parse); this counts DATA events.
  */
object DataMetrics {
  import org.apache.spark.sql.{Column, DataFrame, Observation}

  /** Attach named metrics to a frame. Returns the instrumented frame
    * and a handle whose `get` blocks until an ACTION has run on it,
    * then yields the metric row as a map.
    */
  def observed(df: DataFrame, name: String, metrics: Map[String, Column])
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val exprs = metrics.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }
}
