package graft.api

import scala.collection.concurrent.TrieMap

/** API stability annotations + registry (reference `stability.py:17-146`:
  * `APIStatus`/`APIInfo`, the `stable`/`experimental`/`deprecated`/
  * `internal` decorators, and the module registry with per-status
  * listings). Scala has no runtime decorators, so the engine keeps the
  * same data model with explicit registration and `wrap`-style guards:
  * an experimental or deprecated API warns on FIRST use (the reference
  * warns on every call via `warnings.warn`; once-per-process matches
  * JVM logging convention and keeps hot paths clean).
  */
object Stability {

  sealed trait ApiStatus { def name: String }
  case object Stable extends ApiStatus { val name = "stable" }
  case object Experimental extends ApiStatus { val name = "experimental" }
  case object Deprecated extends ApiStatus { val name = "deprecated" }
  case object Internal extends ApiStatus { val name = "internal" }

  final case class ApiInfo(
      status: ApiStatus,
      since: String,
      deprecatedIn: Option[String] = None,
      removedIn: Option[String] = None,
      replacement: Option[String] = None,
      notes: Option[String] = None)

  private val registry = TrieMap.empty[String, ApiInfo]
  private val warned = TrieMap.empty[String, Boolean]

  def stable(name: String, since: String, notes: Option[String] = None): Unit =
    registry.put(name, ApiInfo(Stable, since, notes = notes))

  def experimental(name: String, since: String,
      notes: Option[String] = None): Unit =
    registry.put(name, ApiInfo(Experimental, since, notes = notes))

  def deprecated(name: String, since: String, removedIn: Option[String] = None,
      replacement: Option[String] = None): Unit =
    registry.put(name, ApiInfo(Deprecated, since, deprecatedIn = Some(since),
      removedIn = removedIn, replacement = replacement))

  def internal(name: String): Unit =
    registry.put(name, ApiInfo(Internal, "0.1.0"))

  /** Runs `f`, emitting the reference's experimental/deprecated warning
    * the first time each annotated API is exercised.
    */
  def guard[T](name: String)(f: => T): T = {
    registry.get(name).foreach { info =>
      lazy val msg = info.status match {
        case Experimental =>
          Some(s"$name is experimental and may change without notice")
        case Deprecated =>
          val removed = info.removedIn.fold("")(v => s" and will be removed in $v")
          val repl = info.replacement.fold("")(r => s". Use $r instead")
          Some(s"$name is deprecated since ${info.since}$removed$repl")
        case _ => None
      }
      if (msg.isDefined && warned.putIfAbsent(name, true).isEmpty)
        System.err.println(s"[stability] ${msg.get}")
    }
    f
  }

  def apiInfo(name: String): Option[ApiInfo] = registry.get(name)
  def listStable: Seq[String] = listByStatus(Stable)
  def listExperimental: Seq[String] = listByStatus(Experimental)
  def listDeprecated: Seq[String] = listByStatus(Deprecated)
  def apiRegistry: Map[String, ApiInfo] = registry.toMap

  private def listByStatus(s: ApiStatus): Seq[String] =
    registry.collect { case (n, i) if i.status == s => n }.toSeq.sorted

  /** Tests only: forget everything. */
  def clear(): Unit = { registry.clear(); warned.clear() }
}
