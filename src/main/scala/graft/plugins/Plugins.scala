package graft.plugins

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.datasets.DatasetSource
import graft.validate.{Semantic, SemanticRule}

/** Unified user-facing extension registry (reference
  * `plugins/__init__.py:47-121`: `Plugin` base with meta/setup/teardown,
  * four abstract kinds, module-level `register`/`get_plugin`/
  * `list_plugins` with lazy one-time setup). Re-expressed Spark-first:
  * the reference's async `fetch`/`parse` collapse into synchronous
  * DataFrame producers (SURVEY D9 — the Spark API is synchronous), and
  * a validator plugin contributes [[graft.validate.SemanticRule]]s so
  * every registered validator runs inside the ONE fused aggregation
  * scan of [[graft.validate.Semantic.validate]] instead of a
  * scan-per-plugin.
  */
final case class PluginMeta(
    name: String,
    version: String,
    description: String,
    author: String = "",
    requires: Seq[String] = Nil,
    provides: Seq[String] = Nil)

sealed trait Plugin {
  def meta: PluginMeta
  /** One-time init, run lazily on first [[Plugins.get]] (reference
    * semantics: instances are created and set up on first access, not
    * at registration).
    */
  def setup(): Unit = ()
  def teardown(): Unit = ()
  def isEnabled: Boolean = true
}

/** A named data source: the reference's `fetch` + `parse` pair fused
  * into one DataFrame producer. `asDatasetSource` drops the plugin into
  * the D1 prioritized fallback chain ([[graft.datasets.DatasetDef]])
  * unchanged.
  */
trait SourcePlugin extends Plugin {
  def fetch(spark: SparkSession): DataFrame
  def sourceName: String = meta.name
  def asDatasetSource(spark: SparkSession, priority: Int): DatasetSource =
    DatasetSource(priority, sourceName, () => fetch(spark))
}

/** A content parser with a `canParse` gate, tried highest-priority
  * first ([[Plugins.parse]]); ties broken by name for determinism.
  */
trait ParserPlugin extends Plugin {
  def canParse(content: String): Boolean
  def parse(spark: SparkSession, content: String): DataFrame
  def priority: Int = 0
}

/** A sink format: writes `df` under `path`, returns the written path. */
trait ExporterPlugin extends Plugin {
  def extension: String
  def export(df: DataFrame, path: String): String
}

/** A validation extension: contributes semantic rules (fused —
  * [[AggRule]]s from every registered validator share one table scan)
  * and, mirroring the reference's `validate() -> (ok, messages)`
  * surface, a default pass/fail summary derived from that fused report.
  */
trait ValidatorPlugin extends Plugin {
  def rules(df: DataFrame): Seq[SemanticRule]
  def validate(df: DataFrame): (Boolean, Seq[String]) = {
    val report = Semantic.validate(df, rules(df))
      .select("rule_name", "passed").collect()
    val failed = report.filterNot(_.getBoolean(1)).map(_.getString(0)).toSeq
    (failed.isEmpty, failed)
  }
}

object Plugins {
  private val registry = TrieMap.empty[String, Plugin]
  private val started = TrieMap.empty[String, Boolean]

  /** Registers (warn-on-override, like the reference's `register`). */
  def register[P <: Plugin](p: P): P = {
    registry.put(p.meta.name, p).foreach { old =>
      System.err.println(
        s"[plugins] override: ${p.meta.name} (was ${old.getClass.getName})")
      started.remove(p.meta.name)
    }
    p
  }

  /** The plugin by name, `setup()` run exactly once on first access. */
  def get(name: String): Option[Plugin] =
    registry.get(name).map { p =>
      if (started.putIfAbsent(name, true).isEmpty) p.setup()
      p
    }

  def list: Seq[PluginMeta] =
    registry.values.map(_.meta).toSeq.sortBy(_.name)

  def unregister(name: String): Unit = {
    registry.remove(name).filter(_ => started.remove(name).isDefined)
      .foreach(_.teardown())
  }

  /** Teardown + drop everything (tests). */
  def clear(): Unit = registry.keys.toSeq.foreach(unregister)

  private def enabled[K <: Plugin](cls: Class[K]): Seq[K] =
    registry.values.collect {
      case p if cls.isInstance(p) && p.isEnabled =>
        get(p.meta.name); cls.cast(p)
    }.toSeq

  /** First registered parser whose gate accepts the content, highest
    * priority first, name-ordered within a priority.
    */
  def parse(spark: SparkSession, content: String): Option[DataFrame] =
    enabled(classOf[ParserPlugin])
      .sortBy(p => (-p.priority, p.meta.name))
      .find(_.canParse(content))
      .map(_.parse(spark, content))

  /** The fused validation pass over the base rules PLUS every enabled
    * registered validator's rules — one shared scan for all AggRules
    * regardless of how many plugins contributed them.
    */
  def validate(df: DataFrame, baseRules: Seq[SemanticRule] = Nil): DataFrame =
    Semantic.validate(df,
      baseRules ++ enabled(classOf[ValidatorPlugin])
        .sortBy(_.meta.name).flatMap(_.rules(df)))

  /** Dispatches an export by declared extension. */
  def export(df: DataFrame, path: String, extension: String): String =
    enabled(classOf[ExporterPlugin])
      .sortBy(_.meta.name)
      .find(_.extension.equalsIgnoreCase(extension))
      .map(_.export(df, path))
      .getOrElse(throw new IllegalArgumentException(
        s"no exporter plugin for extension '$extension' " +
          s"(registered: ${enabled(classOf[ExporterPlugin]).map(_.extension).mkString(", ")})"))
}
