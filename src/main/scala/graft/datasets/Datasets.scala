package graft.datasets

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.validate.Contract

/** Semantic layer (SURVEY §2.10 D1-D6, reference `datasets/base.py` +
  * `datasets/registry.py`): named datasets resolved through a
  * prioritized source chain with error classification, contract
  * validation, as-of snapshot clamping and provenance metadata.
  */
final case class MetaInfo(
    dataset: String,
    source: String,
    contractVersion: String,
    records: Long,
    columns: Seq[String],
    attemptedSources: Seq[(String, String)], // (source, outcome)
    snapshot: Option[String])

final case class DatasetSource(priority: Int, name: String,
    fetch: () => DataFrame)

final case class SourceUnavailable(dataset: String,
    errors: Seq[(String, String)])
  extends RuntimeException(
    s"all sources failed for $dataset: ${errors.map(e => s"${e._1}: ${e._2}").mkString("; ")}")

/** D1 — error taxonomy (reference `datasets/base.py:96-165` classifies
  * network/parse/contract/unexpected per attempted source).
  */
object ErrorTaxonomy {
  def classify(e: Throwable): String = e match {
    case _: ContractViolation => "contract"
    case _: java.io.IOException | _: java.net.SocketException => "network"
    case _: NumberFormatException | _: IllegalArgumentException |
         _: java.time.format.DateTimeParseException => "parse"
    case _ => "unexpected"
  }
}

final case class ContractViolation(dataset: String, violations: Seq[String])
  extends RuntimeException(s"contract violations for $dataset: ${violations.mkString("; ")}")

/** D1-D3 — template pipeline: try sources by priority → normalize →
  * contract-validate (one fused aggregation scan, throws on violation)
  * → snapshot filter → (DataFrame, MetaInfo).
  */
final case class DatasetDef(
    name: String,
    contract: Contract,
    sources: Seq[DatasetSource],
    normalize: DataFrame => DataFrame = identity,
    dateCol: String = "data") {

  def fetch(snapshot: Option[String] = None): (DataFrame, MetaInfo) = {
    val ordered = sources.sortBy(_.priority)
    var attempts = List.empty[(String, String)]
    val resolved: Option[(String, DataFrame)] =
      ordered.iterator.map { src =>
        Try(src.fetch()) match {
          case Success(df) =>
            attempts ::= (src.name, "ok")
            Some(src.name -> df)
          case Failure(e) =>
            attempts ::= (src.name,
              s"${ErrorTaxonomy.classify(e)}: ${e.getClass.getSimpleName}: ${e.getMessage}")
            None
        }
      }.collectFirst { case Some(x) => x }

    val (srcName, raw) = resolved.getOrElse(
      throw SourceUnavailable(name, attempts.reverse))

    val df0 = normalize(raw)

    // required stable columns present?
    val missing = contract.columns.filterNot(_.nullable)
      .map(_.name).filterNot(df0.columns.contains)
    if (missing.nonEmpty)
      throw ContractViolation(name, missing.map(c => s"missing required column $c"))

    // fused one-pass column checks
    val violations = contract.violationReport(df0)
      .filter(col("violations") > 0).collect()
      .map(r => s"${r.getString(0)}(${r.getString(1)})=${r.getLong(2)}")
    if (violations.nonEmpty) throw ContractViolation(name, violations.toSeq)

    // D6 — as-of snapshot clamp (reference `datasets/preco_diario.py:118-120`)
    val df1 = snapshot.fold(df0)(s =>
      df0.filter(col(dateCol) <= lit(s).cast("date")))

    val n = df1.count()
    (df1, MetaInfo(name, srcName, contract.version, n,
      df1.columns.toSeq, attempts.reverse, snapshot))
  }
}

/** Dataset registry (D1; reference `datasets/registry.py:9-31`). */
object DatasetRegistry {
  private val defs = scala.collection.concurrent.TrieMap.empty[String, DatasetDef]
  def register(d: DatasetDef): Unit = defs.put(d.name, d)
  def get(name: String): Option[DatasetDef] = defs.get(name)
  def list(): Seq[String] = defs.keys.toSeq.sorted
}
