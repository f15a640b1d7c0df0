package graft.validate

/** V6 — structural drift detection (reference
  * `validators/structural.py:14-156`): weighted similarity between page
  * fingerprints guards ingestion against silent layout changes. Pure
  * functions over fingerprint values; same weights and thresholds as
  * the reference.
  */
final case class Fingerprint(
    structureHash: String,
    tableClasses: Seq[String],
    keyIds: Seq[String],
    tableHeaders: Seq[Seq[String]],
    elementCounts: Map[String, Int])

final case class StructuralResult(similarity: Double, level: String,
    passed: Boolean)

object Structural {

  val ThresholdHigh = 0.85
  val ThresholdMedium = 0.70
  val ThresholdLow = 0.50

  def compare(current: Fingerprint, reference: Fingerprint): Double = {
    val structure = if (current.structureHash == reference.structureHash) 1.0 else 0.0

    val tableClasses =
      if (reference.tableClasses.isEmpty) 1.0
      else current.tableClasses.count(reference.tableClasses.contains).toDouble /
        reference.tableClasses.size

    val keyIds =
      if (reference.keyIds.isEmpty) 1.0
      else reference.keyIds.count(current.keyIds.contains).toDouble /
        reference.keyIds.size

    val headers =
      if (reference.tableHeaders.isEmpty) 1.0
      else {
        val scores = for {
          r <- reference.tableHeaders
          c <- current.tableHeaders
          rs = r.toSet; cs = c.toSet
          if rs.nonEmpty || cs.nonEmpty
        } yield (rs & cs).size.toDouble / (rs | cs).size
        if (scores.isEmpty) 0.0 else scores.max
      }

    val countDrifts = reference.elementCounts.count { case (k, refN) =>
      refN > 0 &&
        math.abs(current.elementCounts.getOrElse(k, 0) - refN).toDouble / refN > 0.5
    }
    val elementCounts =
      if (countDrifts == 0) 1.0 else math.max(0.0, 1.0 - countDrifts * 0.2)

    0.25 * structure + 0.20 * tableClasses + 0.15 * keyIds +
      0.30 * headers + 0.10 * elementCounts
  }

  def validate(current: Fingerprint, reference: Fingerprint): StructuralResult = {
    val s = compare(current, reference)
    if (s >= ThresholdHigh) StructuralResult(s, "high", passed = true)
    else if (s >= ThresholdMedium) StructuralResult(s, "medium", passed = true)
    else if (s >= ThresholdLow) StructuralResult(s, "low", passed = false)
    else StructuralResult(s, "critical", passed = false)
  }
}
