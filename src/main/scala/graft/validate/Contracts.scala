package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Data-contract layer (reference: agrobr `contracts/__init__.py:27-127`).
  * A contract declares per-column nullability and value bounds plus a
  * primary key; validation compiles ALL column checks into one
  * aggregation pass over the table (a single scan at any scale — never
  * one scan per rule), and the PK-uniqueness check into one groupBy.
  */
final case class ColumnSpec(
    name: String,
    dataType: DataType,
    nullable: Boolean = true,
    minValue: Option[Double] = None,
    maxValue: Option[Double] = None)

final case class Contract(
    name: String,
    version: String,
    columns: Seq[ColumnSpec],
    primaryKey: Seq[String] = Seq.empty) {

  /** (check_name, column, counting expression) for every declared rule —
    * fused by the caller into a single `agg`.
    */
  def checkExprs: Seq[(String, String, Column)] =
    columns.flatMap { c =>
      val nn =
        if (!c.nullable)
          Seq(("not_null", c.name,
            sum(when(col(c.name).isNull, 1L).otherwise(0L))))
        else Seq.empty
      val mn = c.minValue.toSeq.map(v =>
        ("min_value", c.name,
          sum(when(col(c.name) < lit(v), 1L).otherwise(0L))))
      val mx = c.maxValue.toSeq.map(v =>
        ("max_value", c.name,
          sum(when(col(c.name) > lit(v), 1L).otherwise(0L))))
      nn ++ mn ++ mx
    }

  /** Long-format violation report: one row per declared check with its
    * violation count — the whole contract costs ONE table scan.
    */
  def violationReport(df: DataFrame): DataFrame = {
    val checks = checkExprs
    val aggd = df.agg(
      checks.head._3.as("c0"),
      checks.tail.zipWithIndex.map { case ((_, _, e), i) => e.as(s"c${i + 1}") }: _*)
    val stacked = checks.zipWithIndex.map { case ((chk, colName, _), i) =>
      s"'$chk', '$colName', c$i"
    }.mkString(", ")
    aggd.select(expr(
      s"stack(${checks.size}, $stacked) AS (check_name, column_name, violations)"))
  }

  /** PK-duplicate detail: keys occurring more than once with their row
    * counts (reference counts all rows of duplicated groups,
    * `contracts/__init__.py:119-125`).
    */
  def pkDuplicates(df: DataFrame): DataFrame =
    df.groupBy(primaryKey.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Contract-ordered schema as a StructType. */
  def structType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))

  /** Cast a permissively-inferred frame to the contract schema
    * (SURVEY §1.2: read inferred, then validate/cast): declared columns
    * cast to their declared type in contract order; missing nullable
    * columns materialize as typed nulls; undeclared columns drop.
    * try_cast semantics — uncoercible values become null and are then
    * caught by the violation scan, mirroring the reference's
    * "type-coercibility = null-increase" check.
    */
  def castTo(df: DataFrame): DataFrame =
    df.select(columns.map { c =>
      if (df.columns.contains(c.name)) col(c.name).try_cast(c.dataType).as(c.name)
      else lit(null).cast(c.dataType).as(c.name)
    }: _*)
}
