package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column<->Expression converters (Spark 4
  * moved Column onto ColumnNode; this is the supported internal path that
  * `org.apache.spark.sql.functions` itself uses). Lives under
  * `org.apache.spark.sql` purely for access; no Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` is `private[sql]`; expressions outside the sql
  * package need this alias to declare `inputTypes`.
  */
object GraftTypes {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
  /** `AnyDataType` is likewise `private[sql]` — the any-typed input
    * slot for generic-payload aggregates (topk_by).
    */
  val AnyType: AbstractDataType = org.apache.spark.sql.types.AnyDataType
}
