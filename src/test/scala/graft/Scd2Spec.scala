package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.store.Store

/** SCD Type-2 merge semantics: versioning, no-op idempotence, and
  * multi-round history accumulation.
  */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val dim0 = Seq(
    (1L, "gold", d("2020-01-01"), null.asInstanceOf[Date], true),
    (2L, "silver", d("2020-01-01"), null.asInstanceOf[Date], true),
    (3L, "bronze", d("2019-05-05"), d("2020-01-01"), false), // history row
    (3L, "gold", d("2020-01-01"), null.asInstanceOf[Date], true)
  ).toDF("id", "tier", "valid_from", "valid_to", "is_current")

  private def merge(changes: Seq[(Long, String, Date)]) =
    Store.scd2Merge(dim0, changes.toDF("id", "tier", "change_date"),
      Seq("id"), Seq("tier"))

  test("change closes the current row and opens a new version") {
    val out = merge(Seq((1L, "platinum", d("2021-07-01"))))
      .filter($"id" === 1L).orderBy("valid_from")
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "gold", d("2020-01-01"), Some(d("2021-07-01")), false),
      (1L, "platinum", d("2021-07-01"), None, true)))
  }

  test("identical re-delivery is a no-op; history rows pass through") {
    val out = merge(Seq((3L, "gold", d("2021-07-01"))))
    assert(out.count() == dim0.count())
    assert(out.orderBy("id", "valid_from").collect().toSeq ==
      dim0.orderBy("id", "valid_from").collect().toSeq)
  }

  test("new pk inserts an open row as-of the change date") {
    val out = merge(Seq((9L, "gold", d("2021-07-01"))))
      .filter($"id" === 9L)
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq
    assert(out == Seq((9L, "gold", d("2021-07-01"), None, true)))
  }

  test("duplicate pk in one batch: latest change date wins, no fan-out") {
    val out = merge(Seq(
      (1L, "silver", d("2021-03-01")),
      (1L, "platinum", d("2021-07-01")), // latest -> wins
      (1L, "bronze", d("2021-01-01"))))
    val rows = out.filter($"id" === 1L).orderBy("valid_from")
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq
    assert(rows == Seq(
      (1L, "gold", d("2020-01-01"), Some(d("2021-07-01")), false),
      (1L, "platinum", d("2021-07-01"), None, true)))
    assert(out.count() == dim0.count() + 1) // exactly one new version
  }

  test("two merge rounds accumulate a three-version history") {
    val r1 = Store.scd2Merge(dim0,
      Seq((2L, "gold", d("2021-01-01"))).toDF("id", "tier", "change_date"),
      Seq("id"), Seq("tier"))
    val r2 = Store.scd2Merge(r1,
      Seq((2L, "platinum", d("2022-01-01"))).toDF("id", "tier", "change_date"),
      Seq("id"), Seq("tier"))
    val hist = r2.filter($"id" === 2L).orderBy("valid_from")
      .as[(Long, String, Date, Option[Date], Boolean)].collect().toSeq
    assert(hist == Seq(
      (2L, "silver", d("2020-01-01"), Some(d("2021-01-01")), false),
      (2L, "gold", d("2021-01-01"), Some(d("2022-01-01")), false),
      (2L, "platinum", d("2022-01-01"), None, true)))
    // exactly one open row per key, always
    val opens = r2.filter($"is_current").groupBy("id").count()
      .filter($"count" =!= 1).count()
    assert(opens == 0)
  }
}
