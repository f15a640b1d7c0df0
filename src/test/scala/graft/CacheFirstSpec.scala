package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import graft.store.CacheFirst

/** The cache-first read-through lifecycle: gap probe → bounded fetch →
  * merge → serve; stale fallback when the source is down.
  */
class CacheFirstSpec extends SparkSuite {
  import spark.implicits._

  private val asOf = LocalDate.parse("2024-01-12") // a Friday

  test("trailing business days skip weekends") {
    val days = CacheFirst.trailingBusinessDays(asOf, 5).map(_.toString)
    assert(days == Seq("2024-01-12", "2024-01-11", "2024-01-10",
      "2024-01-09", "2024-01-08"))
    // crossing a weekend (Jan 6/7): after Mon 8th comes Fri 5th
    val more = CacheFirst.trailingBusinessDays(asOf, 8).map(_.toString)
    assert(more.takeRight(3) == Seq("2024-01-05", "2024-01-04", "2024-01-03"))
  }

  private def fact(dates: String*) =
    dates.map(d => ("soja", d, 130.0)).toDF("produto", "data", "valor")
      .withColumn("data", col("data").cast("date"))

  test("missing trailing days are fetched and merged; complete cache is untouched") {
    val cached = fact("2024-01-08", "2024-01-09", "2024-01-10")
    var asked: Seq[LocalDate] = Seq.empty
    val (served, fetched) = CacheFirst.readThrough(
      cached, pk = Seq("produto", "data"), dateCol = "data",
      asOf = asOf, windowDays = 5,
      fetch = { missing =>
        asked = missing
        Some(missing.map(d => ("soja", d.toString, 131.0))
          .toDF("produto", "data", "valor")
          .withColumn("data", col("data").cast("date")))
      })
    assert(asked.map(_.toString).toSet == Set("2024-01-11", "2024-01-12"))
    assert(fetched.size == 2)
    assert(served.count() == 5)
    // fetched rows carry the new value; cached rows keep theirs
    assert(served.filter(col("data") === "2024-01-11")
      .select("valor").as[Double].head() == 131.0)
    assert(served.filter(col("data") === "2024-01-08")
      .select("valor").as[Double].head() == 130.0)

    // second pass over the merged view: nothing missing, no fetch
    var called = false
    val (_, fetched2) = CacheFirst.readThrough(served,
      Seq("produto", "data"), "data", asOf, 5,
      _ => { called = true; None })
    assert(fetched2.isEmpty && !called)
  }

  test("source down: stale cache served unchanged") {
    val cached = fact("2024-01-08", "2024-01-09")
    val (served, fetched) = CacheFirst.readThrough(cached,
      Seq("produto", "data"), "data", asOf, 5, _ => None)
    assert(fetched.isEmpty)
    assert(served.count() == 2)
  }
}
