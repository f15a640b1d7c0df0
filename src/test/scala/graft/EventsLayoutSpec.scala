package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

import graft.queries.T

/** The events-loader drift contract (round-7 postmortem: the driver
  * regenerated events.parquet with `ts` as TIMESTAMP(MICROS) instead of
  * TIMESTAMP(NANOS) and every events query died at analysis). `T.load`
  * must return identical rows — with `ts` normalized to TIMESTAMP_NTZ —
  * for every physical layout the column has shipped in:
  *
  *   - raw INT64 epoch nanoseconds (what the legacy TIMESTAMP(NANOS)
  *     file becomes under `spark.sql.legacy.parquet.nanosAsLong`; Spark
  *     cannot WRITE nanos parquet, so the long column stands in for the
  *     physical decoding, which the conf owns);
  *   - naive TIMESTAMP(MICROS) → read as TIMESTAMP_NTZ (today's layout);
  *   - UTC-adjusted TIMESTAMP(MICROS) → read as session-tz TIMESTAMP.
  */
class EventsLayoutSpec extends SparkSuite {

  test("T.load returns identical rows for all three events ts layouts") {
    import spark.implicits._
    val base = T.load(spark, "/root/testdata/sf0.001", "events")
      .orderBy($"event_id").limit(500)

    val root = Files.createTempDirectory("graft_events_layouts")
    val ntzDir = s"$root/ntz"
    val nanosDir = s"$root/nanos"
    val ltzDir = s"$root/ltz"
    base.write.parquet(s"$ntzDir/events.parquet")
    base.withColumn("ts", (T.epochUs($"ts") * 1000L).as("ts"))
      .write.parquet(s"$nanosDir/events.parquet")
    base.withColumn("ts", $"ts".cast("timestamp"))
      .write.parquet(s"$ltzDir/events.parquet")

    val loaded = Seq(ntzDir, nanosDir, ltzDir).map { d =>
      val df = T.load(spark, d, "events")
      assert(df.schema("ts").dataType == TimestampNTZType,
        s"$d: ts must normalize to TIMESTAMP_NTZ, got ${df.schema("ts").dataType}")
      df.select(base.columns.map(col): _*)
        .orderBy($"event_id").collect().toSeq
    }
    assert(loaded(0) == loaded(1),
      "nanos layout loads differently from the ntz layout")
    assert(loaded(0) == loaded(2),
      "ltz layout loads differently from the ntz layout")
    assert(loaded(0).size == 500)
  }

  test("every known timestamp column is drift-guarded, not just events.ts") {
    import spark.implicits._
    val base = T.load(spark, "/root/testdata/sf0.001", "orders")
      .orderBy($"o_orderkey").limit(300)
    val root = Files.createTempDirectory("graft_orders_layouts")
    val ntzDir = s"$root/ntz"
    val ltzDir = s"$root/ltz"
    base.write.parquet(s"$ntzDir/orders.parquet")
    // the drift that killed round 7, replayed on orders: the date
    // column ships UTC-adjusted and reads back as session-tz TIMESTAMP
    base.withColumn("o_orderdate", $"o_orderdate".cast("timestamp"))
      .write.parquet(s"$ltzDir/orders.parquet")
    val loaded = Seq(ntzDir, ltzDir).map { d =>
      val df = T.load(spark, d, "orders")
      assert(df.schema("o_orderdate").dataType == TimestampNTZType,
        s"$d: o_orderdate must normalize to TIMESTAMP_NTZ")
      df.select(base.columns.map(col): _*)
        .orderBy($"o_orderkey").collect().toSeq
    }
    assert(loaded(0) == loaded(1),
      "ltz orders layout loads differently from the ntz layout")
    assert(loaded(0).size == 300)
  }
}
