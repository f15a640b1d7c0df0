package graft

import java.nio.file.Files

import graft.tools.ShuffleAudit

/** Pins the semantics of SHUFFLE.md's scan denominator: a parquet
  * scan's leaf stats must track the on-disk bytes (it is what the
  * `shufW/scan` amplification divides by), and a leaf carrying the
  * optimizer's unknown-size sentinel — the RDD-constructed frames
  * inside the iterative operators — must yield None rather than the
  * sentinel poisoning the ratio (measured: the sentinel rendered a
  * 2 MB scan as 8 TiB before this contract).
  */
class ShuffleAuditSpec extends SparkSuite {

  test("parquet leaves report on-disk bytes, within stats slack") {
    val dir = Files.createTempDirectory("graft_shufspec").toString
    spark.range(0, 10000).selectExpr("id", "id * 2 as v")
      .write.mode("overwrite").parquet(s"$dir/t")
    val onDisk = Files.walk(java.nio.file.Paths.get(s"$dir/t"))
      .filter(p => p.toString.endsWith(".parquet"))
      .mapToLong(p => Files.size(p)).sum()
    val got = ShuffleAudit.scanBytes(spark.read.parquet(s"$dir/t"))
    assert(got.isDefined)
    // leaf stats are file-size based but may carry a compression /
    // estimation factor; same order of magnitude is the contract
    assert(got.get >= onDisk && got.get <= onDisk * 4,
      s"leaf stats ${got.get} vs on-disk $onDisk")
  }

  test("scan size survives filters and projections above the leaf") {
    val dir = Files.createTempDirectory("graft_shufspec2").toString
    spark.range(0, 1000).selectExpr("id", "cast(id as string) as s")
      .write.mode("overwrite").parquet(s"$dir/t")
    val base = ShuffleAudit.scanBytes(spark.read.parquet(s"$dir/t"))
    val shaped = ShuffleAudit.scanBytes(
      spark.read.parquet(s"$dir/t").filter("id > 10").select("id"))
    // collectLeaves sees the same relation whatever sits above it
    assert(shaped == base)
  }

  /** A leaf whose size the optimizer does NOT know: a frame built
    * from a raw RDD carries the unknown-size sentinel (localCheckpoint
    * results of PLANNED frames keep their origin stats, so those stay
    * measurable — it is the createDataFrame-over-RDD shape inside the
    * iterative operators that doesn't).
    */
  private def unknownLeaf = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L))),
      StructType(Seq(StructField("id", LongType))))
  }

  test("RDD leaves with no stats yield None, not the sentinel") {
    assert(ShuffleAudit.scanBytes(unknownLeaf).isEmpty)
  }

  test("a join of a parquet leaf and an unknown leaf is still unknown") {
    val dir = Files.createTempDirectory("graft_shufspec3").toString
    spark.range(0, 100).toDF("id").write.mode("overwrite").parquet(s"$dir/t")
    val pq = spark.read.parquet(s"$dir/t")
    assert(ShuffleAudit.scanBytes(pq.join(unknownLeaf, "id")).isEmpty)
  }

  test("localCheckpoint of a planned frame keeps measurable stats") {
    val df = spark.range(0, 100).toDF("id").localCheckpoint(eager = true)
    val got = ShuffleAudit.scanBytes(df)
    assert(got.exists(b => b > 0 && b < (1L << 20)))
  }
}
