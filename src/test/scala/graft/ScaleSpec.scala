package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.store.Store
import graft.ops.Skew

/** Scale-design tests: partition pruning on the fact layout and salted
  * skew aggregation/join equivalence.
  */
class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("partitioned fact layout prunes partitions on the filter key") {
    val dir = Files.createTempDirectory("graft_part").toString + "/fact"
    val df = Seq(
      ("soja", "2024-01-10", 130.5), ("soja", "2024-01-11", 131.0),
      ("milho", "2024-01-10", 62.0), ("boi", "2024-01-10", 312.0))
      .toDF("produto", "data", "valor")
    Store.writePartitioned(df, dir, Seq("produto"))

    val scan = spark.read.parquet(dir).filter(col("produto") === "soja")
    assert(scan.count() == 2)
    val plan = scan.queryExecution.executedPlan.toString
    // partition filter present => directory pruning, not a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("produto"), s"expected partition pruning in:\n$plan")
  }

  test("salted sum equals direct sum (incl. a hot key)") {
    val rows = (1 to 5000).map(i => ("hot", 1.0)) ++
      (1 to 100).map(i => (s"k${i % 10}", 2.0))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").as[(String, Double)].collect().toSeq
    val salted = Skew.saltedSum(df, Seq("k"), "v", saltBuckets = 8)
      .orderBy("k").as[(String, Double)].collect().toSeq
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val big = ((1 to 2000).map(_ => ("hot", 1)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("key", "n")
    val small = (Seq(("hot", "H")) ++ (1 to 50).map(i => (s"k$i", s"v$i")))
      .toDF("key", "label")
    val plain = big.join(small, Seq("key")).groupBy("label").count()
      .orderBy("label").as[(String, Long)].collect().toSeq
    val salted = Skew.saltedJoin(big, small, "key", saltBuckets = 4)
      .groupBy("label").count()
      .orderBy("label").as[(String, Long)].collect().toSeq
    assert(salted == plain)
  }
}
