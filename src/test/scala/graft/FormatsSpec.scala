package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Multi-format interchange (s10): ORC must be an exchange surface,
  * never a semantic boundary — a parquet→ORC round-trip preserves
  * values exactly, and predicates reach the ORC scan (search-argument
  * pushdown) just as they reach parquet.
  */
class FormatsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("parquet -> ORC round-trip preserves values exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_quantity", $"l_extendedprice", $"l_shipdate")
    val out = java.nio.file.Files.createTempDirectory("graft_fmt")
      .resolve("orc").toString
    li.write.option("compression", "zstd").orc(out)
    val back = spark.read.orc(out)
    assert(back.schema == li.schema)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    assert(back.count() == li.count())
  }

  test("filters are pushed into the ORC scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_fmt_push")
      .resolve("orc").toString
    spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity").write.orc(out)
    val q = spark.read.orc(out).filter($"l_quantity" > 40)
    val plan = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"ORC scan lost the pushed predicate:\n$plan")
  }

  test("s10 ORC aggregation equals the same aggregation over parquet") {
    val viaOrc = graft.queries.StoreOps.s10.fn(spark, sf).collect()
    val direct = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter($"l_quantity" > 40)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast("decimal(18,4)")).cast("double").as("sum_price"))
      .orderBy($"l_returnflag").collect()
    assert(viaOrc.toSeq == direct.toSeq)
  }
}
