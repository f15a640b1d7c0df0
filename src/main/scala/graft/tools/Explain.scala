package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.QueryRegistry

/** Plan auditor: dumps the formatted physical plan of selected queries
  * (`sbt "runMain graft.tools.Explain q01_pricing_summary ..."`) so
  * pushdown, join strategies and codegen spans can be inspected.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_daterange", "q04_join3_revenue",
        "q06_anti_join", "g03_region_rollup")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      QueryRegistry.byName(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
