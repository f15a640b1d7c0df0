package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkEntry

/** Dev-only executed-plan inspector: runs one registered query twice
  * (cold + warm, the bench regime) and prints the FINALIZED adaptive
  * plan of the warm run with each operator's metric values (output
  * rows, shuffle bytes, task counts) — the instrument that maps a hot
  * stage from [[JobProfile]] to the operator that produced it, which
  * the stage's callsite name alone cannot do.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ExecDebug <query>
  */
object ExecDebug {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExecDebug <query name> [more names]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try graft.queries.T.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    def walk(p: SparkPlan, depth: Int): Unit = {
      val m = p.metrics.toSeq
        .filter { case (_, v) => v.value != 0 && v.value != -1 }
        .sortBy(_._1)
        .map { case (k, v) => s"$k=${v.value}" }.mkString(", ")
      println(("  " * depth) + p.nodeName + (if (m.isEmpty) "" else s"  [$m]"))
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case s: QueryStageExec => walk(s.plan, depth + 1)
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new NoSuchElementException(s"unknown query: $name"))
      fn(spark, sfDir).count() // cold pass: codegen/cache state as in the bench
      val df = fn(spark, sfDir)
      // execute THIS queryExecution (count() would plan a separate one,
      // leaving these operators' metrics empty)
      val n = df.queryExecution.executedPlan.execute().count()
      println(s"\n===== $name  (warm, $n result rows) =====")
      walk(df.queryExecution.executedPlan, 0)
    }
    spark.stop()
  }
}
