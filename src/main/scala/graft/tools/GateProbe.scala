package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbench of the curation gate expression in isolation: same
  * 2^24-bit filter, same 50-doc batch, 40 repetitions — separates
  * "the gate is inherently slow" from "the gate accumulates
  * session-wide cost". Usage: runMain graft.tools.GateProbe
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * 131 + j * 7919) % 9999991}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    docs.cache().count()

    val rnd = new java.util.Random(42)
    (0 until 40).foreach { it =>
      // fresh filter each iteration, like the sink's per-batch union
      val words = Array.fill((1 << 24) / 64)(rnd.nextLong())
      val f = graft.ops.Bloom.Filter(words, 1L << 24, 5)
      val t0 = System.nanoTime()
      val q = docs.filter(graft.streaming.Streaming
        .curationSuspect(f, col("text"), 3, 0.6))
      val plan = q.queryExecution.executedPlan // force analysis+optimization+planning
      val t1 = System.nanoTime()
      val n = q.count()
      val t2 = System.nanoTime()
      println(f"GATEPROBE it=$it%3d plan_ms=${(t1 - t0) / 1000000}%6d exec_ms=${(t2 - t1) / 1000000}%6d suspects=$n")
    }
    spark.stop()
  }
}
