package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only per-job profiler: runs one registered query (after [[graft.Bench]]'s
  * warmup) with a listener that prints every Spark job's wall-clock, stage
  * count, task count and shuffle bytes — the instrument that says WHERE a
  * multi-action query (index builds, iterative CC/PageRank) spends its time,
  * so optimization targets are measured, not guessed.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.JobProfile <query> [query...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query name> [more names]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.range(1000000L).selectExpr("sum(id)").collect()
    catch { case _: Throwable => () }
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try graft.queries.T.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, (Long, Int, String)]
    @volatile var capturing = false
    val stageTasks = scala.collection.concurrent.TrieMap.empty[Int, (Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (capturing) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobStart(js.jobId) = (System.nanoTime(), js.stageIds.size, desc)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (capturing) {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for (a <- i.submissionTime; b <- i.completionTime) yield b - a).getOrElse(-1L)
        println(f"[stage] id=${i.stageId}%4d wall=${wall}%5d ms tasks=${i.numTasks}%3d " +
          f"run=${m.executorRunTime}%5d deser=${m.executorDeserializeTime}%4d " +
          f"gc=${m.jvmGCTime}%4d cpu=${m.executorCpuTime / 1000000}%5d  ${i.name.take(60)}")
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobStart.remove(je.jobId).foreach { case (t0, nStages, desc) =>
          val ms = (System.nanoTime() - t0) / 1e6
          println(f"[job] id=${je.jobId}%4d  ${ms}%9.1f ms  stages=$nStages%3d  $desc")
        }
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new NoSuchElementException(s"unknown query: $name"))
      // run once cold (not captured) so codegen/cache state matches the
      // bench's min-of-two WARM regime, then capture the second run
      val t0c = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0c) / 1e9
      println(f"\n===== $name  (cold ${cold}%.3f s; jobs below are the WARM run) =====")
      capturing = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t0) / 1e9
      capturing = false
      Thread.sleep(200)
      println(f"[total] $name warm ${warm}%.3f s")
    }
    spark.stop()
  }
}
