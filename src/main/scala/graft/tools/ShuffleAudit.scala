package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.queries.QueryRegistry

/** Measured data-movement audit: one row per registered query with the
  * TASK-METRIC byte counts that decide cluster behavior at 100 TB —
  * bytes scanned from storage, bytes written to and read back from
  * shuffle, bytes spilled, and the peak per-task execution memory.
  * Written to SHUFFLE.md.
  *
  * PLANS.md counts exchanges (plan SHAPE); this measures their VOLUME.
  * The number that transfers to a cluster is `shuffle write / input`:
  * for a linear operator both sides grow with the data, so the ratio
  * is the network amplification a 100 TB run pays per byte scanned.
  * Ratios well under 1 mean the plan reduces early (partial
  * aggregation, broadcast joins, pushed filters); ratios over 1 mean
  * the operator reshapes more data than it reads — fine when the
  * reshaping IS the algorithm (pair generation, global repartition),
  * a bottleneck when it isn't. Spill at this scale (32 heap-GBs for
  * sf0.1's ~100 MB inputs) would mean a partition-sizing bug, so any
  * nonzero spill row is flagged.
  *
  * Peak task memory is the high-water mark of a single task's
  * execution memory (hash maps, sort buffers): the per-core memory an
  * executor must provision. Rows where this grows with the DATA
  * (rather than the partition) are the ones that OOM first at scale;
  * the ×10 column in SCALE.md catches the time axis, this catches the
  * memory axis at one point.
  *
  * Methodology: each query runs once, cold (cache dropped between
  * rows), counting every task of every job the query triggers —
  * including centroid/codebook training actions. Listener delivery is
  * asynchronous, so counters are read only after they have been
  * stable for three consecutive polls.
  */
object ShuffleAudit {

  private final class Metrics extends SparkListener {
    val shufRead, shufWrite, memSpill, diskSpill, tasks = new AtomicLong
    val peakTaskMem = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        peakTaskMem.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
        tasks.incrementAndGet()
      }
    }
    def snapshot: Seq[Long] = Seq(shufRead.get, shufWrite.get,
      memSpill.get, diskSpill.get, peakTaskMem.get, tasks.get)
    def reset(): Unit =
      Seq(shufRead, shufWrite, memSpill, diskSpill, peakTaskMem, tasks)
        .foreach(_.set(0L))
  }

  /** Bytes under the final plan's leaf relations — post-pruning file
    * sizes for parquet scans, materialized sizes for cached frames.
    * This is the scan denominator: Spark's task-level
    * `inputMetrics.bytesRead` does NOT see the vectorized local-file
    * parquet path (it reports ~0 for an 11 MB scan), so the honest,
    * reproducible number is what the optimizer says sits under the
    * leaves. Eager build phases inside a query (centroid training,
    * store writes) contribute shuffle volume but not leaves of the
    * FINAL plan, so build-heavy rows read as amplification UPPER
    * bounds.
    */
  private[graft] def scanBytes(df: org.apache.spark.sql.DataFrame): Option[Long] = {
    val sizes = df.queryExecution.optimizedPlan.collectLeaves().map { leaf =>
      try leaf.stats.sizeInBytes catch { case _: Throwable => BigInt(-1) }
    }
    // Frames constructed over raw RDDs inside the iterative operators
    // carry the optimizer's UNKNOWN sentinel, not a size (checkpoints
    // of planned frames keep their origin stats and stay measurable) —
    // any sentinel leaf means the row has no static scan denominator.
    val unknown = BigInt(1L) << 40
    if (sizes.exists(s => s < 0 || s >= unknown)) None
    else Some(sizes.sum.min(BigInt(Long.MaxValue)).toLong)
  }

  /** Waits until the async listener bus has drained this query's task
    * events: the counters must hold still for three consecutive polls.
    */
  private def settle(m: Metrics): Unit = {
    var last = m.snapshot
    var stable = 0
    var waited = 0
    while (stable < 3 && waited < 5000) {
      Thread.sleep(100); waited += 100
      val now = m.snapshot
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val metrics = new Metrics
    spark.sparkContext.addSparkListener(metrics)

    val names = (if (args.nonEmpty) args.toSeq
    else QueryRegistry.all.map(_.name) ++ ScaleBench.extras.keys).sorted
    def runner(n: String) =
      ScaleBench.extras.getOrElse(n, QueryRegistry.byName(n).fn)

    // warm the reader/codegen paths once so the first row doesn't
    // absorb one-time session work into its byte counts (it wouldn't —
    // bytes are bytes — but a planning failure should surface here)
    try QueryRegistry.byName("q01_pricing_summary").fn(spark, dir).count()
    catch { case _: Throwable => () }
    spark.catalog.clearCache()

    val mb = 1024.0 * 1024.0
    case class Row(name: String, scan: Option[Double], shufW: Double, shufR: Double,
        spill: Double, peakMb: Double, tasks: Long, failed: Boolean) {
      def ratio: Option[Double] = scan.collect { case s if s > 0 => shufW / s }
    }
    val rows = names.map { n =>
      settle(metrics); metrics.reset()
      var scanMb: Option[Double] = None
      val failed =
        try {
          val df = runner(n)(spark, dir)
          df.count()
          scanMb = scanBytes(df).map(_ / mb)
          false
        } catch { case e: Throwable =>
          System.err.println(s"[shuffle] $n failed: ${e.getMessage}"); true }
      settle(metrics)
      val Seq(sr, sw, ms, ds, pk, tk) = metrics.snapshot
      spark.catalog.clearCache()
      System.err.println(f"[shuffle] $n: scan ${scanMb.getOrElse(-1.0)}%.1f MB, shufW ${sw / mb}%.1f MB, tasks $tk")
      Row(n, scanMb, sw / mb, sr / mb, (ms + ds) / mb, pk / mb, tk, failed)
    }

    val sb = new StringBuilder
    sb ++= "# SHUFFLE — measured data movement per query (sf0.1, task metrics)\n\n"
    sb ++= "Generated by `graft.tools.ShuffleAudit`: every registered query —\n"
    sb ++= "plus the two Θ(N^1.5) `_prod` configurations — run once, cold, at\n"
    sb ++= s"`$dir`, summing Spark task metrics across every job the\n"
    sb ++= "query triggers. PLANS.md counts exchanges (plan shape); this\n"
    sb ++= "measures their volume.\n\n"
    sb ++= "`scan MB` is the bytes under the final plan's leaf relations\n"
    sb ++= "(post-pruning parquet file sizes, materialized cache sizes) —\n"
    sb ++= "used instead of task-level input metrics because Spark's\n"
    sb ++= "vectorized local-file parquet path bypasses those counters.\n"
    sb ++= "Eager build phases inside a query (centroid training, store\n"
    sb ++= "writes) add shuffle volume but no final-plan leaves, so\n"
    sb ++= "build-heavy rows read as amplification UPPER bounds. A `-` scan\n"
    sb ++= "means the final plan sits on RDD-backed leaves with no static\n"
    sb ++= "size (the iterative operators' localCheckpoint results) — their\n"
    sb ++= "movement is in the absolute columns.\n\n"
    sb ++= "`shufW/scan` is the number that transfers to a cluster: for a\n"
    sb ++= "linear operator both sides grow with the data, so it is the\n"
    sb ++= "network bytes a 100 TB run moves per byte scanned. Well under 1 ⇒\n"
    sb ++= "the plan reduces before it moves (map-side partial aggregation,\n"
    sb ++= "broadcast joins, pushed filters). Over 1 ⇒ the operator reshapes\n"
    sb ++= "more than it reads — correct where reshaping IS the algorithm\n"
    sb ++= "(shingle/band explosion in the similarity families, iterative\n"
    sb ++= "rounds that reshuffle a working set, global repartitions), a red\n"
    sb ++= "flag anywhere else. `peak task` is the high-water execution\n"
    sb ++= "memory of a single task (hash maps, sort buffers): the per-core\n"
    sb ++= "provisioning an executor needs — it must track the PARTITION,\n"
    sb ++= "not the dataset, or the operator OOMs first at scale. Any\n"
    sb ++= "nonzero spill at this scale is a partition-sizing bug and is\n"
    sb ++= "flagged below the table.\n\n"
    sb ++= "| query | scan MB | shuf write MB | shuf read MB | shufW/scan | spill MB | peak task MB | tasks |\n"
    sb ++= "|---|---|---|---|---|---|---|---|\n"
    rows.sortBy(-_.shufW).foreach { r =>
      if (r.failed) sb ++= s"| ${r.name} | FAIL | - | - | - | - | - | - |\n"
      else sb ++= f"| ${r.name} | ${r.scan.map(v => f"$v%.1f").getOrElse("-")} | ${r.shufW}%.1f | ${r.shufR}%.1f | " +
        r.ratio.map(v => f"$v%.2f").getOrElse("-") +
        f" | ${r.spill}%.1f | ${r.peakMb}%.1f | ${r.tasks} |\n"
    }
    val spilled = rows.filter(r => !r.failed && r.spill > 0).map(_.name)
    val failed = rows.filter(_.failed).map(_.name)
    val known = rows.filter(r => !r.failed && r.scan.isDefined)
    val totIn = known.flatMap(_.scan).sum
    val totW = known.map(_.shufW).sum
    sb ++= f"\n**Totals** (the ${known.size} rows with a static scan size): " +
      f"$totIn%.0f MB under final-plan leaves, $totW%.0f MB shuffled " +
      f"-> suite-wide write amplification ×${totW / totIn}%.2f.\n"
    sb ++= (if (spilled.isEmpty) "\nNo query spills at sf0.1.\n"
    else s"\nSPILL flagged: ${spilled.mkString(", ")}.\n")
    if (failed.nonEmpty) sb ++= s"\nFAILED: ${failed.mkString(", ")}.\n"

    if (args.isEmpty) Files.writeString(Paths.get("SHUFFLE.md"), sb.result())
    println(sb.result())
    spark.stop()
  }
}
