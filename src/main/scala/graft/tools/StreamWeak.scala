package graft.tools

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming WEAK-SCALING observation — the axis STREAM.md's two-volume
  * table leaves open: drive the two heaviest sinks at (×1 input,
  * 2 cores) and (×4 input, 8 cores) in fresh sessions and compare
  * wall. Near-flat wall at matched input/core growth is the streaming
  * counterpart of COMPUTE.md's weak-scaling rows for batch. Local-mode
  * caveat applies: microbatch orchestration is driver-paced fixed cost
  * per batch, so the ratio carries that floor and is an upper bound on
  * cluster behavior.
  *
  * Appends (or replaces) a delimited section at the end of STREAM.md.
  * StreamBench regenerates STREAM.md WITHOUT this section — re-run
  * this tool after a StreamBench regeneration.
  */
object StreamWeak {
  private val Marker = "## Weak scaling (StreamWeak)"

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Wall seconds to drive `batches` microbatches through the curation
    * sink (fixed-novelty stream: 10 novel + the rest near-dups of 25
    * templates per batch — StreamBench's config, its slowest sink).
    */
  private def curationWall(spark: SparkSession, docRpb: Int, batches: Int,
      work: String): Double = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val q = Streaming.curationSink(in.toDF().toDF("doc_id", "text"),
      s"$work/cur", tau = 0.6, checkpoint = s"$work/cur_chk")
    val t0 = System.nanoTime()
    try (0 until batches).foreach { b =>
      in.addData((0 until docRpb).map { i =>
        val id = b.toLong * docRpb + i
        val words = (0 until 30).map { j =>
          if (i < 10) s"w${(id * 31 + j) % 999983}" else s"w${(id % 25) * 37 + j}"
        }
        (id, words.mkString(" "))
      })
      q.processAllAvailable()
    } finally q.stop()
    (System.nanoTime() - t0) / 1e9
  }

  /** Wall seconds for the decontamination sink (bloom-gated 8-gram
    * check, 1-in-5 docs contaminated — StreamBench's config).
    */
  private def deconWall(spark: SparkSession, docRpb: Int, batches: Int,
      work: String): Double = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val bench = spark.range(50).select(col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 19),
        j -> concat('bench', id * 20 + j)))""").as("text"))
    val in = MemoryStream[(Long, String)]
    val q = Streaming.decontaminationSink(in.toDF().toDF("doc_id", "text"),
      bench, s"$work/dec", n = 8, checkpoint = s"$work/dec_chk")
    val t0 = System.nanoTime()
    try (0 until batches).foreach { b =>
      in.addData((0 until docRpb).map { i =>
        val id = b.toLong * docRpb + i
        val words =
          if (id % 5 == 0)
            (0 until 8).map(j => s"bench${(id % 50) * 20 + j}") ++
              (8 until 20).map(j => s"c${id}w$j")
          else (0 until 20).map(j => s"c${id}w$j")
        (id, words.mkString(" "))
      })
      q.processAllAvailable()
    } finally q.stop()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(12)
    val baseRpb = args.lift(1).map(_.toInt).getOrElse(50)
    val work = Files.createTempDirectory("graft_streamweak")

    // point 1: ×1 input on 2 cores
    var spark = session(2)
    val cur1 = curationWall(spark, baseRpb, batches, s"$work/p1c")
    val dec1 = deconWall(spark, baseRpb * 2, batches, s"$work/p1d")
    spark.stop()
    // point 2: ×4 input on 8 cores (fresh session, fresh state)
    spark = session(8)
    val cur4 = curationWall(spark, baseRpb * 4, batches, s"$work/p4c")
    val dec4 = deconWall(spark, baseRpb * 8, batches, s"$work/p4d")
    spark.stop()

    val sb = new StringBuilder
    sb ++= s"\n$Marker\n\n"
    sb ++= "One observation per heavy sink: ×4 input with ×4 cores (2 → 8),\n"
    sb ++= s"$batches driver-paced microbatches, fresh session per point. Flat\n"
    sb ++= "wall = the per-batch work parallelizes across the added cores;\n"
    sb ++= "the driver-paced microbatch floor (fixed ms per batch regardless\n"
    sb ++= "of cores) keeps the local-mode ratio above a cluster's.\n\n"
    sb ++= "| sink | ×1 @ 2 cores (s) | ×4 @ 8 cores (s) | wall ratio |\n|---|---|---|---|\n"
    sb ++= f"| curation | $cur1%.1f | $cur4%.1f | ×${cur4 / cur1}%.2f |\n"
    sb ++= f"| decontamination | $dec1%.1f | $dec4%.1f | ×${dec4 / dec1}%.2f |\n"
    val out = sb.result()
    val p = Paths.get("STREAM.md")
    val cur = Files.readString(p)
    val cleaned = cur.indexOf(Marker) match {
      case -1 => cur
      case i  => cur.substring(0, i).stripLineEnd + "\n"
    }
    Files.writeString(p, cleaned + out)
    println(out)
  }
}
