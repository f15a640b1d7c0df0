package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Streaming

/** Focused probe: curation sink per-batch wall ms against a GROWING
  * corpus (every doc novel, so the persisted corpus grows by a full
  * batch every batch). The question STREAM.md's curation row left
  * open: does admitting a batch cost O(batch) or O(corpus)? Prints
  * one line per batch: batch index, corpus docs before the batch,
  * batch ms. Usage:
  *   runMain graft.tools.CurationProbe [batches] [docsPerBatch]
  */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(30)
    val docRpb = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val work = Files.createTempDirectory("graft_curprobe")
    val root = s"$work/corpus"
    val in = MemoryStream[(Long, String)]
    val q = Streaming.curationSink(in.toDF().toDF("doc_id", "text"),
      root, tau = 0.6, checkpoint = s"$work/chk")
    val times = (0 until batches).map { b =>
      val rows = (0 until docRpb).map { i =>
        val id = b.toLong * docRpb + i
        // every doc novel: 30 unique-ish words from a large vocabulary
        (id, (0 until 30).map(j => s"w${(id * 131 + j * 7919) % 9999991}")
          .mkString(" "))
      }
      val t0 = System.nanoTime()
      in.addData(rows)
      q.processAllAvailable()
      val ms = (System.nanoTime() - t0) / 1000000L
      println(f"CURPROBE batch=$b%3d corpus_docs=${b * docRpb}%6d ms=$ms%6d")
      ms
    }
    q.stop()
    val (early, late) = (times.slice(2, 7), times.takeRight(5))
    println(s"CURPROBE early_median=${early.sorted.apply(2)} " +
      s"late_median=${late.sorted.apply(2)} " +
      s"ratio=${late.sorted.apply(2).toDouble / early.sorted.apply(2)}")
    spark.stop()
  }
}
