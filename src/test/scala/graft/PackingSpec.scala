package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupOps, TextAnalysis2}

/** Invariant proofs for the batch-assembly + data-selection operators
  * (t23/t24 packing, t25 DSIR, d17 line dedup) beyond the driver's
  * hash oracle: the packing laws, the greedy fold's bin discipline,
  * importance-resampling enrichment, and first-occurrence-wins line
  * survival.
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("t23: the virtual token stream is contiguous, offsets stay inside the budget") {
    val rows = TextAnalysis2.t23.fn(spark, dir)
      .select($"doc_id", $"n_tok", $"start_tok", $"seq_first", $"seq_last",
        $"seq_offset", $"n_seqs")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // contiguity: every doc starts exactly where the previous ended
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 + a._2 == b._3,
        s"gap between doc ${a._1} and ${b._1}")
      case _ => ()
    }
    assert(rows.head._3 == 0L)
    rows.foreach { r =>
      assert(r._6 >= 0 && r._6 < 512, s"offset out of range: $r")
      assert(r._4 <= r._5 && r._7 == r._5 - r._4 + 1, s"seq span wrong: $r")
      // a doc spans exactly the sequences its token interval covers
      assert(r._4 == r._3 / 512 && r._5 == (r._3 + r._2 - 1) / 512)
    }
  }

  test("t24: greedy fold — no bin overflows unless a single doc does, bins advance exactly on overflow") {
    val rows = TextAnalysis2.t24.fn(spark, dir)
      .select($"source", $"doc_id", $"n_tok", $"bin", $"fill_after")
      .as[(String, Long, Long, Long, Long)]
      .collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, ds) =>
      val sorted = ds.sortBy(_._2)
      var bin = 0L; var fill = 0L
      sorted.foreach { case (_, id, n, binOut, fillOut) =>
        if (fill > 0 && fill + n > 256) { bin += 1; fill = 0 }
        fill += n
        assert(binOut == bin && fillOut == fill, s"replay diverged at doc $id")
        assert(fill <= 256 || n > 256, s"bin overflow without oversized doc at $id")
      }
    }
  }

  test("t25: DSIR enriches the target domain and ranks by weight") {
    val sel = TextAnalysis2.t25.fn(spark, dir)
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"lang")
    val rows = sel.join(langs, Seq("doc_id"))
      .select($"rank", $"dsir_w", $"lang")
      .as[(Int, Double, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 100))
    // weights non-increasing in rank order
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2)
      case _ => ()
    }
    // enrichment: target-domain (en) share in the selected set beats its
    // corpus base rate (218/500) — the point of importance resampling
    val enShare = rows.count(_._3 == "en") / 100.0
    val baseRate = {
      val c = langs.filter($"lang" === "en").count().toDouble
      c / langs.count()
    }
    assert(enShare > baseRate, s"no enrichment: $enShare <= $baseRate")
  }

  test("d17: boilerplate survives exactly once, first occurrence wins, kept lines are globally distinct") {
    val out = DedupOps.d17.fn(spark, dir)
      .select($"doc_id", $"n_lines", $"n_kept", $"text_dedup")
      .as[(Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    val banner = "aceite os cookies para continuar"
    val keepers = out.filter(_._4.split("\n").contains(banner)).map(_._1)
    assert(keepers.toSeq == Seq(0L), s"banner kept by ${keepers.mkString(",")}")
    // every surviving line is globally unique
    val allKept = out.flatMap(_._4.split("\n").filter(_.nonEmpty))
    assert(allKept.length == allKept.distinct.length, "duplicate line survived")
    // a doc may legitimately lose EVERY line (this corpus reuses token
    // runs — the LEFT-join path), but then its dedup text must be empty
    out.foreach { case (id, nl, nk, txt) =>
      assert(nk >= 0 && nk <= nl, s"doc $id kept $nk of $nl")
      assert((nk == 0) == txt.isEmpty, s"doc $id kept $nk but text='$txt'")
    }
    assert(out.exists(_._3 == 0), "expected at least one fully-deduped doc")
    // total kept = total distinct lines in the constructed corpus
    val totalLines = out.map(_._2).sum
    val totalKept = out.map(_._3).sum
    assert(totalKept < totalLines, "nothing was deduped — planting broken")
  }
}
