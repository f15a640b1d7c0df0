package graft

/** Compiles-and-runs gate for `graft.examples.Examples`: every example
  * the docs advertise executes end-to-end against the sf0.001 tables
  * and reports sane numbers — so the examples directory cannot rot
  * (the failure mode of every sample-code folder).
  */
class ExamplesSpec extends SparkSuite {
  import graft.examples.Examples

  private val sfDir = "/root/testdata/sf0.001"
  private def work(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ex_$tag").toString

  private def detail(df: org.apache.spark.sql.DataFrame): String =
    df.collect().map(_.getString(1)).mkString(" | ")

  test("quickstart: certify → commit → upsert → export all run") {
    val d = detail(Examples.quickstart(spark, sfDir, work("q")))
    assert(d.contains("certificate="))
    assert(d.contains("commits=2"), d)       // init + correction upsert
    assert(d.contains("export_sha256="), d)
  }

  test("dedup pipeline: finds pairs and collapses clusters") {
    val d = detail(Examples.dedupPipeline(spark, sfDir))
    val n = "(\\d+)".r
    val nums = n.findAllIn(d).map(_.toLong).toSeq
    assert(nums.size == 4 && nums(1) > 0 && nums(2) > 0 && nums(3) > 0, d)
  }

  test("ann index: probe-all recovers brute force exactly; partial probe reports recall") {
    val d = detail(Examples.annIndex(spark, sfDir, work("a")))
    assert(d.contains("probe_all_exact=true"), d)
    val recall = "recall@10\\[nprobe=4/16\\]=([0-9.]+)".r
      .findFirstMatchIn(d).get.group(1).toDouble
    // isotropic substrate: partial probe keeps SOME of the exact set
    assert(recall > 0.0 && recall <= 1.0, d)
  }

  test("streaming curation: near-dup rejected, novel admitted, versioned") {
    val d = detail(Examples.streamingCuration(spark, work("s")))
    assert(d.contains("admitted=1,2,4"), d)  // doc 3 was the near-dup
  }
}
