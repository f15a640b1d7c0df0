package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}

/** GzipRatio — the deflate-based boilerplate signal: repetitive text
  * must compress far below natural prose, the expression must be
  * deterministic and codegen-safe, and the t20 gate must separate the
  * planted degenerate twins from every original.
  */
class GzipRatioSpec extends SparkSuite {
  import spark.implicits._

  test("ratio orders repetitive << prose, empty == 1.0, deterministic") {
    val rows = Seq(
      ("empty", ""),
      ("spam", "spam " * 200),
      ("prose", "The quick brown fox jumps over the lazy dog near the riverbank, " +
        "while seventeen jugglers balance quartz vases on zigzag beams."),
      ("random", (1 to 40).map(i => s"tok${i * 7919 % 9973}").mkString(" ")))
      .toDF("kind", "text")
    val got = rows.select($"kind", G.gzipRatio($"text").as("r"))
      .as[(String, Double)].collect().toMap
    assert(got("empty") === 1.0)
    assert(got("spam") < 0.05, s"spam ratio ${got("spam")} not degenerate")
    assert(got("spam") < got("prose") && got("prose") < 1.5)
    assert(got("random") > got("spam"))
    // same input, same ratio — across codegen and interpreted eval
    val again = rows.select($"kind", G.gzipRatio($"text").as("r"))
      .as[(String, Double)].collect().toMap
    assert(got === again)
  }

  test("SQL registration works and t20 gate separates planted twins exactly") {
    G.register(spark)
    val viaSql = spark.sql("SELECT gzip_ratio('aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa')")
      .head().getDouble(0)
    assert(viaSql < 0.5)
    val t20 = queries.TextAnalysis.t20.fn(spark, "/root/testdata/sf0.001")
    assert(t20.filter(!col("gate_correct")).count() === 0,
      "compression gate misclassified a document")
    assert(t20.filter(col("is_planted")).count() > 0)
  }
}
