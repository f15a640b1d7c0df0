package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}
import graft.ops.Dedup

/** Dev-only stage-timing probe for the heavy pipelines (not part of the
  * driver contract). Times each materialization boundary of d06/d08/a04
  * so optimization targets are measured, not guessed.
  */
object Probe {
  def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    G.register(spark)

    val d = spark.read.parquet(s"$dir/documents.parquet")
    val every11 = d.filter(pmod(col("doc_id"), lit(11)) === 0)
    val docsRaw = d.select(col("doc_id"), col("text")).unionByName(
      every11.select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" graft appended marker tokens")).as("text")))

    // --- d06 decomposition ---
    val k = 3; val tau = 0.6
    def ceilTau(n: org.apache.spark.sql.Column) = ceil(lit(tau) * n - lit(1e-9))
    val docs = docsRaw.select(col("doc_id"),
        transform(Dedup.shingles(col("text"), k), x => xxhash64(x)).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    time("docs cache (shingle+hash)") { docs.count() }
    val toks = docs.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("s"))
    time("token explode count") { toks.count() }
    val tokenDf = toks.groupBy(col("s")).agg(count(lit(1)).as("tdf"))
    time("tokenDf agg") { tokenDf.count() }
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("tdf"), col("s"))
    def alpha(n1: org.apache.spark.sql.Column, n2: org.apache.spark.sql.Column) =
      ceil(lit(tau / (1 + tau)) * (n1 + n2) - lit(1e-9))
    val prefix = toks.join(tokenDf, Seq("s"))
      .withColumn("pos", row_number().over(byRarity))
      .filter(col("pos") <= col("n") - ceilTau(col("n")) + 1)
      .select(col("s"), col("doc_id"), col("n"), col("pos"))
    time("prefix (join+window)") { prefix.count() }
    val cand = prefix.select(col("s"), col("doc_id").as("id1"),
        col("n").as("n1"), col("pos").as("pos1"))
      .join(prefix.select(col("s"), col("doc_id").as("id2"),
        col("n").as("n2"), col("pos").as("pos2")), Seq("s"))
      .filter(col("id1") < col("id2") &&
        col("n2") >= ceilTau(col("n1")) && col("n1") >= ceilTau(col("n2")) &&
        lit(1) + least(col("n1") - col("pos1"), col("n2") - col("pos2")) >=
          alpha(col("n1"), col("n2")))
      .select(col("id1"), col("id2"))
      .distinct()
    val nCand = time("candidates (prefix join)") { cand.count() }
    println(s"[probe] n_candidates = $nCand")
    val out = cand
      .join(docs.select(col("doc_id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(docs.select(col("doc_id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("c", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .select(col("id1"), col("id2"),
        (col("c") / (size(col("sh1")) + size(col("sh2")) - col("c"))).as("jacc"))
      .filter(col("jacc") >= tau)
    println(s"[probe] n_pairs = ${time("verify join") { out.count() }}")
    time("d06 end-to-end (op)") {
      Dedup.ngramJaccardPairs(docsRaw, col("doc_id"), col("text"), 3, 0.6).count()
    }

    // --- a04 decomposition ---
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = e.filter(col("vec_id") =!= 0)
    println(s"[probe] embeddings rows = ${base.count()}")
    val cents = time("ivf train (c=16, iters=2)") {
      graft.ops.VectorSearch.trainCentroids(base, "vec_id", "embedding", c = 16, iters = 2)
    }
    time("ivf probe") {
      graft.ops.VectorSearch.ivfCandidates(base, e.filter(col("vec_id") === 0),
        "embedding", cents, nprobe = 4).count()
    }
    spark.stop()
  }
}
