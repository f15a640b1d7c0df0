package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only solo benchmark: time ONE registered query (or a few) in a
  * fresh JVM, min-of-3, with [[graft.Bench]]'s warmup — the instrument
  * for triaging shared-session ordering effects. A full-bench row that
  * moved round-over-round while its solo time held still is a
  * shared-JVM artifact (GC/cache state left by alphabetically-earlier
  * families), not a regression; a solo move is real.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.SoloBench <query> [query...]
  */
object SoloBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SoloBench <query name> [more names]")
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
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new NoSuchElementException(s"unknown query: $name"))
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[solo] $name%-32s min ${ts.min}%.3f s  (runs: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
