package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{VectorSearch => V}

// throwaway dev profiler — not part of the library surface
object DevProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.queries.T.load(spark, sfDir, "embeddings").count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"== round $round")
      val e = graft.queries.T.load(spark, sfDir, "embeddings")
      val base = e.filter(col("vec_id") =!= 0)
      val cents = t("trainCentroids") {
        V.trainCentroids(base, "vec_id", "embedding", c = 16, iters = 1)
      }
      val normBase = t("a10Normalized") {
        val d = base
          .withColumn("_v", col("embedding").cast("array<double>"))
          .withColumn("_nrm", sqrt(aggregate(col("_v"), lit(0.0d), (a, x) => a + x * x)))
          .filter(col("_nrm") > 0)
          .withColumn("nv", transform(col("_v"), x => x / col("_nrm")))
          .select(col("vec_id"), col("label"), col("nv"))
        d.count(); d
      }
      val books = t("trainPqCodebooks") {
        V.trainPqCodebooks(normBase, "vec_id", "nv", m = 8, c = 16, iters = 1)
      }
      val base2 = normBase.select(col("vec_id").as("id"), col("nv").cast("array<double>").as("v"))
      t("  seeds TakeOrdered") {
        base2.orderBy(xxhash64(col("id")), col("id")).limit(16).select(col("v")).collect()
      }
      t("  literal encode+means") {
        base2.withColumn("codes", V.pqEncode(col("v"), books))
          .select(explode(array((0 until 8).map(i =>
            struct(lit(i).as("sub"), element_at(col("codes"), i + 1).as("cell"),
              slice(col("v"), i * 8 + 1, 8).as("sv"))): _*)).as("e"))
          .select(col("e.sub").as("sub"), col("e.cell").as("cell"),
            posexplode(col("e.sv")).as(Seq("pos", "x")))
          .groupBy(col("sub"), col("cell"), col("pos")).agg(avg(col("x")).as("mu"))
          .collect()
      }
      t("  join encode+means") {
        V.pqCodesJoin(base2, "id", "v", books)
          .select(explode(array((0 until 8).map(i =>
            struct(lit(i).as("sub"), element_at(col("codes"), i + 1).as("cell"),
              slice(col("v"), i * 8 + 1, 8).as("sv"))): _*)).as("e"))
          .select(col("e.sub").as("sub"), col("e.cell").as("cell"),
            posexplode(col("e.sv")).as(Seq("pos", "x")))
          .groupBy(col("sub"), col("cell"), col("pos")).agg(avg(col("x")).as("mu"))
          .collect()
      }
      val idx = java.nio.file.Files.createTempDirectory("graft_prof")
        .resolve("index").toString
      t("buildIvfPqIndex") {
        V.buildIvfPqIndex(base, "vec_id", "embedding", cents, books, idx)
      }
    }
    spark.stop()
  }
}
