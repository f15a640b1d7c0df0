package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{VectorSearch => V}

/** Dev-only stage-timing probe for the PQ pipelines (a10/a11) — the
  * bench tail. Times each materialization boundary so optimization
  * targets are measured, not guessed.
  */
object ProbePq {
  import Probe.time

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def normalized(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0d), (a, x) => a + x * x)))
      .filter(col("nrm") > 0)
      .withColumn("nv", transform(col("v"), x => x / col("nrm")))
    val base = normalized(e.filter(col("vec_id") =!= 0))
    time("warm base count")(base.count())

    // decomposed training (mirrors trainPqCodebooks) to time each phase
    locally {
      import org.apache.spark.sql.expressions.Window
      val m = 8; val c = 16
      val dim = time("dim head")(base.select(size(col("nv"))).head().getInt(0))
      val subLen = dim / m
      val subs = base.select(col("vec_id").as("id"),
          col("nv").cast("array<double>").as("v"))
        .select(col("id"), explode(array((0 until m).map(i =>
          struct(lit(i).as("sub"),
            slice(col("v"), i * subLen + 1, subLen).as("sv"))): _*)).as("e"))
        .select(col("id"), col("e.sub"), col("e.sv"))
        .cache()
      time("subs cache")(subs.count())
      val seedW = Window.partitionBy(col("sub")).orderBy(xxhash64(col("id")), col("id"))
      var books0: Map[Int, IndexedSeq[Seq[Float]]] = time("seeds window")(subs
        .withColumn("rn", row_number().over(seedW)).filter(col("rn") <= c)
        .select(col("sub"), col("rn"), col("sv"))
        .collect()
        .groupBy(_.getAs[Int]("sub")).map { case (s, rows) =>
          s -> rows.sortBy(_.getAs[Int]("rn"))
            .map(_.getSeq[Double](2).map(_.toFloat)).toIndexedSeq
        })
      for (r <- 1 to 2) {
        import spark.implicits._
        val centDf = broadcast(books0.toSeq.flatMap { case (s, cs) =>
          cs.zipWithIndex.map { case (cv, i) => (s, i, cv) }
        }.toDF("sub", "cid", "cv"))
        val l2 = aggregate(zip_with(col("sv"), col("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0d), (s, x) => s + x)
        time(s"lloyd round $r")(subs.join(centDf, Seq("sub"))
          .select(col("id"), col("sub"), col("sv"), col("cid"), l2.as("d"))
          .groupBy(col("id"), col("sub"))
          .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("cell"),
            first(col("sv")).as("sv"))
          .select(col("sub"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
          .groupBy(col("sub"), col("cell"), col("pos")).agg(avg(col("x")).as("mu"))
          .collect())
      }
      subs.unpersist()
    }

    val books = time("trainPqCodebooks")(
      V.trainPqCodebooks(base, "vec_id", "nv", m = 8, c = 16))
    val qv = time("query fetch")(normalized(e.filter(col("vec_id") === 0))
      .select(col("nv")).head().getSeq[Double](0))
    val subLen = qv.size / books.length
    val lut: Array[Array[Double]] = books.zipWithIndex.map { case (cb, i) =>
      cb.map(cent => cent.zipWithIndex.map { case (x, j) =>
        x * qv(i * subLen + j)
      }.sum.toDouble)
    }
    val scored = base
      .withColumn("codes", V.pqEncode(col("nv"), books))
      .withColumn("adc", round(V.pqScore(col("codes"), lut), 6))
    time("encode + ADC (count)")(scored.count())
    val cand = V.batchTopK(scored.select(lit(0L).as("qid"),
        col("vec_id"), col("adc")), "qid", "vec_id", "adc", k = 50)
      .select(col("vec_id"))
    time("shortlist + re-rank")(scored.join(cand, Seq("vec_id"))
      .withColumn("sim", round(aggregate(
        zip_with(col("nv"), typedlit(qv), (a, b) => a * b),
        lit(0.0d), (acc, x) => acc + x), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(10).collect())

    spark.stop()
  }
}
