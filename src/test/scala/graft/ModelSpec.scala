package graft

import org.apache.spark.sql.functions._
import graft.ops.Model

/** Convergence properties of the distributed trainers that the
  * DuckDB-checked 2-epoch trajectories (a28/a29) cannot show: logistic
  * regression actually LEARNS a separable concept (loss falls
  * monotonically, held-in accuracy is high), and power iteration
  * recovers a planted dominant direction regardless of the mean
  * offset. Synthetic data is deterministic (hash-derived), so the
  * assertions are exact-repeatable.
  */
class ModelSpec extends SparkSuite {
  import spark.implicits._

  private val dims = 8

  /** 400 rows, label = 1 iff a fixed linear score of the features is
    * positive — linearly separable by construction, mean shifted off
    * the origin so the bias term has to work too.
    */
  private lazy val separable = {
    val rows = (0 until 400).map { i =>
      val v = (0 until dims).map(j =>
        (((i * 31 + j * 17) % 101) - 50) / 50.0f + 0.2f)
      val score = v(0) + 0.5f * v(1) - v(2)
      (i.toLong, v, if (score > 0.1f) 1.0 else 0.0)
    }
    rows.toDF("id", "v", "y").cache()
  }

  test("logreg: full-batch GD drives log-loss down monotonically and separates") {
    val models = Model.trainLogReg(separable, "v", col("y"),
      dims = dims, epochs = 12, lr = 2.0)
    assert(models.size == 12)
    val losses = models.map { m =>
      separable
        .select(Model.predict(col("v"), m).as("p"), col("y"))
        .select(avg(-(col("y") * log(greatest(col("p"), lit(1e-9))) +
          (lit(1.0) - col("y")) *
            log(greatest(lit(1.0) - col("p"), lit(1e-9))))).as("ll"))
        .head().getDouble(0)
    }
    losses.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9,
      s"loss must not increase: $losses") }
    assert(losses.last < 0.35, s"final loss too high: ${losses.last}")
    val acc = separable
      .select((Model.predict(col("v"), models.last) >= 0.5).cast("double")
        .as("pred"), col("y"))
      .filter(col("pred") === col("y")).count() / 400.0
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("logreg: epoch-1-from-zero weights equal the closed-form linear step") {
    val m1 = Model.trainLogReg(separable, "v", col("y"),
      dims = dims, epochs = 1, lr = 1.0).head
    // sigmoid(0) = 0.5 exactly, so w1_j = -avg(round((0.5-y)*v_j, 6))
    val exp = separable
      .select((0 until dims).map(j =>
        avg(round((lit(0.5) - col("y")) * col("v")(j), 6)).as(s"g$j")): _*)
      .head()
    (0 until dims).foreach { j =>
      assert(math.abs(m1.weights(j) - Model.r6(-exp.getDouble(j))) <= 1e-6)
    }
  }

  /** Planted spectrum: x = t·dir + small orthogonal noise + constant
    * mean shift. The top principal component of the CENTERED data is
    * ±dir; the mean shift would dominate an uncentered power method,
    * so recovery also certifies the centering pass.
    */
  test("pca: power iteration recovers the planted dominant direction") {
    val dir = {
      val raw = (0 until dims).map(j => if (j % 2 == 0) 1.0 else -0.5)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val rows = (0 until 300).map { i =>
      val t = ((i % 61) - 30) / 3.0 // dominant variance along dir
      val v = (0 until dims).map(j =>
        (t * dir(j) + (((i * 13 + j * 7) % 19) - 9) / 90.0 + 5.0).toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    val (mean, iters) = Model.powerIterationPc1(df, "v", dims, iters = 6)
    assert(mean.forall(m => math.abs(m - 5.0) < 1.5)) // shift seen by centering
    val pc = iters.last
    val cos = pc.zip(dir).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"|cos(pc, planted)| = ${math.abs(cos)}")
    val norm = math.sqrt(pc.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"iterate not unit: $norm")
  }

  test("pca: successive iterates converge (direction stabilizes)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (_, iters) = Model.powerIterationPc1(e, "embedding", 64, iters = 5)
    val Seq(a, b) = iters.takeRight(2)
    val cos = a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(cos) > 0.99, s"iterates still moving: cos=$cos")
  }
}
