package graft

import org.apache.spark.sql.functions._
import graft.store.TxStore

/** ACID commit protocol over plain parquet: a failed merge must leave
  * the committed snapshot readable and unchanged (the guarantee the
  * reference inherits from DuckDB's transactional staging merge,
  * `cache/duckdb_store.py:417-461`).
  */
class TxStoreSpec extends SparkSuite {
  import spark.implicits._

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_txstore").resolve("t").toString

  private def rows(root: String): Set[(Long, String, Double)] =
    TxStore.read(spark, root).as[(Long, String, Double)].collect().toSet

  test("init + read round-trip at v1") {
    val root = freshRoot()
    val base = Seq((1L, "soja", 100.0), (2L, "milho", 50.0)).toDF("k", "produto", "v")
    assert(TxStore.init(base, root) == 1L)
    assert(TxStore.currentVersion(root).contains(1L))
    assert(rows(root) == Set((1L, "soja", 100.0), (2L, "milho", 50.0)))
  }

  test("successful commit: updates replace, inserts append, version bumps") {
    val root = freshRoot()
    TxStore.init(Seq((1L, "soja", 100.0), (2L, "milho", 50.0)).toDF("k", "produto", "v"), root)
    val updates = Seq((2L, "milho", 75.0), (3L, "trigo", 30.0)).toDF("k", "produto", "v")
    assert(TxStore.commitUpsert(spark, root, updates, Seq("k")) == 2L)
    assert(rows(root) == Set((1L, "soja", 100.0), (2L, "milho", 75.0), (3L, "trigo", 30.0)))
  }

  test("failed merge leaves the committed snapshot readable and unchanged") {
    val root = freshRoot()
    TxStore.init(Seq((1L, "soja", 100.0), (2L, "milho", 50.0)).toDF("k", "produto", "v"), root)
    val before = rows(root)
    // updates that explode mid-job, after some rows have been produced
    val poison = Seq((2L, "milho", 75.0), (3L, "trigo", -1.0)).toDF("k", "produto", "v")
      .withColumn("v", when(col("v") < 0, raise_error(lit("poison row"))).otherwise(col("v")))
    val e = intercept[Exception](TxStore.commitUpsert(spark, root, poison, Seq("k")))
    assert(e.getMessage != null)
    assert(TxStore.currentVersion(root).contains(1L), "pointer never flipped")
    assert(rows(root) == before, "committed data unchanged")
    assert(TxStore.vacuum(root).isEmpty, "failed write cleaned its own partial dir")
    // and the table still accepts a good commit afterwards
    assert(TxStore.commitUpsert(spark, root,
      Seq((3L, "trigo", 30.0)).toDF("k", "produto", "v"), Seq("k")) == 2L)
    assert(rows(root) == before + ((3L, "trigo", 30.0)))
  }

  test("time travel reads any committed version; uncommitted versions are unreadable") {
    val root = freshRoot()
    TxStore.init(Seq((1L, "soja", 100.0)).toDF("k", "produto", "v"), root)
    TxStore.commitUpsert(spark, root,
      Seq((1L, "soja", 150.0)).toDF("k", "produto", "v"), Seq("k")) // -> v2
    assert(TxStore.readVersion(spark, root, 1L).as[(Long, String, Double)].collect().toSet
      == Set((1L, "soja", 100.0)))
    assert(TxStore.readVersion(spark, root, 2L).as[(Long, String, Double)].collect().toSet
      == Set((1L, "soja", 150.0)))
    intercept[IllegalArgumentException](TxStore.readVersion(spark, root, 3L))
  }

  test("optimistic concurrency: a stale writer conflicts and changes nothing") {
    val root = freshRoot()
    TxStore.init(Seq((1L, "soja", 100.0)).toDF("k", "produto", "v"), root)
    TxStore.commitUpsert(spark, root,
      Seq((2L, "milho", 50.0)).toDF("k", "produto", "v"), Seq("k")) // -> v2
    val snapshot = rows(root)
    intercept[TxStore.ConcurrentCommitException] {
      TxStore.commitUpsert(spark, root,
        Seq((9L, "cafe", 9.0)).toDF("k", "produto", "v"), Seq("k"),
        expectedVersion = Some(1L)) // stale base: v2 already committed
    }
    assert(TxStore.currentVersion(root).contains(2L))
    assert(rows(root) == snapshot)
  }
}
