package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.T._
import graft.store.Store

/** Store-operation family (SURVEY §2.1 S7-S10): MERGE upsert and
  * content-hash export, both oracle-checked. S7 (predicate scan) and
  * S10 (as-of snapshot) are exercised by q19/q02.
  */
object StoreOps {

  /** S8 — MERGE upsert: every 10th order gets a price update AND a new
    * row with a fresh key; updates must replace, inserts must append
    * (reference `cache/duckdb_store.py:417-461`).
    */
  val s01 = Q("s01_upsert_merge",
    (s, dir) => {
      val base = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val touched = load(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      val updates = touched
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 100000.0).as("o_totalprice"))
        .unionByName(touched.select((col("o_orderkey") + 5000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))
      Store.upsert(base, updates, Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH updates AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 5000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0),
      base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
      SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      UNION ALL SELECT * FROM updates
      ORDER BY o_orderkey"""))

  /** S9/F13 — canonical content hash: per-row canonical string, sorted,
    * sha256 (reference `models.py:177-179` hashes the canonical CSV).
    */
  val s02 = Q("s02_content_hash",
    (s, dir) => Store.contentHash(load(s, dir, "orders"),
      Seq("o_orderkey", "o_orderstatus", "o_orderpriority")),
    Some("""
      SELECT COUNT(*) AS n_rows,
        sha256(string_agg(r, chr(10) ORDER BY r)) AS content_hash
      FROM (SELECT concat_ws('|', o_orderkey, o_orderstatus, o_orderpriority) AS r
            FROM orders) t"""))

  /** S8 under the transactional commit protocol: same MERGE as s01 but
    * through [[graft.store.TxStore]] — init v1, commitUpsert to v2,
    * read back the committed snapshot. Same oracle as s01: the ACID
    * path must be invisible in the result.
    */
  val s03 = Q("s03_tx_upsert",
    (s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft_tx")
        .resolve("t").toString
      val base = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      graft.store.TxStore.init(base, root)
      val touched = load(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      val updates = touched
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 100000.0).as("o_totalprice"))
        .unionByName(touched.select((col("o_orderkey") + 5000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))
      graft.store.TxStore.commitUpsert(s, root, updates, Seq("o_orderkey"))
      graft.store.TxStore.read(s, root).orderBy(col("o_orderkey"))
    },
    Some("""
      WITH updates AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 5000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0),
      base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
      SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      UNION ALL SELECT * FROM updates
      ORDER BY o_orderkey"""))

  /** s03's MERGE through the INCREMENTAL partitioned commit: base is
    * partitioned on pmod(o_orderkey, 10); the updates touch only
    * partition 0, so nine of ten partitions are hard-linked forward,
    * never rewritten — commit cost ∝ touched data. Same oracle as s03
    * (minus rows whose partition the updates touch differently): the
    * commit protocol must be invisible in the result.
    */
  val s04 = Q("s04_tx_partitioned",
    (s, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft_txpart")
        .resolve("t").toString
      val base = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          pmod(col("o_orderkey"), lit(10)).as("part"))
      graft.store.TxStore.initPartitioned(base, root, "part")
      val touched = load(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      val updates = touched
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 100000.0).as("o_totalprice"))
        .unionByName(touched.select((col("o_orderkey") + 5000000L).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice")))
        .withColumn("part", pmod(col("o_orderkey"), lit(10)))
      graft.store.TxStore.commitUpsertPartitioned(s, root, updates,
        Seq("o_orderkey"), "part")
      graft.store.TxStore.read(s, root)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""
      WITH updates AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 5000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0),
      base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
      SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      UNION ALL SELECT * FROM updates
      ORDER BY o_orderkey"""))

  def qs: Seq[Q] = Seq(s01, s02, s03, s04)
}
