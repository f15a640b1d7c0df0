package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => G}
import graft.ops.{Dedup, VectorSearch}
import graft.validate._
import graft.store.Store
import graft.dims.Dims

/** End-to-end pipeline tests on small planted datasets: dedup cluster
  * recovery, ANN neighbor recovery, validation outcomes, upsert
  * semantics, dim lookups, SQL registration.
  */
class PipelinesSpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup finds case/whitespace-mutated copies only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "  ALPHA   beta GAMMA delta "),
      (3L, "some other document"),
      (4L, "a third unrelated doc")).toDF("doc_id", "text")
    val clusters = Dedup.exactDupClusters(docs, col("doc_id"), col("text")).collect()
    assert(clusters.length == 1)
    assert(clusters(0).getAs[String]("doc_ids") == "1,2")
    assert(clusters(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH recovers planted near-dup, skips unrelated") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val docs = Seq(
      (1L, base),
      (2L, base + " with a tiny appended tail"),
      (3L, "entirely different text about distributed query engines and shuffle planning at scale today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 64, bands = 16, minSim = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("persisted-signature minhash path yields identical pairs to the cached path") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val docs = (1L to 40L).map { i =>
      if (i % 5 == 0) (i, base + s" tail $i") // near-dup family
      else (i, s"unique document number $i about topic ${i * 7} with body text segment ${i * 13} and closing words ${i * 31}")
    }.toDF("doc_id", "text")
    val cachedPairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
      shingleSize = 3, numHashes = 64, bands = 16, minSim = 0.5)
      .select("id1", "id2", "est_sim").as[(Long, Long, Double)].collect().toSet
    val sigDir = java.nio.file.Files.createTempDirectory("graft_sig_spec")
      .resolve("signatures").toString
    val sigs = Dedup.persistedMinhashSignatures(docs, col("doc_id"), col("text"),
      sigDir, shingleSize = 3, numHashes = 64)
    val persistedPairs = Dedup.minhashLshPairsFromSigs(sigs, 64, 16, 0.5)
      .select("id1", "id2", "est_sim").as[(Long, Long, Double)].collect().toSet
    assert(persistedPairs == cachedPairs)
    assert(persistedPairs.nonEmpty) // the planted family was found
    // the signature table is a real on-disk parquet table
    val back = spark.read.parquet(sigDir)
    assert(back.count() == 40 &&
      back.schema.fieldNames.toSeq == Seq("doc_id", "sig"))
  }

  test("ngram-jaccard prefix-filtered join equals brute force on the real corpus") {
    // the whole point of the prefix filter is that it prunes WITHOUT
    // losing pairs — assert exact equality against the all-pairs answer
    // on the sf0.001 documents table (500 docs, ~125k brute pairs)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val tau = 0.6
    val filtered = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), k = 3, tau = tau)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val brute = sh.select(col("doc_id").as("id1"), col("sh").as("sh1"))
      .crossJoin(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")))
      .filter(col("id1") < col("id2"))
      .filter(Dedup.jaccard(col("sh1"), col("sh2")) >= tau)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(filtered == brute)
    assert(brute.nonEmpty) // the corpus really contains near-dups
  }

  test("simhash banding recovers planted near-dup") {
    // a doubled document keeps identical term frequencies -> identical
    // simhash (hamming 0); the unrelated doc must stay out
    val base = "spark catalyst tungsten codegen shuffle partition broadcast join aggregate window"
    val docs = Seq(
      (1L, base),
      (2L, base + " " + base),
      (3L, "unrelated words entirely distinct corpus segment with other topics"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"),
      bands = 4, maxHamming = 6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ANN: brute force and LSH both rank the planted neighbor first") {
    val dim = 16
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(dim)(r.nextFloat() * 2 - 1)
    }
    val q = vec(7)
    val near = q.clone(); near(0) += 0.01f
    // filler seeds disjoint from the query's seed
    val rows = (near +: (101 to 150).map(i => vec(i)).toSeq).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val vectors = rows.toDF("vec_id", "embedding")
    val query = Seq((99L, q)).toDF("vec_id", "embedding")

    val bf = VectorSearch.bruteForceTopK(vectors, query, "embedding", 5)
      .orderBy(col("sim").desc).select("vec_id").as[Long].head()
    assert(bf == 0L)

    val lsh = VectorSearch.lshCandidates(vectors, query, "embedding",
      nbits = 4, tables = 3)
      .orderBy(col("sim").desc).select("vec_id").as[Long].collect()
    assert(lsh.nonEmpty && lsh.head == 0L)
  }

  test("asof join: inclusive at equal ts, null before first build, latest otherwise") {
    import graft.ops.Temporal
    val probe = Seq((1L, 10L, 5L), (2L, 10L, 10L), (3L, 10L, 15L), (4L, 10L, 30L),
      (5L, 99L, 50L)).toDF("event_id", "user_id", "ts")
    val build = Seq((10L, 10L, 1.0), (10L, 20L, 2.0)).toDF("user_id", "ts", "pv")
    val got = Temporal.asofJoin(probe, build, Seq("user_id"), "ts", "pv")
      .select("event_id", "pv").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty)          // before the first build row
    assert(got(2L).contains(1.0))    // equal ts is inclusive (<=)
    assert(got(3L).contains(1.0))    // between builds -> earlier one
    assert(got(4L).contains(2.0))    // after the last build
    assert(got(5L).isEmpty)          // key with no build rows at all
  }

  test("binned range join equals the naive inequality join") {
    import graft.ops.Temporal
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(i => (i.toLong, (i % 5).toLong, rnd.nextInt(100000).toLong))
      .toDF("pid", "k", "pt")
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(95000).toLong
      (i.toLong, (i % 5).toLong, lo, lo + rnd.nextInt(8000))
    }.toDF("iid", "k", "lo", "hi")
    val binned = Temporal.rangeJoinBinned(ivs, pts, Seq("k"), "pt", "lo", "hi", 4096L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = ivs.join(pts, Seq("k"))
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("cluster split is leakage-safe: planted duplicates land on their original's side") {
    val q = graft.queries.QueryRegistry.byName("d07_split_by_cluster")
    val out = q.fn(spark, "/root/testdata/sf0.001")
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    val byCluster = out.groupBy(_._2).values
    assert(byCluster.forall(_.map(_._3).distinct.size == 1), "one split per cluster")
    val splitOf = out.map(r => r._1 -> r._3).toMap
    // every planted exact dup (doc_id % 7 == 0 mirrored at +10000) follows its original
    val planted = out.filter(_._1 >= 10000)
    assert(planted.nonEmpty)
    planted.foreach { case (id, _, s) => assert(s == splitOf(id - 10000)) }
    // and the split is actually a split, roughly 80/20
    val train = out.count(_._3 == "train").toDouble / out.length
    assert(train > 0.6 && train < 0.95, s"train fraction $train")
  }

  test("IVF: nprobe == C degenerates to exact brute force; planted neighbor recovered") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = e.filter(col("vec_id") =!= 0L)
    val query = e.filter(col("vec_id") === 0L)
    val c = 8
    val cents = VectorSearch.trainCentroids(base, "vec_id", "embedding", c = c, iters = 2)
    assert(cents.length == c && cents.forall(_.nonEmpty))
    def topIds(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      df.orderBy(col("sim").desc, col("vec_id")).limit(k)
        .select("vec_id").as[Long].collect().toSeq
    // probing every cell must recover the exact answer
    val exhaustive = topIds(VectorSearch.ivfCandidates(base, query, "embedding", cents, nprobe = c), 10)
    val brute = topIds(VectorSearch.bruteForceTopK(base, query, "embedding", 10), 10)
    assert(exhaustive == brute)
    // a tiny perturbation of the query lands in the query's own probe set
    val planted = query.select(lit(99999L).as("vec_id"), lit("planted").as("label"),
      transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)).as("embedding"))
    val found = topIds(VectorSearch.ivfCandidates(base.unionByName(planted), query,
      "embedding", cents, nprobe = 1), 1)
    assert(found == Seq(99999L))
  }

  test("batch ANN: a query SET probes in one join, per-query results keyed by query_id") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = e.filter(col("vec_id") > 1L)
    val queries = e.filter(col("vec_id") <= 1L) // vec 0 and vec 1 as a batch
    val cents = VectorSearch.trainCentroids(base, "vec_id", "embedding", c = 8, iters = 1)
    def top1(qid: Long, df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("query_id") === qid)
        .orderBy(col("sim").desc, col("vec_id")).limit(1)
        .select("vec_id").as[Long].head()
    val ivf = VectorSearch.ivfCandidates(base, queries, "embedding", cents,
      nprobe = 8, queryIdCol = Some("vec_id"))
    val lsh = VectorSearch.lshCandidates(base, queries, "embedding",
      nbits = 2, tables = 3, queryIdCol = Some("vec_id"))
    // nprobe = C: per-query IVF top-1 equals per-query brute force
    Seq(0L, 1L).foreach { qid =>
      val brute = VectorSearch.bruteForceTopK(base,
        queries.filter(col("vec_id") === qid).select("embedding"), "embedding", 1)
        .orderBy(col("sim").desc, col("vec_id")).limit(1)
        .select("vec_id").as[Long].head()
      assert(top1(qid, ivf) == brute)
      assert(lsh.filter(col("query_id") === qid).count() > 0)
    }
  }

  test("contract violation report counts nulls and bounds in one pass") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, -5.0), (null, 3.0), (4L, 200.0))
      .toDF("id", "v")
    val contract = Contract("t", "1", Seq(
      ColumnSpec("id", LongType, nullable = false),
      ColumnSpec("v", DoubleType, minValue = Some(0.0), maxValue = Some(100.0))))
    val rep = contract.violationReport(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rep(("not_null", "id")) == 1L)
    assert(rep(("min_value", "v")) == 1L)
    assert(rep(("max_value", "v")) == 1L)
  }

  test("quality certify: gold on clean data, level drops with failures") {
    val clean = Seq((1L, "2024-01-10", 10.0), (2L, "2024-01-11", 20.0))
      .toDF("id", "data", "valor")
      .withColumn("data", col("data").cast("date"))
    val cert = Quality.certify(clean, Seq("id", "data", "valor"),
      "data", "valor", asOf = "2024-01-12", maxAgeDays = 7,
      minValue = 0.0, maxValue = 100.0).collect()(0)
    assert(cert.getAs[String]("level") == "GOLD")
    assert(cert.getAs[Double]("score") == 1.0)

    val dirty = Seq((1L, "2024-01-10", 1000.0), (2L, "2023-06-01", 20.0))
      .toDF("id", "data", "valor")
      .withColumn("data", col("data").cast("date"))
    val cert2 = Quality.certify(dirty, Seq("id", "data", "valor"),
      "data", "valor", asOf = "2024-06-01", maxAgeDays = 7,
      minValue = 0.0, maxValue = 100.0).collect()(0)
    assert(cert2.getAs[String]("level") != "GOLD")
  }

  test("gap finder reports only missing business days") {
    // Mon 2024-01-01 .. Fri 2024-01-05; Wed missing; weekend ignored
    val df = Seq("2024-01-01", "2024-01-02", "2024-01-04", "2024-01-05", "2024-01-08")
      .toDF("d").withColumn("d", col("d").cast("date"))
    val missing = Gaps.missingBusinessDays(df, col("d"))
      .as[java.sql.Date].collect().map(_.toString)
    assert(missing.toSeq == Seq("2024-01-03"))
  }

  test("upsert: updates replace, inserts append") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val updates = Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("k", "s", "v")
    val merged = Store.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
  }

  test("export writes parquet + sidecar with stable hash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val h1 = Store.exportWithHash(df, s"$dir/t.parquet", Seq("id", "s"))
    val h2 = Store.contentHash(
      spark.read.parquet(s"$dir/t.parquet"), Seq("id", "s"))
      .collect()(0).getString(1)
    assert(h1 == h2, "hash must survive a write/read round-trip")
    val meta = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/t.parquet.meta.json"))
    assert(meta.contains(s"sha256:$h1"))
  }

  test("crop normalization + UF lookup") {
    val out = Seq("Soja em Grão", "CORN", "feijão 2ª safra", "novo produto")
      .toDF("raw").select(Dims.normalizeCrop(col("raw")).as("p"))
      .as[String].collect().toSeq
    assert(out == Seq("soja", "milho", "feijao_2", "novo_produto"))

    val lk = Dims.ufLookup(spark)
    val res = Seq("sao paulo", "SP", "Paraná").toDF("raw")
      .join(lk, G.stripAccents(lower(trim(col("raw")))) === lk("k"))
      .select("sigla").as[String].collect().toSet
    assert(res == Set("SP", "PR"))
  }

  test("custom expressions callable from SQL") {
    val r = spark.sql(
      """SELECT parse_br_decimal('1.234,56') AS d,
                strip_accents('maçã') AS s,
                safra_of(DATE '2024-08-01') AS sf,
                convert_unit(CAST(2 AS DECIMAL(18,4)), 'sc60', 'kg', 'soja') AS kg
      """).collect()(0)
    assert(r.getDecimal(0).toString == "1234.5600")
    assert(r.getString(1) == "maca")
    assert(r.getString(2) == "2024/25")
    assert(r.getDecimal(3).toString == "120.0000")
  }

  test("sanity rules flag range and change anomalies") {
    val df = Seq(
      (1L, "soja", "2024-01-01", 100.0),
      (2L, "soja", "2024-01-02", 500.0),  // above max + big change
      (3L, "soja", "2024-01-03", 10.0))   // below min + big change
      .toDF("id", "produto", "data", "valor")
      .withColumn("data", col("data").cast("date"))
    val rules = Map("soja" -> SanityRule(30.0, 300.0, 50.0))
    val flagged = Sanity.flagAnomalies(df, rules, col("produto"), col("valor"),
      Seq(col("produto")), Seq(col("data")))
      .select("id", "anomalies").as[(Long, String)].collect().toMap
    assert(flagged(2L) == "above_max,daily_change")
    assert(flagged(3L) == "below_min,daily_change")
    assert(!flagged.contains(1L))
  }
}
