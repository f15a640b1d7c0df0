package graft

import org.apache.spark.sql.functions._
import graft.api.Graft
import graft.datasets.{DatasetDef, DatasetSource}
import graft.validate.ContractRegistry

/** The facade surface + contract registry + a plan-regression guard for
  * the events pushdown.
  */
class ApiSpec extends SparkSuite {
  import spark.implicits._

  test("contract registry covers the fixture families with sane PKs") {
    assert(ContractRegistry.all.size == 6)
    assert(ContractRegistry.get("cepea.indicador").get.primaryKey ==
      Seq("data", "produto"))
    assert(ContractRegistry.get("queimadas.focos").get
      .columns.find(_.name == "lat").get.minValue.contains(-35.0))
  }

  test("facade: dataset fetch, validate, certify, gaps") {
    def rows() = Seq(("2024-01-10", "soja", "BRL/sc60kg", 130.5))
      .toDF("data", "produto", "unidade", "valor")
      .withColumn("data", col("data").cast("date"))
      .withColumn("valor", col("valor").cast("decimal(18,4)"))
      .withColumn("praca", lit(null).cast("string"))
      .withColumn("variacao_percentual", lit(null).cast("decimal(18,4)"))
    Graft.registerDataset(DatasetDef("cepea_fixture",
      ContractRegistry.cepeaIndicador,
      Seq(DatasetSource(1, "fixture", () => rows()))))
    val (df, meta) = Graft.dataset("cepea_fixture").fetch()
    assert(meta.records == 1 && meta.source == "fixture")

    assert(Graft.validate(rows(), "cepea.indicador").count() == 0)
    val bad = rows().withColumn("valor", lit(-1.0).cast("decimal(18,4)"))
    assert(Graft.validate(bad, "cepea.indicador").count() == 1)

    val cert = Graft.certify(rows().select("data", "produto", "valor"),
      Seq("data", "produto", "valor"), "data", "valor",
      asOf = "2024-01-12", maxAgeDays = 7, minValue = 0, maxValue = 1000)
    assert(cert.collect()(0).getAs[String]("level") == "GOLD")

    intercept[NoSuchElementException] { Graft.dataset("nope") }
  }

  test("standard dataset catalog: landing-zone read, fallback, normalize") {
    val base = java.nio.file.Files.createTempDirectory("graft_landing").toString
    val snap = java.nio.file.Files.createTempDirectory("graft_snapdir").toString
    val names = graft.datasets.StandardDatasets.register(spark, base, Some(snap))
    assert(names.size == 6 && names.contains("preco_diario"))

    // land normalized-ready data for preco_diario
    Seq(("2024-01-10", "Sojá ", 130.5)).toDF("data", "produto", "valor")
      .withColumn("data", col("data").cast("date"))
      .withColumn("valor", col("valor").cast("decimal(18,4)"))
      .withColumn("unidade", lit("BRL/sc60kg"))
      .withColumn("praca", lit(null).cast("string"))
      .withColumn("variacao_percentual", lit(null).cast("decimal(18,4)"))
      .write.parquet(s"$base/preco_diario")
    val (df, meta) = Graft.dataset("preco_diario").fetch()
    assert(meta.source == "landing:preco_diario")
    assert(df.select("produto").as[String].head() == "soja") // normalized

    // missing landing zone -> snapshot fallback
    Seq(("2024-01-09", "soja", 129.0)).toDF("data", "produto", "valor")
      .withColumn("data", col("data").cast("date"))
      .withColumn("valor", col("valor").cast("decimal(18,4)"))
      .withColumn("unidade", lit("BRL/sc60kg"))
      .withColumn("praca", lit(null).cast("string"))
      .withColumn("variacao_percentual", lit(null).cast("decimal(18,4)"))
      .write.parquet(s"$snap/clima_diario_unused") // wrong name: keep clima missing
    intercept[graft.datasets.SourceUnavailable] {
      Graft.dataset("clima_diario").fetch()
    }
  }

  test("facade: curation verbs (dedup, near-dup join, ann)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "  ALPHA   beta GAMMA delta epsilon zeta "),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "totally unrelated words about other things entirely"))
      .toDF("doc_id", "text")
    assert(Graft.dedupExact(docs, col("doc_id"), col("text")).count() == 1)
    val pairs = Graft.nearDupPairs(docs, col("doc_id"), col("text"), tau = 0.4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)) && !pairs.exists(p => p._1 == 4L || p._2 == 4L))
    val vecs = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val top = Graft.annTopK(vecs.filter(col("vec_id") =!= 1L),
      vecs.filter(col("vec_id") === 1L).select("embedding"), "embedding", 1)
      .orderBy(col("sim").desc).limit(1).select("vec_id").as[Long].head()
    assert(top == 3L)
  }

  test("facade: temporal, frequency, batch-ann and incremental-dedup verbs") {
    import java.sql.Timestamp
    def t(sec: Int) = new Timestamp(sec * 1000L)
    val probe = Seq((1L, 10L, t(50)), (2L, 10L, t(5))).toDF("pid", "k", "ts")
    val build = Seq((10L, t(40), 7.0), (10L, t(60), 9.0)).toDF("k", "ts", "payload")
    val asof = Graft.asofJoin(probe, build, Seq("k"), "ts", "payload")
      .select($"pid", $"payload").as[(Long, Option[Double])].collect().toMap
    assert(asof == Map(1L -> Some(7.0), 2L -> None))

    val iv = Seq((1L, 0L, 0L, 100L)).toDF("iv", "k", "lo", "hi")
    val pts = Seq((1L, 0L, 50L), (2L, 0L, 500L)).toDF("pt_id", "k", "pt")
    assert(Graft.rangeJoin(iv, pts, Seq("k"), "pt", "lo", "hi", 10L)
      .select($"pt_id").as[Long].collect().toSeq == Seq(1L))

    val items = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i"))
      .toDF("token")
    val hh = Graft.heavyHitters(items, "token", 9).as[(String, Long)]
      .collect().toMap
    assert(hh == Map("hot" -> 60L))

    val scored = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))
      .toDF("qid", "vec_id", "sim")
    assert(Graft.annTopKBatch(scored, "qid", "vec_id", "sim", 2)
      .select($"vec_id").as[Long].collect().toSet == Set(10L, 11L))

    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq((100L, "alpha beta gamma delta epsilon zeta eta"),
      (101L, "wholly different content here entirely now")).toDF("doc_id", "text")
    val inc = Graft.incrementalDedup(corpus, batch, col("doc_id"), col("text"),
      k = 3, tau = 0.5).select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(inc == Set((1L, 100L)))
  }

  test("facade: script-aware dedup routes zh through char shingles") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en"),
      (2L, "alpha beta gamma delta epsilon zeta eta", "en"),
      (3L, "今天的天气很好我们一起去公园散步吧这是一个测试文档", "zh"),
      (4L, "今天的天气很好我们一起去公园散步吧这是一个测试文档了", "zh"),
      (5L, "完全不同的内容讲述另外一个故事与前面毫无关系", "zh"))
      .toDF("doc_id", "text", "lang")
    val pairs = Graft.nearDupPairsByScript(docs, $"doc_id", $"text", $"lang",
        tau = 0.5)
      .select($"id1", $"id2", $"route").as[(Long, Long, String)].collect().toSet
    assert(pairs == Set((1L, 2L, "word"), (3L, 4L, "char")),
      s"expected one pair per script route, got $pairs")
  }

  test("facade: curation verbs (repetition, decontaminate, spans)") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),                       // one bigram everywhere
      (2L, "the quick brown fox jumps over the lazy dog now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val rep = Graft.repetitionStats(docs, "doc_id", "text")
      .select($"doc_id", $"top_bigram_frac").as[(Long, Double)].collect().toMap
    assert(rep(1L) == 1.0)           // "spam spam" is all 4 bigram slots
    assert(rep(2L) < 0.3 && rep(3L) < 0.3)

    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val cont = Graft.decontaminate(docs, bench, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(cont == Set((3L, 1L, 100L))) // doc 3 shares exactly one 8-gram

    val corpus = docs.unionByName(
      Seq((10L, "the quick brown fox jumps over the lazy dog not")).toDF("doc_id", "text"))
    val spans = Graft.duplicateSpans(corpus, "doc_id", "text", k = 5)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    // docs 2 and 10 share tokens 1..9 ("the ... dog"): 5-grams at pos 1..5
    assert(spans == Set((2L, 1L, 9L), (10L, 1L, 9L)), s"got $spans")
  }

  test("facade: round-4 verbs (semDedup, bloom join, bloom decontaminate, truncated ANN)") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over the lazy dog now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    // bloom-gated decontamination must equal the broadcast-exact verb
    val exact = Graft.decontaminate(docs, bench, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    val bloomed = Graft.decontaminateBloom(docs, bench, "doc_id", "text", n = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(bloomed == exact && exact.nonEmpty)

    val probe = (0L until 100L).map(i => (i, s"p$i")).toDF("k", "payload")
    val build = (0L until 100L by 10L).map(i => (i, s"b$i")).toDF("bk", "tag")
    val joined = Graft.bloomPrunedJoin(probe, build, "k", "bk", nBuildRows = 10)
      .select($"k", $"tag").as[(Long, String)].collect().toSet
    assert(joined == (0L until 100L by 10L).map(i => (i, s"b$i")).toSet)

    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = graft.ops.VectorSearch.trainCentroids(e, "vec_id", "embedding", c = 1, iters = 1)
    val survivors = Graft.semDedup(e, "vec_id", "embedding", cents, tau = 0.999)
    assert(survivors.count() > 0 && survivors.count() <= e.count())

    val top = Graft.annTopKTruncated(e.filter($"vec_id" =!= 0),
      e.filter($"vec_id" === 0), "embedding", Seq("vec_id"),
      coarseDims = 16, shortlist = Int.MaxValue, k = 5)
    assert(top.count() === 5)
  }

  test("scrubbing every detected span removes every duplicated gram from the corpus") {
    // real corpus + planted near-dups: detect all duplicated 5-gram
    // spans, scrub them from EVERY doc, and no originally-duplicated
    // gram may survive anywhere (each duplicated position is inside a
    // span by construction)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val planted = docs.filter($"doc_id" % 9 === 0)
      .select(($"doc_id" + 50000).as("doc_id"), $"text")
    val corpus = docs.unionByName(planted)
    val spans = graft.ops.Curation.duplicateSpans(corpus, "doc_id", "text", k = 5)
    val dupGrams = graft.ops.Curation
      .wordGramPositions(corpus, "doc_id", "text", 5)
      .groupBy($"g").agg(count(lit(1)).as("c")).filter($"c" > 1)
      .select($"g").as[String].collect().toSet
    assert(dupGrams.nonEmpty, "planted copies must produce duplicated grams")
    val scrubbed = graft.ops.Curation.scrubSpans(corpus, spans, "doc_id", "text")
      .select($"doc_id", $"clean_text".as("text"))
    val surviving = graft.ops.Curation
      .wordGramPositions(scrubbed.filter(length($"text") > 0), "doc_id", "text", 5)
      .filter($"g".isin(dupGrams.toSeq: _*))
      .count()
    assert(surviving == 0, s"$surviving duplicated grams survived the scrub")
  }

  test("a registered validator plugin runs inside the fused validation pass") {
    import graft.plugins._
    import graft.validate.AggRule
    Plugins.clear()
    var setUp = 0
    Plugins.register(new ValidatorPlugin {
      val meta = PluginMeta("nonneg-values", "1.0", "no negative event values")
      override def setup(): Unit = setUp += 1
      def rules(df: org.apache.spark.sql.DataFrame) = Seq(
        AggRule("plugin_value_nonneg", "error",
          sum(when($"value" < 0, 1L).otherwise(0L))))
    })
    val ev = graft.queries.T.load(spark, "/root/testdata/sf0.001", "events")
    val report = Plugins.validate(ev,
      baseRules = graft.validate.Semantic.eventSeriesRules())
    val byName = report.collect().map(r => r.getString(0) -> r).toMap
    // the plugin's rule is in the SAME report as the base rules —
    // i.e. it joined the fused pass, not a private scan
    assert(byName.contains("plugin_value_nonneg"))
    assert(byName.contains("value_not_null"))
    assert(setUp == 1, "plugin setup must run exactly once (lazy, deduped)")
    // the reference-parity (ok, messages) surface over the same rules
    val (ok, failed) = Plugins.get("nonneg-values").get
      .asInstanceOf[ValidatorPlugin].validate(ev)
    assert(ok && failed.isEmpty)
    assert(setUp == 1)
    Plugins.clear()
  }

  test("plan regression: events range predicates stay pushed down") {
    val q = graft.queries.QueryRegistry.byName("q02_filter_daterange")
      .fn(spark, "/root/testdata/sf0.001")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,") &&
      scan.contains("LessThan(ts,"),
      s"pushed ts range filters missing from plan:\n$scan")
  }
}
