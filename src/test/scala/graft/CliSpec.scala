package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files
import java.time.LocalDateTime

import graft.store.{KvCache, Policies}

/** D10 — each CLI verb drives the library against temp stores
  * (reference `cli.py:23-419`'s cache/snapshot/health commands; the
  * fetch verbs are covered by `verify`, exercised by the driver).
  */
class CliSpec extends SparkSuite {

  private def run(args: String*): String = {
    val buf = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(buf, true, "UTF-8")) {
      // Cli prints via println (Console.out); System.out stays untouched
      Cli.main(args.toArray)
    }
    buf.toString("UTF-8")
  }

  test("queries verb lists the whole registry with oracle kinds") {
    val out = run("queries")
    assert(out.linesIterator.size == graft.queries.QueryRegistry.all.size)
    assert(out.contains("q01_pricing_summary") && out.contains("oracle"))
  }

  test("plugins verb lists registered plugin metadata") {
    graft.plugins.Plugins.clear()
    assert(run("plugins").contains("no plugins registered"))
    graft.plugins.Plugins.register(new graft.plugins.ValidatorPlugin {
      val meta = graft.plugins.PluginMeta("cli-probe", "2.1", "cli listing probe")
      def rules(df: org.apache.spark.sql.DataFrame) = Nil
    })
    val out = run("plugins")
    assert(out.contains("cli-probe") && out.contains("2.1"))
    graft.plugins.Plugins.clear()
  }

  test("scaleup verb synthesizes a key-shifted multiple of a testdata dir") {
    val dst = s"${Files.createTempDirectory("graft_cli_scaleup")}/sf2x"
    run("scaleup", "/root/testdata/sf0.001", dst, "2")
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    val out = spark.read.parquet(s"$dst/lineitem.parquet")
    assert(out.count() == 2 * src, "fact tables must scale by the factor")
    // dims stay single-copy; keys never collide across replicas
    assert(spark.read.parquet(s"$dst/nation.parquet").count() ==
      spark.read.parquet("/root/testdata/sf0.001/nation.parquet").count())
    assert(out.select("l_orderkey").distinct().count() ==
      2 * spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey").distinct().count())
  }

  test("cache stats + purge-legacy verbs over a temp KV store") {
    val path = s"${Files.createTempDirectory("graft_cli_cache")}/kv"
    val kv = new KvCache(spark, path)
    val now = LocalDateTime.of(2024, 1, 10, 12, 0)
    kv.put(Policies.cacheKey("cepea", Map("produto" -> "soja"), "v2"),
      "cached-payload", ttlSeconds = 3600, staleMaxSeconds = 86400, now = now)
    kv.put("legacy-key-no-version", "old", 3600, 86400, now)
    kv.persist()

    val stats = run("cache", "stats", path)
    assert(stats.contains("entries: 2") && stats.contains("legacy keys: 1"))

    assert(run("cache", "purge-legacy", path).contains("purged 1 legacy keys"))
    val after = run("cache", "stats", path)
    assert(after.contains("entries: 1") && after.contains("legacy keys: 0"))
  }

  test("snapshot create/list/show/delete verbs over a temp snapshot root") {
    val base = Files.createTempDirectory("graft_cli_snap").toString
    assert(run("snapshot", "list", base).contains("no snapshots"))
    val created = run("snapshot", "create", base, "jan", "/root/testdata/sf0.001",
      "region", "nation")
    assert(created.contains("captured driver/region") &&
      created.contains("captured driver/nation"))
    val listed = run("snapshot", "list", base)
    assert(listed.linesIterator.size == 1 && listed.startsWith("jan") &&
      listed.contains("MB") && listed.contains("sources: driver"))
    val manifest = run("snapshot", "show", base, "jan")
    assert(manifest.contains("\"name\": \"jan\"") && manifest.contains("region"))
    assert(run("snapshot", "delete", base, "jan").contains("deleted snapshot 'jan'"))
    assert(run("snapshot", "list", base).contains("no snapshots"))
  }

  test("cache clear verb: by dataset prefix, then everything") {
    val path = s"${Files.createTempDirectory("graft_cli_cc")}/kv"
    val kv = new KvCache(spark, path)
    val now = LocalDateTime.of(2024, 1, 10, 12, 0)
    kv.put(Policies.cacheKey("cepea", Map("p" -> "soja"), "v2"), "a", 3600, 86400, now)
    kv.put(Policies.cacheKey("conab", Map("p" -> "milho"), "v2"), "b", 3600, 86400, now)
    kv.persist()
    assert(run("cache", "clear", path, "cepea").contains("cleared 1 entries"))
    assert(run("cache", "stats", path).contains("entries: 1"))
    assert(run("cache", "clear", path).contains("cleared 1 entries"))
    assert(run("cache", "stats", path).contains("entries: 0"))
  }

  test("doctor reports live environment facts; config show prints policies") {
    val doc = run("doctor")
    assert(doc.contains("spark.version") && doc.contains(spark.version))
    assert(doc.contains("registered queries") &&
      doc.contains(graft.queries.QueryRegistry.all.size.toString))
    assert(doc.contains("custom function registry") && doc.contains("ok") &&
      !doc.contains("BROKEN"))
    assert(doc.contains("testdata sf0.01") && doc.contains("present"))
    val cfg = run("config", "show")
    assert(cfg.contains("cepea") && cfg.contains("ttl=") &&
      cfg.contains("SLA tiers") && cfg.contains("critical"))
  }

  test("dataset list/fetch verbs over a temp landing dir") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val landing = Files.createTempDirectory("graft_cli_ds").toString
    Seq(("2024-01-10", "Soja", "BRL/sc60kg", 130.5))
      .toDF("data", "produto", "unidade", "valor")
      .withColumn("data", col("data").cast("date"))
      .withColumn("valor", col("valor").cast("decimal(18,4)"))
      .withColumn("praca", lit(null).cast("string"))
      .withColumn("variacao_percentual", lit(null).cast("decimal(18,4)"))
      .write.parquet(s"$landing/preco_diario")

    val listed = run("dataset", "list", landing)
    assert(listed.contains("preco_diario") && listed.contains("landing:preco_diario"))
    assert(listed.linesIterator.size ==
      graft.datasets.DatasetRegistry.list().size)

    val fetched = run("dataset", "fetch", landing, "preco_diario", "5")
    assert(fetched.contains("source: landing:preco_diario"))
    assert(fetched.contains("records: 1"))
    assert(fetched.contains("landing:preco_diario=ok"))
    assert(fetched.contains("soja")) // normalize ran (lower + accent strip)
  }

  test("health verb prints one status row per probed source") {
    val out = run("health")
    assert(out.contains("cepea") && out.contains("conab") && out.contains("ibge"))
  }

  test("reference-named source verbs alias the catalog entries (cli.py parity)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val landing = Files.createTempDirectory("graft_cli_src").toString
    Seq(("2024-01-10", "Soja", "BRL/sc60kg", 130.5))
      .toDF("data", "produto", "unidade", "valor")
      .withColumn("data", col("data").cast("date"))
      .withColumn("valor", col("valor").cast("decimal(18,4)"))
      .withColumn("praca", lit(null).cast("string"))
      .withColumn("variacao_percentual", lit(null).cast("decimal(18,4)"))
      .write.parquet(s"$landing/preco_diario")

    // `cepea indicador` must be exactly `dataset fetch preco_diario`
    val viaAlias = run("cepea", "indicador", landing, "5")
    assert(viaAlias.contains("dataset: preco_diario"))
    assert(viaAlias.contains("records: 1") && viaAlias.contains("soja"))

    val produtos = run("conab", "produtos", landing)
    assert(produtos.contains("soja") && produtos.contains("milho_2"),
      s"canonical crop list expected, got: $produtos")
  }

  test("tx verbs: history, DV delete, purge, vacuum over a temp table") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cli_tx").resolve("t").toString
    graft.store.TxStore.init(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v"), root)
    val del = run("tx", "delete", root, "k = 2")
    assert(del.contains("v2") && del.contains("k = 2"))
    assert(graft.store.TxStore.read(spark, root).count() == 2L)
    val purge = run("tx", "purge", root)
    assert(purge.contains("v3"))
    val hist = run("tx", "history", root)
    assert(hist.contains("delete_dv") && hist.contains("purge_deletes")
      && hist.contains("init"))
    val vac = run("tx", "vacuum", root, "2")
    assert(vac.contains("expired versions: 1"))
    // the committed view survives retention
    assert(graft.store.TxStore.read(spark, root)
      .as[(Long, Double)].collect().toSet == Set((1L, 10.0), (3L, 30.0)))
  }
}
