package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plugins._

/** The four plugin kinds + registry semantics (reference
  * `plugins/__init__.py`): warn-on-override registration, lazy one-time
  * setup, priority-ordered parser dispatch, extension-keyed export,
  * source plugins composing into the D1 fallback chain.
  */
class PluginsSpec extends SparkSuite {
  import spark.implicits._

  test("parser plugins dispatch by canParse gate in priority order") {
    Plugins.clear()
    def parser(n: String, prio: Int, gate: String => Boolean) =
      new ParserPlugin {
        val meta = PluginMeta(n, "1.0", n)
        override def priority = prio
        def canParse(c: String) = gate(c)
        def parse(s: org.apache.spark.sql.SparkSession, c: String) = {
          import s.implicits._
          Seq((n, c.length)).toDF("parser", "len")
        }
      }
    Plugins.register(parser("csv-ish", 1, _.contains(";")))
    Plugins.register(parser("html-ish", 5, _.startsWith("<")))
    Plugins.register(parser("fallback", 0, _ => true))

    // the high-priority gate wins even though the csv gate also matches
    val out = Plugins.parse(spark, "<table>;</table>").get.collect()(0)
    assert(out.getString(0) == "html-ish")
    // no gate but the catch-all → fallback
    assert(Plugins.parse(spark, "plain").get.collect()(0).getString(0) == "fallback")
    Plugins.clear()
  }

  test("exporter plugins dispatch by extension and refuse unknown ones") {
    Plugins.clear()
    Plugins.register(new ExporterPlugin {
      val meta = PluginMeta("br-csv", "1.0", "semicolon csv")
      def extension = "csv"
      def export(df: DataFrame, path: String) = {
        df.coalesce(1).write.option("sep", ";").option("header", "true")
          .csv(path)
        path
      }
    })
    val dir = Files.createTempDirectory("graft_plugin_export")
    val out = Plugins.export(Seq((1, "a")).toDF("id", "v"), s"$dir/out", "csv")
    assert(spark.read.option("sep", ";").option("header", "true")
      .csv(out).count() == 1)
    intercept[IllegalArgumentException] {
      Plugins.export(Seq((1, "a")).toDF("id", "v"), s"$dir/out2", "xlsx")
    }
    Plugins.clear()
  }

  test("source plugin composes into the dataset fallback chain") {
    Plugins.clear()
    val src = Plugins.register(new SourcePlugin {
      val meta = PluginMeta("fixture-src", "1.0", "in-memory fixture")
      def fetch(s: org.apache.spark.sql.SparkSession) = {
        import s.implicits._
        Seq(("2024-01-10", "soja", 130.5)).toDF("data", "produto", "valor")
      }
    })
    val ds = src.asDatasetSource(spark, priority = 2)
    assert(ds.priority == 2 && ds.name == "fixture-src")
    assert(ds.fetch().count() == 1)
    Plugins.clear()
  }

  test("re-registration overrides and re-arms setup; unregister tears down") {
    Plugins.clear()
    var events = List.empty[String]
    def v(tag: String) = new ValidatorPlugin {
      val meta = PluginMeta("dup", "1.0", tag)
      override def setup(): Unit = events ::= s"setup-$tag"
      override def teardown(): Unit = events ::= s"teardown-$tag"
      def rules(df: DataFrame) = Nil
    }
    Plugins.register(v("a"))
    Plugins.get("dup")
    Plugins.register(v("b")) // override: the replacement must set up anew
    Plugins.get("dup")
    Plugins.get("dup") // still once
    assert(events.reverse == List("setup-a", "setup-b"))
    Plugins.unregister("dup")
    assert(events.reverse == List("setup-a", "setup-b", "teardown-b"))
    assert(Plugins.get("dup").isEmpty)
    assert(Plugins.list.isEmpty)
  }
}
