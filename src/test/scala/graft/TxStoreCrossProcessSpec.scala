package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.store.TxStore

/** The CROSS-PROCESS commit contract: two real JVMs race MERGE-commits
  * on one table, arbitrated only by [[TxStore.claimVersion]]'s
  * filesystem conditional put (the in-process commit monitor cannot
  * see across processes). Asserts the serializable-history outcome the
  * protocol promises:
  *
  *  - exactly one winner per version number — no version is ever
  *    claimed twice, and the two writers' win sets are disjoint;
  *  - the committed history is LINEAR and gapless (v1..v11 for
  *    1 init + 2×5 commits), every version parented on its
  *    predecessor;
  *  - no lost updates: the final snapshot contains the init row plus
  *    every row both writers committed;
  *  - time travel still resolves every intermediate version, and each
  *    version has exactly one more row than its parent (each commit
  *    was built on the version it claims to extend).
  *
  * The writers run [[TxRaceMain]] — retry-on-conflict loops, the
  * documented read-retry contract — launched with this (forked) test
  * JVM's own classpath and --add-opens flags.
  */
class TxStoreCrossProcessSpec extends SparkSuite {

  test("two JVMs race five commits each: one winner per version, linear history, no lost updates") {
    val root = Files.createTempDirectory("graft_xproc").resolve("t").toString
    import spark.implicits._
    TxStore.init(Seq((0L, "init")).toDF("pk", "payload"), root)

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    val addOpens: Seq[String] =
      ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
        .sliding(2).collect { case scala.collection.Seq("--add-opens", m) =>
          Seq("--add-opens", m) }.flatten.toSeq
    def launch(writerId: Int, resultFile: String): Process =
      new ProcessBuilder(
        (Seq(javaBin) ++ addOpens ++ Seq(
          "-Xmx2g", "-Dspark.ui.enabled=false",
          "-Dspark.sql.session.timeZone=UTC",
          "-cp", cp, "graft.TxRaceMain",
          root, writerId.toString, "5", resultFile)).asJava)
        .redirectErrorStream(true)
        .redirectOutput(new java.io.File(s"$resultFile.log"))
        .start()

    val r1 = s"$root.wins1"
    val r2 = s"$root.wins2"
    val (p1, p2) = (launch(1, r1), launch(2, r2))
    val ok1 = p1.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    val ok2 = p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    assert(ok1 && ok2, "race writers did not finish in time")
    def tailOf(f: String) = {
      val log = Paths.get(f + ".log")
      if (Files.exists(log)) Files.readString(log).takeRight(2000) else "<no log>"
    }
    assert(p1.exitValue() == 0, s"writer 1 failed:\n${tailOf(r1)}")
    assert(p2.exitValue() == 0, s"writer 2 failed:\n${tailOf(r2)}")

    def winsOf(f: String): Seq[(Int, Long)] =
      Files.readAllLines(Paths.get(f)).asScala.toSeq.filter(_.nonEmpty)
        .map { l => val Array(w, v) = l.split(","); (w.toInt, v.toLong) }
    val wins = winsOf(r1) ++ winsOf(r2)

    // exactly one winner per version, both writers landed all 5 commits
    assert(wins.size == 10, s"expected 10 wins, got $wins")
    assert(wins.map(_._2).distinct.size == 10,
      s"a version number was claimed twice: $wins")
    assert(wins.map(_._2).sorted == (2L to 11L),
      s"history must be gapless v2..v11, got ${wins.map(_._2).sorted}")

    // linear, gapless, correctly-parented manifest history
    val hist = TxStore.history(spark, root)
      .select("version", "parent").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    assert(hist.map(_._1).toSeq == (1L to 11L))
    assert(hist.tail.forall { case (v, par) => par.contains(v - 1) },
      s"non-linear parentage: ${hist.mkString(", ")}")

    // no lost updates: init row + every committed row survives
    val finalRows = TxStore.read(spark, root)
      .select("pk").as[Long].collect().toSet
    val wanted = Set(0L) ++
      (1 to 5).map(i => 1000L + i) ++ (1 to 5).map(i => 2000L + i)
    assert(finalRows == wanted, s"lost update: $finalRows != $wanted")

    // every intermediate version readable, each one row bigger than
    // its parent — each commit really extended the version it claimed
    val counts = (1L to 11L).map(v =>
      TxStore.readVersion(spark, root, v).count())
    assert(counts == (1L to 11L),
      s"version row counts must step by one: $counts")
  }
}
