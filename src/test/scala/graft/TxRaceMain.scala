package graft

import org.apache.spark.sql.SparkSession

import graft.store.TxStore

/** Forked-JVM writer for TxStoreCrossProcessSpec: a REAL separate
  * process racing MERGE-commits on a shared table, so the spec
  * exercises [[TxStore.claimVersion]]'s filesystem conditional put —
  * the arbitration the in-process commit monitor cannot provide.
  *
  * args: <tableRoot> <writerId> <nCommits> <resultFile>
  *
  * Each commit upserts one row keyed `writerId*1000 + i` and retries
  * on [[TxStore.ConcurrentCommitException]] (re-read base, re-merge —
  * the documented read-retry contract) until it wins. The versions
  * this writer WON are appended to `resultFile`, one
  * `writerId,version` line per win, for the spec's
  * exactly-one-winner-per-version assertion.
  */
object TxRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, writerIdS, nS, resultFile) = args.take(4)
    val (writerId, n) = (writerIdS.toInt, nS.toInt)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_race_wh_$writerId")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val wins = Seq.newBuilder[Long]
    (1 to n).foreach { i =>
      val row = Seq((writerId * 1000L + i, s"w$writerId-c$i"))
        .toDF("pk", "payload")
      var committed = false
      var attempts = 0
      while (!committed) {
        attempts += 1
        require(attempts <= 200, s"writer $writerId livelocked on commit $i")
        try {
          wins += TxStore.commitUpsert(spark, root, row, Seq("pk"))
          committed = true
        } catch {
          case _: TxStore.ConcurrentCommitException => Thread.sleep(20L)
        }
      }
    }
    val lines = wins.result().map(v => s"$writerId,$v").mkString("", "\n", "\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(resultFile), lines)
    spark.stop()
  }
}
