package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.store.TxStore
import graft.streaming.Streaming

/** Kill-and-replay soak: stop a streaming query mid-stream, restart it
  * from the SAME checkpoint, and assert the terminal state is identical
  * to an uninterrupted run. StreamingSpec proves per-sink batch-id
  * idempotence by direct replay calls; these tests prove the
  * END-TO-END restart contract — offset recovery, state-store
  * recovery, and the crash window BETWEEN a sink's commit and the
  * checkpoint's commit marker (simulated by deleting the newest
  * `commits/<n>` file, which forces Spark to re-run that exact batch
  * id on restart — the replay every idempotent sink must absorb).
  */
class StreamingRestartSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Delete the newest commit marker so restart replays its batch. */
  private def dropLastCommitMarker(ckpt: String): Long = {
    val commits = Paths.get(ckpt, "commits")
    val s = Files.list(commits)
    val latest =
      try s.iterator().asScala
        .filter(_.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      finally s.close()
    Files.delete(latest)
    // Hadoop's local ChecksumFileSystem keeps a `.<n>.crc` sidecar; a
    // stale one makes the re-written marker's rename throw
    // FileAlreadyExists (surfaced as a bogus "multiple streaming
    // queries" error), so the simulated crash removes both files.
    Files.deleteIfExists(
      commits.resolve("." + latest.getFileName.toString + ".crc"))
    latest.getFileName.toString.toLong
  }

  test("upsert sink: crash between table commit and checkpoint marker; restart replays as a no-op and resumes") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("graft_rst_up") + "/t"
    val ckpt = tmp("graft_rst_upck")
    val in = MemoryStream[(Long, String, Double)]
    val src = in.toDF().toDF("k", "produto", "v")
    def rows(): Set[(Long, String, Double)] =
      TxStore.read(spark, root).as[(Long, String, Double)].collect().toSet

    var q = Streaming.upsertSink(src, root, Seq("k"), ckpt)
    try {
      in.addData((1L, "soja", 100.0), (2L, "milho", 50.0))
      q.processAllAvailable()
    } finally q.stop()
    val vBefore = TxStore.currentVersion(root).get
    val rowsBefore = rows()

    // the table committed batch 0 but the checkpoint "lost" its marker
    // (crash in the gap) — restart MUST re-run batch 0 and the sink's
    // batch-id high-water mark MUST drop it
    val replayedId = dropLastCommitMarker(ckpt)
    assert(TxStore.lastBatchId(root).contains(replayedId))
    q = Streaming.upsertSink(src, root, Seq("k"), ckpt)
    try {
      q.processAllAvailable()
      assert(TxStore.currentVersion(root).contains(vBefore),
        "replayed batch must not create a new version")
      assert(rows() == rowsBefore)
      // and the stream keeps going: post-restart updates land normally
      in.addData((2L, "milho", 75.0), (3L, "trigo", 30.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(rows() ==
      Set((1L, "soja", 100.0), (2L, "milho", 75.0), (3L, "trigo", 30.0)),
      "terminal state must equal an uninterrupted run")
  }

  test("curation sink: restart with forced replay never re-admits, then keeps curating") {
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("graft_rst_cur") + "/t"
    val ckpt = tmp("graft_rst_curck")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "one two three four five six seven eight nine ten eleven twelve"
    val e = "north south east west up down left right forward backward inward outward"
    val in = MemoryStream[(Long, String)]
    val src = in.toDF().toDF("doc_id", "text")
    def docs(): Set[Long] =
      TxStore.read(spark, root).select("doc_id").as[Long].collect().toSet

    var q = Streaming.curationSink(src, root, tau = 0.6, checkpoint = ckpt)
    try {
      in.addData((1L, a), (2L, b))
      q.processAllAvailable()
    } finally q.stop()
    assert(docs() == Set(1L, 2L))
    val vBefore = TxStore.currentVersion(root).get

    dropLastCommitMarker(ckpt)
    q = Streaming.curationSink(src, root, tau = 0.6, checkpoint = ckpt)
    try {
      // replayed batch: same docs again — corpus must not duplicate and
      // must not advance its version
      q.processAllAvailable()
      assert(docs() == Set(1L, 2L))
      assert(TxStore.currentVersion(root).contains(vBefore))
      // stream continues: novel doc admitted, near-dup of a PERSISTED
      // pre-restart doc rejected (proves the corpus side survived too)
      in.addData((5L, e), (6L, b + " tail"))
      q.processAllAvailable()
    } finally q.stop()
    assert(docs() == Set(1L, 2L, 5L),
      "terminal corpus must equal an uninterrupted run's")
  }

  test("ohlc bars: state store survives restart — pre-restart trades and a post-restart late tick fold into one bar") {
    implicit val sqlCtx = spark.sqlContext
    val out = tmp("graft_rst_ohlc_out")
    val ckpt = tmp("graft_rst_ohlcck")
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val src = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    def start() = Streaming.ohlcStream(src)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .start()

    var q = start()
    try {
      in.addData(
        (1L, ts("2024-01-01 00:10:00"), 1L, "trade", 10.0),
        (3L, ts("2024-01-01 03:00:00"), 1L, "trade", 30.0))
      q.processAllAvailable()
    } finally q.stop() // bar still OPEN in the state store at stop time
    // restart: the unfinalized bar must come back from the checkpointed
    // state store, absorb a LATE in-watermark tick that moves the open,
    // and finalize when the watermark passes — exactly as uninterrupted
    q = start()
    try {
      in.addData((2L, ts("2024-01-01 00:05:00"), 1L, "trade", 5.0))
      q.processAllAvailable()
      in.addData((99L, ts("2024-01-02 12:00:00"), 9L, "other", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val bars = spark.read.parquet(out)
      .select("bar_start", "event_type", "open", "high", "low", "close", "n")
      .as[(Timestamp, String, Double, Double, Double, Double, Long)]
      .collect().filter(_._2 == "trade").toSeq
    assert(bars == Seq(
      (ts("2024-01-01 00:00:00"), "trade", 5.0, 30.0, 5.0, 30.0, 3L)),
      "restarted bar must equal the uninterrupted StreamingSpec twin")
  }
}
