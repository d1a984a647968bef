package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ManifestTable

/** The manifest table as a REAL Structured Streaming source
  * (`graft.streaming.ManifestStreamProvider`): offsets are manifest
  * versions, each micro-batch is a manifest diff, checkpoint restart
  * resumes at the committed version, and a rewrite inside the offset
  * range fails the batch (append-only contract).
  */
class ManifestStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshPath(): String =
    Files.createTempDirectory("mstream").resolve("t").toString

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    (lo until hi).map(i => (i, i * 2)).toDF("k", "v").coalesce(1)
  }

  private def readTail(path: String) =
    spark.readStream
      .format("graft.streaming.ManifestStreamProvider")
      .option("path", path)
      .load()

  test("each micro-batch is the version delta; offsets are versions; " +
      "checkpoint restart resumes exactly-once") {
    val p = freshPath()
    val ckpt = Files.createTempDirectory("mstream_ckpt").toString
    ManifestTable.commitAppend(df(0, 10), p) // v1
    val seen = mutable.ArrayBuffer.empty[(Long, Seq[Long])]
    def start() = readTail(p).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        seen.synchronized {
          seen += ((batchId,
            batch.select("k").collect().map(_.getLong(0)).toSeq.sorted))
        }
        ()
      }
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      // first batch: the whole table (startingVersion default 0)
      assert(seen.map(_._2.size).sum == 10)
      assert(seen.flatMap(_._2).sorted == (0L until 10L))
      // append v2 while the stream runs: the next batch is ONLY v2's rows
      val before = seen.size
      ManifestTable.commitAppend(df(10, 15), p)
      q.processAllAvailable()
      assert(seen.size == before + 1)
      assert(seen.last._2 == (10L until 15L))
      // no data → no batch
      q.processAllAvailable()
      assert(seen.size == before + 1)
    } finally q.stop()

    // append v3 while the stream is DOWN; restart from the checkpoint
    ManifestTable.commitAppend(df(15, 18), p)
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      // exactly-once: only v3's rows are delivered after the restart
      assert(seen.flatMap(_._2).sorted == (15L until 18L),
        s"expected only v3 rows, got $seen")
    } finally q2.stop()
  }

  test("table-to-table pipeline: manifest source -> transform -> " +
      "exactly-once manifest sink; downstream tails upstream through a crash") {
    import spark.implicits._
    val up = freshPath()
    val down = freshPath()
    val ckpt = Files.createTempDirectory("mpipe_ckpt").toString
    ManifestTable.commitAppend(df(0, 10), up) // upstream v1
    def start() = graft.streaming.EventStream.appendEventFeed(
      readTail(up).withColumn("v", col("v") * 10), down)
      .option("checkpointLocation", ckpt)
      .start()

    val q = start()
    try {
      q.processAllAvailable()
      assert(ManifestTable.latest(spark, down).count() == 10L)
      ManifestTable.commitAppend(df(10, 14), up) // upstream v2
      q.processAllAvailable()
      assert(ManifestTable.latest(spark, down).count() == 14L)
    } finally q.stop()
    // upstream commits while the pipeline is down; restart resumes the
    // cursor AND the sink's txn dedup absorbs any batch replay
    ManifestTable.commitAppend(df(14, 16), up)   // upstream v3
    val q2 = start()
    try {
      q2.processAllAvailable()
      val end = ManifestTable.latest(spark, down)
      assert(end.count() == 16L, s"got ${end.count()}")
      // transform applied, no duplicates anywhere in the chain
      assert(end.agg(sum("v")).head.getLong(0) ==
        (0L until 16L).map(_ * 2 * 10).sum)
      assert(end.select("k").distinct().count() == 16L)
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger: a backfill advances one version per batch " +
      "and the cap survives a checkpoint restart") {
    val p = freshPath()
    val ckpt = Files.createTempDirectory("mcap_ckpt").toString
    ManifestTable.commitAppend(df(0, 4), p)   // v1
    ManifestTable.commitAppend(df(4, 7), p)   // v2
    ManifestTable.commitAppend(df(7, 9), p)   // v3
    val seen = mutable.ArrayBuffer.empty[Seq[Long]]
    def start() = spark.readStream
      .format("graft.streaming.ManifestStreamProvider")
      .option("path", p)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        seen.synchronized {
          seen += batch.select("k").collect().map(_.getLong(0)).toSeq.sorted
        }
        ()
      }
      .start()
    val q = start()
    try {
      q.processAllAvailable()
      // three versions → three rate-limited batches, in commit order
      assert(seen.toSeq == Seq(0L until 4L, 4L until 7L, 7L until 9L),
        s"got $seen")
    } finally q.stop()
    // two more commits while down; restart resumes the ladder from the
    // checkpointed rung, still one version per trigger
    ManifestTable.commitAppend(df(9, 11), p)  // v4
    ManifestTable.commitAppend(df(11, 12), p) // v5
    seen.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.toSeq == Seq(9L until 11L, 11L until 12L), s"got $seen")
    } finally q2.stop()
  }

  test("stateful op over the real source: trendingTokens driven by the " +
      "manifest table matches the MemoryStream twin batch-for-batch") {
    import spark.implicits._
    import graft.streaming.DocStream
    import graft.streaming.DocStream.{DocRec, TokenSketch}
    val p = freshPath()
    val b1 = Seq(
      DocRec("en", 1L, "alpha beta beta gamma"),
      DocRec("en", 2L, "beta gamma gamma delta"),
      DocRec("de", 3L, "eins zwei zwei"))
    val b2 = Seq(
      DocRec("en", 4L, "gamma gamma epsilon"),
      DocRec("de", 5L, "zwei drei drei drei"))
    ManifestTable.commitAppend(b1.toDF(), p) // v1
    val got = mutable.Map.empty[String, TokenSketch]
    val q = spark.readStream
      .format("graft.streaming.ManifestStreamProvider")
      .option("path", p).load()
      .as[DocRec]
      .transform(DocStream.trendingTokens(_, k = 4))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("mstate_ckpt").toString)
      .foreachBatch { (batch: Dataset[TokenSketch], _: Long) =>
        got.synchronized {
          batch.collect().foreach(s => got(s.lang) = s)
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      ManifestTable.commitAppend(b2.toDF(), p) // v2 → state evolves
      q.processAllAvailable()
    } finally q.stop()
    // the MemoryStream twin over the same two batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[DocRec]
    val want = mutable.Map.empty[String, TokenSketch]
    val q2 = DocStream.trendingTokens(mem.toDS(), k = 4)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[TokenSketch], _: Long) =>
        want.synchronized {
          batch.collect().foreach(s => want(s.lang) = s)
        }
        ()
      }
      .start()
    try {
      mem.addData(b1: _*); q2.processAllAvailable()
      mem.addData(b2: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(got.keySet == Set("en", "de"))
    assert(got.toMap.map { case (k, v) => k -> (v.tokens, v.counts) } ==
      want.toMap.map { case (k, v) => k -> (v.tokens, v.counts) })
  }

  test("startingVersion skips consumed history; a rewrite in the offset " +
      "range fails the batch (append-only contract)") {
    val p = freshPath()
    ManifestTable.commitAppend(df(0, 10), p)  // v1
    ManifestTable.commitAppend(df(10, 20), p) // v2
    val seen = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .format("graft.streaming.ManifestStreamProvider")
      .option("path", p)
      .option("startingVersion", "1")
      .load()
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("mstream_ckpt2").toString)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        seen.synchronized {
          seen ++= batch.select("k").collect().map(_.getLong(0))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.sorted == (10L until 20L), s"expected v2 only, got $seen")
      // a DELETE commits a rewrite: the next batch must fail loudly,
      // not re-emit the rewritten file's surviving rows as "new"
      ManifestTable.extendStats(spark, p, 2L, Seq("k"))
      ManifestTable.deleteWhere(spark, p, "k", 0L, 4L) // v3 rewrites v1 file
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(ex.getMessage.contains("not an append") ||
        Option(ex.getCause).exists(_.getMessage.contains("not an append")))
    } finally q.stop()
  }

  test("OPTIMIZE mid-stream: the compaction rewrite refuses loudly, and a " +
      "consumer resumes past the boundary without re-emitting history") {
    val p = freshPath()
    ManifestTable.commitAppend(df(0, 10), p)  // v1
    ManifestTable.commitAppend(df(10, 20), p) // v2
    val seen = mutable.ArrayBuffer.empty[Long]
    def sink(buf: mutable.ArrayBuffer[Long]) =
      (batch: Dataset[Row], _: Long) => {
        buf.synchronized { buf ++= batch.select("k").collect().map(_.getLong(0)) }
        ()
      }
    val q = readTail(p).writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("mstream_ckpt3").toString)
      .foreachBatch(sink(seen)).start()
    try {
      q.processAllAvailable()
      assert(seen.sorted == (0L until 20L))
      // OPTIMIZE is a rewrite: the running consumer must fail the
      // batch (double-emitting the compacted files would duplicate
      // every row it already processed)
      val v3 = ManifestTable.compact(spark, p, targetFiles = 1)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
      assert(ex.getMessage.contains("not an append") ||
        Option(ex.getCause).exists(_.getMessage.contains("not an append")))
      q.stop()
      // the runbook: restart pinned AT the compacted version — history
      // (now living in the compacted files) is skipped, only future
      // appends emit
      val resumed = mutable.ArrayBuffer.empty[Long]
      val q2 = spark.readStream
        .format("graft.streaming.ManifestStreamProvider")
        .option("path", p)
        .option("startingVersion", v3.toString)
        .load()
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("mstream_ckpt4").toString)
        .foreachBatch(sink(resumed)).start()
      try {
        q2.processAllAvailable()
        assert(resumed.isEmpty, s"compacted history must not re-emit: $resumed")
        ManifestTable.commitAppend(df(20, 25), p) // v4: a real new append
        q2.processAllAvailable()
        assert(resumed.sorted == (20L until 25L), s"only the append: $resumed")
      } finally q2.stop()
    } finally if (q.isActive) q.stop()
  }
}
