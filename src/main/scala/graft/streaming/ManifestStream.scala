package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.ManifestTable

/** A real Structured Streaming SOURCE over [[graft.sources.ManifestTable]]
  * — `spark.readStream.format("graft.streaming.ManifestStreamProvider")
  * .option("path", …).load()` tails the table the way Delta's
  * streaming source tails a Delta table:
  *
  *   - '''offsets ARE manifest versions''' (a `LongOffset` per
  *     committed version), so the checkpoint's offset log IS the
  *     consumer's cursor into the table history — restart resumes at
  *     the exact version the last batch committed, exactly-once with
  *     no source-side state;
  *   - '''each micro-batch is a manifest diff''' ([[ManifestTable
  *     .tailSince]]): the batch plans ONLY the files appended in
  *     (start, end] — O(delta-files) per trigger with zero data
  *     compared, which is what lets a consumer tail a 100 TB table
  *     that commits every minute;
  *   - '''the append-only contract is enforced per step''' — a
  *     delete/merge/compaction inside the offset range fails the
  *     batch loudly rather than re-emitting a rewritten file's
  *     surviving rows as "new" (Delta's streaming-source behavior,
  *     without the ignoreChanges opt-out).
  *
  * Implementation note: this is the V1 `Source` API (offset pair →
  * DataFrame), the same surface Spark's own FileStreamSource uses.
  * `getBatch` must return a STREAMING-tagged frame; the only door to
  * that tag is the package-private `internalCreateDataFrame`, reached
  * through [[PlanBridge.asStreaming]].
  */
class ManifestStreamProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-manifest"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = ManifestStreamProvider.pathOf(parameters)
    (shortName(),
      schema.getOrElse(
        ManifestTable.latest(sqlContext.sparkSession, path).schema))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ManifestSource(sqlContext, ManifestStreamProvider.pathOf(parameters),
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
}

object ManifestStreamProvider {
  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-manifest source requires .option(\"path\", <table root>)"))
}

/** See [[ManifestStreamProvider]]. `startV` is the version the stream
  * starts AFTER (0 = deliver the whole table as the first batch —
  * Delta's default; `startingVersion` skips history already consumed
  * elsewhere). `maxVersions` is Delta's maxFilesPerTrigger-class
  * admission control at version granularity: without it a fresh
  * consumer's FIRST trigger plans the entire table — on 100 TB that
  * is one multi-hour batch with no checkpoint inside it; capped, the
  * backfill advances (and checkpoints) every `maxVersions` commits.
  */
class ManifestSource(sqlContext: SQLContext, path: String, startV: Long,
    maxVersions: Option[Long] = None) extends Source {

  private val spark = sqlContext.sparkSession

  override val schema: StructType = ManifestTable.latest(spark, path).schema

  // the engine calls getOffset BEFORE getBatch each trigger; under a
  // cap, the admitted end must advance from the last ADMITTED offset,
  // which the engine hands back as getBatch's start — tracked here so
  // getOffset can continue the ladder (restart re-seeds it from the
  // checkpoint via getBatch's start offset).
  @volatile private var lastAdmitted: Long = startV

  /** Latest committed version as the available offset, clamped to
    * `maxVersions` above the last admitted rung — None until
    * something newer than `startV` exists.
    */
  override def getOffset: Option[Offset] = {
    val latest = ManifestTable.committedVersions(spark, path)
      .maxOption.getOrElse(0L)
    val admitted = maxVersions
      .fold(latest)(m => math.min(latest, lastAdmitted + m))
    if (admitted <= startV || admitted <= lastAdmitted) None
    else Some(LongOffset(admitted))
  }

  /** The rows committed in versions (start, end] — a manifest diff,
    * never a snapshot join. `start = None` is the engine's "from the
    * beginning" (first batch, or a restart that replays the last
    * uncommitted batch from the checkpointed offset pair).
    */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startV)
    val to = versionOf(end)
    // re-seed the admission ladder (the engine replays the offset
    // log's last entry through getBatch on restart, before the first
    // getOffset, so the cap resumes from the checkpointed rung)
    lastAdmitted = math.max(lastAdmitted, to)
    PlanBridge.asStreaming(ManifestTable.tailSince(spark, path, from, to))
  }

  // LongOffset.json is the version literal, and a checkpoint-restored
  // SerializedOffset carries the same json — one decoder covers both
  private def versionOf(o: Offset): Long = o.json.trim.toLong

  override def stop(): Unit = ()
}
