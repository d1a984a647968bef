package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) handled as
  * opaque `binary` payloads with typed metadata, decoded/featurized
  * per-partition.
  *
  * The decode step is a clearly-marked STUB — no media codecs exist in
  * this environment — producing a deterministic fake feature vector
  * (byte histogram moments). Everything around it is the real
  * distributed shape: binary column + schema, `mapPartitions` batch
  * processing (the Scala analogue of `mapInPandas` batches: amortizes
  * per-partition setup such as codec/model initialization), explicit
  * output schema, and no driver-side collection. Swapping the stub for
  * a real decoder changes one function.
  */
object Multimodal {

  // Non-nullable primitives: the typed encoder derives this from the
  // case class (primitives can't be null — tighter than the old
  // RDD-path schema, which had to declare everything nullable).
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("frame_count", LongType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** STUB decoder: deterministic fake "decode" of a binary payload —
    * 16-bin byte histogram (normalized) standing in for real image/
    * audio features. Replace with a codec call in production.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Double, Array[Double]) = {
    val hist = new Array[Double](16)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      hist(b >> 4) += 1.0
      sum += b
      i += 1
    }
    val n = math.max(payload.length, 1)
    val mean = sum.toDouble / n
    val frames = payload.length / 256L + 1L // fake frame sampling
    (frames, mean, hist.map(_ / n))
  }

  /** Attach a binary payload column (here: utf-8 bytes of the text —
    * the testdata has no real media; the *plumbing* is what's real).
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  case class PayloadIn(doc_id: Long, payload: Array[Byte])
  case class FeatureOut(doc_id: Long, n_bytes: Long, frame_count: Long,
      mean_byte: Double, features: Array[Double])

  /** Per-partition batch decode: binary payloads → typed features, as
    * a TYPED Dataset.mapPartitions (encoder-backed — stays on the
    * Tungsten serialization path rather than dropping to the RDD API
    * with driver-supplied Row schemas). The per-PARTITION iterator is
    * where a real decoder would hoist codec/model init, amortized over
    * the batch — the same shape `mapInPandas` gives Python. Zero
    * shuffle; partition sizing inherited from the source (at 100 TB:
    * bound via spark.sql.files.maxPartitionBytes so payload batches
    * fit in executor memory).
    */
  def decodeFeatures(docsWithPayload: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col(idCol).cast("long").as("doc_id"), col("payload"))
      .as[PayloadIn]
      .mapPartitions { batch =>
        // real-decoder version: init codec ONCE here, reuse across rows
        batch.map { p =>
          val (frames, mean, feats) = decodeStub(p.payload)
          FeatureOut(p.doc_id, p.payload.length.toLong, frames, mean, feats)
        }
      }
      .toDF()
  }

  /** Frame-sampling manifest: expand each "video" payload into one row
    * per SAMPLED frame (every `stride`-th of its `frameBytes`-sized
    * fake frames, matching decodeStub's frame arithmetic), carrying a
    * presentation timestamp and a content fingerprint of the frame's
    * leading bytes. The real-decoder swap point is the fingerprint
    * expression; the surrounding shape is production truth: a row-
    * local generate (posexplode of a computed index sequence), ZERO
    * shuffles, output partitioning inherited from the scan — at
    * 100 TB frame expansion must never be a shuffle, only a flatMap.
    */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 256, stride: Int = 4,
      fpWindow: Int = 16, fps: Int = 25): DataFrame = {
    val frameMs = 1000 / fps
    docs
      .select(col("doc_id"), col("text"),
        (length(col("text")).cast("long") / frameBytes + 1).cast("long")
          .as("frame_count"))
      .select(col("doc_id"), col("text"), col("frame_count"),
        posexplode(sequence(lit(0L), col("frame_count") - 1, lit(stride.toLong))))
      .select(col("doc_id"),
        col("col").as("frame_idx"),
        (col("col") * frameMs).as("ts_ms"),
        substring(md5(col("text").substr(
          (col("col") * frameBytes + 1).cast("int"), lit(fpWindow))), 1, 8)
          .as("frame_fp"))
  }
}
