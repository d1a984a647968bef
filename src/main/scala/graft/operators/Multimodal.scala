package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("frame_count", LongType),
    StructField("mean_byte", DoubleType),
    StructField("features", ArrayType(DoubleType))))

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

  /** Per-partition batch decode: binary payloads → typed features.
    * Runs N-per-partition with zero shuffle; partition sizing is
    * inherited from the source (at 100 TB: bound partitions via
    * spark.sql.files.maxPartitionBytes so payload batches fit in
    * executor memory).
    */
  def decodeFeatures(docsWithPayload: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docsWithPayload.sparkSession
    val input = docsWithPayload.select(col(idCol).cast("long"), col("payload"))
    val rows = input.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (frames, mean, feats) = decodeStub(payload)
        Row(id, payload.length.toLong, frames, mean, feats.toSeq)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }
}
