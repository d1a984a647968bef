package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compressed-payload ingestion: the shape a 100 TB crawl corpus
  * actually arrives in (WARC and most text dumps are gzip members).
  * The codec is the JDK's `java.util.zip` — public, pure JVM — run
  * PER PAYLOAD on executors via a typed mapPartitions, exactly where
  * a production reader decompresses object-store blobs.
  *
  * Scale note (the reason this is a first-class source op): gzip is
  * NOT splittable — one member must be decompressed by one task, so
  * at 100 TB parallelism comes from the NUMBER of objects/members,
  * never from intra-file splits. The per-payload seam here is the
  * honest unit; a reader that pretended to split .gz would corrupt.
  * Decompressed payloads should feed downstream codegen (length/md5/
  * parse) without re-serializing to the driver — the query keeps
  * everything inside the scan stage.
  */
object CompressedIngest {

  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, bytes.length / 3))
    val gz = new GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  /** Inflate one gzip member; throws `java.util.zip.ZipException` on a
    * non-gzip payload (loud failure, never garbage bytes).
    */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try in.readAllBytes() finally in.close()
  }

  // Encoder-backed row shapes — must be non-private: Catalyst's
  // generated (de)serializers instantiate them from synthesized code.
  case class DocText(doc_id: Long, text: String)
  case class DocGz(doc_id: Long, gz: Array[Byte])
  case class DocBytes(doc_id: Long, payload: Array[Byte])

  /** The documents corpus as gzip payloads (doc_id, gz: binary),
    * compressed ON EXECUTORS — the fixture half standing in for a
    * directory of .gz objects (payload bytes never transit the
    * driver).
    */
  def gzipPayloads(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col(textCol).as("text"))
      .as[DocText]
      .mapPartitions(_.map(d =>
        DocGz(d.doc_id, gzip(d.text.getBytes("UTF-8")))))
      .toDF()
  }

  /** Decompress gzip payloads back to raw bytes (doc_id, payload) —
    * one member per task-row, zero shuffle; downstream stats run as
    * codegen expressions over the binary column.
    */
  def gunzipPayloads(gzDocs: DataFrame): DataFrame = {
    val spark = gzDocs.sparkSession
    import spark.implicits._
    gzDocs.select(col("doc_id"), col("gz"))
      .as[DocGz]
      .mapPartitions(_.map(d => DocBytes(d.doc_id, gunzip(d.gz))))
      .toDF()
  }
}
