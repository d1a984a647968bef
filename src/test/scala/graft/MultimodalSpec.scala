package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload plumbing: schema, determinism, no driver collect") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val feats = Multimodal.decodeFeatures(Multimodal.withPayload(docs))
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_bytes") == 3L)
    assert(rows(1L).getAs[Long]("frame_count") == 1L)
    // 'a'+'b'+'c' = 294 / 3 = 98.0
    assert(rows(1L).getAs[Double]("mean_byte") == 98.0)
    assert(math.abs(rows(1L).getAs[Seq[Double]]("features").sum - 1.0) < 1e-9)
    assert(rows(2L).getAs[Long]("n_bytes") == 0L)
  }
}
