package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.0f, 1.0f, 0.0f), 0),
    (3L, Array(-1.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.95f, 0.05f, 0.0f), 1)).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by quantized dot, ties by id") {
    val top = Similarity.bruteForceTopK(emb, 0L, 4).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("score")))
    // float 0.95f < 0.95 exactly, so floor(0.95f*1000) = 949 (and 0.9f -> 899):
    // quantization is defined on the *actual* float values, not their decimals
    assert(top.map(_._1).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(top.head._2 == 949000L)
    assert(top(1)._2 == 899000L)
  }

  test("quantized dot is exact and order-independent") {
    val df = emb.filter(col("vec_id") === 1)
      .withColumn("n2", Similarity.qnorm2("embedding"))
    // 0.9f -> 899, 0.1f -> 100 (0.1f is slightly above 0.1)
    assert(df.collect().head.getAs[Long]("n2") == 899L * 899 + 100L * 100)
  }

  test("LSH top-k plan contains no cartesian product and returns neighbors") {
    val top = Similarity.lshTopK(emb, 0L, 3, planes = 2)
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"LSH candidate generation must be a bucket equi-join, got:\n$plan")
    val ids = top.collect().map(_.getAs[Long]("vec_id")).toSet
    assert(ids.nonEmpty)
    assert(ids.contains(1L) || ids.contains(4L)) // same-octant neighbors
  }

  test("blocked cosine pairs stay within label blocks") {
    val pairs = Similarity.blockedCosinePairs(emb, minCosBp = 9000)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((0L, 1L))) // only same-label near-parallel pair
  }

  test("brute-force matches LSH scores for shared candidates") {
    val bf = Similarity.bruteForceTopK(emb, 0L, 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("score")).toMap
    val lsh = Similarity.lshTopK(emb, 0L, 4, planes = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("score")).toMap
    lsh.foreach { case (id, score) => assert(bf(id) == score) }
  }
}
