package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantizedDot

class QuantizedDotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = {
    QuantizedDot.register(spark)
    Seq(
      (1L, Array(0.5f, -0.25f), Array(2.0f, 4.0f)),
      (2L, Array(0.1f, 0.2f), Array(0.3f, 0.4f))).toDF("id", "a", "b")
  }

  test("native qdot matches the HOF formula bit-for-bit") {
    val hof = expr("aggregate(zip_with(a, b, (x, y) -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) * CAST(floor(CAST(y AS DOUBLE)*1000) AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    val rows = df.select(expr("qdot(a, b)").as("native"), hof.as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // floor(-0.25*1000) = -250; 500*2000 + (-250)*4000 = 0
    assert(rows.head.getLong(0) == 0L)
  }

  test("qdot survives both codegen and interpreted paths") {
    val withCodegen = df.select(expr("qdot(a, b)").as("s")).collect().map(_.getLong(0))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = df.select(expr("qdot(a, b)").as("s")).collect().map(_.getLong(0))
      assert(withCodegen.toSeq == interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null inputs and null elements are handled") {
    QuantizedDot.register(spark)
    val n = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(expr("qdot(a, b)")).collect().head
    assert(n.isNullAt(0)) // null array => null (BinaryExpression null-safety)
    val withNullElem = spark.sql(
      "SELECT qdot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT)))")
      .collect().head.getLong(0)
    assert(withNullElem == 1000000L) // null element counts as 0
  }

  test("type mismatch is a clear analysis error") {
    QuantizedDot.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT qdot(array(1, 2), array(3, 4))").collect())
    assert(e.getMessage.contains("qdot"))
  }
}
