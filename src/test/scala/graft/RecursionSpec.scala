package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Recursion

class RecursionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("expand walks a chain to fixpoint") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val anchor = Seq(1).toDF("node").withColumn("depth", lit(1))
    val out = Recursion.expand(anchor, fr =>
      edges.join(fr, col("src") === col("node"))
        .select(col("dst").as("node"), (col("depth") + 1).as("depth")))
    val rows = out.orderBy("node").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq == Seq((1, 1), (2, 2), (3, 3), (4, 4)))
  }

  test("expand respects checkpoint interval (deep chain)") {
    val edges = (1 until 20).map(i => (i, i + 1)).toDF("src", "dst")
    val anchor = Seq(1).toDF("node")
    val out = Recursion.expand(anchor, fr =>
      edges.join(fr, col("src") === col("node")).select(col("dst").as("node")),
      maxDepth = 64, checkpointInterval = 4)
    assert(out.count() == 20)
  }

  test("expand throws on cycles at maxDepth") {
    val edges = Seq((1, 2), (2, 1)).toDF("src", "dst")
    val anchor = Seq(1).toDF("node")
    assertThrows[IllegalStateException] {
      Recursion.expand(anchor, fr =>
        edges.join(fr, col("src") === col("node")).select(col("dst").as("node")),
        maxDepth = 10).count()
    }
  }
}
