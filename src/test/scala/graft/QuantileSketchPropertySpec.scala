package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch
import graft.functions.QuantileSketch.QBuf

/** Contract laws of the MRL quantile sketch: exact weight
  * conservation under any partitioning/merge tree, the ε rank bound
  * against sorted references, merge-of-merges ≡ one-shot (within the
  * bound), determinism under a fixed partitioning, and HOF-estimator
  * agreement with the JVM reference.
  */
class QuantileSketchPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 256
  private val EPS = 0.025
  private val QS = Seq(0.01, 0.25, 0.5, 0.9, 0.99)

  /** exact rank window check: est must sit between the values at
    * ranks ceil((q−ε)n) and ceil((q+ε)n) of the sorted data
    */
  private def inRankWindow(sorted: IndexedSeq[Long], est: Long,
      q: Double): Boolean = {
    val n = sorted.size
    val lo = math.max(1, math.ceil((q - EPS) * n).toInt)
    val hi = math.min(n, math.ceil((q + EPS) * n).toInt)
    sorted(lo - 1) <= est && est <= sorted(hi - 1)
  }

  private def collectSketch(data: Seq[Long], parts: Int): QBuf = {
    val row = data.toDF("v").repartition(parts)
      .agg(QuantileSketch.sketch(K)(col("v")).as("sk"))
      .selectExpr("sk.raw AS raw", "sk.levels AS levels")
      .as[QBuf].head()
    row
  }

  test("weight conservation and rank bound across distributions and partitionings") {
    val rnd = new scala.util.Random(2024)
    val datasets = Seq(
      (1 to 20000).map(_ => rnd.nextInt(100000).toLong),       // uniform
      (1 to 20000).map(_ => (math.abs(rnd.nextGaussian()) * 1e4).toLong), // half-normal
      (1 to 20000).map(i => if (i % 100 == 0) 1000000L else i % 37L), // heavy ties + outliers
      (1L to 777L)) // tiny (below one buffer: sketch is EXACT)
    for (data <- datasets; parts <- Seq(1, 7, 32)) {
      val sk = collectSketch(data, parts)
      assert(QuantileSketch.totalWeightOf(sk) == data.size,
        s"weight conservation (parts=$parts, n=${data.size})")
      val sorted = data.sorted.toIndexedSeq
      for (q <- QS) {
        val est = QuantileSketch.quantileOf(sk, q)
        assert(inRankWindow(sorted, est, q),
          s"rank bound q=$q parts=$parts n=${data.size}: est=$est")
      }
    }
  }

  test("below one buffer the sketch is exact at every quantile") {
    val data = (1L to 200L).map(_ * 3)
    val sk = collectSketch(data, 5)
    val sorted = data.sorted.toIndexedSeq
    for (q <- QS) {
      val want = sorted(math.max(1, math.ceil(q * sorted.size).toInt) - 1)
      assert(QuantileSketch.quantileOf(sk, q) == want, s"q=$q")
    }
  }

  test("merge-of-merges stays within the bound and conserves weight exactly") {
    val rnd = new scala.util.Random(99)
    val data = (1 to 30000).map(_ => rnd.nextInt(1000000).toLong)
    // leaves = 13 uneven chunks sketched independently, then folded
    val chunks = data.grouped(2345).toSeq
    val leaves = chunks.zipWithIndex
      .flatMap { case (c, i) => c.map(v => (i, v)) }
      .toDF("leaf", "v")
      .groupBy("leaf").agg(QuantileSketch.sketch(K)(col("v")).as("sk"))
    val merged = leaves
      .agg(QuantileSketch.mergeSketches(K)(col("sk")).as("sk"))
      .selectExpr("sk.raw AS raw", "sk.levels AS levels")
      .as[QBuf].head()
    assert(QuantileSketch.totalWeightOf(merged) == data.size)
    val sorted = data.sorted.toIndexedSeq
    for (q <- QS)
      assert(inRankWindow(sorted, QuantileSketch.quantileOf(merged, q), q),
        s"merged rank bound q=$q")
  }

  test("deterministic under a fixed partitioning; HOF estimator equals the JVM reference") {
    val data = (1 to 12000).map(i => (i.toLong * 2654435761L) % 999983L)
    val df = data.toDF("v").repartition(8, col("v"))
    def once() = df.agg(QuantileSketch.sketch(K)(col("v")).as("sk"),
      count(lit(1)).as("n"))
    val a = once().selectExpr("sk.raw AS raw", "sk.levels AS levels")
      .as[QBuf].head()
    val b = once().selectExpr("sk.raw AS raw", "sk.levels AS levels")
      .as[QBuf].head()
    assert(a == b, "same partitioning must re-produce the identical sketch")
    val hof = once().selectExpr(
      QuantileSketch.quantileExpr("sk", "n", 0.5) + " AS p50",
      QuantileSketch.quantileExpr("sk", "n", 0.9) + " AS p90",
      QuantileSketch.totalWeightExpr("sk") + " AS tw").head()
    assert(hof.getLong(0) == QuantileSketch.quantileOf(a, 0.5))
    assert(hof.getLong(1) == QuantileSketch.quantileOf(a, 0.9))
    assert(hof.getLong(2) == data.size)
  }
}
