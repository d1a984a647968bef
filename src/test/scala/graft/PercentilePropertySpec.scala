package graft

import org.apache.spark.sql.functions.expr
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Laws behind q31's exact percentiles: the distributed evaluation
  * must be PARTITIONING-INVARIANT (partial buffers merged across any
  * split equal the single-partition fold — the property Catalyst
  * assumes when it map-side-combines), and the result must equal the
  * shared interpolation definition `lower + (upper-lower)·frac` at
  * rank p·(n-1), in Spark's exact operand order
  * `(hi-rank)·lower + (rank-lo)·upper` — a symmetric lerp that can
  * differ from the `lower + (upper-lower)·frac` form by one ULP
  * (e.g. vals [-2,1], p=0.9: 0.7000000000000001 vs …02), so the law
  * must be stated in the engine's own form. Randomized multisets
  * (duplicates included) × random partition counts; trial count kept
  * modest because every trial runs real Spark jobs.
  */
class PercentilePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ps = Seq(0.25, 0.5, 0.75, 0.9)

  private def sparkPercentiles(vals: Seq[Int], parts: Int): Seq[Double] = {
    import spark.implicits._
    vals.toDF("v").repartition(parts)
      .agg(expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"),
        expr("percentile(v, 0.9)").as("p90"))
      .head().toSeq.map(_.asInstanceOf[Double])
  }

  /** The interpolation definition in Spark's exact operand order
    * (Percentile.getPercentile): `(hi-rank)*lower + (rank-lo)*upper`,
    * degenerating to `lower` when the rank is integral.
    */
  private def reference(vals: Seq[Int], p: Double): Double = {
    val sorted = vals.sorted.map(_.toDouble)
    val rank = p * (sorted.size - 1)
    val lo = math.floor(rank).toLong
    val hi = math.ceil(rank).toLong
    if (lo == hi) sorted(lo.toInt)
    else (hi - rank) * sorted(lo.toInt) + (rank - lo) * sorted(hi.toInt)
  }

  test("percentile is partition-invariant and equals the interpolation law") {
    val valsGen = Gen.nonEmptyListOf(Gen.chooseNum(-100, 100))
    val prop = Prop.forAll(valsGen, Gen.chooseNum(1, 8)) { (vals, parts) =>
      val got = sparkPercentiles(vals, parts)
      val single = sparkPercentiles(vals, 1)
      val expect = ps.map(reference(vals, _))
      got == single && got == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"percentile laws: ${res.status}")
  }
}
