package graft

import org.apache.spark.sql.functions.expr
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Laws behind q31's exact percentiles: the distributed evaluation
  * must be PARTITIONING-INVARIANT (partial buffers merged across any
  * split equal the single-partition fold — the property Catalyst
  * assumes when it map-side-combines), and the result must equal the
  * shared interpolation definition `lower + (upper-lower)·frac` at
  * rank p·(n-1) — the definition Spark `percentile` and DuckDB
  * `quantile_cont` both implement, which is why q31 can hash-match
  * its oracle bit-exactly over integral inputs. Randomized multisets
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

  /** The interpolation definition, written exactly as both engines
    * compute it (same parse tree → same IEEE op order).
    */
  private def reference(vals: Seq[Int], p: Double): Double = {
    val sorted = vals.sorted.map(_.toDouble)
    val rank = p * (sorted.size - 1)
    val lo = math.floor(rank).toInt
    val hi = math.ceil(rank).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (rank - lo)
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
