package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries
import graft.functions.MisraGries.MGBuf

/** The Misra-Gries laws that make p9's oracle contract sound. Unlike
  * TopKAgg there is NO partitioning-invariance of the buffer itself —
  * counter values legitimately differ across merge orders — so the
  * laws are the sketch's GUARANTEES, which must hold for every
  * split/merge shape Catalyst might choose (driven directly on the
  * Aggregator, zipf-ish random streams):
  *  - presence: every token with true count > N/(k+1) is tracked;
  *  - estimate bounds: tracked counts never exceed the true count and
  *    undershoot by at most N/(k+1) (Mergeable Summaries, PODS'12);
  *  - zero is a merge identity.
  */
class MisraGriesPropertySpec extends AnyFunSuite {

  // Skewed alphabet: single-char tokens with geometric-ish weights so
  // heavy hitters actually exist in most samples.
  private val tokenGen: Gen[String] =
    Gen.frequency(
      (40, Gen.const("a")), (20, Gen.const("b")), (10, Gen.const("c")),
      (5, Gen.const("d")), (5, Gen.const("e")),
      (20, Gen.choose('f', 'z').map(_.toString)))

  private val streamGen: Gen[List[String]] = Gen.listOf(tokenGen)
  private val kGen: Gen[Int] = Gen.chooseNum(1, 10)

  /** Fold a stream through reduce with merges at the given cut points
    * — an arbitrary two-level partial-aggregation tree, the space of
    * evaluation orders Catalyst may pick.
    */
  private def viaSplits(agg: MisraGries.MG, rows: List[String],
      cuts: List[Int]): MGBuf = {
    val n = rows.size
    val points = (cuts.map(c => if (n == 0) 0 else c % (n + 1)) :+ 0 :+ n)
      .distinct.sorted
    val parts = points.zip(points.tail).map { case (a, b) => rows.slice(a, b) }
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("presence guarantee: true count > N/(k+1) implies tracked, any merge tree") {
    check("presence", Prop.forAll(streamGen, kGen, Gen.listOf(Gen.chooseNum(0, 1000))) {
      (rows, k, cuts) =>
        val agg = new MisraGries.MG(k)
        val buf = viaSplits(agg, rows, cuts)
        val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
        val n = rows.size.toLong
        exact.forall { case (t, f) =>
          f * (k + 1) <= n || buf.tokens.contains(t)
        }
    })
  }

  test("estimate bounds: true - N/(k+1) <= tracked count <= true count") {
    check("bounds", Prop.forAll(streamGen, kGen, Gen.listOf(Gen.chooseNum(0, 1000))) {
      (rows, k, cuts) =>
        val agg = new MisraGries.MG(k)
        val buf = viaSplits(agg, rows, cuts)
        val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = rows.size.toDouble
        buf.tokens.zip(buf.counts).forall { case (t, m) =>
          val f = exact.getOrElse(t, 0L)
          m <= f && m >= f - n / (k + 1)
        }
    })
  }

  test("zero is a merge identity and buffers stay within k counters") {
    check("identity", Prop.forAll(streamGen, kGen) { (rows, k) =>
      val agg = new MisraGries.MG(k)
      val buf = rows.foldLeft(agg.zero)(agg.reduce)
      agg.merge(buf, agg.zero) == buf &&
        agg.merge(agg.zero, buf) == buf &&
        buf.tokens.size <= k
    })
  }
}
