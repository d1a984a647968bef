package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKAgg
import graft.functions.TopKAgg.{Scored, TopBuf}

/** Algebraic laws the TopK Aggregator must satisfy for Catalyst to be
  * allowed to evaluate it distributed: partial buffers may be built in
  * any row order, merged in any grouping/order, and the result must
  * equal the sequential fold — these are exactly the properties the
  * planner assumes when it map-side-combines and tree-merges partials.
  * Checked over randomized inputs (including duplicate scores and ids,
  * the tiebreak paths) with ScalaCheck's engine driven directly (the
  * scalatest bridge artifact is not on the classpath).
  */
class TopKAggPropertySpec extends AnyFunSuite {

  private val scoredGen: Gen[Scored] = for {
    score <- Gen.chooseNum(-50L, 50L)
    id <- Gen.chooseNum(0L, 30L)
  } yield Scored(score, id)

  private val rowsGen: Gen[List[Scored]] = Gen.listOf(scoredGen)
  private val kGen: Gen[Int] = Gen.chooseNum(1, 8)

  private def reference(rows: Seq[Scored], k: Int): Seq[Scored] =
    rows.sortBy(s => (-s.score, s.id)).take(k)

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("sequential fold equals sort-take reference") {
    check("fold", Prop.forAll(rowsGen, kGen) { (rows, k) =>
      val agg = new TopKAgg.TopK(k)
      rows.foldLeft(agg.zero)(agg.reduce).rows == reference(rows, k)
    })
  }

  test("arbitrary partition split + merge equals the sequential fold") {
    check("split-merge", Prop.forAll(rowsGen, kGen, Gen.chooseNum(0, 100)) {
      (rows, k, cut) =>
        val agg = new TopKAgg.TopK(k)
        val at = if (rows.isEmpty) 0 else cut % (rows.size + 1)
        val (l, r) = rows.splitAt(at)
        agg.merge(
          l.foldLeft(agg.zero)(agg.reduce),
          r.foldLeft(agg.zero)(agg.reduce)).rows == reference(rows, k)
    })
  }

  test("merge is commutative and has zero as identity") {
    check("commutative", Prop.forAll(rowsGen, rowsGen, kGen) { (a, b, k) =>
      val agg = new TopKAgg.TopK(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba) &&
        agg.merge(ba, agg.zero) == ba && agg.merge(agg.zero, bb) == bb
    })
  }

  test("merge is associative") {
    check("associative", Prop.forAll(rowsGen, rowsGen, rowsGen, kGen) {
      (a, b, c, k) =>
        val agg = new TopKAgg.TopK(k)
        def buf(xs: List[Scored]): TopBuf = xs.foldLeft(agg.zero)(agg.reduce)
        agg.merge(agg.merge(buf(a), buf(b)), buf(c)) ==
          agg.merge(buf(a), agg.merge(buf(b), buf(c)))
    })
  }
}
