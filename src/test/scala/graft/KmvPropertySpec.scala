package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch
import graft.functions.KmvSketch.KmvBuf

/** The KMV laws that make p14's oracle contract sound. KMV is
  * stronger than Misra-Gries here: the buffer itself is a pure
  * function of the input SET (the k smallest distinct unsigned
  * hashes), so the laws are exact EQUALITIES on the buffer, not just
  * bound guarantees:
  *  - split invariance: any partitioning + merge tree yields the
  *    bit-identical sketch (what licenses Catalyst to pick any
  *    partial-aggregation shape);
  *  - merge is commutative with zero as identity;
  *  - order invariance: reduce order never matters;
  *  - exactness below k: fewer than k distinct hashes → the estimate
  *    equals the true distinct count;
  *  - estimator accuracy above k on a deterministic pseudo-random
  *    stream (expected rel. error ~ 1/sqrt(k-2)).
  */
class KmvPropertySpec extends AnyFunSuite {

  private val hashGen: Gen[Long] = Gen.long
  private val streamGen: Gen[List[Long]] = Gen.listOf(hashGen)
  private val kGen: Gen[Int] = Gen.chooseNum(2, 32)

  private def sketchOf(agg: KmvSketch.Kmv, rows: List[Long]): KmvBuf =
    rows.foldLeft(agg.zero)(agg.reduce)

  private def viaSplits(agg: KmvSketch.Kmv, rows: List[Long],
      cuts: List[Int]): KmvBuf = {
    val n = rows.size
    val points = (cuts.map(c => if (n == 0) 0 else math.abs(c % (n + 1))) :+ 0 :+ n)
      .distinct.sorted
    val parts = points.zip(points.tail).map { case (a, b) => rows.slice(a, b) }
    parts.map(sketchOf(agg, _)).foldLeft(agg.zero)(agg.merge)
  }

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("split invariance: every partial-aggregation tree gives the identical buffer") {
    check("split-invariance", Prop.forAll(kGen, streamGen, Gen.listOf(Gen.posNum[Int])) {
      (k, rows, cuts) =>
        val agg = new KmvSketch.Kmv(k)
        viaSplits(agg, rows, cuts) == sketchOf(agg, rows)
    })
  }

  test("merge is commutative and zero is an identity") {
    check("merge-laws", Prop.forAll(kGen, streamGen, streamGen) { (k, a, b) =>
      val agg = new KmvSketch.Kmv(k)
      val (sa, sb) = (sketchOf(agg, a), sketchOf(agg, b))
      agg.merge(sa, sb) == agg.merge(sb, sa) &&
        agg.merge(sa, agg.zero) == sa && agg.merge(agg.zero, sa) == sa
    })
  }

  test("order invariance: shuffled input gives the identical buffer") {
    check("order-invariance", Prop.forAll(kGen, streamGen, Gen.long) { (k, rows, seed) =>
      val agg = new KmvSketch.Kmv(k)
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      sketchOf(agg, shuffled) == sketchOf(agg, rows)
    })
  }

  test("buffer invariant: canonical form sorted unsigned ascending, distinct, size <= k") {
    // the buffer itself is lazily compacted (pending appends are
    // allowed to be unsorted/duplicated); the invariant is a property
    // of the CANONICAL form — which is also what finish() and every
    // cross-buffer comparison observe
    check("invariant", Prop.forAll(kGen, streamGen) { (k, rows) =>
      val agg = new KmvSketch.Kmv(k)
      val h = sketchOf(agg, rows).compacted.hashes
      h.size <= k && h.size == h.distinct.size &&
        h.zip(h.drop(1)).forall { case (a, b) =>
          java.lang.Long.compareUnsigned(a, b) < 0 }
    })
  }

  test("exact below k: estimate equals true distinct count") {
    check("exact-below-k", Prop.forAll(streamGen) { rows =>
      val distinct = rows.distinct.size
      val agg = new KmvSketch.Kmv(distinct + 2)
      agg.finish(sketchOf(agg, rows)) == distinct.toDouble
    })
  }

  test("estimator accuracy above k on a deterministic LCG stream") {
    // 20k distinct "hashes" from a fixed 64-bit LCG (so the test is
    // not flaky), k = 256 → expected rel. error ~6%; assert < 15%,
    // the same tolerance p14 declares.
    val n = 20000
    var x = 0x9E3779B97F4A7C15L
    val hashes = Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x
    }
    val agg = new KmvSketch.Kmv(256)
    // Duplicate every hash 3× in interleaved order: distinct count
    // must not be inflated by multiplicity.
    val rows = (hashes ++ hashes ++ hashes).toList
    val est = agg.finish(sketchOf(agg, rows))
    val relErr = math.abs(est - n) / n
    assert(relErr < 0.15, s"estimate $est vs true $n (rel err $relErr)")
  }

  test("union homomorphism: unionEstimate(sig A, sig B) == estimate over A ++ B") {
    // The law p20's sketch algebra rests on: combining two signatures
    // gives EXACTLY the estimate a single sketch over the concatenated
    // streams would give — unions need no second pass over the data.
    val prop = Prop.forAll(streamGen, streamGen, kGen) { (xs, ys, k) =>
      val agg = new KmvSketch.Kmv(k)
      val sigA = sketchOf(agg, xs).hashes
      val sigB = sketchOf(agg, ys).hashes
      val direct = agg.finish(sketchOf(agg, xs ++ ys))
      KmvSketch.unionEstimate(sigA, sigB, k) == direct
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
