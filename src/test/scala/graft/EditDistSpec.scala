package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.EditDist

class EditDistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation: classic full-matrix Levenshtein. */
  private def naive(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    val dp = Array.tabulate(m + 1, n + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to m; j <- 1 to n)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(m)(n)
  }

  private val asciiStr: Gen[String] =
    Gen.listOf(Gen.oneOf(('a' to 'f') :+ ' ')).map(_.mkString)

  test("banded equals the reference DP under threshold, -1 above (property)") {
    val prop = Prop.forAll(asciiStr, asciiStr, Gen.chooseNum(0, 12)) { (a, b, k) =>
      val got = EditDist.banded(a.getBytes("UTF-8"), b.getBytes("UTF-8"), k)
      val ed = naive(a, b)
      if (ed <= k) got == ed else got == -1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  // r18: banded() dispatches to bit-parallel Myers kernels (1-word for
  // m ≤ 64, 2-word for m ≤ 128, DP above) after common prefix/suffix
  // stripping — every regime and boundary must agree with the naive DP.
  test("bit-parallel kernels equal the reference DP across all length regimes (property)") {
    val longStr: Gen[String] = for {
      len <- Gen.chooseNum(0, 160)
      cs <- Gen.listOfN(len, Gen.oneOf(('a' to 'f') :+ ' '))
    } yield cs.mkString
    val prop = Prop.forAll(longStr, longStr, Gen.chooseNum(0, 60)) { (a, b, k) =>
      val got = EditDist.banded(a.getBytes("UTF-8"), b.getBytes("UTF-8"), k)
      val ed = naive(a, b)
      if (ed <= k) got == ed else got == -1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(800), prop)
    assert(res.passed, res.status.toString)
  }

  test("near-dup shapes: shared prefixes/suffixes and word-boundary lengths") {
    val rnd = new scala.util.Random(42)
    def rs(n: Int) = (0 until n).map(_ => "abcdef 0123"(rnd.nextInt(11))).mkString
    // word-boundary pattern lengths around the 1-word/2-word/DP splits
    for (m <- Seq(1, 2, 63, 64, 65, 100, 127, 128, 129, 140);
         dn <- Seq(0, 1, 7); k <- Seq(0, 3, 45, 120)) {
      val a = rs(m)
      val b0 = rs(m + dn)
      // plus structured near-dups: an edit in the middle of a copy
      val b1 = if (m > 2) a.updated(m / 2, 'z') else a
      for (b <- Seq(b0, b1, a, "")) {
        val got = EditDist.banded(a.getBytes("UTF-8"), b.getBytes("UTF-8"), k)
        val ed = naive(a, b)
        val want = if (ed <= k) ed else -1
        assert(got == want, s"m=$m k=$k a='$a' b='$b': got $got want $want")
      }
    }
  }

  test("bedit column selects exactly the builtin levenshtein rows (codegen path)") {
    val rnd = new scala.util.Random(7)
    def s() = (0 until (40 + rnd.nextInt(80)))
      .map(_ => "abcdef 0123"(rnd.nextInt(11))).mkString
    val base = s()
    val rows = (1 to 300).map { i =>
      // mix: unrelated strings, near-copies with a few edits, exact dups
      val t = rnd.nextInt(3) match {
        case 0 => s()
        case 1 => base.updated(rnd.nextInt(base.length), 'z').take(base.length - rnd.nextInt(3))
        case _ => base
      }
      (i.toLong, base, t)
    }
    val df = rows.toDF("id", "pa", "pb")
    graft.functions.EditDist.register(spark)
    val got = df.withColumn("ed", expr("bedit(pa, pb, 45)"))
      .select("id", "ed").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = df
      .withColumn("l", levenshtein(col("pa"), col("pb")))
      .select(col("id"), when(col("l") <= 45, col("l")).otherwise(lit(-1)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expect)
  }
}
