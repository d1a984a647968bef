package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("recovers a planted dominant direction; components orthonormal, variances sorted") {
    // points = t·v + small orthogonal noise, fixed seed — the first
    // principal component must align with v
    val rnd = new scala.util.Random(11)
    val v = {
      val raw = Array(3.0, 1.0, 2.0, 0.5)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    val u = { // any direction not parallel to v (Gram-Schmidt vs v)
      val raw = Array(1.0, -1.0, 0.0, 1.0)
      val p = dot(raw, v)
      val o = raw.zip(v).map { case (r, vi) => r - p * vi }
      val n = math.sqrt(o.map(x => x * x).sum)
      o.map(_ / n)
    }
    val rows = (1 to 500).map { _ =>
      val t = rnd.nextGaussian() * 5.0
      val e = rnd.nextGaussian() * 0.3
      v.zip(u).map { case (vi, ui) => (t * vi + e * ui + 2.0).toFloat }
    }
    val df = rows.map(r => Tuple1(r)).toDF("embedding")
    val m = Pca.fit(df, k = 4)
    assert(m.n == 500L)
    // alignment with the planted direction (sign-free)
    val cos = math.abs(dot(m.components(0), v))
    assert(cos > 0.999, s"pc1 must align with the planted axis, cos=$cos")
    // variance sorted descending, dominant >> noise
    assert(m.variance.zip(m.variance.tail).forall { case (a, b) => a >= b })
    assert(m.variance(0) > 10 * m.variance(1), m.variance.mkString(","))
    // orthonormal basis
    for (i <- 0 until 4; j <- 0 until 4) {
      val d = dot(m.components(i), m.components(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<c$i,c$j> = $d")
    }
    // trace identity: Σ eigenvalues = total variance of the data
    val total = {
      val cols = rows.head.indices
      cols.map { c =>
        val xs = rows.map(_(c).toDouble)
        val mu = xs.sum / xs.size
        xs.map(x => (x - mu) * (x - mu)).sum / xs.size
      }.sum
    }
    assert(math.abs(m.variance.sum - total) < 1e-6,
      s"trace ${m.variance.sum} vs total $total")
  }

  test("exact 2-D case matches the analytic eigendecomposition") {
    // four points with covariance [[2.5, 1.5], [1.5, 2.5]]:
    // eigenvalues 4 and 1, eigenvectors (1,1)/√2 and (1,-1)/√2
    val pts = Seq(Array(2f, 2f), Array(-2f, -2f), Array(1f, -1f), Array(-1f, 1f))
    val m = Pca.fit(pts.map(Tuple1(_)).toDF("embedding"), k = 2)
    assert(math.abs(m.variance(0) - 4.0) < 1e-12 &&
      math.abs(m.variance(1) - 1.0) < 1e-12, m.variance.mkString(","))
    val s = 1.0 / math.sqrt(2.0)
    assert(m.components(0).zip(Array(s, s)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 }, m.components(0).mkString(","))
    assert(m.components(1).zip(Array(s, -s)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 }, m.components(1).mkString(","))
  }

  test("repartition-invariant to float tolerance; projection is shuffle-free") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(_ => Array.fill(6)((rnd.nextGaussian()).toFloat))
    val df = rows.map(r => Tuple1(r)).toDF("embedding")
    val m2 = Pca.fit(df.repartition(2), k = 3)
    val m7 = Pca.fit(df.repartition(7), k = 3)
    m2.components.zip(m7.components).foreach { case (a, b) =>
      assert(math.abs(math.abs(dot(a, b)) - 1.0) < 1e-6,
        "same basis regardless of partitioning") }
    m2.variance.zip(m7.variance).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6) }
    // projection: pure projection/codegen — no exchange, no join
    val proj = Pca.project(df, m2)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"projection must be scan-side only:\n$plan")
    // projected variance of pc1 equals the model variance (to fp tol)
    val xs = proj.select("pc").as[Seq[Double]].collect().map(_.head)
    val mu = xs.sum / xs.length
    val pv = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    assert(math.abs(pv - m2.variance(0)) < 1e-6, s"$pv vs ${m2.variance(0)}")
  }

  test("PCA-reduced ANN: recall contract on real embeddings (isotropy-honest)") {
    // the integration the operator exists for: search in PCA-reduced
    // space, measure recall of the full-space exact top-10 (s5's
    // recall-contract pattern). The synthetic embeddings are
    // near-ISOTROPIC (top-16 of 64 components carry only ~38% of
    // variance — measured, not assumed), so the honest contract is
    // not high absolute recall at aggressive reduction; it is that
    // recall is far above chance (10/499 ≈ 2%) and grows with k —
    // exactly the tradeoff curve a pipeline would consult before
    // choosing a reduction level. On a real text-embedding corpus
    // (sharply decaying spectrum) the same harness reads much higher.
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val df = emb.map(e => Tuple1(e._2)).toSeq.toDF("embedding")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val full = emb.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def top10(space: Map[Long, Array[Double]], q: Long): Set[Long] =
      space.keys.filter(_ != q).toSeq
        .sortBy(id => (-cos(space(q), space(id)), id)).take(10).toSet
    val queries = emb.take(10).map(_._1)
    def meanRecall(k: Int): Double = {
      val m = Pca.fit(df, k = k)
      def reduce(x: Array[Float]): Array[Double] =
        m.components.map(w =>
          w.zip(x).map { case (wi, xi) => wi * xi.toDouble }.sum -
            w.zip(m.mean).map { case (wi, mi) => wi * mi }.sum)
      val red = emb.map { case (id, v) => id -> reduce(v) }.toMap
      queries.map(q => (top10(full, q) & top10(red, q)).size / 10.0)
        .sum / queries.length
    }
    val r32 = meanRecall(32)
    val r16 = meanRecall(16)
    assert(r32 >= 0.35, s"k=32 recall@10 must far exceed chance (2%): $r32")
    assert(r32 > r16, s"recall must grow with k: k16=$r16 k32=$r32")
  }
}
