package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed principal-component analysis over an embedding column —
  * the two-phase linear-algebra-at-scale pattern (MLlib RowMatrix's
  * `computeGramianMatrix` shape, Halko et al. 2011 §4 for the general
  * sketch-then-solve idea):
  *
  *   Phase 1 (distributed, ONE pass): every partition folds its rows
  *   into (count, sum vector, packed upper-triangular Gramian) —
  *   O(d²) state per partition regardless of row count, combined on
  *   the driver. Nothing row-sized ever crosses the network; at
  *   100 TB this is one scan with a d(d+1)/2-double accumulator per
  *   task (d = 64 here → 2 080 doubles).
  *
  *   Phase 2 (driver, control-plane): covariance = Gram/n − μμᵀ, then
  *   a cyclic Jacobi eigensolve of the symmetric d×d matrix — O(d³)
  *   driver work on a 64×64 matrix is microseconds; the eigenbasis is
  *   exactly the artifact you then BROADCAST to project the corpus
  *   (dimensionality reduction before ANN, whitening, variance
  *   audits).
  *
  * Numerics note: unlike the oracle-checked operators (which quantize
  * to integers), PCA is inherently a float pipeline — per-partition
  * double accumulation makes the Gramian partition-order dependent at
  * the 1e-12 level, so the contract is approximate (spec asserts
  * repartition-invariance to 1e-6, orthonormality and variance
  * ordering exactly where algebra guarantees them). Sign convention:
  * each component's largest-magnitude entry is made positive, so the
  * basis is deterministic given the covariance.
  */
object Pca {

  /** mean, row-major components (k × d, orthonormal, variance-sorted
    * descending), their variances, and the row count.
    */
  case class Model(mean: Array[Double], components: Array[Array[Double]],
      variance: Array[Double], n: Long)

  /** One-pass distributed moments: (n, Σx, packed upper Gramian). */
  private[operators] def moments(embeddings: DataFrame, vecCol: String)
      : (Long, Array[Double], Array[Double]) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val parts = embeddings.select(col(vecCol)).as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        var d = -1
        var sum: Array[Double] = null
        var gram: Array[Double] = null
        while (it.hasNext) {
          val x = it.next()
          if (x != null) {
            if (d < 0) {
              d = x.length
              sum = new Array[Double](d)
              gram = new Array[Double](d * (d + 1) / 2)
            }
            require(x.length == d, s"ragged embedding: ${x.length} vs $d")
            n += 1
            var i = 0
            var t = 0
            while (i < d) {
              val xi = x(i).toDouble
              sum(i) += xi
              var j = i
              while (j < d) { gram(t) += xi * x(j); j += 1; t += 1 }
              i += 1
            }
          }
        }
        if (n == 0L) Iterator.empty else Iterator.single((n, sum, gram))
      }.collect() // ≤ one O(d²) triple per partition — control plane
    require(parts.nonEmpty, "PCA needs at least one non-null row")
    val d = parts.head._2.length
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    var n = 0L
    parts.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < sum.length) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += pg(i); i += 1 }
    }
    (n, sum, gram)
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix (row-major d×d).
    * Returns (eigenvalues, eigenvectors as rows), unsorted. Classic
    * two-sided rotations (Golub & Van Loan §8.5) — unconditionally
    * convergent on symmetric input, deterministic sweep order.
    */
  private[operators] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-18) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val eig = Array.tabulate(d)(i => a(i)(i))
    val vecs = Array.tabulate(d)(j => Array.tabulate(d)(i => v(i)(j)))
    (eig, vecs)
  }

  /** Fit the top-`k` principal components of `vecCol`. */
  def fit(embeddings: DataFrame, vecCol: String = "embedding",
      k: Int = 8): Model = {
    val (n, sum, packed) = moments(embeddings, vecCol)
    val d = sum.length
    require(k >= 1 && k <= d, s"k=$k out of range for d=$d")
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = packed(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (eig, vecs) = jacobiEigen(cov)
    val order = eig.indices.sortBy(ix => -eig(ix))
    val comps = order.take(k).map { ix =>
      val w = vecs(ix)
      // deterministic sign: largest-|entry| positive (ties: first)
      val m = w.indices.maxBy(x => (math.abs(w(x)), -x))
      if (w(m) < 0) w.map(-_) else w.clone()
    }.toArray
    Model(mean, comps, order.take(k).map(eig).toArray, n)
  }

  /** Project `vecCol` onto the model's components: appends
    * `outCol` = array<double> of k scores ((x − μ)·wᵢ). The model is
    * a k×d literal folded into codegen'd array arithmetic — the
    * broadcast-the-basis shape (no join, no shuffle; the corpus scan
    * is untouched).
    */
  def project(df: DataFrame, model: Model, vecCol: String = "embedding",
      outCol: String = "pc"): DataFrame = {
    val scores = model.components.zipWithIndex.map { case (w, _) =>
      // (x − μ)·w = x·w − μ·w; μ·w is a driver constant
      val muDotW = w.zip(model.mean).map { case (a, b) => a * b }.sum
      val terms = w.zipWithIndex.collect {
        case (wi, i) if wi != 0.0 =>
          element_at(col(vecCol), i + 1).cast("double") * lit(wi)
      }
      terms.reduce(_ + _) - lit(muDotW)
    }
    df.withColumn(outCol, array(scores.toSeq: _*))
  }
}
