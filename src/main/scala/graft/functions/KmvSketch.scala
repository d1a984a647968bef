package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV ("k minimum values" / bottom-k) distinct-count sketch as a
  * mergeable partial aggregate.
  *
  * Classic estimator (Bar-Yossef et al. 2002; Beyer et al., SIGMOD
  * 2007): hash every element to a uniform 64-bit value, keep the k
  * smallest DISTINCT hashes seen, and estimate the distinct count as
  * (k-1) / u_k where u_k is the k-th order statistic normalized to
  * (0,1]. Expected relative error is about 1/sqrt(k-2).
  *
  * Why this shape matters at 100 TB: exact COUNT(DISTINCT) shuffles
  * every distinct value; HLL (Spark's approx_count_distinct) fixes
  * that but its register states are opaque. KMV keeps the best of
  * both: the final state is the SET of the k smallest distinct hashes
  * of the input — a pure function of the input SET, so any
  * partitioning, any merge tree order, and any row order produce
  * bit-identical sketches. That makes merge exactly associative /
  * commutative (property-tested, `KmvPropertySpec`), shuffle volume
  * O(k) per map task, and — unlike HLL — the sketch doubles as a
  * bottom-k signature usable for set-similarity (the same idea as
  * one-permutation minhash).
  *
  * Contract consumed by p14_kmv_distinct: when fewer than k distinct
  * hashes exist the estimate is EXACT (the sketch saw everything);
  * otherwise the estimate lands within a tolerance of the true count.
  * The declared query exposes the exact count plus a boolean contract
  * flag, so the DuckDB oracle (which cannot compute xxhash64) checks
  * it by recomputing the exact count and expecting TRUE.
  *
  * Input is the 64-bit hash (e.g. `xxhash64(col)`), not the raw value:
  * hashing stays in codegen'd Catalyst expressions and the aggregator
  * only maintains the bounded sorted buffer.
  */
object KmvSketch {

  /** Sketch buffer with LAZY COMPACTION. `hashes` holds candidate
    * hashes; when `sorted` is true it is the canonical state (unsigned
    * ascending, distinct, ≤ k); when false it carries up-to-2k pending
    * appends that a compaction will sort/dedup/trim.
    *
    * Why: the k-smallest invariant does NOT need to hold per row. An
    * always-sorted immutable buffer pays an O(k) copy for every
    * accepted insert — and during the fill phase EVERY row is
    * accepted, so each (group × partition) pays O(k²) building its
    * first k entries (measured as the dominant cost of
    * signature-heavy aggregations). Appending to a Vector is
    * amortized O(1); compacting every ≥k appends is O(k log k) —
    * amortized O(log k) per row, with the O(1) unsigned-threshold
    * reject kicking in once the canonical k-th minimum is known.
    *
    * Equality is CANONICAL (compact both sides first): two buffers
    * holding the same hash SET in different pending states are equal —
    * this is what the merge/commutativity/identity property tests
    * compare, and physical layout is an implementation detail.
    */
  final case class KmvBuf(hashes: Seq[Long], k: Int, sorted: Boolean) {
    /** Canonical form: unsigned-ascending, distinct, trimmed to k. */
    def compacted: KmvBuf =
      if (sorted) this
      else KmvBuf(hashes.distinct.sortWith(unsignedLt).take(k), k, sorted = true)

    override def equals(o: Any): Boolean = o match {
      case b: KmvBuf => k == b.k && compacted.hashes == b.compacted.hashes
      case _ => false
    }
    override def hashCode(): Int = compacted.hashes.hashCode() * 31 + k
  }

  object KmvBuf {
    /** Canonical buffer from an already-finished signature. */
    def fromSignature(sig: Seq[Long], k: Int): KmvBuf =
      KmvBuf(sig, k, sorted = true)
  }

  private def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** Map an unsigned 64-bit hash to (0,1]: (h + 1) / 2^64 — the +1
    * keeps u strictly positive for h = 0.
    */
  private def toUnit(h: Long): Double = {
    val unsigned =
      if (h >= 0) h.toDouble
      else h.toDouble + 1.8446744073709552e19 // + 2^64
    (unsigned + 1.0) / 1.8446744073709552e19
  }

  final class Kmv(k: Int) extends Aggregator[Long, KmvBuf, Double] {
    require(k >= 2, s"k must be >= 2, got $k")

    override def zero: KmvBuf = KmvBuf(Vector.empty, k, sorted = true)

    /** Hot path: O(1) unsigned-threshold reject once the canonical
      * k-th minimum is known, O(1) amortized append otherwise,
      * compaction (sort + dedup + trim) every ≥ k pending appends.
      */
    private[KmvSketch] def insert(b: KmvBuf, h: Long): KmvBuf = {
      if (b.sorted && b.hashes.size >= k && !unsignedLt(h, b.hashes.last)) b
      else {
        val appended = KmvBuf(b.hashes :+ h, k, sorted = false)
        if (appended.hashes.size >= 2 * k) appended.compacted else appended
      }
    }

    override def reduce(buf: KmvBuf, h: Long): KmvBuf = insert(buf, h)

    /** Union of the two candidate sets re-canonicalized — the
      * set-of-k-smallest is a semilattice, so this is exactly
      * associative and commutative (no error growth on merge).
      */
    override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
      KmvBuf(b1.hashes ++ b2.hashes, k, sorted = false).compacted

    override def finish(b: KmvBuf): Double = {
      val c = b.compacted
      if (c.hashes.size < k) c.hashes.size.toDouble
      else (k - 1).toDouble / toUnit(c.hashes.last)
    }

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Distinct-count estimate over a column of 64-bit hashes. */
  def estimate(k: Int)(hashes: Column): Column =
    udaf(new Kmv(k), Encoders.scalaLong).apply(hashes)

  /** Same sketch, but FINISH RETURNS THE SIGNATURE (the bottom-k hash
    * set, unsigned-ascending) instead of collapsing to an estimate —
    * the mergeable artifact for sketch ALGEBRA: group once, then
    * combine the tiny per-group signatures pairwise (union, and from
    * it intersection by inclusion-exclusion) without touching the
    * data again. At 100 TB this is the difference between one scan
    * producing |groups|·k longs and a per-pair re-scan of the corpus.
    */
  final class KmvSig(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    private val inner = new Kmv(k)
    override def zero: KmvBuf = inner.zero
    override def reduce(b: KmvBuf, h: Long): KmvBuf = inner.reduce(b, h)
    override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = inner.merge(b1, b2)
    override def finish(b: KmvBuf): Seq[Long] = b.compacted.hashes
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Bottom-k signature over a column of 64-bit hashes. */
  def signature(k: Int)(hashes: Column): Column =
    udaf(new KmvSig(k), Encoders.scalaLong).apply(hashes)

  /** Bottom-k signature over a column of SIGNATURES: the semilattice
    * merge lifted to an aggregate. Lets a pipeline sketch once per
    * fine-grained group (cheap, near the data) and re-aggregate to
    * coarser groups from the signatures alone — the result is
    * bit-identical to sketching the coarse group directly
    * (associativity; property-tested in KmvPropertySpec). Overlap uses
    * it to turn the per-source signature build into control-plane
    * arithmetic over the per-pattern signatures.
    */
  final class KmvSigMerge(k: Int)
      extends Aggregator[Seq[Long], KmvBuf, Seq[Long]] {
    private val inner = new Kmv(k)
    override def zero: KmvBuf = inner.zero
    override def reduce(b: KmvBuf, sig: Seq[Long]): KmvBuf =
      inner.merge(b, KmvBuf.fromSignature(sig, k))
    override def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = inner.merge(b1, b2)
    override def finish(b: KmvBuf): Seq[Long] = b.compacted.hashes
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Merge a column of bottom-k signatures into one. */
  def mergeSignatures(k: Int)(sigs: Column): Column =
    udaf(new KmvSigMerge(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(sigs)

  /** Distinct-count estimate of A ∪ B from the two signatures alone:
    * merge (re-trim to bottom-k) and finish. Exactly the estimate a
    * single sketch over the concatenated inputs would give (the
    * semilattice property; property-tested).
    */
  def unionEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val inner = new Kmv(k)
    inner.finish(inner.merge(
      KmvBuf.fromSignature(a, k), KmvBuf.fromSignature(b, k)))
  }

  /** `unionEstimate` as a column function for pair-table use. A Scala
    * UDF is the right tool HERE — it runs once per GROUP PAIR (a
    * control-plane-sized table: |groups|² rows of k-long arrays),
    * never per data row, so codegen pressure is irrelevant and
    * reusing the exact merge/finish code beats re-deriving unsigned
    * comparison in expression space.
    */
  def unionEstimateCol(k: Int)(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.udf(
      (x: Seq[Long], y: Seq[Long]) => unionEstimate(x, y, k)).apply(a, b)
}
