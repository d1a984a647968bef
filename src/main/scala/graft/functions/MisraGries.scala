package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters summary as a mergeable partial aggregate.
  *
  * The deterministic counter-based frequency sketch (Misra & Gries
  * 1982): k counters, stream length N, and for every item x the
  * estimate m(x) satisfies `f(x) - N/(k+1) <= m(x) <= f(x)`. The
  * decisive property for Spark is MERGEABILITY (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): two summaries combine by adding
  * counts and re-pruning to k entries, and the error bound still holds
  * for the union stream — so Catalyst may split the input into any
  * partitioning and combine partials in any tree order, exactly like a
  * built-in partial/final aggregate. Shuffle volume is O(k) per map
  * task regardless of stream size, the property that matters when the
  * token stream is 100 TB: an exact groupBy(token) shuffles every
  * distinct token, this shuffles 64 counters.
  *
  * Contract consumed by p9_heavy_hitters: any token with true count
  * strictly above N/(k+1) is GUARANTEED present in the summary. That
  * is checkable against an exact oracle (DuckDB computes true counts;
  * every qualifying token must appear) even though the counter VALUES
  * are partitioning-dependent — so the declared query exposes presence,
  * never the raw counter estimates.
  */
object MisraGries {

  /** Summary buffer: parallel token/count sequences (kept sorted by
    * token for deterministic encoding; `Encoders.product` handles Seq
    * fields, and a Map field would lose ordering determinism).
    */
  final case class MGBuf(tokens: Seq[String], counts: Seq[Long])

  final class MG(k: Int) extends Aggregator[String, MGBuf, MGBuf] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: MGBuf = MGBuf(Vector.empty, Vector.empty)

    private def fromMap(m: Map[String, Long]): MGBuf = {
      val sorted = m.toVector.sortBy(_._1)
      MGBuf(sorted.map(_._1), sorted.map(_._2))
    }

    private def toMap(b: MGBuf): Map[String, Long] =
      b.tokens.iterator.zip(b.counts.iterator).toMap

    /** Classic MG step: increment if tracked, insert if a counter is
      * free, otherwise decrement every counter by one (dropping zeros)
      * — each decrement is "paid for" by one prior increment, which is
      * where the N/(k+1) bound comes from.
      */
    override def reduce(buf: MGBuf, token: String): MGBuf = {
      val m = toMap(buf)
      m.get(token) match {
        case Some(c) => fromMap(m.updated(token, c + 1))
        case None if m.size < k => fromMap(m.updated(token, 1L))
        case None =>
          fromMap(m.flatMap { case (t, c) =>
            if (c > 1) Some(t -> (c - 1)) else None })
      }
    }

    /** Mergeable-summaries combine: sum counts, then if more than k
      * survive subtract the (k+1)-th largest count from all (the merge
      * analogue of the decrement step) and keep the strictly positive.
      */
    override def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
      val m1 = toMap(b1)
      val combined = toMap(b2).foldLeft(m1) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (combined.size <= k) fromMap(combined)
      else {
        val cut = combined.valuesIterator.toVector.sorted(Ordering[Long].reverse)(k)
        fromMap(combined.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None })
      }
    }

    override def finish(r: MGBuf): MGBuf = r
    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** Column-API entry: `sketch(64)(col("token"))` yields a struct with
    * `tokens`/`counts` arrays; callers explode `tokens` for presence.
    */
  def sketch(k: Int): Column => Column = {
    val f = udaf(new MG(k), Encoders.STRING)
    token => f(token)
  }
}
